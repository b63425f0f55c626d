"""Synthetic dataset fixtures.

The reference has no test assets; the rebuild's test/bench suites need data
with the exact on-disk layouts the loaders expect. These generators write
structured, learnable volumes (concentric ellipse "cardiac" phantoms for
ACDC's 4 classes) so single-step-loss-decreases and dice-improves tests are
meaningful, not noise.
"""

from __future__ import annotations

import os

import h5py
import numpy as np


def _phantom_slice(rng: np.random.Generator, h: int, w: int,
                   num_classes: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """One slice: background + (num_classes-1) concentric ellipse rings."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy = h / 2 + rng.uniform(-h / 8, h / 8)
    cx = w / 2 + rng.uniform(-w / 8, w / 8)
    ry = rng.uniform(h / 8, h / 4)
    rx = rng.uniform(w / 8, w / 4)
    theta = rng.uniform(0, np.pi)
    ys, xs = yy - cy, xx - cx
    yr = ys * np.cos(theta) + xs * np.sin(theta)
    xr = -ys * np.sin(theta) + xs * np.cos(theta)
    r = np.sqrt((yr / ry) ** 2 + (xr / rx) ** 2)

    mask = np.zeros((h, w), dtype=np.uint8)
    # outer ring = class 1, middle = class 2, core = class 3 (ACDC-like)
    radii = np.linspace(1.0, 0.3, num_classes)
    for cls in range(1, num_classes):
        mask[r < radii[cls - 1]] = cls

    image = 0.2 + 0.15 * mask.astype(np.float32)
    image += rng.normal(0, 0.05, (h, w)).astype(np.float32)
    image = np.clip(image, 0.0, 1.0)
    return image, mask


def make_synthetic_acdc(root: str, n_train_slices: int = 48,
                        n_test_volumes: int = 3, depth: int = 6,
                        hw: tuple[int, int] = (256, 216),
                        num_classes: int = 4, seed: int = 0) -> str:
    """Write an ACDC-layout tree (reference layout: datasets/ACDC.py:65-82)."""
    rng = np.random.default_rng(seed)
    h, w = hw
    os.makedirs(os.path.join(root, "data", "slices"), exist_ok=True)

    train_names = []
    for i in range(n_train_slices):
        name = f"patient{i:03d}_frame01_slice_{i % 10}"
        train_names.append(name)
        image, mask = _phantom_slice(rng, h, w, num_classes)
        with h5py.File(os.path.join(root, "data", "slices", f"{name}.h5"), "w") as f:
            f.create_dataset("image", data=image)
            f.create_dataset("label", data=mask)

    test_names, val_names = [], []
    for i in range(n_test_volumes * 2):
        name = f"patient{100 + i:03d}_volume"
        (test_names if i < n_test_volumes else val_names).append(name)
        vol_img = np.zeros((depth, h, w), dtype=np.float32)
        vol_msk = np.zeros((depth, h, w), dtype=np.uint8)
        for d in range(depth):
            vol_img[d], vol_msk[d] = _phantom_slice(rng, h, w, num_classes)
        with h5py.File(os.path.join(root, "data", f"{name}.h5"), "w") as f:
            f.create_dataset("image", data=vol_img)
            f.create_dataset("label", data=vol_msk)

    for list_name, names in [("train_slices.list", train_names),
                             ("test.list", test_names),
                             ("val.list", val_names)]:
        with open(os.path.join(root, list_name), "w") as f:
            f.write("\n".join(names) + "\n")
    return root


def make_synthetic_png_pairs(root: str, n: int = 24, hw: tuple[int, int] = (96, 96),
                             rgb: bool = True, seed: int = 0,
                             image_dir: str = "image_r", mask_dir: str = "mask_r",
                             mask_prefix: str = "LIDC_Mask_") -> str:
    """Write a LIDC/ISIC-style PNG image/mask tree (reference: datasets/LIDC.py:79-82)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    h, w = hw
    os.makedirs(os.path.join(root, image_dir), exist_ok=True)
    os.makedirs(os.path.join(root, mask_dir), exist_ok=True)
    for i in range(n):
        image, mask = _phantom_slice(rng, h, w, num_classes=2)
        arr = (image * 255).astype(np.uint8)
        if rgb:
            arr = np.stack([arr] * 3, axis=-1)
        Image.fromarray(arr).save(os.path.join(root, image_dir, f"{i:04d}.png"))
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(root, mask_dir, f"{mask_prefix}{i:04d}.png"))
    return root
