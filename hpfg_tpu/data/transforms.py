"""Host-side numpy augmentations with reference parity.

`RandomGenerator` (reference: datasets/utils.py:99-117): with p=0.5 apply a
random rot90+flip, else with p=0.5 apply a ±20° nearest-neighbor rotation;
always nearest-zoom to the crop size. These run in the loader's worker
threads; the on-device batched equivalent lives in hpfg_tpu/ops/augment.py.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def nearest_zoom(arr: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """scipy.ndimage.zoom(..., order=0) equivalent used for all eval/train
    resizes in the reference (val.py:274,280; datasets/utils.py:107-111)."""
    x, y = arr.shape[:2]
    if (x, y) == tuple(out_hw):
        return arr
    return ndimage.zoom(arr, (out_hw[0] / x, out_hw[1] / y), order=0)


def random_rot_flip(image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
    """k*90° rotation + axis flip (reference: datasets/utils.py:75-83)."""
    k = rng.integers(0, 4)
    image = np.rot90(image, k)
    label = np.rot90(label, k)
    axis = rng.integers(0, 2)
    image = np.flip(image, axis=axis).copy()
    label = np.flip(label, axis=axis).copy()
    return image, label


def random_rotate(image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
    """±20° nearest rotation, no reshape (reference: datasets/utils.py:86-90)."""
    angle = rng.integers(-20, 20)
    image = ndimage.rotate(image, angle, order=0, reshape=False)
    label = ndimage.rotate(label, angle, order=0, reshape=False)
    return image, label


class RandomGenerator:
    """Reference RandomGenerator (datasets/utils.py:99-117) on numpy, NHWC out.

    Returns (image [H, W, 1] float32, mask [H, W] uint8).
    """

    def __init__(self, output_size: tuple[int, int], seed: int | None = None):
        self.output_size = tuple(output_size)
        self.seed = 0 if seed is None else int(seed)
        self.rng = np.random.default_rng(seed)

    def __call__(self, image: np.ndarray, mask: np.ndarray,
                 rng: np.random.Generator | None = None):
        """``rng`` (when provided by the loader) is derived statelessly from
        (loader seed, epoch, sample index) so multi-threaded sample assembly
        stays bit-deterministic; the fallback shared-rng path matches the
        reference's global-random behavior."""
        rng = self.rng if rng is None else rng
        if rng.random() > 0.5:
            image, mask = random_rot_flip(image, mask, rng)
        elif rng.random() > 0.5:
            image, mask = random_rotate(image, mask, rng)
        image = nearest_zoom(image, self.output_size).astype(np.float32)
        mask = nearest_zoom(mask, self.output_size).astype(np.uint8)
        return image[..., None], mask


class ResizeOnly:
    """Deterministic nearest resize for the on-device augmentation path
    (geometry randomness then runs in ops/augment.py on TPU).

    ``deterministic = True`` lets BatchLoader cache the result per sample
    index, so the single-core host pays each resize once per run instead of
    once per epoch."""

    deterministic = True

    def __init__(self, output_size: tuple[int, int]):
        self.output_size = tuple(output_size)

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        image = nearest_zoom(image, self.output_size).astype(np.float32)
        mask = nearest_zoom(mask, self.output_size).astype(np.uint8)
        return image[..., None], mask


def color_jitter_image(image: np.ndarray, rng: np.random.Generator,
                       strength: float = 1.0) -> np.ndarray:
    """Strong-branch color jitter (reference color_jitter,
    datasets/utils.py:93-101: ColorJitter(0.8s, 0.8s, 0.8s, 0.2s))."""
    img = image.astype(np.float32)
    b = 0.8 * strength
    img = img * rng.uniform(1 - b, 1 + b)
    mean = img.mean()
    img = (img - mean) * rng.uniform(1 - b, 1 + b) + mean
    return np.clip(img, 0.0, 1.0)


class WeakStrongAugment:
    """Weak (rot/flip) + strong (color jitter) augmented views
    (reference WeakStrongAugment, datasets/utils.py:120-153).

    Returns dict(image, image_weak, image_strong, label_aug) like the
    reference, with HWC float images.
    """

    def __init__(self, output_size: tuple[int, int], seed: int | None = None):
        self.output_size = tuple(output_size)
        self.rng = np.random.default_rng(seed)

    def __call__(self, image: np.ndarray, label: np.ndarray) -> dict:
        image = nearest_zoom(image, self.output_size)
        label = nearest_zoom(label, self.output_size)
        image_weak, label = random_rot_flip(image, label, self.rng)
        image_strong = color_jitter_image(image_weak, self.rng)
        return {
            "image": image.astype(np.float32)[..., None],
            "image_weak": image_weak.astype(np.float32)[..., None],
            "image_strong": image_strong.astype(np.float32)[..., None],
            "label_aug": label.astype(np.uint8),
        }
