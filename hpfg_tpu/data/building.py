"""Aerial building-footprint dataset (reference: datasets/Building.py).

Layout (reference: datasets/Building.py:73-92): <root>/{train,val,test}.txt
name lists (with extensions); train/val images under <root>/train/image/,
masks under <root>/train/mask/<stem>.png; test under <root>/test/ (the test
split yields images only, Building.py:53-55). Supervised-only in the
reference (3-loader: train, val, test).
"""

from __future__ import annotations

import os

import numpy as np

from hpfg_tpu.data.augment2d import BuildingTrainTransform
from hpfg_tpu.data.lidc import PNGPairDataset
from hpfg_tpu.data.loader import BatchLoader

PALETTE = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)


class BuildingTestDataset:
    """Image-only test split (reference: datasets/Building.py:53-55)."""

    PALETTE = PALETTE

    def __init__(self, img_paths):
        self.img_paths = list(img_paths)

    def __len__(self):
        return len(self.img_paths)

    def load(self, idx: int):
        from PIL import Image

        image = np.asarray(Image.open(self.img_paths[idx]).convert("RGB"),
                           dtype=np.float32) / 255.0
        # dummy mask so the generic BatchLoader stacking works; callers of the
        # test split only consume images (reference returns image alone).
        return image, np.zeros(image.shape[:2], np.uint8)


def _paths(root: str, split: str):
    with open(os.path.join(root, f"{split}.txt"), "r") as f:
        names = [line.strip() for line in f if line.strip()]
    sub = "train" if split in ("train", "val") else "test"
    base = os.path.join(root, sub)
    imgs = [os.path.join(base, "image", n) for n in names]
    anns = [os.path.join(base, "mask", f"{n.split('.')[0]}.png")
            for n in names]
    return imgs, anns


def get_building_loader(root: str, batch_size: int = 8,
                        train_crop_size=(512, 512), seed: int = 0):
    """(train, val, test) loaders (reference get_building_loader,
    datasets/Building.py:95-131)."""
    timgs, tanns = _paths(root, "train")
    vimgs, vanns = _paths(root, "val")
    simgs, _ = _paths(root, "test")
    train = PNGPairDataset(timgs, tanns, binarize="eq255")
    val = PNGPairDataset(vimgs, vanns, binarize="eq255", cache=False)
    test = BuildingTestDataset(simgs)
    train_loader = BatchLoader(
        train, batch_size,
        transform=BuildingTrainTransform(train_crop_size, seed=seed),
        shuffle=True, drop_last=False, seed=seed)
    val_loader = BatchLoader(val, batch_size, shuffle=False, drop_last=True,
                             seed=seed)
    test_loader = BatchLoader(test, batch_size, shuffle=False,
                              drop_last=False, seed=seed)
    return train_loader, val_loader, test_loader
