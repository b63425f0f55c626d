"""Synapse abdominal-CT dataset (reference: datasets/Synapse.py).

Layout: train slices as npz (<root>/train_npz/<name>.npz, keys image/label,
listed in train.txt); test volumes as h5 (<root>/test_vol_h5/<name>.npy.h5,
listed in test_vol.txt) (reference: datasets/Synapse.py:104-117).
9-class palette (reference: datasets/Synapse.py:56-58). Train augmentation is
the ACDC RandomGenerator (reference: datasets/Synapse.py:139, local copy at
Synapse.py:16-51).
"""

from __future__ import annotations

import os

import h5py
import numpy as np

from hpfg_tpu.data.loader import BatchLoader, VolumeLoader, random_split
from hpfg_tpu.data.transforms import RandomGenerator

PALETTE = np.array(
    [[0, 0, 0], [0, 128, 192], [128, 0, 0], [64, 0, 128], [192, 192, 128],
     [64, 64, 128], [64, 64, 0], [128, 64, 128], [0, 0, 192],
     [192, 128, 128]], dtype=np.uint8)


class SynapseDataset:
    PALETTE = PALETTE

    def __init__(self, root: str, split: str = "train", cache: bool = True):
        self.root = root
        self.split = split
        self.cache = cache
        self._cached: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if split == "train":
            with open(os.path.join(root, "train.txt"), "r") as f:
                names = [l.strip() for l in f if l.strip()]
            self.sample_list = [
                os.path.join(root, "train_npz", f"{n}.npz") for n in names]
        else:
            with open(os.path.join(root, "test_vol.txt"), "r") as f:
                names = [l.strip() for l in f if l.strip()]
            self.sample_list = [
                os.path.join(root, "test_vol_h5", f"{n}.npy.h5") for n in names]

    def __len__(self) -> int:
        return len(self.sample_list)

    def load(self, idx: int):
        if self.cache and idx in self._cached:
            return self._cached[idx]
        path = self.sample_list[idx]
        if self.split == "train":
            data = np.load(path)
            out = (np.asarray(data["image"], np.float32),
                   np.asarray(data["label"], np.uint8))
        else:
            with h5py.File(path, "r") as f:
                out = (np.asarray(f["image"][:], np.float32),
                       np.asarray(f["label"][:], np.uint8))
        if self.cache:
            self._cached[idx] = out
        return out

    def label_to_img(self, label):
        label = np.asarray(label).astype(np.int64)
        label[label == 255] = 0
        return self.PALETTE[label].astype(np.uint8)


def get_synapse_loader(root: str, batch_size: int = 8,
                       train_crop_size=(224, 224), seed: int = 0):
    """(train, test) (reference get_synapse_loader, datasets/Synapse.py:130-144)."""
    train = SynapseDataset(root, "train")
    test = SynapseDataset(root, "test", cache=False)
    train_loader = BatchLoader(train, batch_size,
                               transform=RandomGenerator(train_crop_size, seed),
                               shuffle=True, drop_last=True, seed=seed)
    return train_loader, VolumeLoader(test)


def get_ssl_synapse_loader(root: str, batch_size: int = 8,
                           unlabel_batch_size: int = 24,
                           train_crop_size=(224, 224),
                           label_num: float = 0.2, seed: int = 0):
    """(label, unlabel, test) (reference get_ssl_synapse_loader,
    datasets/Synapse.py:147-170)."""
    train = SynapseDataset(root, "train")
    label_len = int(len(train) * label_num)
    train_label, train_unlabel = random_split(train, label_len, seed)
    test = SynapseDataset(root, "test", cache=False)
    label_loader = BatchLoader(train_label, batch_size,
                               transform=RandomGenerator(train_crop_size, seed),
                               shuffle=True, drop_last=True, seed=seed)
    unlabel_loader = BatchLoader(
        train_unlabel, unlabel_batch_size,
        transform=RandomGenerator(train_crop_size, seed + 1),
        shuffle=True, drop_last=True, seed=seed + 1)
    return label_loader, unlabel_loader, VolumeLoader(test)
