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
        self.rng = np.random.default_rng(seed)

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        if self.rng.random() > 0.5:
            image, mask = random_rot_flip(image, mask, self.rng)
        elif self.rng.random() > 0.5:
            image, mask = random_rotate(image, mask, self.rng)
        image = nearest_zoom(image, self.output_size).astype(np.float32)
        mask = nearest_zoom(mask, self.output_size).astype(np.uint8)
        return image[..., None], mask
