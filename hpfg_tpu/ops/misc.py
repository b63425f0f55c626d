"""Misc utility ops for inventory parity (reference utils/utils.py,
utils/knn_monitor.py, utils/enhance/).

Live surface used by trainers is in ops/{rampup,ema,cutmix}.py; this module
covers the remaining helpers the reference ships.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def label_onehot(labels: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """[B, H, W] int → [B, H, W, C] one-hot with negatives clamped to 0
    (reference label_onehot, utils/utils.py:13-19; NHWC instead of NCHW)."""
    labels = jnp.maximum(labels.astype(jnp.int32), 0)
    return jax.nn.one_hot(labels, num_segments, dtype=jnp.float32)


class Denormalize:
    """Invert a mean/std normalization (reference Denormalize,
    utils/utils.py:54-64). Channel-last numpy arrays."""

    def __init__(self, mean, std):
        mean = np.asarray(mean, np.float32)
        std = np.asarray(std, np.float32)
        self._mean = -mean / std
        self._std = 1.0 / std

    def __call__(self, array: np.ndarray) -> np.ndarray:
        return (np.asarray(array) - self._mean) / self._std


def knn_predict(feature: jnp.ndarray, feature_bank: jnp.ndarray,
                feature_labels: jnp.ndarray, classes: int, knn_k: int = 200,
                knn_t: float = 0.1) -> jnp.ndarray:
    """Weighted kNN class scores (reference knn_predict,
    utils/knn_monitor.py:45-80).

    feature [B, D] (L2-normalized), feature_bank [D, N], feature_labels [N].
    Returns [B, classes] predicted-class ranking scores.
    """
    sim = jnp.dot(feature, feature_bank,
                  preferred_element_type=jnp.float32)  # [B, N]
    sim_weight, sim_indices = jax.lax.top_k(sim, knn_k)
    sim_labels = feature_labels[sim_indices]  # [B, K]
    sim_weight = jnp.exp(sim_weight / knn_t)
    one_hot = jax.nn.one_hot(sim_labels, classes, dtype=jnp.float32)
    return jnp.sum(one_hot * sim_weight[..., None], axis=1)


def knn_monitor(embed_fn, memory_batches, test_batches, classes: int,
                knn_k: int = 200, knn_t: float = 0.1) -> float:
    """SSL representation-quality probe (reference knn_monitor,
    utils/knn_monitor.py:9-43): build an L2-normalized feature bank from the
    memory set, rank test features with weighted kNN, return top-1 accuracy."""
    bank, labels = [], []
    for images, lbls in memory_batches:
        f = embed_fn(jnp.asarray(images))
        bank.append(f / jnp.linalg.norm(f, axis=-1, keepdims=True))
        labels.append(jnp.asarray(lbls))
    bank = jnp.concatenate(bank).T  # [D, N]
    labels = jnp.concatenate(labels)

    total, correct = 0, 0
    for images, lbls in test_batches:
        f = embed_fn(jnp.asarray(images))
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        scores = knn_predict(f, bank, labels, classes, knn_k, knn_t)
        pred = jnp.argmax(scores, axis=-1)
        correct += int(jnp.sum(pred == jnp.asarray(lbls)))
        total += len(lbls)
    return correct / max(total, 1)


def saliency_box_masks(rng: jax.Array, images: jnp.ndarray,
                       prop_range=(0.25, 0.5)) -> jnp.ndarray:
    """Saliency-guided CutMix boxes (reference SaliencyMaskGentor,
    utils/enhance/saliencymix.py:34 — cv2 static saliency; here a
    gradient-magnitude proxy so it stays on device): one box per sample,
    centered on the saliency peak, area ~ U(prop_range). Returns
    [B, H, W, 1] masks in {0, 1}."""
    b, h, w, _ = images.shape
    gray = jnp.mean(images, axis=-1)
    gy = jnp.abs(jnp.diff(gray, axis=1, prepend=gray[:, :1]))
    gx = jnp.abs(jnp.diff(gray, axis=2, prepend=gray[:, :, :1]))
    saliency = (gy + gx).reshape(b, -1)
    peak = jnp.argmax(saliency, axis=-1)
    cy, cx = peak // w, peak % w

    k_area, k_aspect = jax.random.split(rng)
    area = jax.random.uniform(k_area, (b,), minval=prop_range[0],
                              maxval=prop_range[1])
    aspect = jnp.exp(jax.random.uniform(k_aspect, (b,), minval=-0.5,
                                        maxval=0.5))
    bh = jnp.round(jnp.sqrt(area / aspect) * h)
    bw = jnp.round(jnp.sqrt(area * aspect) * w)
    y0 = jnp.clip(cy - bh // 2, 0, h - 1)
    x0 = jnp.clip(cx - bw // 2, 0, w - 1)
    y1 = jnp.clip(y0 + bh, 0, h)
    x1 = jnp.clip(x0 + bw, 0, w)

    ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
    inside = ((ys >= y0[:, None, None]) & (ys < y1[:, None, None])
              & (xs >= x0[:, None, None]) & (xs < x1[:, None, None]))
    return inside.astype(jnp.float32)[..., None]
