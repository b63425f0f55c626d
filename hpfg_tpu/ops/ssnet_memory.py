"""SS-Net prototype feature memory, jit-safe fixed-shape redesign.

The reference FeatureMemory (utils/loss/ssnet_loss.py:4-48) stores a python
list of variable-length numpy arrays on the CPU and rebuilds it every
iteration from boolean-masked features — dynamic shapes, host round-trips.

TPU redesign: the bank is a fixed [C, K, F] array + [C, K] validity mask
living INSIDE the train state (donated HBM buffer, no host traffic). Variable
feature counts become masked top-k selections:
  * candidate mask: correctly-predicted, non-background labeled pixels
    (reference trainer 2022_03…py:122-127)
  * when more than K candidates exist for a class, keep the K with the
    LOWEST sigmoid selector score — the reference sorts ascending and takes
    the head (utils/loss/ssnet_loss.py:33-43)
  * classes with zero candidates retain their previous bank contents
    (reference only overwrites when features exist, ssnet_loss.py:30-48).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

NEG = -1e9


def update_memory(features: jnp.ndarray, labels: jnp.ndarray,
                  candidate_mask: jnp.ndarray, scores_per_class: jnp.ndarray,
                  memory: jnp.ndarray, memory_valid: jnp.ndarray,
                  num_classes: int):
    """One bank refresh.

    features:        [N, F] projected features (already stop-gradient)
    labels:          [N] int class labels of each feature
    candidate_mask:  [N] bool — rows eligible for storage
    scores_per_class:[C, N] sigmoid selector score per class (lower = kept)
    memory:          [C, K, F]; memory_valid: [C, K] bool
    """
    c_dim, k, f = memory.shape
    assert c_dim == num_classes
    features = jax.lax.stop_gradient(features.astype(jnp.float32))

    new_mem, new_valid = [], []
    for c in range(num_classes):
        mask_c = candidate_mask & (labels == c)
        count = jnp.sum(mask_c)
        # keep K lowest scores among masked rows: top_k of negated score
        key = jnp.where(mask_c, -scores_per_class[c], NEG)
        _, idx = jax.lax.top_k(key, k)
        gathered = features[idx]  # [K, F]
        slot_valid = jnp.arange(k) < jnp.minimum(count, k)
        mem_c = jnp.where(slot_valid[:, None], gathered, memory[c])
        valid_c = jnp.where(count > 0, slot_valid, memory_valid[c])
        mem_c = jnp.where(count > 0, mem_c, memory[c])
        new_mem.append(mem_c)
        new_valid.append(valid_c)
    return jnp.stack(new_mem), jnp.stack(new_valid)


def _l2n(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def contrastive_class_to_class_learned_memory(
        features: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
        memory: jnp.ndarray, memory_valid: jnp.ndarray,
        selector_fn: Callable[[int, jnp.ndarray], jnp.ndarray],
        selector_memory_fn: Callable[[int, jnp.ndarray], jnp.ndarray]):
    """Masked-pair reimplementation of the reference loss
    (utils/loss/ssnet_loss.py:50-104).

    features: [N, F] prediction-head outputs; labels: [N]. For each class c
    with >1 feature rows and >1 valid memory slots: cosine distances between
    L2-normalized rows and memory, re-weighted by two learned sigmoid
    attention MLPs (feature-side detached), mean over valid pairs.
    """
    feats32 = features.astype(jnp.float32)
    total = jnp.asarray(0.0, jnp.float32)
    for c in range(num_classes):
        mask_f = (labels == c)
        m_count = jnp.sum(mask_f).astype(jnp.float32)
        mem_c = memory[c]                        # [K, F]
        vmask = memory_valid[c]                  # [K]
        k_count = jnp.sum(vmask).astype(jnp.float32)

        mem_n = _l2n(mem_c)
        feat_n = _l2n(feats32)
        distances = 1.0 - jnp.dot(feat_n, mem_n.T,
                                  preferred_element_type=jnp.float32)  # [N, K]

        w_f = jax.nn.sigmoid(
            selector_fn(c, jax.lax.stop_gradient(feats32)))[:, 0]  # [N]
        w_f_sum = jnp.sum(jnp.where(mask_f, w_f, 0.0))
        w_f = (m_count / jnp.maximum(w_f_sum, 1e-8)) * w_f

        w_m = jax.nn.sigmoid(selector_memory_fn(c, mem_c))[:, 0]  # [K]
        w_m_sum = jnp.sum(jnp.where(vmask, w_m, 0.0))
        w_m = (k_count / jnp.maximum(w_m_sum, 1e-8)) * w_m

        pair_mask = mask_f[:, None] & vmask[None, :]
        weighted = distances * w_f[:, None] * w_m[None, :]
        mean_c = jnp.sum(jnp.where(pair_mask, weighted, 0.0)) / jnp.maximum(
            m_count * k_count, 1.0)
        use = (m_count > 1) & (k_count > 1)
        total = total + jnp.where(use, mean_c, 0.0)
    return total / num_classes
