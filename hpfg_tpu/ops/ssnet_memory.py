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

The class axis is BATCHED, not python-unrolled: bank refresh and the
contrastive distances/reductions run as single [C, ...] ops, so the HLO size
is independent of the class count (4-class ACDC and 9-class Synapse compile
the same program shape). Only the per-class selector MLPs stay unrolled —
they are distinct named modules (reference checkpoint layout) of 32x32
matmuls, negligible next to the [C, N, K] distance work.
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
    """One bank refresh (all classes in one batched program).

    features:        [N, F] projected features (already stop-gradient)
    labels:          [N] int class labels of each feature
    candidate_mask:  [N] bool — rows eligible for storage
    scores_per_class:[C, N] sigmoid selector score per class (lower = kept)
    memory:          [C, K, F]; memory_valid: [C, K] bool
    """
    c_dim, k, f = memory.shape
    assert c_dim == num_classes
    features = jax.lax.stop_gradient(features.astype(jnp.float32))

    classes = jnp.arange(num_classes, dtype=labels.dtype)
    mask = candidate_mask[None, :] & (labels[None, :] == classes[:, None])
    count = jnp.sum(mask, axis=1)                                   # [C]
    # keep K lowest scores among masked rows: top_k of negated score
    key = jnp.where(mask, -scores_per_class, NEG)                   # [C, N]
    _, idx = jax.lax.top_k(key, k)                                  # [C, K]
    gathered = features[idx]                                        # [C, K, F]
    slot_valid = jnp.arange(k)[None, :] < jnp.minimum(count, k)[:, None]
    new_mem = jnp.where(slot_valid[:, :, None], gathered, memory)
    has_any = (count > 0)[:, None]
    new_valid = jnp.where(has_any, slot_valid, memory_valid)
    new_mem = jnp.where(has_any[:, :, None], new_mem, memory)
    return new_mem, new_valid


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
    attention MLPs (feature-side detached), mean over valid pairs. Distances
    and reductions are one batched [C, N, K] program; only the selector MLP
    calls unroll (distinct per-class modules).
    """
    feats32 = features.astype(jnp.float32)
    c_dim, k, _ = memory.shape
    assert c_dim == num_classes

    feat_n = _l2n(feats32)                                          # [N, F]
    mem_n = _l2n(memory)                                            # [C, K, F]
    distances = 1.0 - jnp.einsum(
        "nf,ckf->cnk", feat_n, mem_n,
        preferred_element_type=jnp.float32)                         # [C, N, K]

    classes = jnp.arange(num_classes, dtype=labels.dtype)
    mask_f = labels[None, :] == classes[:, None]                    # [C, N]
    m_count = jnp.sum(mask_f, axis=1).astype(jnp.float32)           # [C]
    k_count = jnp.sum(memory_valid, axis=1).astype(jnp.float32)     # [C]

    sg_feats = jax.lax.stop_gradient(feats32)
    w_f = jnp.stack([
        jax.nn.sigmoid(selector_fn(c, sg_feats))[:, 0]
        for c in range(num_classes)])                               # [C, N]
    w_f_sum = jnp.sum(jnp.where(mask_f, w_f, 0.0), axis=1)
    w_f = (m_count / jnp.maximum(w_f_sum, 1e-8))[:, None] * w_f

    w_m = jnp.stack([
        jax.nn.sigmoid(selector_memory_fn(c, memory[c]))[:, 0]
        for c in range(num_classes)])                               # [C, K]
    w_m_sum = jnp.sum(jnp.where(memory_valid, w_m, 0.0), axis=1)
    w_m = (k_count / jnp.maximum(w_m_sum, 1e-8))[:, None] * w_m

    pair_mask = mask_f[:, :, None] & memory_valid[:, None, :]       # [C, N, K]
    weighted = distances * w_f[:, :, None] * w_m[:, None, :]
    mean_c = jnp.sum(jnp.where(pair_mask, weighted, 0.0),
                     axis=(1, 2)) / jnp.maximum(m_count * k_count, 1.0)
    use = (m_count > 1) & (k_count > 1)
    total = jnp.sum(jnp.where(use, mean_c, 0.0))
    return total / num_classes
