"""Auxiliary contrastive / knowledge-distillation loss library.

Capability parity with the reference's library losses that no trainer wires
up (SURVEY §2.4 "unused library losses"): ContrastiveLoss, SimCLRLoss,
SimSiamLoss, NT_Xent (the distributed variant whose GatherLayer is the only
distributed-aware code in the reference), Info_Nce_Loss,
CriterionStructuralKD / Kld_Loss, CriterionMiniBatchCrossImagePair,
entropy_minimization / compute_kl_loss. Re-derived for TPU:

  * the reference's GatherLayer (utils/loss/NT_Xent.py:5-21,
    utils/loss/cirkd_mini_batch.py:10-27) wraps torch.distributed.all_gather;
    here `nt_xent_distributed` takes an optional mesh axis name and uses
    `jax.lax.all_gather` inside shard_map/pjit — differentiable, over ICI;
  * all NHWC, masked selects instead of boolean packing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpfg_tpu.models.layers import adaptive_avg_pool


def _l2n(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def simclr_loss(out_1: jnp.ndarray, out_2: jnp.ndarray,
                temperature: float = 0.5) -> jnp.ndarray:
    """SimCLR NT-Xent over 2B local examples (reference SimCLRLoss,
    utils/loss/simclr_loss.py:8-35; ContrastiveLoss in contrastiveloss.py is
    the same computation via log_softmax)."""
    b = out_1.shape[0]
    o1, o2 = _l2n(out_1), _l2n(out_2)
    out = jnp.concatenate([o1, o2], axis=0)
    sim = jnp.exp(jnp.dot(out, out.T, preferred_element_type=jnp.float32)
                  / temperature)
    sim = sim * (1.0 - jnp.eye(2 * b, dtype=sim.dtype))
    pos = jnp.exp(jnp.sum(o1 * o2, axis=-1) / temperature)
    pos = jnp.concatenate([pos, pos], axis=0)
    return jnp.mean(-jnp.log(pos / jnp.sum(sim, axis=-1)))


contrastive_loss = simclr_loss


def nt_xent_distributed(z_i: jnp.ndarray, z_j: jnp.ndarray,
                        temperature: float = 0.5,
                        axis_name: str | None = None) -> jnp.ndarray:
    """Distributed SimCLR loss (reference NT_Xent, utils/loss/NT_Xent.py:23-69).

    With ``axis_name`` set (inside shard_map/pmap over a mesh axis), the local
    views are all-gathered across the data axis — the TPU-native role of the
    reference's GatherLayer — and the CE-form NT-Xent is computed over the
    GLOBAL 2·B·world batch.
    """
    if axis_name is not None:
        z_i = jax.lax.all_gather(z_i, axis_name, tiled=True)
        z_j = jax.lax.all_gather(z_j, axis_name, tiled=True)
    bw = z_i.shape[0]  # batch * world
    n = 2 * bw
    z = _l2n(jnp.concatenate([z_i, z_j], axis=0))
    sim = jnp.dot(z, z.T, preferred_element_type=jnp.float32) / temperature

    pos_ij = jnp.diagonal(sim, offset=bw)
    pos_ji = jnp.diagonal(sim, offset=-bw)
    positives = jnp.concatenate([pos_ij, pos_ji])[:, None]  # [N, 1]

    mask = jnp.ones((n, n), bool)
    mask = mask.at[jnp.arange(n), jnp.arange(n)].set(False)
    idx = jnp.arange(bw)
    mask = mask.at[idx, bw + idx].set(False)
    mask = mask.at[bw + idx, idx].set(False)
    # masked logsumexp over [positives, negatives] with positive at column 0:
    # CE(logits, 0) = -pos + logsumexp(all columns)
    neg_inf = jnp.finfo(sim.dtype).min
    negatives = jnp.where(mask, sim, neg_inf)
    all_logits = jnp.concatenate([positives, negatives], axis=1)
    lse = jax.nn.logsumexp(all_logits, axis=1)
    return jnp.sum(lse - positives[:, 0]) / n


def simsiam_loss(z1, z2, p1, p2, version: str = "simplified") -> jnp.ndarray:
    """SimSiam negative cosine (reference SimSiamLoss,
    utils/loss/simsiam_loss.py:8-32); both versions are the same math."""

    def asym(p, z):
        z = jax.lax.stop_gradient(z)
        return -jnp.mean(jnp.sum(_l2n(p) * _l2n(z), axis=-1))

    return 0.5 * asym(p1, z2) + 0.5 * asym(p2, z1)


def info_nce_loss(features: jnp.ndarray, batch_size: int,
                  temperature: float = 0.7, n_views: int = 2) -> jnp.ndarray:
    """InfoNCE over stacked views (reference Info_Nce_Loss,
    utils/loss/info_nce_loss.py:9-48): features [n_views·B, D]; positives are
    same-index pairs across views; CE against the positive column."""
    labels = jnp.tile(jnp.arange(batch_size), n_views)
    same = (labels[None, :] == labels[:, None])
    n = n_views * batch_size
    eye = jnp.eye(n, dtype=bool)
    f = _l2n(features)
    sim = jnp.dot(f, f.T, preferred_element_type=jnp.float32)

    pos_mask = same & ~eye
    neg_mask = ~same
    neg_inf = jnp.finfo(sim.dtype).min
    # single positive per row for n_views=2
    positives = jnp.sum(jnp.where(pos_mask, sim, 0.0), axis=1, keepdims=True)
    negatives = jnp.where(neg_mask, sim, neg_inf)
    logits = jnp.concatenate([positives, negatives], axis=1) / temperature
    lse = jax.nn.logsumexp(logits, axis=1)
    return jnp.mean(lse - logits[:, 0])


def structural_kd_loss(feat_s: jnp.ndarray, feat_t: jnp.ndarray) -> jnp.ndarray:
    """Structured KD pairwise-similarity MSE (reference CriterionStructuralKD,
    utils/loss/skd_loss.py:9-41): 4x4 max-pool, L2-normalize channels,
    per-sample token-similarity maps, MSE. NHWC in."""
    import flax.linen as nn

    s = nn.max_pool(feat_s, (4, 4), strides=(4, 4))
    t = nn.max_pool(feat_t, (4, 4), strides=(4, 4))
    s = _l2n(s, axis=-1)
    t = _l2n(t, axis=-1)
    b = s.shape[0]
    s = s.reshape(b, -1, s.shape[-1])
    t = t.reshape(b, -1, t.shape[-1])
    sim_s = jnp.einsum("bic,bjc->bij", s, s,
                       preferred_element_type=jnp.float32)
    sim_t = jnp.einsum("bic,bjc->bij", t, t,
                       preferred_element_type=jnp.float32)
    return jnp.mean((sim_s - sim_t) ** 2)


def kld_loss(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """batchmean KL (reference Kld_Loss, utils/loss/skd_loss.py:43-47)."""
    logp = jax.nn.log_softmax(inputs.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(targets.astype(jnp.float32), axis=-1)
    pointwise = jnp.where(q > 0, q * (jnp.log(jnp.maximum(q, 1e-30)) - logp),
                          0.0)
    return jnp.sum(pointwise) / inputs.shape[0]


def cross_image_pair_kd(feat_s: jnp.ndarray, feat_t: jnp.ndarray,
                        temperature: float = 0.7,
                        pooling: int | None = 56) -> jnp.ndarray:
    """Cross-image pairwise KD (reference CriterionMiniBatchCrossImagePair,
    utils/loss/cirkd_mini_batch.py:29-93). The reference's B² python loop
    becomes one batched einsum pair — same mean over all (i, j) pairs."""
    if pooling is not None:
        feat_s = adaptive_avg_pool(feat_s, (pooling, pooling))
        feat_t = adaptive_avg_pool(feat_t, (pooling, pooling))
    s = _l2n(feat_s, axis=-1)
    t = _l2n(feat_t, axis=-1)
    b = s.shape[0]
    s = s.reshape(b, -1, s.shape[-1])
    t = t.reshape(b, -1, t.shape[-1])
    # [B, B, N, N] pairwise token-similarity maps
    sim_s = jnp.einsum("inc,jmc->ijnm", s, s,
                       preferred_element_type=jnp.float32) / temperature
    sim_t = jnp.einsum("inc,jmc->ijnm", t, t,
                       preferred_element_type=jnp.float32) / temperature
    logp = jax.nn.log_softmax(sim_s, axis=-1)
    q = jax.nn.softmax(sim_t, axis=-1)
    pointwise = jnp.where(q > 0, q * (jnp.log(jnp.maximum(q, 1e-30)) - logp),
                          0.0)
    n = s.shape[1]
    # kl_div(batchmean) per (i, j) = sum/N; mean over B² pairs
    return jnp.sum(pointwise) / (n * b * b)


def entropy_minimization(p: jnp.ndarray) -> jnp.ndarray:
    """Mean pixel entropy of probability maps (reference entropy_minmization,
    utils/loss/loss.py:7-11)."""
    return jnp.mean(-jnp.sum(p * jnp.log(p + 1e-6), axis=-1))


def compute_kl_loss(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Symmetric mean KL between logits (reference compute_kl_loss,
    utils/loss/loss.py:20-31)."""
    from hpfg_tpu.ops.losses import softmax_kl_loss

    return 0.5 * (softmax_kl_loss(p, q) + softmax_kl_loss(q, p))


def pixel_class_contrastive_loss(features: jnp.ndarray,
                                 memory_features: jnp.ndarray,
                                 labels: jnp.ndarray,
                                 student_logits: jnp.ndarray,
                                 teacher_logits: jnp.ndarray,
                                 num_classes: int,
                                 length: int = 1024,
                                 temperature: float = 0.1) -> jnp.ndarray:
    """Pixel-level class contrastive loss
    (reference Pixel_Class_Contrastive_Loss, utils/loss/pixel_contrastiveloss.py:8-75).

    For each foreground class c: positives are the first `length`
    correctly-predicted student pixels of class c paired with teacher pixels
    of class c; negatives are `num_classes*length` teacher pixels of OTHER
    classes; InfoNCE with the positive in column 0. Classes without enough
    pixels contribute 0 (the reference `continue`s).

    jit-safe redesign: boolean packing becomes masked top-k index selection
    with validity gating; inputs are NHWC
    (features/memory [B, H, W, C], labels [B, H, W], logits [B, H, W, K]).
    """
    opp_length = num_classes * length
    f = features.reshape(-1, features.shape[-1]).astype(jnp.float32)
    m = memory_features.reshape(-1, memory_features.shape[-1]).astype(jnp.float32)
    lab = labels.reshape(-1).astype(jnp.int32)
    s_pred = jnp.argmax(student_logits, axis=-1).reshape(-1)
    t_pred = jnp.argmax(teacher_logits, axis=-1).reshape(-1)
    s_ok = (s_pred == lab) & (s_pred > 0)
    t_ok = (t_pred == lab) & (t_pred > 0)

    def take_rows(mask, rows, k):
        """First-k rows where mask holds (order-preserving), with validity.
        k is clamped to the number of rows (tiny test inputs)."""
        k = min(k, rows.shape[0])
        key = jnp.where(mask, 0.0, 1.0)
        order = jnp.argsort(key, stable=True)[:k]
        count = jnp.sum(mask)
        valid = jnp.arange(k) < count
        return rows[order], valid, count

    total = jnp.asarray(0.0, jnp.float32)
    for c in range(1, num_classes):
        fc, f_valid, f_count = take_rows(s_ok & (s_pred == c), f, length)
        mc, m_valid, m_count = take_rows(t_ok & (t_pred == c), m, length)
        oc, o_valid, o_count = take_rows(t_ok & (t_pred != c), m, opp_length)

        fc = _l2n(fc)
        mc = _l2n(mc)
        oc = _l2n(oc)
        l_pos = jnp.sum(fc * mc, axis=-1, keepdims=True)  # [L, 1]
        l_neg = jnp.dot(fc, oc.T, preferred_element_type=jnp.float32)
        neg_inf = jnp.finfo(jnp.float32).min
        l_neg = jnp.where(o_valid[None, :], l_neg, neg_inf)
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
        lse = jax.nn.logsumexp(logits, axis=1)
        ce = lse - logits[:, 0]
        row_valid = f_valid & m_valid
        loss_c = jnp.sum(jnp.where(row_valid, ce, 0.0)) / jnp.maximum(
            jnp.sum(row_valid), 1)
        enough = (m_count >= length) & (o_count >= opp_length)
        total = total + jnp.where(enough, loss_c, 0.0)
    return total
