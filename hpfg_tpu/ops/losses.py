"""Segmentation / SSL loss library, NHWC, pure jnp.

Capability parity with the reference loss library (utils/loss/diceloss.py,
utils/loss/medloss.py, utils/loss/dense_loss.py), re-derived for TPU:

  * class axis LAST (NHWC) so reductions vectorize over the 128-lane axis;
  * per-class dice computed with one einsum over all classes at once instead of
    a python loop over classes (reference: utils/loss/diceloss.py:187-190);
  * everything is jit-safe (static shapes, no data-dependent control flow).

All losses accept float32 or bfloat16 inputs; reductions accumulate in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-5
IGNORE_INDEX = 255


def one_hot_labels(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot over the last (new) axis. Labels outside [0, C) (e.g. the 255
    ignore value) one-hot to all-zeros, matching the reference's
    ``input == i`` encoder (utils/loss/diceloss.py:160-166)."""
    labels = labels.astype(jnp.int32)
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def soft_dice_per_class(probs: jnp.ndarray, target_one_hot: jnp.ndarray,
                        smooth: float = SMOOTH) -> jnp.ndarray:
    """Per-class soft dice LOSS (1 - dice), summed globally over the batch.

    probs: [..., C] probabilities; target_one_hot: [..., C].
    Matches reference `_dice_loss` (utils/loss/diceloss.py:168-176):
    dice = (2*sum(p*t)+s) / (sum(p^2)+sum(t^2)+s), per class over ALL pixels
    of the whole batch.
    Returns [C] vector of losses.
    """
    p = probs.astype(jnp.float32)
    t = target_one_hot.astype(jnp.float32)
    axes = tuple(range(p.ndim - 1))
    intersect = jnp.sum(p * t, axis=axes)
    z_sum = jnp.sum(p * p, axis=axes)
    y_sum = jnp.sum(t * t, axis=axes)
    dice = (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    return 1.0 - dice


def dice_loss_multiclass(probs: jnp.ndarray, labels: jnp.ndarray,
                         num_classes: int,
                         weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean-over-classes soft dice on probabilities vs int labels.

    Equivalent to the reference DiceLoss.forward with softmax pre-applied
    (utils/loss/diceloss.py:178-191): averages over all classes including
    background.
    """
    t = one_hot_labels(labels, num_classes)
    per_class = soft_dice_per_class(probs, t)
    if weight is not None:
        per_class = per_class * jnp.asarray(weight, per_class.dtype)
    return jnp.mean(per_class)


def dice_loss_from_probs(probs: jnp.ndarray, target_probs: jnp.ndarray,
                         smooth: float = SMOOTH) -> jnp.ndarray:
    """Soft-target dice: mean over classes of `dice_loss1`-style dice
    (reference: utils/loss/diceloss.py:19-27, 38-55 softmax_dice_loss body).

    Uses sum(t) (not sum(t^2)) in the denominator like `dice_loss1`.
    """
    p = probs.astype(jnp.float32)
    t = target_probs.astype(jnp.float32)
    axes = tuple(range(p.ndim - 1))
    intersect = jnp.sum(p * t, axis=axes)
    z_sum = jnp.sum(p, axis=axes)
    y_sum = jnp.sum(t, axis=axes)
    dice = (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    return jnp.mean(1.0 - dice)


def softmax_dice_loss(input_logits: jnp.ndarray,
                      target_logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax both sides then soft-target dice
    (reference: utils/loss/diceloss.py:38-55)."""
    return dice_loss_from_probs(jax.nn.softmax(input_logits, axis=-1),
                                jax.nn.softmax(target_logits, axis=-1))


def dice_loss_binary(probs: jnp.ndarray, targets: jnp.ndarray,
                     smooth: float = SMOOTH) -> jnp.ndarray:
    """Per-sample flattened binary dice, averaged over the batch
    (reference DiceLoss_LIDC, utils/loss/diceloss.py:193-205)."""
    n = probs.shape[0]
    p = probs.astype(jnp.float32).reshape(n, -1)
    t = targets.astype(jnp.float32).reshape(n, -1)
    inter = jnp.sum(p * t, axis=1)
    dice = (2.0 * inter + smooth) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth)
    return 1.0 - jnp.mean(dice)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_index: int = IGNORE_INDEX) -> jnp.ndarray:
    """Pixel CE with an ignore index, mean over non-ignored pixels
    (reference: nn.CrossEntropyLoss(ignore_index=255), utils/loss/medloss.py:50).
    logits: [..., C]; labels: integer [...]."""
    labels = labels.astype(jnp.int32)
    valid = (labels != ignore_index)
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction instead of take_along_axis: a per-pixel gather
    # lowers to a serial "custom fusion" on TPU (profiled at 5.3 ms/step for
    # [8,224,224,4]); the dense multiply+sum vectorizes over the lane axis.
    oh = jax.nn.one_hot(safe_labels, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * oh, axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def med_sup_loss(logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
                 ce_weight: float = 0.5, dice_weight: float = 0.5) -> jnp.ndarray:
    """0.5*CE(ignore 255) + 0.5*Dice(softmax, labels)
    (reference Med_Sup_Loss, utils/loss/medloss.py:46-56)."""
    ce = cross_entropy_loss(logits, labels)
    dl = dice_loss_multiclass(jax.nn.softmax(logits, axis=-1), labels, num_classes)
    return ce_weight * ce + dice_weight * dl


def softmax_mse_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray,
                     sigmoid: bool = False) -> jnp.ndarray:
    """Elementwise (softmax(in) - softmax(tgt))^2 map; caller reduces
    (reference: utils/loss/diceloss.py:64-81). Gradients flow to inputs only
    if the caller stops them on targets (done at call sites, as in the
    reference's `with torch.no_grad()` teacher passes)."""
    if sigmoid:
        a = jax.nn.sigmoid(input_logits.astype(jnp.float32))
        b = jax.nn.sigmoid(target_logits.astype(jnp.float32))
    else:
        a = jax.nn.softmax(input_logits.astype(jnp.float32), axis=-1)
        b = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    return (a - b) ** 2


def softmax_kl_loss(input_logits: jnp.ndarray, target_logits: jnp.ndarray,
                    sigmoid: bool = False) -> jnp.ndarray:
    """KL(target || input) with 'mean' reduction over ALL elements, matching
    torch F.kl_div(reduction='mean') (reference: utils/loss/diceloss.py:84-103)."""
    if sigmoid:
        logp = jnp.log(jax.nn.sigmoid(input_logits.astype(jnp.float32)))
        q = jax.nn.sigmoid(target_logits.astype(jnp.float32))
    else:
        logp = jax.nn.log_softmax(input_logits.astype(jnp.float32), axis=-1)
        q = jax.nn.softmax(target_logits.astype(jnp.float32), axis=-1)
    # torch kl_div pointwise: q * (log q - log p); 0 where q == 0.
    pointwise = jnp.where(q > 0, q * (jnp.log(jnp.maximum(q, 1e-30)) - logp), 0.0)
    return jnp.mean(pointwise)


def symmetric_mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference, gradients to both sides
    (reference: utils/loss/diceloss.py:106-115)."""
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def entropy_loss(probs: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Mean normalized pixel entropy (reference: utils/loss/diceloss.py:30-35)."""
    p = probs.astype(jnp.float32)
    ent = -jnp.sum(p * jnp.log(p + 1e-6), axis=-1) / jnp.log(float(num_classes))
    return jnp.mean(ent)


def entropy_loss_map(probs: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Per-pixel normalized entropy map (reference: utils/loss/diceloss.py:58-61)."""
    p = probs.astype(jnp.float32)
    return -jnp.sum(p * jnp.log(p + 1e-6), axis=-1, keepdims=True) / jnp.log(
        float(num_classes))


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0,
               alpha: jnp.ndarray | None = None,
               size_average: bool = True) -> jnp.ndarray:
    """Focal loss (reference FocalLoss, utils/loss/diceloss.py:118-152)."""
    labels = labels.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction, not take_along_axis (gathers serialize on TPU)
    oh = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    logpt = jnp.sum(logp * oh, axis=-1)
    pt = jnp.exp(jax.lax.stop_gradient(logpt))
    if alpha is not None:
        at = jnp.sum(jnp.asarray(alpha, jnp.float32) * oh, axis=-1)
        logpt = logpt * at
    loss = -((1.0 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def _binary_ce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def bce_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """0.5*BCE + binary dice (reference BCEDiceLoss, utils/loss/diceloss.py:207-221)."""
    bce = _binary_ce_with_logits(logits, targets)
    dice = dice_loss_binary(jax.nn.sigmoid(logits), targets)
    return 0.5 * bce + dice


def bce_dice_l1_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """0.5*BCE + dice + 0.1*smooth-L1 (reference BCEDiceL1Loss,
    utils/loss/diceloss.py:223-238)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    diff = jnp.abs(x - t)
    l1 = jnp.mean(jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5))
    return bce_dice_loss(logits, targets) + 0.1 * l1


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _nt_xent(out_1: jnp.ndarray, out_2: jnp.ndarray,
             temperature: float) -> jnp.ndarray:
    """SimCLR NT-Xent over a 2B x 2B similarity matrix
    (reference Dense_Loss.contrastive_loss, utils/loss/dense_loss.py:17-33).

    out_1/out_2: [B, D] already normalized+flattened. The B x B similarity
    matmul is the MXU hot path; under a data-parallel mesh the concat/matmul
    become a global all-gather + matmul automatically (the role of the
    reference's dead GatherLayer, utils/loss/NT_Xent.py:5-21).
    """
    b = out_1.shape[0]
    out = jnp.concatenate([out_1, out_2], axis=0)  # [2B, D]
    sim = jnp.exp(
        jnp.dot(out, out.T, preferred_element_type=jnp.float32) / temperature)
    # zero the diagonal instead of masked_select-ing it away: same row sums.
    sim = sim * (1.0 - jnp.eye(2 * b, dtype=sim.dtype))
    pos = jnp.exp(jnp.sum(out_1 * out_2, axis=-1) / temperature)  # [B]
    pos = jnp.concatenate([pos, pos], axis=0)  # [2B]
    return jnp.mean(-jnp.log(pos / jnp.sum(sim, axis=-1)))


def dense_contrastive_loss(student: tuple[jnp.ndarray, jnp.ndarray],
                           teacher: tuple[jnp.ndarray, jnp.ndarray],
                           temperature: float = 0.7) -> jnp.ndarray:
    """HPFG's dense contrastive loss between projection-neck outputs
    (reference Dense_Loss.forward, utils/loss/dense_loss.py:35-40).

    student/teacher: tuples (global [B, D], dense [B, S, D]) from the
    projection necks (dense stored spatial-major so D rides the TPU lane
    axis; the reference stores [B, D, S*S] and normalizes dim=1 — identical
    math). Teacher side is detached.
    """
    sg, sd = student
    tg, td = jax.tree_util.tree_map(jax.lax.stop_gradient, teacher)

    sg = _l2_normalize(sg.astype(jnp.float32), axis=-1)
    tg = _l2_normalize(tg.astype(jnp.float32), axis=-1)
    sd = _l2_normalize(sd.astype(jnp.float32), axis=-1).reshape(sd.shape[0], -1)
    td = _l2_normalize(td.astype(jnp.float32), axis=-1).reshape(td.shape[0], -1)

    loss_g = _nt_xent(sg, tg, temperature)
    loss_d = _nt_xent(sd, td, temperature)
    return 0.5 * (loss_g + loss_d)
