"""Volume evaluation (ACDC / Synapse style).

Reference flow (val.py:268-287): python loop over volume slices, each slice
individually zoomed on host, copied to device, forwarded with batch size 1,
argmaxed, copied back, zoomed back — a host↔device ping-pong per slice.

TPU rebuild: all slices of a volume are zoomed once, stacked, padded to a
fixed chunk size and forwarded in batched jitted calls; only the final
integer prediction volume returns to host. With a multi-device mesh the
slice axis is sharded over the ``data`` axis (each chip forwards its share
of the volume) and the per-class confusion sums are computed ON DEVICE —
``jnp.sum`` over a sharded axis lowers to a psum over ICI (SURVEY.md §5.7),
so no prediction gather is needed for Dice. Distance-transform metrics
(HD95) stay on host (scipy), fed by a single prediction readback. Resize
parity: scipy order-0 zoom semantics on both directions, exactly as the
reference (val.py:274, 280).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.evals.metrics import calculate_metric_percase
from hpfg_tpu.parallel.mesh import batch_sharding, pad_to_multiple

# Volumes are padded to a multiple of this many slices so jit sees a tiny,
# fixed set of batch shapes (1-2 compilations, reused across volumes).
DEFAULT_CHUNK = 16

# Native H/W are padded up to multiples of this for the on-device metric
# path, bounding the number of distinct compiled shapes.
HW_BUCKET = 64


class SliceForward:
    """Jitted chunked argmax-forward over stacks of slices.

    apply_fn(variables, x[N, H, W, C_in]) -> logits [N, H, W, C]; `val`-style
    inference (no dropout, running BN stats), matching the reference's
    model.val()/model() eval calls (main.py:315, val.py:278).

    With ``mesh`` the slice axis of each chunk is sharded over the mesh's
    data axis: GSPMD splits the forward across chips (chunk is rounded up to
    a device-count multiple so every chip gets an equal shard).
    """

    def __init__(self, apply_fn: Callable, chunk: int = DEFAULT_CHUNK,
                 output_index: int | None = None, mesh=None,
                 wire_dtype=None):
        """``output_index`` selects one head from tuple-output models: 0 for
        deep-supervision mains (reference test_single_volume_ds,
        val.py:290-308) and SS-Net's (logits, feature) outputs
        (val.py:353-373). ``wire_dtype`` sets the host→device eval input
        precision (default module WIRE_DTYPE = f16; pass np.float32 for
        full-precision parity eval, e.g. fp32-compute configs)."""
        self.mesh = mesh
        self.wire_dtype = np.dtype(WIRE_DTYPE if wire_dtype is None
                                   else wire_dtype)
        if mesh is not None and mesh.devices.size > 1:
            chunk = pad_to_multiple(chunk, mesh.devices.size)
        self.chunk = chunk

        def fwd(variables, x):
            logits = apply_fn(variables, x)
            if output_index is not None:
                logits = logits[output_index]
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._fwd = jax.jit(fwd)

    def _put(self, x: np.ndarray):
        if self.mesh is None or self.mesh.devices.size == 1:
            return x
        return jax.device_put(x, batch_sharding(self.mesh, x.ndim))

    def __call__(self, variables, slices: np.ndarray) -> np.ndarray:
        """slices: [D, H, W, C_in] float32 → predictions [D, H, W] int32."""
        return np.concatenate(
            [np.asarray(c) for c in self.device_chunks(variables, slices)]
        )[:slices.shape[0]]

    def device_chunks(self, variables, slices: np.ndarray) -> list:
        """Forward all (padded) chunks, returning DEVICE arrays [chunk,H,W]
        int32 — callers that keep working on device avoid the readback."""
        return self.forward_chunks(variables, self.put_slices(slices))

    def put_slices(self, slices: np.ndarray) -> list:
        """Pad to chunk multiples and upload ONCE, returning device chunks.

        Multi-model evals reuse the same uploaded slices across models —
        through the dev tunnel every fresh H2D pays a ~26 ms floor
        (CLAUDE.md), so per-model re-uploads dominate eval boundaries
        (EVAL_COST_r05.json)."""
        d = slices.shape[0]
        pad = (-d) % self.chunk
        if pad:
            slices = np.concatenate(
                [slices, np.zeros((pad,) + slices.shape[1:], slices.dtype)])
        sharding = (batch_sharding(self.mesh, slices.ndim)
                    if self.mesh is not None and self.mesh.devices.size > 1
                    else None)
        return [jax.device_put(slices[i:i + self.chunk], sharding)
                for i in range(0, slices.shape[0], self.chunk)]

    def forward_chunks(self, variables, dev_chunks: list) -> list:
        """Forward already-uploaded device chunks (see put_slices)."""
        return [self._fwd(variables, c) for c in dev_chunks]


# Eval slices cross host→device in float16: the dev tunnel's H2D sustains
# ~40-50 MB/s (BENCH_NOTES.md) and every model casts inputs to its compute
# dtype as the first op, so the wire precision is free to halve.
WIRE_DTYPE = np.float16


def predict_volume(forward: SliceForward, variables, image: np.ndarray,
                   patch_size: tuple[int, int],
                   zoom_order: int = 0) -> np.ndarray:
    """image: [D, H, W] → predicted labels [D, H, W] (native resolution)."""
    d, h, w = image.shape
    resized = _resize_volume(image, patch_size, zoom_order)
    preds = forward(variables, resized[..., None].astype(forward.wire_dtype))
    ph, pw = patch_size
    if (h, w) != (ph, pw):
        ys = _zoom_index_map(ph, h)
        xs = _zoom_index_map(pw, w)
        preds = preds[:, ys[:, None], xs[None, :]]
    return preds


def _resize_volume(image: np.ndarray, patch_size: tuple[int, int],
                   zoom_order: int) -> np.ndarray:
    d, h, w = image.shape
    ph, pw = patch_size
    if (h, w) == (ph, pw):
        return image
    if zoom_order == 0:
        # order-0 zoom is a pure index map — compute it once, apply to all
        # slices with one fancy-index (reference zooms per slice,
        # val.py:274).
        ys = _zoom_index_map(h, ph)
        xs = _zoom_index_map(w, pw)
        return image[:, ys[:, None], xs[None, :]]
    from scipy.ndimage import zoom

    return np.stack([zoom(image[i], (ph / h, pw / w), order=zoom_order)
                     for i in range(d)])


def _zoom_index_map(in_size: int, out_size: int) -> np.ndarray:
    """Index map replicating scipy.ndimage.zoom(..., order=0) coordinates."""
    idx = np.arange(out_size)
    # scipy zoom maps output i -> input i * (in-1)/(out-1) (endpoint-aligned)
    if out_size == 1:
        src = np.zeros(1)
    else:
        src = idx * (in_size - 1) / (out_size - 1)
    return np.clip(np.round(src).astype(np.int64), 0, in_size - 1)


# ---------------------------------------------------------------------------
# On-device sharded metric path
# ---------------------------------------------------------------------------

def volume_confusion_sums(forward: SliceForward, variables,
                          image: np.ndarray, label: np.ndarray,
                          num_classes: int, patch_size: tuple[int, int],
                          zoom_order: int = 0,
                          return_pred: bool = True):
    """Per-class (intersection, |pred|, |gt|) at NATIVE resolution, computed
    on device over the (mesh-sharded) slice axis.

    The native-resolution zoom-back (reference val.py:280) is a pure gather
    executed on device; H/W are padded to :data:`HW_BUCKET` multiples so the
    compiled-shape count stays bounded across heterogeneous volumes.

    Returns ``(sums [C-1, 3] int32, pred [D, H, W] | None)`` — ``pred`` is
    the single host readback feeding HD95; pass ``return_pred=False`` for a
    zero-readback fast path (dice-only eval).
    """
    d, h, w = image.shape
    ph, pw = patch_size
    resized = _resize_volume(image, patch_size, zoom_order)
    chunks = forward.device_chunks(
        variables, resized[..., None].astype(forward.wire_dtype))

    hb, wb = pad_to_multiple(h, HW_BUCKET), pad_to_multiple(w, HW_BUCKET)
    ys = np.zeros(hb, np.int32)
    xs = np.zeros(wb, np.int32)
    ys[:h] = _zoom_index_map(ph, h) if (h, w) != (ph, pw) else np.arange(h)
    xs[:w] = _zoom_index_map(pw, w) if (h, w) != (ph, pw) else np.arange(w)

    label_p = np.zeros((len(chunks) * forward.chunk, hb, wb), np.int32)
    label_p[:d, :h, :w] = label
    chunk = forward.chunk
    confusion = _confusion_and_unzoom_fn(num_classes)

    mesh = forward.mesh
    def put(x):
        if mesh is None or mesh.devices.size == 1:
            return x
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    total = None
    pred_chunks = []
    for i, pred_c in enumerate(chunks):
        n_valid = np.clip(d - i * chunk, 0, chunk)
        sums, pred_native = confusion(
            pred_c, put(label_p[i * chunk:(i + 1) * chunk]),
            jnp.asarray(ys), jnp.asarray(xs),
            np.int32(n_valid), np.int32(h), np.int32(w))
        total = sums if total is None else total + sums
        if return_pred:
            pred_chunks.append(pred_native)
    total = np.asarray(total)
    pred = None
    if return_pred:
        pred = np.concatenate([np.asarray(p) for p in pred_chunks])[:d, :h, :w]
    return total, pred


_CONF_UNZOOM_CACHE: dict = {}


def _confusion_and_unzoom_fn(num_classes: int):
    if num_classes not in _CONF_UNZOOM_CACHE:

        def fn(pred_patch, label, ys, xs, n_valid, h, w):
            # pred_patch: [N, ph, pw]; label: [N, Hb, Wb]; ys/xs: bucket-
            # padded native->patch index maps; h/w: true native extent.
            pred = pred_patch[:, ys[:, None], xs[None, :]]  # [N, Hb, Wb]
            n, hb, wb = pred.shape
            valid = ((jnp.arange(n)[:, None, None] < n_valid)
                     & (jnp.arange(hb)[None, :, None] < h)
                     & (jnp.arange(wb)[None, None, :] < w))
            out = []
            for c in range(1, num_classes):
                p = (pred == c) & valid
                l = (label == c) & valid
                out.append(jnp.stack([
                    jnp.sum(p & l, dtype=jnp.int32),
                    jnp.sum(p, dtype=jnp.int32),
                    jnp.sum(l, dtype=jnp.int32),
                ]))
            return jnp.stack(out), pred

        _CONF_UNZOOM_CACHE[num_classes] = jax.jit(fn)
    return _CONF_UNZOOM_CACHE[num_classes]


def dice_from_sums(sums: np.ndarray) -> np.ndarray:
    """Per-class dice with the reference's 3-branch edge rule
    (val.py:376-387 via calculate_metric_percase): both non-empty → dice;
    pred non-empty but gt empty → 1 (a hallucinated class on a volume that
    lacks it scores 1, reachable for early-training checkpoints); else 0."""
    inter, ps, ls = sums[:, 0], sums[:, 1], sums[:, 2]
    denom = ps + ls
    dice = np.where((ps > 0) & (ls > 0),
                    2.0 * inter / np.maximum(denom, 1),
                    np.where((ps > 0) & (ls == 0), 1.0, 0.0))
    return dice


_DICE_ACCUM_CACHE: dict = {}


def _dice_accum_fn(num_classes: int):
    """Jitted on-device per-volume dice (3-branch rule of dice_from_sums)
    accumulated into a running [C-1] sum — no per-volume readback."""
    if num_classes not in _DICE_ACCUM_CACHE:

        def fn(sums, acc):
            inter = sums[:, 0].astype(jnp.float32)
            ps = sums[:, 1].astype(jnp.float32)
            ls = sums[:, 2].astype(jnp.float32)
            dice = jnp.where(
                (ps > 0) & (ls > 0),
                2.0 * inter / jnp.maximum(ps + ls, 1.0),
                jnp.where((ps > 0) & (ls == 0), 1.0, 0.0))
            return acc + dice

        _DICE_ACCUM_CACHE[num_classes] = jax.jit(fn)
    return _DICE_ACCUM_CACHE[num_classes]


def evaluate_volumes_multi(forward: SliceForward, named_variables: dict,
                           volumes, num_classes: int,
                           patch_size: tuple[int, int], zoom_order: int = 0,
                           compute_hd95: bool = True,
                           want_first: bool = True) -> dict:
    """Evaluate SEVERAL models' variables over the same volumes with shared
    per-volume work (EVAL_COST_r05: per-boundary eval cost was dominated by
    per-(model, volume) H2D/D2H round-trips at the ~26 ms tunnel floor and
    duplicated gt-side EDT):

      * each volume's slices / labels / zoom index maps upload ONCE and are
        reused by every model (same wire input regardless of architecture);
      * per-volume dice accumulates ON DEVICE (one [C-1] readback per model
        at the end instead of one per volume);
      * hd95's gt border/EDT is computed once per (volume, class) and
        shared across models (metrics.gt_surface_cache);
      * the prediction readback (1 per model·volume) remains — it feeds
        host EDT — unless ``compute_hd95=False`` and ``want_first=False``.

    Returns {name: (mean_dice, mean_hd95, per_class [C-1, 2], first)} with
    identical semantics to per-model :func:`evaluate_volumes` calls
    (reference volume-then-class averaging, val.py:187-193)."""
    from hpfg_tpu.evals.metrics import binary_hd95, gt_surface_cache

    names = list(named_variables)
    c1 = num_classes - 1
    confusion = _confusion_and_unzoom_fn(num_classes)
    dice_fn = _dice_accum_fn(num_classes)
    dice_acc = {n: jnp.zeros(c1, jnp.float32) for n in names}
    hd_sum = {n: np.zeros(c1, np.float64) for n in names}
    firsts: dict = {n: None for n in names}
    count = 0
    mesh = forward.mesh
    multi_dev = mesh is not None and mesh.devices.size > 1

    for image, label in volumes:
        image = np.asarray(image, dtype=np.float32)
        label = np.asarray(label)
        d, h, w = image.shape
        ph, pw = patch_size
        resized = _resize_volume(image, patch_size, zoom_order)
        dev_slices = forward.put_slices(
            resized[..., None].astype(forward.wire_dtype))
        chunk = forward.chunk

        hb, wb = pad_to_multiple(h, HW_BUCKET), pad_to_multiple(w, HW_BUCKET)
        ys = np.zeros(hb, np.int32)
        xs = np.zeros(wb, np.int32)
        same = (h, w) == (ph, pw)
        ys[:h] = np.arange(h) if same else _zoom_index_map(ph, h)
        xs[:w] = np.arange(w) if same else _zoom_index_map(pw, w)
        ys_d, xs_d = jnp.asarray(ys), jnp.asarray(xs)
        label_p = np.zeros((len(dev_slices) * chunk, hb, wb), np.int32)
        label_p[:d, :h, :w] = label
        label_chunks = [
            jax.device_put(label_p[i * chunk:(i + 1) * chunk],
                           batch_sharding(mesh, 3) if multi_dev else None)
            for i in range(len(dev_slices))]

        gt_caches = None
        if compute_hd95:
            gt_caches = [gt_surface_cache(label == c)
                         for c in range(1, num_classes)]

        for n in names:
            preds = forward.forward_chunks(named_variables[n], dev_slices)
            total = None
            pred_chunks = []
            for i, pred_c in enumerate(preds):
                n_valid = np.clip(d - i * chunk, 0, chunk)
                sums, pred_native = confusion(
                    pred_c, label_chunks[i], ys_d, xs_d,
                    np.int32(n_valid), np.int32(h), np.int32(w))
                total = sums if total is None else total + sums
                pred_chunks.append(pred_native)
            dice_acc[n] = dice_fn(total, dice_acc[n])

            if compute_hd95 or (want_first and firsts[n] is None):
                pred = np.concatenate(
                    [np.asarray(p) for p in pred_chunks])[:d, :h, :w]
                if compute_hd95:
                    for c in range(1, num_classes):
                        pmask = pred == c
                        if pmask.sum() > 0 and gt_caches[c - 1]["any"]:
                            hd_sum[n][c - 1] += binary_hd95(
                                pmask, label == c,
                                gt_cache=gt_caches[c - 1])
                if firsts[n] is None:
                    firsts[n] = (image, label, pred)
        count += 1

    results = {}
    for n in names:
        dice_pc = np.asarray(dice_acc[n]).astype(np.float64) / max(count, 1)
        hd_pc = hd_sum[n] / max(count, 1)
        per_class = np.stack([dice_pc, hd_pc], axis=1)
        results[n] = (float(dice_pc.mean()), float(hd_pc.mean()),
                      per_class, firsts[n])
    return results


def evaluate_volumes(forward: SliceForward, variables, volumes,
                     num_classes: int, patch_size: tuple[int, int],
                     zoom_order: int = 0, compute_hd95: bool = True):
    """Evaluate an iterable of (image [D, H, W], label [D, H, W]) volumes.

    Returns (mean_dice, mean_hd95, per_class [C-1, 2], first) with the
    reference's volume-then-class averaging (val.py:187-193). Dice comes
    from on-device confusion sums (sharded over the mesh when the forward
    carries one); HD95 from host EDT over the predictions — or 0s with
    ``compute_hd95=False``, which skips the prediction readback entirely.
    """
    metric_sum = np.zeros((num_classes - 1, 2), dtype=np.float64)
    count = 0
    first = None
    for image, label in volumes:
        image = np.asarray(image, dtype=np.float32)
        label = np.asarray(label)
        sums, pred = volume_confusion_sums(
            forward, variables, image, label, num_classes, patch_size,
            zoom_order, return_pred=compute_hd95 or first is None)
        metric_sum[:, 0] += dice_from_sums(sums)
        if compute_hd95:
            for i in range(1, num_classes):
                p, l = pred == i, label == i
                if p.sum() > 0 and l.sum() > 0:
                    from hpfg_tpu.evals.metrics import binary_hd95

                    metric_sum[i - 1, 1] += binary_hd95(p, l)
        count += 1
        if first is None:
            first = (image, label, pred)
    per_class = metric_sum / max(count, 1)
    return float(per_class[:, 0].mean()), float(per_class[:, 1].mean()), per_class, first


def evaluate_images(forward: SliceForward, variables, loader,
                    full_metrics: bool = False):
    """Binary 2-D eval for LIDC/ISIC-style loaders yielding batches
    (reference test_lidc val.py:86-106, test_isic val.py:125-151).

    Returns (dice, hd95) or (dice, hd95, jaccard, asd) dataset-weighted means.
    """
    from hpfg_tpu.evals.metrics import calculate_metric_percase_full

    sums = np.zeros(4 if full_metrics else 2, dtype=np.float64)
    n = 0
    for images, labels in loader:
        images = np.asarray(images, dtype=forward.wire_dtype)
        labels = np.asarray(labels)
        preds = forward(variables, images)
        bs = images.shape[0]
        if full_metrics:
            m = calculate_metric_percase_full(preds == 1, labels == 1)
        else:
            m = calculate_metric_percase(preds == 1, labels == 1)
        sums += np.asarray(m) * bs
        n += bs
    sums /= max(n, 1)
    return tuple(float(v) for v in sums)
