"""Fused UNet ConvBlock (Pallas TPU kernels).

The reference ConvBlock (conv3x3 - BN - LeakyReLU - Dropout - conv3x3 - BN -
LeakyReLU, reference: model/unet.py:12-28) dominates the UNet train step at
the large-spatial / small-channel stages (16-64 channels at 224²/112²). The
XLA lowering runs it as ~20 memory-bound ops per block, each wasting 7/8 of
the 128-lane axis because the channel count rides the minor dimension
(profiled at ~0.2 TB/s effective on v5e, ~25% of HBM peak).

TPU-first redesign in this module:

  * activations are processed in PACKED row form [H, W*C] — the (W, C) axes
    collapse onto the lane axis so every VMEM tile is 100% occupied;
  * the 3x3 conv becomes ONE dense MXU matmul per image:
    im2col A = [H*W/8, 30C] built from lane-rolls + tile-aligned reshapes
    (group stride 8C is a multiple of 128 for C in {16, 32, 64, ...}),
    weights expanded to a block-structured [30C, 8F] matrix (8 output pixels
    per MXU column group -> the N axis is full, ~30% dense);
  * BatchNorm statistics are per-lane sums accumulated ACROSS the batch grid
    in the same pass as the conv (no separate reduce ops), finalized by tiny
    jnp glue; normalization + LeakyReLU + dropout fuse into the next conv's
    input load;
  * train mode needs two batch-stat sync points, so the block runs as three
    kernels (conv1+stats -> bn1+act+drop+conv2+stats -> bn2+act); everything
    else stays in VMEM.

The backward pass is Pallas too (wired via jax.custom_vjp): the BN+LeakyReLU
backward reduces to per-lane sums [Σdz, Σdz·x̂] (one reduction kernel, which
also IS (dbias, dscale)); dpre = a·(dz − S0/N − x̂·S1/N) materializes in one
elementwise kernel; the conv input-gradient is ANOTHER packed conv with
flip-transposed expanded weights; and the weight gradient is a single
im2colᵀ @ grouped-cotangent matmul per image ([30C, HW/8] x [HW/8, 8F] —
full-lane MXU shapes), accumulated across the batch grid and folded back to
[3,3,C,F] with the placement tensor. Everything is gradchecked against
jax.grad of the pure-jnp reference in tests/test_fused_conv_block.py.
"""

from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.01
BN_EPS = 1e-5

# In-kernel im2col construction for the SINGLE-input conv paths:
#   'roll'  — two full-width fp32 lane rolls per chunk, per-dy window
#             concats (the round-2/3 validated form);
#   'shift' — group-reshape the chunk once, 'own' operands are static
#             sublane slices (K = pix*C, one full MXU K-pass), and all six
#             halo columns (left/right x 3 dy) pack into ONE [M, 6C]
#             operand: 4 MXU K-passes per chunk instead of 6, zero lane
#             rolls, zero full-width concats, bf16 end-to-end.
#   'packrw'— r4 hybrid: roll's construction (2 lane rolls, cheap windows)
#             with shift's pass structure — the lw windows contract alone
#             (K = pix*C, one full K-tile) and the three rw windows pack
#             into ONE [M, 6C] pass against row-permuted weights
#             (expand_weights_packrw): 4 K-tile passes/chunk at roll's VPU
#             cost. Shift lost its MXU win to halo-assembly VPU time
#             (BENCH_NOTES session-10); packrw keeps the win without that
#             cost IF Mosaic lowers the misaligned-target rw concat.
# A/B candidate for the 15.1 ms/step of conv._fused the r3 profile shows
# against a 2-3 ms HBM roofline (BENCH_NOTES.md). The flag drives fwd conv,
# dgrad, wgrad (plus _fold_wgrad's matching fold) AND the dual-input
# (concat-fold) forward (_shift_chunk_conv_cat).
_IM2COL = _os.environ.get("HPFG_IM2COL", "roll")
if _IM2COL not in ("roll", "shift", "packrw"):
    raise ValueError(
        f"unknown HPFG_IM2COL={_IM2COL!r} (roll | shift | packrw)")

# HPFG_EXT_BF16=1 (A/B candidate, shift form only): keep the extended chunk
# rows in the input dtype on identity-transform paths (conv1 fwd, dgrad,
# wgrad-identity) instead of the fp32 roundtrip. The fp32 ext exists to
# serve Mosaic's 32-bit-only lane rotate — the shift form has NO rolls, so
# for bf16 inputs the fp32 trip is numerically a no-op (bf16→f32→bf16)
# that costs whole-chunk VPU casts and 2x ext VMEM. BN-affine/dropout
# transforms (conv2) and the C=1 stem MXU expand stay fp32. Off by default
# pending TPU gate + bench (bf16 sublane slices at odd offsets retile the
# (16, 128) packed tiles — cost unknown until measured).
_EXT_BF16 = _os.environ.get("HPFG_EXT_BF16", "0") == "1"

# Round-4 backward folds (VERDICT r3 #1: the bwd pass got none of the
# pair/stem fwd-fold treatment — up4/bwd 5.38 + up3/bwd 2.73 ms/step):
#   HPFG_DUAL_BWD=1    — pair (UpBlock) stage-1 backward runs ONE shared
#                        im2col of dh2 against both halves' flipped weights
#                        (_dgrad_pair) and ONE wgrad kernel sharing the
#                        dpre group-reshape (_wgrad_pair), instead of two
#                        independent kernels per half.
#   HPFG_FOLD_REDUCE=1 — stage-2 dgrad folds the NEXT stage's bwd_reduce
#                        into its output loop (_dgrad's own output rows are
#                        the reduce's operand, already in VMEM per chunk).
# Default ON after the session-14 on-chip A/B (TPU_GATE_dualbwd.json green;
# bench base 884.07 / dual 904.72 / fold 889.11 / dual+fold 908.56 img/s —
# _chain/bench_r04_*.json, round-3 discipline).
_DUAL_BWD = _os.environ.get("HPFG_DUAL_BWD", "1") == "1"
_FOLD_REDUCE = _os.environ.get("HPFG_FOLD_REDUCE", "1") == "1"


def set_bwd_flags(dual: bool | None = None, fold: bool | None = None) -> None:
    """Test/A-B hook for the round-4 backward-fold dispatch flags."""
    global _DUAL_BWD, _FOLD_REDUCE
    if dual is not None:
        _DUAL_BWD = dual
    if fold is not None:
        _FOLD_REDUCE = fold


def set_im2col_form(form: str, ext_bf16: bool | None = None) -> None:
    """Force the im2col construction ('roll' | 'shift' | 'packrw') and
    optionally the shift-form ext dtype fast path; tests/probes only —
    takes effect at trace time, so flip it before (re)tracing."""
    global _IM2COL, _EXT_BF16
    if form not in ("roll", "shift", "packrw"):
        raise ValueError(form)
    _IM2COL = form
    if ext_bf16 is not None:
        _EXT_BF16 = ext_bf16

# Output pixels per MXU column group ("pix"). The expanded weight matrix
# [3*(pix+2)*C, pix*F] has density 3/(pix+2) — smaller pix = denser MXU work
# — but lane alignment needs pix*C % 128 == 0 and pix*F % 128 == 0, so pix
# shrinks as the channel counts grow: 8 at C=16 (30% dense), 4 at C=32
# (50%), 2 at C>=64 (75%). choose_pix picks per conv.


def _min_pix(ch: int) -> int:
    """Smallest power-of-two p with p*ch % 128 == 0."""
    import math

    return max(128 // math.gcd(ch, 128), 1)


def choose_pix(w: int, c: int, f: int) -> int | None:
    """Densest (smallest) group size for a c->f conv on W-wide rows, or
    None when no power-of-two group satisfies the alignment constraints.
    pix >= 2: the right-roll window supplies 2C columns per group, which a
    1-pixel group cannot hold (pix=1 would need a third rolled copy)."""
    pix = max(_min_pix(c), _min_pix(f), 2)
    if pix > 8 or w % pix != 0:
        return None
    return pix


def choose_pix_cat(w: int, ca: int, cb: int, f: int) -> int | None:
    """Group size for the DUAL-INPUT conv (UpBlock concat fold): one pix
    must satisfy the lane alignment of both input halves and the output."""
    pix = max(_min_pix(ca), _min_pix(cb), _min_pix(f), 2)
    if pix > 8 or w % pix != 0:
        return None
    return pix

# Mosaic's default scoped-vmem limit is a conservative 16M; the wide dgrad
# blocks (e.g. [224, 224*32] outputs) need more headroom for double-buffered
# block windows + im2col temporaries.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


class ConvBlockParams(NamedTuple):
    w1: jax.Array  # [3, 3, C, F]
    b1: jax.Array  # [F]
    scale1: jax.Array
    bias1: jax.Array
    w2: jax.Array  # [3, 3, F, F]
    b2: jax.Array
    scale2: jax.Array
    bias2: jax.Array


def supported(h: int, w: int, c: int, f: int) -> bool:
    """Shapes the packed kernels handle: both convs of the block must admit
    a lane-aligned group size (see choose_pix)."""
    if f % 16 != 0 or f > 128:
        return False
    if not (c == 1 or (c % 16 == 0 and c <= 128)):
        return False
    c_eff = 16 if c == 1 else c
    return (choose_pix(w, c_eff, f) is not None
            and choose_pix(w, f, f) is not None)


def supported_cat(h: int, w: int, ca: int, cb: int, f: int) -> bool:
    """Shapes the dual-input (concat-folded) block handles: each half must
    be lane-aligned on its own (the kernel packs two im2cols side by side,
    never materializing the channel interleave)."""
    if f % 16 != 0 or f > 128:
        return False
    for ci in (ca, cb):
        if ci % 16 != 0 or ci > 128:
            return False
    return (choose_pix_cat(w, ca, cb, f) is not None
            and choose_pix(w, f, f) is not None)


# Dispatch floor for `profitable` (on-chip A/B knob): the w >= 112 default
# was measured with the ROLL im2col (56² stages were a net in-model loss,
# 676 → 666 img/s); the shift form's better pass structure may flip them —
# re-A/B with HPFG_FUSED_MINW=56 before trusting the old number.
_FUSED_MINW = int(_os.environ.get("HPFG_FUSED_MINW", "112"))


def profitable(h: int, w: int, c: int, f: int) -> bool:
    """Where the packed kernels beat XLA on TPU: the large-spatial,
    small-channel stages whose minor-dim lane waste cripples the XLA
    lowering (measured: 2.9 vs 4.9 ms fwd, 5.8 vs ~11 ms fwd+bwd at
    224²x16; 1.51x fwd+bwd at 112²x16→32 with pix=4 groups; ~1.07x at
    56²x32→64 standalone — but a net LOSS in-model with the roll form:
    canonical bench 676 → 666 img/s with 56² stages dispatched).
    Wide-channel / small-spatial stages are lane-friendly and stay on XLA
    fusions (0.74x at 56² 128→64)."""
    return w >= _FUSED_MINW and max(c, f) <= 64


# elements per im2col chunk, sized against the raised scoped-vmem limit in
# _COMPILER_PARAMS (chunk-size sweep on v5e: x4 budget -> th=112 rows at
# 224²x16 is ~3% faster than th=28 — bigger chunks mean fewer, larger MXU
# passes; beyond x4 is flat).
_CHUNK_BUDGET = 112 * 3584


def _row_chunk(h: int, wl: int) -> int:
    """Rows per in-kernel im2col chunk (VMEM sizing); divides h.

    Under the shift im2col form the chunk's group-row count (TH+2)*G must
    stay a sublane-tile multiple for the halo's sublane rolls (G = W/pix is
    28 at every fused stage, so TH even suffices) — skip odd candidates."""
    for th in (224, 112, 56, 32, 28, 16, 14, 8, 7, 4, 2):
        if _IM2COL == "shift" and th % 2:
            continue
        if h % th == 0 and th * wl <= _CHUNK_BUDGET:
            return th
    return 1


# ---------------------------------------------------------------------------
# weight expansion (jnp, tiny tensors — runs in the surrounding jit)
# ---------------------------------------------------------------------------

_PLACEMENT_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _placement(c: int, pix: int) -> np.ndarray:
    """Constant indicator T[j, p, dx, ci] = 1 iff im2col slab lane j feeds
    output pixel p through conv tap dx / input channel ci."""
    if (c, pix) not in _PLACEMENT_CACHE:
        kdy = (pix + 2) * c
        t = np.zeros((kdy, pix, 3, c), np.float32)
        for dx in range(3):
            for p in range(pix):
                for ci in range(c):
                    t[(p + dx) * c + ci, p, dx, ci] = 1.0
        _PLACEMENT_CACHE[(c, pix)] = t.reshape(kdy * pix, 3 * c)
    return _PLACEMENT_CACHE[(c, pix)]


def expand_weights(w: jax.Array, pix: int) -> jax.Array:
    """[3, 3, C, F] -> block-structured [3 * (pix+2)*C, pix*F].

    Column group p (output pixel p of a pix-pixel group) reads input lanes
    [(p+dx)*C, (p+dx+1)*C) of the dy-th slab; everything else is zero. The
    matmul A[HW/pix, (pix+2)C] @ W_big then computes pix output pixels
    x F channels per row at once. Built with ONE contraction against a
    cached 0/1 placement tensor (a python scatter loop would trace to ~72
    tiny HLO ops per block per step)."""
    _, _, c, f = w.shape
    kdy = (pix + 2) * c
    t = jnp.asarray(_placement(c, pix), w.dtype)
    wr = w.reshape(3, 3 * c, f)            # [dy, dx*c+ci, f]
    out = jnp.einsum("kx,yxf->ykf", t, wr)  # [3, kdy*pix, f]
    return out.reshape(3, kdy, pix, f).reshape(3 * kdy, pix * f)


def expand_weights_cat(wa: jax.Array, wb: jax.Array, pix: int) -> jax.Array:
    """Stack the expanded halves of a concat conv's weight per dy slab so
    the dual-input im2col columns [lw_a | rw_a | lw_b | rw_b] hit their
    taps: rows [3*(pix+2)*(Ca+Cb), pix*F]."""
    ea, eb = expand_weights(wa, pix), expand_weights(wb, pix)
    ka, kb = ea.shape[0] // 3, eb.shape[0] // 3
    pf = ea.shape[1]
    return jnp.concatenate([ea.reshape(3, ka, pf), eb.reshape(3, kb, pf)],
                           axis=1).reshape(3 * (ka + kb), pf)


def _placement_shift(c: int, pix: int) -> np.ndarray:
    """0/1 indicator for the shift-form 'own' blocks: im2col lane p'*C+ci
    (own pixel p' of the group) feeds output pixel p through tap dx = p'-p+1
    when that tap stays inside the group."""
    key = ("shift", c, pix)
    if key not in _PLACEMENT_CACHE:
        t = np.zeros((pix * c, pix, 3, c), np.float32)
        for p in range(pix):
            for dx in range(3):
                pp = p + dx - 1
                if 0 <= pp < pix:
                    for ci in range(c):
                        t[pp * c + ci, p, dx, ci] = 1.0
        _PLACEMENT_CACHE[key] = t.reshape(pix * c * pix, 3 * c)
    return _PLACEMENT_CACHE[key]


def expand_weights_shift(w: jax.Array, pix: int) -> jax.Array:
    """[3, 3, C, F] -> [3*pix*C + 6*C, pix*F] for the shift-form kernels.

    Rows [i*pix*C, (i+1)*pix*C) are dy-slab i's 'own' block (taps whose
    input pixel lies inside the output group); the trailing 6C rows are the
    packed halo block, matching the kernel's [M, 6C] halo operand columns
    [left(dy=-1) | right(dy=-1) | left(0) | right(0) | left(1) | right(1)]:
    the left halo (group pixel -1) only feeds output pixel p=0 through
    dx=0, the right halo (pixel pix) only p=pix-1 through dx=2. Total K
    rows equal the roll form's 3*(pix+2)*C — the contraction work is
    conserved; only its pass structure changes."""
    _, _, c, f = w.shape
    t = jnp.asarray(_placement_shift(c, pix), w.dtype)
    wr = w.reshape(3, 3 * c, f)
    own = jnp.einsum("kx,yxf->ykf", t, wr)          # [3, pix*c*pix, f]
    own = own.reshape(3, pix * c, pix, f).reshape(3 * pix * c, pix * f)
    halo = jnp.zeros((3, 2 * c, pix, f), w.dtype)
    halo = halo.at[:, :c, 0].set(w[:, 0])           # left -> output p=0
    halo = halo.at[:, c:, pix - 1].set(w[:, 2])     # right -> p=pix-1
    return jnp.concatenate([own, halo.reshape(6 * c, pix * f)], axis=0)


def expand_weights_shift_cat(wa: jax.Array, wb: jax.Array,
                             pix: int) -> jax.Array:
    """[3,3,Ca,F] + [3,3,Cb,F] -> [3*pix*(Ca+Cb) + 6*(Ca+Cb), pix*F] for
    the dual-input SHIFT kernels (UpBlock concat fold). Per-input own slabs
    stay separate — rows [own_a | own_b] with own_b's dy slab i at
    3*pix*Ca + i*pix*Cb — so each input contracts its own grp operand in a
    full dense K-pass; the trailing halo block is [halo_a | halo_b],
    matching the kernel's concat([halo_a, halo_b], axis=1) operand. Total
    rows equal expand_weights_cat's 3*(pix+2)*(Ca+Cb) (shared out_ref /
    wgrad shapes across forms)."""
    ca, cb = wa.shape[2], wb.shape[2]
    ea, eb = expand_weights_shift(wa, pix), expand_weights_shift(wb, pix)
    return jnp.concatenate([ea[:3 * pix * ca], eb[:3 * pix * cb],
                            ea[3 * pix * ca:], eb[3 * pix * cb:]], axis=0)


def expand_weights_packrw(w: jax.Array, pix: int) -> jax.Array:
    """Row-permuted expand_weights for the PACKRW im2col form: rows
    [own0 | own1 | own2 | halo0 | halo1 | halo2] where own_i is dy slab i's
    lw block (pix*C rows) and halo_i its rw block (2C rows). Same values as
    the roll expansion — only the contraction is regrouped so the three
    full-K lw passes run at K = pix*C (one MXU K-tile) and all rw columns
    pack into ONE trailing [6C, pix*F] pass: 4 K-tile passes per chunk
    instead of the roll form's 6 (shift's pass count) while keeping the
    roll form's cheap VPU construction (2 lane rolls, no sublane rolls,
    no iota masks)."""
    e = expand_weights(w, pix)
    c = w.shape[2]
    kdy, kown = (pix + 2) * c, pix * c
    own = [e[i * kdy:i * kdy + kown] for i in range(3)]
    halo = [e[i * kdy + kown:(i + 1) * kdy] for i in range(3)]
    return jnp.concatenate(own + halo, axis=0)


def _expand1(w: jax.Array, pix: int) -> jax.Array:
    """Weight expansion for the SINGLE-input conv kernels in the active
    im2col form (the kernels branch on the same module flag at trace
    time, so operand and weight layouts always agree)."""
    if _IM2COL == "shift":
        return expand_weights_shift(w, pix)
    if _IM2COL == "packrw":
        return expand_weights_packrw(w, pix)
    return expand_weights(w, pix)


def _expand_cat(wa: jax.Array, wb: jax.Array, pix: int) -> jax.Array:
    """Dual-input weight expansion in the active im2col form (_expand1's
    counterpart for the concat-folded conv1)."""
    return (expand_weights_shift_cat(wa, wb, pix) if _IM2COL == "shift"
            else expand_weights_cat(wa, wb, pix))


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _lane_index(h, l):
    return jax.lax.broadcasted_iota(jnp.int32, (h, l), dimension=1)


# In-kernel dropout: instead of materializing a [B, H, W*F] mask in HBM
# (generated by jax.random, written once, read by THREE kernels across
# fwd/bwd), every kernel regenerates the mask from a murmur3-style integer
# hash of (seed, image, row, lane). Halo rows hash identically regardless of
# which chunk reads them, and the same jnp ops serve as the test oracle
# (hash_mask_reference).

_GOLD = np.uint32(0x9E3779B9)
_MUR1 = np.uint32(0x85EBCA6B)
_MUR2 = np.uint32(0xC2B2AE35)


def _hash_mask(seed_u32, b_idx, row_ids, lane_ids, l_total: int,
               keep: float):
    """Pre-scaled dropout mask (1/keep or 0) for int32 row/lane id grids."""
    v = (row_ids * np.int32(l_total) + lane_ids).astype(jnp.uint32)
    x = v + (seed_u32 + jnp.uint32(b_idx) * _GOLD)
    x = x ^ (x >> 16)
    x = x * _MUR1
    x = x ^ (x >> 13)
    x = x * _MUR2
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int(keep * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(x < thresh, jnp.float32(1.0 / keep), jnp.float32(0.0))


def hash_mask_reference(seed, b: int, h: int, l: int, keep: float):
    """jnp oracle: the [h, l] mask image ``b`` sees (tests)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, l), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (h, l), 1)
    return _hash_mask(jnp.asarray(seed, jnp.uint32), b, rows, lanes, l, keep)


def _kernel_mask_rows(seed_ref, lo: int, hi: int, l: int, keep: float):
    """Mask rows [lo, hi) for the current grid image (in-kernel)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (hi - lo, l), 0) + lo
    lanes = jax.lax.broadcasted_iota(jnp.int32, (hi - lo, l), 1)
    return _hash_mask(seed_ref[0].astype(jnp.uint32), pl.program_id(0),
                      rows, lanes, l, keep)


def _roll(x, shift, axis):
    """Lane roll with jnp.roll semantics for negative shifts.

    Mosaic's lane rotate only supports 32-bit data, so rolls run on fp32
    rows. (A bf16 int32-bitcast roll is NOT equivalent on hardware: bf16
    tiles pack SUBLANE pairs (2,1) into 32-bit words, so the reinterpreted
    lanes don't correspond to adjacent bf16 lanes.)"""
    assert x.dtype.itemsize == 4, x.dtype
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _padded_rows(x_ref, y0, th, h, transform, dtype=jnp.float32):
    """rows [y0-1, y0+th+1) of x_ref[0] (static bounds) with zero rows
    outside the image; ``transform(rows, lo, hi)`` (elementwise, may slice
    sibling refs with the same static bounds) runs ONCE on the valid rows.
    ``dtype``: row working dtype — fp32 by default (lane rolls and the
    BN/dropout transforms need it); the shift form passes the input dtype
    on identity-transform paths under HPFG_EXT_BF16."""
    lo, hi = max(y0 - 1, 0), min(y0 + th + 1, h)
    body = transform(x_ref[0, lo:hi].astype(dtype), lo, hi)
    parts = []
    if lo > y0 - 1:
        parts.append(jnp.zeros((lo - (y0 - 1), body.shape[1]), body.dtype))
    parts.append(body)
    if hi < y0 + th + 1:
        parts.append(jnp.zeros((y0 + th + 1 - hi, body.shape[1]), body.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else body


def _rolled_pair(ext, c, w, pix):
    """The two lane-rolled copies of the EXTENDED chunk rows (one roll pair
    for the whole chunk instead of one pair per dy slab — lane rolls run on
    the fp32 VPU and were the dominant non-MXU cost at 6 rolls/chunk).

    ext: [TH+2, W*C]. Returns (left, right) with jnp.roll semantics and the
    SAME-conv zero masks applied:
      left  = roll(+C):        lanes [G*g - C, G*g + (pix-1)*C) per group
      right = roll(-(pix-1)C): lanes [G*g + (pix-1)*C, G*g + (pix+1)*C)
    """
    the, l = ext.shape
    lane = _lane_index(the, l)
    zero = jnp.zeros((), ext.dtype)
    left = jnp.where(lane < c, zero, _roll(ext, c, 1))
    right = jnp.where(lane >= l - (pix - 1) * c, zero,
                      _roll(ext, -(pix - 1) * c, 1))
    return left, right


def _im2col_dy_windows(left, right, dy, th, c, w, pix):
    """dy-slab im2col from the pre-rolled chunk copies: slice the dy row
    window and reshape into pix-pixel groups ([TH*W/pix, (pix+2)*C]). Group
    stride pix*C is a 128-multiple by choose_pix (tile-aligned reshapes)."""
    lw = left[dy + 1:dy + 1 + th].reshape(th * w // pix, pix * c)
    rw = right[dy + 1:dy + 1 + th].reshape(th * w // pix, pix * c)[:, :2 * c]
    return lw, rw


def _shift_operands(ext, c, w, pix, mm, halo_dtype=None):
    """SHIFT-form im2col operands for one extended chunk — the ONE
    constructor shared by the forward conv (_shift_chunk_conv) and the
    weight gradient (_wgrad_kernel): both must build bit-identical operands
    or dW silently diverges from the forward (a failure class the interpret
    suite can mask).

    ext: [TH+2, W*C] extended rows. Returns (own, halo, g, m): dy slab i's
    'own' operand own[i] is ext[i:i+TH] group-reshaped to [M, pix*C]
    (G = W/pix, M = TH*G; lane-aligned by choose_pix — K = pix*C is exactly
    one full MXU K-pass at pix*C=128); halo is the packed [M, 6C] operand
    (columns [left|right] per dy slab) of the six boundary-masked halo
    columns (a single K-pass). No lane rolls, no full-width concats.

    Mosaic layout constraints (v5e, found the hard way — two failed gate
    attempts): VALUE slices carry their register offsets with them, and
    Mosaic cannot relayout a non-zero offset on a non-concat dimension
    inside tpu.concatenate, in bf16 OR fp32 ("result/input offset mismatch
    on non-concat dimension", TPU_GATE_im2col.json 2026-08-19). Both halo
    ingredients hit this: the left column is a lane slice at offset
    (pix-1)*C = 112, and the per-dy row windows are sublane slices at
    offsets i*G % 8 != 0. The construction below therefore uses ONLY
    proven-lowering primitives (validated in isolation by
    _mosaic_probe.py on the chip):
      * the left column is canonicalized by a full-width fp32 lane roll
        (pltpu.roll, the primitive the rolled form runs green on) before
        its offset-0 slice;
      * the per-dy row shifts are SUBLANE rolls of the even-row-count
        [THE*G, C] columns (THE*G % 8 == 0, tile-aligned) with the two
        out-of-range edge rows masked by an iota select — no sublane
        concats, no misaligned slices, no scratch.
    fp32 assembly is exact: bf16→f32→bf16 is lossless and the cast
    commutes with select/roll/concat. The own slabs are sublane-sliced
    from ext BEFORE the group reshape (slice→reshape→cast, the
    layout-normalizing pattern the rolled form already runs green).

    ``halo_dtype`` overrides the returned halo dtype (the dual-input caller
    keeps it f32 so both halos concat before a single cast).

    Halo source columns: ONE narrow lane slice each, masked at the group
    boundary (left operand row j sources group-row s+j-1, whose value must
    vanish when output group g = j%G == 0, i.e. source%G == G-1; right
    symmetric). If Mosaic ever rejects the int remainder for a
    non-power-of-2 G, swap ridx%g for a periodic iota:
    broadcasted_iota(int32, (the, g, c), 1).reshape(the*g, c)."""
    the = ext.shape[0]
    th = the - 2
    g = w // pix
    m = th * g
    nr = the * g
    g32 = ext.astype(jnp.float32).reshape(nr, pix * c)
    own = [ext[i:i + th].reshape(m, pix * c).astype(mm) for i in range(3)]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (nr, c), 0)
    zero = jnp.zeros((), jnp.float32)
    lcol = jnp.where(ridx % g == g - 1, zero,
                     pltpu.roll(g32, c, 1)[:, :c])
    rcol = jnp.where(ridx % g == 0, zero, g32[:, :c])
    jrow = jax.lax.broadcasted_iota(jnp.int32, (m, c), 0)
    halos = []
    for i in range(3):
        s = i * g
        # left_i[j] = lcol[s+j-1] (0 when s+j-1 < 0): sublane roll + mask
        lsh = pltpu.roll(lcol, (1 - s) % nr, 0)[:m]
        halos.append(jnp.where(jrow + (s - 1) < 0, zero, lsh))
        # right_i[j] = rcol[s+j+1] (0 when s+j+1 >= nr)
        rsh = pltpu.roll(rcol, (-(s + 1)) % nr, 0)[:m]
        halos.append(jnp.where(jrow + (s + 1) >= nr, zero, rsh))
    halo = jnp.concatenate(halos, axis=1).astype(halo_dtype or mm)
    return own, halo, g, m


def _shift_chunk_conv(ext, wbig_ref, *, c, f, w, pix, mm):
    """One chunk's conv output [TH, W*F] in the SHIFT im2col form: the
    shared operands contracted against the expand_weights_shift rows
    (own blocks [i*pix*C, (i+1)*pix*C), packed halo block trailing 6C)."""
    th = ext.shape[0] - 2
    own, halo, g, m = _shift_operands(ext, c, w, pix, mm)
    kown = pix * c
    o = jax.lax.dot_general(
        halo, wbig_ref[3 * kown:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [M, pix*F]
    for i in range(3):
        o = o + jax.lax.dot_general(
            own[i], wbig_ref[i * kown:(i + 1) * kown],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return o.reshape(th, w * f)


def _shift_chunk_conv_cat(ext, ext2, wbig_ref, *, c, c2, f, w, pix, mm):
    """Dual-input SHIFT conv chunk [TH, W*F]: each input's own slabs
    contract against their separate weight blocks (K = pix*C per pass, both
    halves lane-aligned by choose_pix_cat), and BOTH packed halo operands
    join in one [M, 6*(C+C2)] pass — weight layout from
    expand_weights_shift_cat. The [B,H,W,Ca+Cb] interleave never exists and
    no full-width concat is built (the halo concat is 6*(C+C2) lanes)."""
    th = ext.shape[0] - 2
    own_a, halo_a, g, m = _shift_operands(ext, c, w, pix, mm,
                                          halo_dtype=jnp.float32)
    own_b, halo_b, _, _ = _shift_operands(ext2, c2, w, pix, mm,
                                          halo_dtype=jnp.float32)
    ka, kb = pix * c, pix * c2
    o = jax.lax.dot_general(
        jnp.concatenate([halo_a, halo_b], axis=1).astype(mm),
        wbig_ref[3 * (ka + kb):],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [M, pix*F]
    for i in range(3):
        o = o + jax.lax.dot_general(
            own_a[i], wbig_ref[i * ka:(i + 1) * ka],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o + jax.lax.dot_general(
            own_b[i],
            wbig_ref[3 * ka + i * kb:3 * ka + (i + 1) * kb],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return o.reshape(th, w * f)


def _conv_rows(x_ref, wbig_ref, bvec_ref, out_ref, sums, *, c, f, w, h, pix,
               transform, dtype, post=None, x2_ref=None, c2=0,
               identity_transform=False):
    """Chunked packed-row 3x3 SAME conv over one image.

    Reads x_ref[0] ([H, W*C]) in _row_chunk-row chunks (+-1 halo rows via
    static slicing), applies ``transform`` ONCE to the chunk's input rows
    (BN affine / dropout fusion for conv2), matmuls against the expanded
    weights and writes out_ref[0] rows. ``post(o, lo, hi)`` post-processes
    output rows (e.g. the dropout-mask multiply of a dgrad). Returns
    accumulated per-lane [sum, sum^2] when ``sums`` is not None.

    ``x2_ref``/``c2``: optional SECOND input (UpBlock concat fold) — its
    im2col slabs sit next to the first input's in the K axis, against
    weights stacked by expand_weights_cat. conv(concat(a, b)) = the one
    matmul over both slabs; the [B,H,W,Ca+Cb] interleave never exists.
    """
    th = _row_chunk(h, w * max(c + c2, f))
    kdy = (pix + 2) * (c + c2)
    use_shift = _IM2COL == "shift"
    mm = x_ref.dtype if x_ref.dtype != jnp.float32 else jnp.float32
    # HPFG_EXT_BF16 + shift + identity transform: no rolls → no 32-bit
    # constraint; bf16→f32→bf16 is numerically a no-op, skip the trip
    ext_dt = (x_ref.dtype if (use_shift and identity_transform and _EXT_BF16)
              else jnp.float32)
    for y0 in range(0, h, th):
        ext = _padded_rows(x_ref, y0, th, h, transform, dtype=ext_dt)
        if use_shift and x2_ref is not None:
            ext2 = _padded_rows(x2_ref, y0, th, h, lambda r, lo, hi: r,
                                dtype=(x2_ref.dtype if _EXT_BF16
                                       else jnp.float32))
            o = _shift_chunk_conv_cat(ext, ext2, wbig_ref, c=c, c2=c2, f=f,
                                      w=w, pix=pix, mm=mm)
        elif use_shift:
            o = _shift_chunk_conv(ext, wbig_ref, c=c, f=f, w=w, pix=pix,
                                  mm=mm)
        elif _IM2COL == "packrw" and x2_ref is None:
            # roll-form operands, shift-form pass structure: 3 full-K lw
            # passes (K = pix*C, one MXU K-tile each) + ONE packed [M, 6C]
            # rw pass against the expand_weights_packrw trailing rows —
            # 4 K-tile passes per chunk instead of 6 (wbig's K = (pix+2)C
            # = 160 pays 2 tiles per dy slab; 96 of its second tile's 128
            # lanes are dead)
            left, right = _rolled_pair(ext, c, w, pix)
            kown = pix * c
            o = None
            rws = []
            for i, dy in enumerate((-1, 0, 1)):
                lw, rw = _im2col_dy_windows(left, right, dy, th, c, w, pix)
                part = jax.lax.dot_general(
                    lw.astype(mm), wbig_ref[i * kown:(i + 1) * kown],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = part if o is None else o + part
                rws.append(rw)
            halo = jnp.concatenate(rws, axis=1).astype(mm)  # [M, 6C]
            o = o + jax.lax.dot_general(
                halo, wbig_ref[3 * kown:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = o.reshape(th, w * f)
        else:
            left, right = _rolled_pair(ext, c, w, pix)  # ONE roll pair/chunk
            if x2_ref is not None:
                ext2 = _padded_rows(x2_ref, y0, th, h, lambda r, lo, hi: r)
                left2, right2 = _rolled_pair(ext2, c2, w, pix)
            o = None
            for i, dy in enumerate((-1, 0, 1)):
                lw, rw = _im2col_dy_windows(left, right, dy, th, c, w, pix)
                parts = [lw, rw]
                if x2_ref is not None:
                    lw2, rw2 = _im2col_dy_windows(left2, right2, dy, th, c2,
                                                  w, pix)
                    parts += [lw2, rw2]
                a = jnp.concatenate(parts, axis=1).astype(mm)
                part = jax.lax.dot_general(
                    a, wbig_ref[i * kdy:(i + 1) * kdy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [TH*W/pix, pix*F]
                o = part if o is None else o + part
            o = o.reshape(th, w * f)
        if bvec_ref is not None:
            o = o + bvec_ref[0]
        if post is not None:
            o = post(o, y0, y0 + th)
        out_ref[0, y0:y0 + th] = o.astype(dtype)
        if sums is not None:
            sums[0] = sums[0] + jnp.sum(o, axis=0)
            sums[1] = sums[1] + jnp.sum(o * o, axis=0)
    return sums


# NOTE: a single-input-channel stem is handled by zero-padding the channel
# axis to 16 in the host wrapper (_forward) and reusing the general packed
# path — pltpu.repeat tiles rather than element-repeats, so a dedicated
# VPU stem kernel would need an expensive lane permutation instead.


def _affine_lrelu(y, a_ref, b_ref):
    """Per-lane affine (folded BN) + LeakyReLU, fp32 in/out."""
    z = y * a_ref[0] + b_ref[0]
    return jnp.where(z >= 0, z, z * LRELU_SLOPE)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _flush_stats(sums_ref, local):
    if local is None:
        return

    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    sums_ref[0] += local[0]
    sums_ref[1] += local[1]


def _new_local(want_stats, lf):
    if not want_stats:
        return None
    return [jnp.zeros(lf, jnp.float32), jnp.zeros(lf, jnp.float32)]


def _conv_stats_kernel(x_ref, wbig_ref, bvec_ref, h_ref, sums_ref, *,
                       c, f, w, h, pix, want_stats, dtype):
    """conv3x3 + bias; optionally accumulate per-lane [sum, sum^2] across the
    batch grid (sums_ref revisited with a constant index map)."""
    local = _new_local(want_stats, w * f)
    local = _conv_rows(x_ref, wbig_ref, bvec_ref, h_ref, local,
                       c=c, f=f, w=w, h=h, pix=pix,
                       transform=lambda r, lo, hi: r, dtype=dtype,
                       identity_transform=True)
    _flush_stats(sums_ref, local)


def _conv_stats_c1_kernel(x_ref, e_ref, wbig_ref, bvec_ref, h_ref, sums_ref,
                          *, c, f, w, h, pix, want_stats, dtype):
    """Stem conv3x3 for a SINGLE-channel input read in packed [H, W] form.

    The C=1 image cannot take the generic packed path directly (pix*C % 128
    alignment needs pix=128), and padding the channel axis to 16 in HBM costs
    a 16x-inflated pad materialization plus a layout copy at the Pallas
    boundary (~0.7 ms/step in the r3 copy audit). Instead the kernel expands
    each chunk's rows onto the 16-channel lane structure IN VMEM with one MXU
    matmul against the 0/1 expansion operand e_ref ([W, W*16], pixel i ->
    lane 16*i), then runs the generic c=16 conv pipeline. HBM reads 3.2 MB
    instead of 51 MB at 224^2."""

    def expand(r, lo, hi):
        return jax.lax.dot_general(
            r.astype(e_ref.dtype), e_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    local = _new_local(want_stats, w * f)
    local = _conv_rows(x_ref, wbig_ref, bvec_ref, h_ref, local,
                       c=c, f=f, w=w, h=h, pix=pix,
                       transform=expand, dtype=dtype)
    _flush_stats(sums_ref, local)


def _conv_stats_cat_kernel(x_ref, xb_ref, wbig_ref, bvec_ref, h_ref,
                           sums_ref, *, c, cb, f, w, h, pix, want_stats,
                           dtype):
    """Dual-input conv3x3 + bias (+ stats): conv over an implicit channel
    concat of the two packed inputs (UpBlock skip-concat fold)."""
    local = _new_local(want_stats, w * f)
    local = _conv_rows(x_ref, wbig_ref, bvec_ref, h_ref, local,
                       c=c, f=f, w=w, h=h, pix=pix,
                       transform=lambda r, lo, hi: r, dtype=dtype,
                       x2_ref=xb_ref, c2=cb, identity_transform=True)
    _flush_stats(sums_ref, local)


def _bn_act_conv_stats_kernel(h_ref, a_ref, b_ref, mask_ref, seed_ref,
                              wbig_ref, bvec_ref, g_ref, sums_ref, *,
                              c, f, w, h, pix, want_stats, use_mask, drop,
                              dtype):
    """BN-affine + LeakyReLU (+ dropout mask) on conv1 output fused into the
    conv2 input load, then conv2 (+ stats). c here is conv2's input channel
    count (= conv1's F). ``drop`` (keep prob) regenerates the mask in-kernel
    from the hash of (seed, image, row, lane) instead of reading HBM."""

    def transform(rows, lo, hi):
        z = rows * a_ref[0] + b_ref[0]
        z = jnp.where(z >= 0, z, z * LRELU_SLOPE)
        if use_mask:
            z = z * mask_ref[0, lo:hi].astype(jnp.float32)
        elif drop is not None:
            z = z * _kernel_mask_rows(seed_ref, lo, hi, w * c, drop)
        return z

    local = _new_local(want_stats, w * f)
    local = _conv_rows(h_ref, wbig_ref, bvec_ref, g_ref, local,
                       c=c, f=f, w=w, h=h, pix=pix, transform=transform,
                       dtype=dtype)
    _flush_stats(sums_ref, local)


def _bn_act_kernel(g_ref, a_ref, b_ref, y_ref):
    y_ref[0] = _affine_lrelu(
        g_ref[0].astype(jnp.float32), a_ref, b_ref).astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _vec_spec(n):
    return pl.BlockSpec((1, n), lambda b: (0, 0), memory_space=pltpu.VMEM)


def _row_spec(h, l):
    return pl.BlockSpec((1, h, l), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


def _sums_spec(lf):
    return pl.BlockSpec((2, lf), lambda b: (0, 0), memory_space=pltpu.VMEM)


def _conv_stats(x2, wbig, bvec, *, c, f, h, w, pix, want_stats,
                dtype, interpret=False):
    b = x2.shape[0]
    lf = w * f
    kernel = functools.partial(_conv_stats_kernel, c=c, f=f, w=w, h=h,
                               pix=pix, want_stats=want_stats, dtype=dtype)
    wspec = pl.BlockSpec(wbig.shape, lambda b: (0,) * wbig.ndim,
                         memory_space=pltpu.VMEM)
    out, sums = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, x2.shape[-1]), wspec, _vec_spec(lf)],
        out_specs=[_row_spec(h, lf), _sums_spec(lf)],
        out_shape=[jax.ShapeDtypeStruct((b, h, lf), dtype),
                   jax.ShapeDtypeStruct((2, lf), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x2, wbig, bvec.reshape(1, lf))
    return out, sums


def _expansion_matrix(w: int, c: int, dtype) -> jax.Array:
    """0/1 operand for the in-kernel C=1 expand: E[i, i*c] = 1 (pixel i of a
    packed [H, W] row lands on lane i*c, channel 0 of c). Built from iotas in
    the surrounding jit — one tiny fused op, no HBM pad materialization."""
    i = jax.lax.broadcasted_iota(jnp.int32, (w, w * c), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (w, w * c), 1)
    return (j == i * c).astype(dtype)


def _conv_stats_c1(x2, e, wbig, bvec, *, c, f, h, w, pix, want_stats,
                   dtype, interpret=False):
    """Packed stem conv: x2 is [B, H, W] (C=1); the kernel lane-expands each
    chunk to the c-channel structure via one MXU matmul against ``e``."""
    b = x2.shape[0]
    lf = w * f
    kernel = functools.partial(_conv_stats_c1_kernel, c=c, f=f, w=w, h=h,
                               pix=pix, want_stats=want_stats, dtype=dtype)
    wspec = pl.BlockSpec(wbig.shape, lambda b: (0,) * wbig.ndim,
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec(e.shape, lambda b: (0, 0), memory_space=pltpu.VMEM)
    out, sums = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, w), espec, wspec, _vec_spec(lf)],
        out_specs=[_row_spec(h, lf), _sums_spec(lf)],
        out_shape=[jax.ShapeDtypeStruct((b, h, lf), dtype),
                   jax.ShapeDtypeStruct((2, lf), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x2, e, wbig, bvec.reshape(1, lf))
    return out, sums


def _conv_stats_cat(xa2, xb2, wbig, bvec, *, ca, cb, f, h, w, pix,
                    want_stats, dtype, interpret=False):
    b = xa2.shape[0]
    lf = w * f
    kernel = functools.partial(_conv_stats_cat_kernel, c=ca, cb=cb, f=f, w=w,
                               h=h, pix=pix, want_stats=want_stats,
                               dtype=dtype)
    wspec = pl.BlockSpec(wbig.shape, lambda b: (0,) * wbig.ndim,
                         memory_space=pltpu.VMEM)
    out, sums = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, xa2.shape[-1]), _row_spec(h, xb2.shape[-1]),
                  wspec, _vec_spec(lf)],
        out_specs=[_row_spec(h, lf), _sums_spec(lf)],
        out_shape=[jax.ShapeDtypeStruct((b, h, lf), dtype),
                   jax.ShapeDtypeStruct((2, lf), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xa2, xb2, wbig, bvec.reshape(1, lf))
    return out, sums


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _seed_arr(seed):
    # The seed enters fused_conv_block as an f32 scalar (exact small int;
    # f32 keeps the custom_vjp tangent plumbing trivial) but must reach SMEM
    # as int32: Mosaic lowers i32->u32 (bitcast) but has NO f32->u32 cast —
    # shipping f32 here crashes at lowering time. Convert in XLA-land.
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape(1)


def _bn_act_conv_stats(h2, avec, bvec_aff, mask2, wbig, bvec, *, c, f, h, w,
                       pix, want_stats, dtype, drop=None, seed=None,
                       interpret=False):
    b = h2.shape[0]
    lc, lf = w * c, w * f
    use_mask = mask2 is not None
    kernel = functools.partial(_bn_act_conv_stats_kernel, c=c, f=f, w=w, h=h,
                               pix=pix, want_stats=want_stats,
                               use_mask=use_mask, drop=drop, dtype=dtype)
    if mask2 is None:  # feed a dummy 1-row array; kernel never reads it
        mask2 = jnp.zeros((b, 1, 128), dtype)
        mask_spec = pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = _row_spec(h, lc)
    out, sums = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, lc), _vec_spec(lc), _vec_spec(lc), mask_spec,
                  _seed_spec(),
                  pl.BlockSpec(wbig.shape, lambda b: (0, 0),
                               memory_space=pltpu.VMEM), _vec_spec(lf)],
        out_specs=[_row_spec(h, lf), _sums_spec(lf)],
        out_shape=[jax.ShapeDtypeStruct((b, h, lf), dtype),
                   jax.ShapeDtypeStruct((2, lf), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(h2, avec.reshape(1, lc), bvec_aff.reshape(1, lc), mask2,
      _seed_arr(seed), wbig, bvec.reshape(1, lf))
    return out, sums


def _bn_act_apply(g2, avec, bvec_aff, *, h, w, f, dtype, interpret=False):
    b = g2.shape[0]
    lf = w * f
    return pl.pallas_call(
        _bn_act_kernel,
        grid=(b,),
        in_specs=[_row_spec(h, lf), _vec_spec(lf), _vec_spec(lf)],
        out_specs=_row_spec(h, lf),
        out_shape=jax.ShapeDtypeStruct((b, h, lf), dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(g2, avec.reshape(1, lf), bvec_aff.reshape(1, lf))


# ---------------------------------------------------------------------------
# statistics glue
# ---------------------------------------------------------------------------

def _finalize_stats(sums, n, f):
    """Per-lane [2, W*F] sums -> per-channel (mean, biased var) [F]."""
    folded = sums.reshape(2, -1, f).sum(axis=1)
    mean = folded[0] / n
    var = folded[1] / n - mean * mean
    return mean, jnp.maximum(var, 0.0)


def _affine(scale, bias, mean, var, w):
    """Fold BN into a per-lane affine: a = scale/sqrt(var+eps),
    b = bias - a*mean, tiled W times to per-lane vectors."""
    a = scale / jnp.sqrt(var + BN_EPS)
    b = bias - a * mean
    return jnp.tile(a, w).astype(jnp.float32), jnp.tile(b, w).astype(jnp.float32)


# ---------------------------------------------------------------------------
# public forward
# ---------------------------------------------------------------------------

class FusedStats(NamedTuple):
    mean1: jax.Array
    var1: jax.Array
    mean2: jax.Array
    var2: jax.Array


def _pack(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w * c)


def _unpack(x2, w, c):
    b, h, _ = x2.shape
    return x2.reshape(b, h, w, c)


def _forward(x, params: ConvBlockParams, mask, run_stats, train: bool,
             interpret: bool = False, drop=None, seed=None):
    """Returns (y, h2, g2, batch_stats) — h2/g2 are the PACKED pre-BN conv
    outputs kept as custom-vjp residuals. In eval mode batch_stats echoes
    ``run_stats``. ``drop``/``seed``: in-kernel hash dropout (keep prob +
    f32 seed scalar) as the zero-HBM alternative to an explicit ``mask``.
    ``x`` may be a PAIR of NHWC arrays (UpBlock skip-concat fold): conv1
    then runs as one dual-im2col matmul and the concat never materializes."""
    if isinstance(x, (tuple, list)):
        xa, xb = x
        b, h, w, ca = xa.shape
        cb = xb.shape[-1]
        f = params.w1.shape[-1]
        dtype = xa.dtype
        n = b * h * w

        pix2 = choose_pix(w, f, f)
        w2 = _expand1(params.w2.astype(dtype), pix2)
        b2vec = jnp.tile(params.b2.astype(jnp.float32), w)

        pix1 = choose_pix_cat(w, ca, cb, f)
        w1 = _expand_cat(params.w1[:, :, :ca].astype(dtype),
                         params.w1[:, :, ca:].astype(dtype), pix1)
        b1vec = jnp.tile(params.b1.astype(jnp.float32), w)
        h2, sums1 = _conv_stats_cat(_pack(xa), _pack(xb), w1, b1vec, ca=ca,
                                    cb=cb, f=f, h=h, w=w, pix=pix1,
                                    want_stats=train, dtype=dtype,
                                    interpret=interpret)
        if train:
            mean1, var1 = _finalize_stats(sums1, n, f)
        else:
            mean1, var1 = run_stats.mean1, run_stats.var1
        a1, aff_b1 = _affine(params.scale1, params.bias1, mean1, var1, w)

        g2, sums2 = _bn_act_conv_stats(h2, a1, aff_b1, mask, w2, b2vec, c=f,
                                       f=f, h=h, w=w, pix=pix2,
                                       want_stats=train, dtype=dtype,
                                       drop=drop, seed=seed,
                                       interpret=interpret)
        if train:
            mean2, var2 = _finalize_stats(sums2, n, f)
        else:
            mean2, var2 = run_stats.mean2, run_stats.var2
        a2, aff_b2 = _affine(params.scale2, params.bias2, mean2, var2, w)
        y2 = _bn_act_apply(g2, a2, aff_b2, h=h, w=w, f=f, dtype=dtype,
                           interpret=interpret)
        stats = FusedStats(mean1, var1, mean2, var2)
        return _unpack(y2, w, f), h2, g2, stats

    b, h, w, c = x.shape
    f = params.w1.shape[-1]
    dtype = x.dtype
    n = b * h * w

    pix2 = choose_pix(w, f, f)
    w2 = _expand1(params.w2.astype(dtype), pix2)
    b2vec = jnp.tile(params.b2.astype(jnp.float32), w)

    if c == 1 and choose_pix(w, 16, f) is not None:
        # single-channel stem, packed: the kernel reads the [B, H, W] image
        # (3.2 MB at 224^2, not the 51 MB HBM-padded form whose pad + layout
        # copy cost ~0.7 ms/step in the r3 copy audit) and lane-expands each
        # chunk to the 16-channel structure in VMEM via one MXU matmul
        # against the 0/1 expansion operand. Weights pad 1->16 so the
        # generic c=16 conv pipeline applies; the zero-K MXU waste is ~20 us.
        ce = 16
        pix1 = choose_pix(w, ce, f)
        w1p = jnp.pad(params.w1, ((0, 0), (0, 0), (0, ce - 1), (0, 0)))
        w1 = _expand1(w1p.astype(dtype), pix1)
        b1vec = jnp.tile(params.b1.astype(jnp.float32), w)
        e = _expansion_matrix(w, ce, dtype)
        h2, sums1 = _conv_stats_c1(x.reshape(b, h, w), e, w1, b1vec, c=ce,
                                   f=f, h=h, w=w, pix=pix1, want_stats=train,
                                   dtype=dtype, interpret=interpret)
        if train:
            mean1, var1 = _finalize_stats(sums1, n, f)
        else:
            mean1, var1 = run_stats.mean1, run_stats.var1
    elif c == 1:
        # fallback for widths the packed stem cannot tile: run conv1 through
        # XLA (C=1 convs have a cheap lowering) and enter Pallas at bn1. The
        # [B,H,W,F] -> [B,H,W*F] pack is a free reshape.
        h4 = _conv3x3(x, params.w1.astype(dtype)).astype(
            jnp.float32) + params.b1
        h2 = _pack(h4.astype(dtype))
        if train:
            mean1 = jnp.mean(h4, axis=(0, 1, 2))
            var1 = jnp.maximum(
                jnp.mean(h4 * h4, axis=(0, 1, 2)) - mean1 * mean1, 0.0)
        else:
            mean1, var1 = run_stats.mean1, run_stats.var1
    else:
        pix1 = choose_pix(w, c, f)
        w1 = _expand1(params.w1.astype(dtype), pix1)
        b1vec = jnp.tile(params.b1.astype(jnp.float32), w)
        x2 = _pack(x)
        h2, sums1 = _conv_stats(x2, w1, b1vec, c=c, f=f, h=h, w=w, pix=pix1,
                                want_stats=train, dtype=dtype,
                                interpret=interpret)
        if train:
            mean1, var1 = _finalize_stats(sums1, n, f)
        else:
            mean1, var1 = run_stats.mean1, run_stats.var1
    a1, aff_b1 = _affine(params.scale1, params.bias1, mean1, var1, w)

    g2, sums2 = _bn_act_conv_stats(h2, a1, aff_b1, mask, w2, b2vec, c=f, f=f,
                                   h=h, w=w, pix=pix2, want_stats=train,
                                   dtype=dtype, drop=drop, seed=seed,
                                   interpret=interpret)
    if train:
        mean2, var2 = _finalize_stats(sums2, n, f)
    else:
        mean2, var2 = run_stats.mean2, run_stats.var2
    a2, aff_b2 = _affine(params.scale2, params.bias2, mean2, var2, w)

    y2 = _bn_act_apply(g2, a2, aff_b2, h=h, w=w, f=f, dtype=dtype,
                       interpret=interpret)
    stats = FusedStats(mean1, var1, mean2, var2)
    return _unpack(y2, w, f), h2, g2, stats


# ---------------------------------------------------------------------------
# Pallas backward
#
# Per conv+BN+LeakyReLU stage, with residual pre-BN output `pre`, per-lane
# folded affine (a = γ·inv, b = β − a·μ) and x̂ = (pre − μ)·inv:
#   dz = dy · lrelu'(a·pre + b)
#   dpre = a · (dz − S0/N − x̂·S1/N)      (train-BN backward)
# where S0 = Σdz, S1 = Σdz·x̂ per channel give (dbias, dscale) directly.
# dgrad w.r.t. the conv input is ANOTHER packed conv (flipped/transposed
# expanded weights); wgrad is im2colᵀ @ grouped-cotangent, accumulated over
# the batch grid and folded by the placement tensor. Conv biases feed BN
# directly, so their gradients are exactly zero (mean shift washes out).
# ---------------------------------------------------------------------------

def _dz_xhat(dy, pre, a, b, m, inv):
    z = pre * a + b
    dz = dy * jnp.where(z >= 0, 1.0, LRELU_SLOPE)
    xhat = (pre - m) * inv
    return dz, xhat


def _bwd_reduce_kernel(dy_ref, pre_ref, a_ref, b_ref, m_ref, inv_ref,
                       sums_ref, *, h):
    """Accumulate per-lane [Σdz, Σdz·x̂] across the batch grid."""
    th = _row_chunk(h, dy_ref.shape[-1])
    s0 = jnp.zeros(dy_ref.shape[-1], jnp.float32)
    s1 = jnp.zeros(dy_ref.shape[-1], jnp.float32)
    for y0 in range(0, h, th):
        dy = dy_ref[0, y0:y0 + th].astype(jnp.float32)
        pre = pre_ref[0, y0:y0 + th].astype(jnp.float32)
        dz, xhat = _dz_xhat(dy, pre, a_ref[0], b_ref[0], m_ref[0], inv_ref[0])
        s0 = s0 + jnp.sum(dz, axis=0)
        s1 = s1 + jnp.sum(dz * xhat, axis=0)
    _flush_stats(sums_ref, [s0, s1])


def _dpre_kernel(dy_ref, pre_ref, a_ref, b_ref, m_ref, inv_ref, u_ref,
                 v_ref, out_ref):
    """Materialize dpre = a·(dz − u − x̂·v) (the train-BN backward)."""
    dy = dy_ref[0].astype(jnp.float32)
    pre = pre_ref[0].astype(jnp.float32)
    dz, xhat = _dz_xhat(dy, pre, a_ref[0], b_ref[0], m_ref[0], inv_ref[0])
    out_ref[0] = (a_ref[0] * (dz - u_ref[0] - xhat * v_ref[0])).astype(
        out_ref.dtype)


def _dgrad_kernel(dpre_ref, wbig_ref, mask_ref, seed_ref, out_ref, *, c, f,
                  w, h, pix, use_mask, drop, dtype):
    """Conv-input gradient: packed conv of dpre with the flip-transposed
    expanded weights; the dropout mask multiplies the OUTPUT rows."""
    post = None
    if use_mask:
        def post(o, lo, hi):
            return o * mask_ref[0, lo:hi].astype(jnp.float32)
    elif drop is not None:
        def post(o, lo, hi):
            return o * _kernel_mask_rows(seed_ref, lo, hi, w * f, drop)
    _conv_rows(dpre_ref, wbig_ref, None, out_ref, None, c=c, f=f, w=w, h=h,
               pix=pix, transform=lambda r, lo, hi: r, dtype=dtype, post=post,
               identity_transform=True)


def _wgrad_kernel(src_ref, dpre_ref, a_ref, b_ref, mask_ref, seed_ref,
                  out_ref, *, c, f, w, h, pix, mode, drop=None):
    """Accumulate dW_big[3*(pix+2)C, pix*F] = im2col(A)ᵀ @ groups(dpre).

    mode selects the A-operand transform: 'identity' (conv1: raw input) or
    'act' (conv2: recompute d = mask·lrelu(aff1(h)) from the h residual).
    """
    th = _row_chunk(h, w * max(c, f))

    def transform(rows, lo, hi):
        if mode == "identity":
            return rows
        z = rows * a_ref[0] + b_ref[0]
        z = jnp.where(z >= 0, z, z * LRELU_SLOPE)
        if mask_ref is not None:
            z = z * mask_ref[0, lo:hi].astype(jnp.float32)
        elif drop is not None:
            z = z * _kernel_mask_rows(seed_ref, lo, hi, w * c, drop)
        return z

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kdy = (pix + 2) * c
    mm = src_ref.dtype if src_ref.dtype != jnp.float32 else jnp.float32
    ext_dt = (src_ref.dtype if (_IM2COL == "shift" and mode == "identity"
                                and _EXT_BF16) else jnp.float32)
    for y0 in range(0, h, th):
        ext = _padded_rows(src_ref, y0, th, h, transform, dtype=ext_dt)
        bgrp = dpre_ref[0, y0:y0 + th].astype(mm).reshape(
            th * w // pix, pix * f)                      # [TH*W/pix, pix*F]
        if _IM2COL == "shift":
            # the SHARED operand constructor (_shift_operands), contraction
            # transposed: own blocks land on rows [i*pix*C, (i+1)*pix*C),
            # the packed halo on the trailing 6C rows (row count equals the
            # roll form's 3*(pix+2)*C, so out_ref is shared; the fold
            # differs — _fold_wgrad branches on the same flag).
            own, halo, g, m = _shift_operands(ext, c, w, pix, mm)
            for i in range(3):
                out_ref[i * pix * c:(i + 1) * pix * c] += jax.lax.dot_general(
                    own[i], bgrp,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [pix*C, pix*F]
            out_ref[3 * pix * c:] += jax.lax.dot_general(
                halo, bgrp,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [6C, pix*F]
            continue
        left, right = _rolled_pair(ext, c, w, pix)
        for i, dy in enumerate((-1, 0, 1)):
            lw, rw = _im2col_dy_windows(left, right, dy, th, c, w, pix)
            a = jnp.concatenate([lw, rw], axis=1).astype(mm)
            out_ref[i * kdy:(i + 1) * kdy] += jax.lax.dot_general(
                a, bgrp, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [(pix+2)C, pix*F]


def _fold_wgrad(dw_big: jax.Array, c: int, f: int, pix: int) -> jax.Array:
    """[3*(pix+2)C, pix*F] -> [3, 3, C, F] (transpose of the active
    expansion: _placement for 'roll', _placement_shift + halo rows for
    'shift' — both forms share the same dw_big row count)."""
    if _IM2COL == "shift":
        t = jnp.asarray(_placement_shift(c, pix), dw_big.dtype)
        own = dw_big[:3 * pix * c].reshape(3, pix * c * pix, f)
        out = jnp.einsum("kx,ykf->yxf", t, own)        # [3, 3c, f]
        halo = dw_big[3 * pix * c:].reshape(3, 2 * c, pix, f)
        out = out.reshape(3, 3, c, f)
        out = out.at[:, 0].add(halo[:, :c, 0])         # left -> dx=0
        out = out.at[:, 2].add(halo[:, c:, pix - 1])   # right -> dx=2
        return out
    kdy = (pix + 2) * c
    t = jnp.asarray(_placement(c, pix), dw_big.dtype)  # [kdy*pix, 3c]
    d = dw_big.reshape(3, kdy, pix, f).reshape(3, kdy * pix, f)
    out = jnp.einsum("kx,ykf->yxf", t, d)         # [3, 3c, f]
    return out.reshape(3, 3, c, f)


def _bwd_reduce(dy2, pre2, a, bvec, m, inv, *, h, w, f, interpret):
    b = dy2.shape[0]
    lf = w * f
    vec = lambda v: v.reshape(1, lf)
    return pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, h=h),
        grid=(b,),
        in_specs=[_row_spec(h, lf)] * 2 + [_vec_spec(lf)] * 4,
        out_specs=_sums_spec(lf),
        out_shape=jax.ShapeDtypeStruct((2, lf), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dy2, pre2, vec(a), vec(bvec), vec(m), vec(inv))


def _dpre(dy2, pre2, vecs, *, h, w, f, dtype, interpret):
    b = dy2.shape[0]
    lf = w * f
    return pl.pallas_call(
        _dpre_kernel,
        grid=(b,),
        in_specs=[_row_spec(h, lf)] * 2 + [_vec_spec(lf)] * 6,
        out_specs=_row_spec(h, lf),
        out_shape=jax.ShapeDtypeStruct((b, h, lf), dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dy2, pre2, *[v.reshape(1, lf) for v in vecs])


def _dgrad(dpre2, wflip, mask2, *, c, f, w, h, pix, dtype, interpret,
           drop=None, seed=None):
    """dpre2: [B, H, W*F] cotangent of the conv output; returns the
    cotangent of the conv input [B, H, W*C]. (c, f) are the FORWARD conv's
    in/out channels, so the flipped weights map F -> C."""
    b = dpre2.shape[0]
    use_mask = mask2 is not None
    if mask2 is None:
        mask2 = jnp.zeros((b, 1, 128), dtype)
        mask_spec = pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = _row_spec(h, w * c)
    kernel = functools.partial(_dgrad_kernel, c=f, f=c, w=w, h=h, pix=pix,
                               use_mask=use_mask, drop=drop, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, w * f),
                  pl.BlockSpec(wflip.shape, lambda b: (0, 0),
                               memory_space=pltpu.VMEM), mask_spec,
                  _seed_spec()],
        out_specs=_row_spec(h, w * c),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dpre2, wflip, mask2, _seed_arr(seed))


def _wgrad(src2, dpre2, mode, aff, mask2, *, c, f, w, h, pix, interpret,
           drop=None, seed=None):
    b = src2.shape[0]
    lc = w * c
    kdy = (pix + 2) * c
    if aff is None:
        aff = (jnp.zeros(lc, jnp.float32), jnp.zeros(lc, jnp.float32))
    if mask2 is None:
        mask_ref_spec = pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
        mask2 = jnp.zeros((b, 1, 128), src2.dtype)
        has_mask = False
    else:
        mask_ref_spec = _row_spec(h, lc)
        has_mask = True

    def kernel(src_ref, dpre_ref, a_ref, b_ref, mask_ref, seed_ref, out_ref):
        _wgrad_kernel(src_ref, dpre_ref, a_ref, b_ref,
                      mask_ref if has_mask else None, seed_ref, out_ref,
                      c=c, f=f, w=w, h=h, pix=pix, mode=mode, drop=drop)

    dw_big = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, lc), _row_spec(h, w * f),
                  _vec_spec(lc), _vec_spec(lc), mask_ref_spec, _seed_spec()],
        out_specs=pl.BlockSpec((3 * kdy, pix * f), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * kdy, pix * f), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(src2, dpre2, aff[0].reshape(1, lc), aff[1].reshape(1, lc), mask2,
      _seed_arr(seed))
    return _fold_wgrad(dw_big, c, f, pix)


def _dgrad_pair_kernel(dpre_ref, wflip_ref, outa_ref, outb_ref, *, c, fa, fb,
                       w, h, pix, dtype):
    """Dual-output conv-input gradient for the pair (UpBlock) block.

    ONE im2col of the packed stage-1 cotangent dh2 [H, W*C] is contracted
    against BOTH halves' flip-transposed expanded weights, whose columns
    sit side by side ([pix*Fa | pix*Fb] per dy slab; host wrapper concat).
    This is the backward mirror of the forward concat fold: the im2col VPU
    assembly — the dominant non-MXU cost at these stages (BENCH_NOTES
    roofline note 3) — runs once instead of once per half, and each
    cotangent lands row-major packed for its own consumer (the encoder
    block's bwd / the resize bwd). The output split slices are lane-tile
    aligned: pix*Fa % 128 == 0 by choose_pix."""
    mm = dpre_ref.dtype if dpre_ref.dtype != jnp.float32 else jnp.float32
    use_shift = _IM2COL == "shift"
    ext_dt = (dpre_ref.dtype if (use_shift and _EXT_BF16) else jnp.float32)
    th = _row_chunk(h, w * max(c, fa + fb))
    kdy = (pix + 2) * c
    ksplit = pix * fa
    for y0 in range(0, h, th):
        ext = _padded_rows(dpre_ref, y0, th, h, lambda r, lo, hi: r,
                           dtype=ext_dt)
        if use_shift:
            own, halo, _, _ = _shift_operands(ext, c, w, pix, mm)
            o = jax.lax.dot_general(
                halo, wflip_ref[3 * pix * c:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for i in range(3):
                o = o + jax.lax.dot_general(
                    own[i], wflip_ref[i * pix * c:(i + 1) * pix * c],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        elif _IM2COL == "packrw":
            left, right = _rolled_pair(ext, c, w, pix)
            kown = pix * c
            o = None
            rws = []
            for i, dy in enumerate((-1, 0, 1)):
                lw, rw = _im2col_dy_windows(left, right, dy, th, c, w, pix)
                part = jax.lax.dot_general(
                    lw.astype(mm), wflip_ref[i * kown:(i + 1) * kown],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = part if o is None else o + part
                rws.append(rw)
            o = o + jax.lax.dot_general(
                jnp.concatenate(rws, axis=1).astype(mm),
                wflip_ref[3 * kown:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            left, right = _rolled_pair(ext, c, w, pix)
            o = None
            for i, dy in enumerate((-1, 0, 1)):
                lw, rw = _im2col_dy_windows(left, right, dy, th, c, w, pix)
                a = jnp.concatenate([lw, rw], axis=1).astype(mm)
                part = jax.lax.dot_general(
                    a, wflip_ref[i * kdy:(i + 1) * kdy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = part if o is None else o + part
        outa_ref[0, y0:y0 + th] = (
            o[:, :ksplit].reshape(th, w * fa).astype(dtype))
        outb_ref[0, y0:y0 + th] = (
            o[:, ksplit:].reshape(th, w * fb).astype(dtype))


def _dgrad_pair(dpre2, wflip_cat, *, c, fa, fb, w, h, pix, dtype, interpret):
    """Shared-im2col dual dgrad: dpre2 [B, H, W*C] (stage-1 cotangent, C =
    the forward conv's F), wflip_cat [3*(pix+2)*C, pix*(Fa+Fb)]. Returns
    (dxa2 [B,H,W*Fa], dxb2 [B,H,W*Fb]) — the two pair-input cotangents."""
    b = dpre2.shape[0]
    kernel = functools.partial(_dgrad_pair_kernel, c=c, fa=fa, fb=fb, w=w,
                               h=h, pix=pix, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, w * c),
                  pl.BlockSpec(wflip_cat.shape, lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(_row_spec(h, w * fa), _row_spec(h, w * fb)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w * fa), dtype),
                   jax.ShapeDtypeStruct((b, h, w * fb), dtype)),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dpre2, wflip_cat)


def _wgrad_pair_kernel(srca_ref, srcb_ref, dpre_ref, outa_ref, outb_ref, *,
                       ca, cb, f, w, h, pix):
    """Dual weight gradient for the pair block (identity mode — conv1 of
    the UpBlock): one kernel accumulates both halves' dW_big, sharing the
    dpre group-reshape per chunk and reading dpre once instead of twice."""
    th = _row_chunk(h, w * max(ca + cb, f))
    mm = srca_ref.dtype if srca_ref.dtype != jnp.float32 else jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _():
        outa_ref[:] = jnp.zeros_like(outa_ref)
        outb_ref[:] = jnp.zeros_like(outb_ref)

    use_shift = _IM2COL == "shift"
    for y0 in range(0, h, th):
        m = th * w // pix
        bgrp = dpre_ref[0, y0:y0 + th].astype(mm).reshape(m, pix * f)  # ONCE
        for src_ref, c, out_ref in ((srca_ref, ca, outa_ref),
                                    (srcb_ref, cb, outb_ref)):
            ext_dt = (src_ref.dtype if (use_shift and _EXT_BF16)
                      else jnp.float32)
            ext = _padded_rows(src_ref, y0, th, h, lambda r, lo, hi: r,
                               dtype=ext_dt)
            if use_shift:
                own, halo, _, _ = _shift_operands(ext, c, w, pix, mm)
                for i in range(3):
                    out_ref[i * pix * c:(i + 1) * pix * c] += (
                        jax.lax.dot_general(
                            own[i], bgrp,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
                out_ref[3 * pix * c:] += jax.lax.dot_general(
                    halo, bgrp,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                left, right = _rolled_pair(ext, c, w, pix)
                kdy = (pix + 2) * c
                for i, dy in enumerate((-1, 0, 1)):
                    lw, rw = _im2col_dy_windows(left, right, dy, th, c, w,
                                                pix)
                    a = jnp.concatenate([lw, rw], axis=1).astype(mm)
                    out_ref[i * kdy:(i + 1) * kdy] += jax.lax.dot_general(
                        a, bgrp,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)


def _wgrad_pair(srca2, srcb2, dpre2, *, ca, cb, f, w, h, pix, interpret):
    """Dual identity-mode wgrad. Returns folded ([3,3,Ca,F], [3,3,Cb,F])."""
    b = srca2.shape[0]
    kernel = functools.partial(_wgrad_pair_kernel, ca=ca, cb=cb, f=f, w=w,
                               h=h, pix=pix)
    out_spec = lambda c: pl.BlockSpec(
        (3 * (pix + 2) * c, pix * f), lambda b: (0, 0),
        memory_space=pltpu.VMEM)
    dwa, dwb = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, w * ca), _row_spec(h, w * cb),
                  _row_spec(h, w * f)],
        out_specs=(out_spec(ca), out_spec(cb)),
        out_shape=(jax.ShapeDtypeStruct((3 * (pix + 2) * ca, pix * f),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((3 * (pix + 2) * cb, pix * f),
                                        jnp.float32)),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(srca2, srcb2, dpre2)
    return _fold_wgrad(dwa, ca, f, pix), _fold_wgrad(dwb, cb, f, pix)


def _dgrad_reduce_kernel(dpre_ref, wbig_ref, mask_ref, seed_ref, pre_ref,
                         a_ref, b_ref, m_ref, inv_ref, out_ref, sums_ref, *,
                         c, f, w, h, pix, use_mask, drop, dtype):
    """_dgrad_kernel + the NEXT stage's _bwd_reduce folded into the output
    loop: the reduce's operand IS this dgrad's own output (dd2), already in
    VMEM per chunk — the separate reduce kernel's 2x full-tensor HBM read
    disappears and its VPU work overlaps this kernel's MXU passes. The
    output rows are cast to the storage dtype before the reduce so the sums
    are bit-identical to the unfused path's (which reads the stored dd2)."""
    lf = w * f
    local = [jnp.zeros(lf, jnp.float32), jnp.zeros(lf, jnp.float32)]

    def post(o, lo, hi):
        if use_mask:
            o = o * mask_ref[0, lo:hi].astype(jnp.float32)
        elif drop is not None:
            o = o * _kernel_mask_rows(seed_ref, lo, hi, lf, drop)
        oc = o.astype(dtype).astype(jnp.float32)
        pre = pre_ref[0, lo:hi].astype(jnp.float32)
        dz, xhat = _dz_xhat(oc, pre, a_ref[0], b_ref[0], m_ref[0],
                            inv_ref[0])
        local[0] = local[0] + jnp.sum(dz, axis=0)
        local[1] = local[1] + jnp.sum(dz * xhat, axis=0)
        return o

    _conv_rows(dpre_ref, wbig_ref, None, out_ref, None, c=c, f=f, w=w, h=h,
               pix=pix, transform=lambda r, lo, hi: r, dtype=dtype,
               post=post, identity_transform=True)
    _flush_stats(sums_ref, local)


def _dgrad_reduce(dpre2, wflip, mask2, pre2, vecs, *, c, f, w, h, pix, dtype,
                  interpret, drop=None, seed=None):
    """Fused stage-2 dgrad + stage-1 bwd_reduce. ``pre2``/``vecs`` are the
    NEXT stage's pre-activation residual and (a, b, mean, inv) lane vecs.
    Returns (dd2, sums[2, W*C_out]) with dd2 identical to _dgrad's output
    and sums identical to _bwd_reduce(dd2, pre2, ...)."""
    b = dpre2.shape[0]
    use_mask = mask2 is not None
    if mask2 is None:
        mask2 = jnp.zeros((b, 1, 128), dtype)
        mask_spec = pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = _row_spec(h, w * c)
    lf = w * c  # kernel's OUTPUT lane width (c/f swapped as in _dgrad)
    kernel = functools.partial(_dgrad_reduce_kernel, c=f, f=c, w=w, h=h,
                               pix=pix, use_mask=use_mask, drop=drop,
                               dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_row_spec(h, w * f),
                  pl.BlockSpec(wflip.shape, lambda b: (0, 0),
                               memory_space=pltpu.VMEM), mask_spec,
                  _seed_spec(), _row_spec(h, lf)] + [_vec_spec(lf)] * 4,
        out_specs=(_row_spec(h, lf), _sums_spec(lf)),
        out_shape=(jax.ShapeDtypeStruct((b, h, lf), dtype),
                   jax.ShapeDtypeStruct((2, lf), jnp.float32)),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dpre2, wflip, mask2, _seed_arr(seed), pre2,
      *[v.reshape(1, lf) for v in vecs])


def _conv3x3(x, w):
    """Plain conv used by the jnp reference implementation."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


# full custom-vjp assembly ---------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_conv_block(x, params: ConvBlockParams, mask, seed, train: bool,
                     interpret: bool, drop: float | None,
                     run_stats: FusedStats | None):
    """Fused block forward. Dropout comes in ONE of two forms: ``mask`` — a
    pre-scaled mask in PACKED form [B, H, W*F] — or ``drop`` (static keep
    prob) + ``seed`` (f32 scalar holding a small int), which regenerates the
    mask in-kernel from an integer hash with zero HBM traffic.
    ``run_stats`` feeds eval-mode normalization (None in train mode).
    Returns (y, batch FusedStats). Positional args only (custom_vjp)."""
    y, _, _, stats = _forward(x, params, mask, run_stats, train, interpret,
                              drop=drop, seed=seed)
    return y, stats


def _fwd(x, params, mask, seed, train, interpret, drop, run_stats):
    y, h2, g2, stats = _forward(x, params, mask, run_stats, train, interpret,
                                drop=drop, seed=seed)
    res = (x, params, mask, seed, h2, g2, stats)
    return (y, stats), res


def _fold_sums(s, w, f):
    return s.reshape(2, w, f).sum(axis=1)


def _bwd(train, interpret, drop, res, cts):
    dy, _ = cts  # no gradients flow through the returned statistics
    x, params, mask2, seed, h2, g2, stats = res
    if not train:
        raise NotImplementedError("fused_conv_block backward: train only")

    is_pair = isinstance(x, (tuple, list))
    b, hh, w, cin = x[0].shape if is_pair else x.shape
    f = params.w1.shape[-1]
    n = b * hh * w
    dtype = h2.dtype
    dy2 = _pack(dy).astype(dtype)
    kw = dict(h=hh, w=w, f=f, interpret=interpret)

    # ---- stage 2: BN2+LeakyReLU backward, conv2 dgrad/wgrad -------------
    a2l, b2l = _affine(params.scale2, params.bias2, stats.mean2, stats.var2, w)
    tile = lambda v: jnp.tile(v.astype(jnp.float32), w)
    m2l, inv2l = tile(stats.mean2), tile(1.0 / jnp.sqrt(stats.var2 + BN_EPS))
    s2 = _fold_sums(_bwd_reduce(dy2, g2, a2l, b2l, m2l, inv2l, **kw), w, f)
    dbias2, dscale2 = s2[0], s2[1]
    dg2 = _dpre(dy2, g2, (a2l, b2l, m2l, inv2l, tile(s2[0] / n),
                          tile(s2[1] / n)), dtype=dtype, **kw)

    a1l, b1l = _affine(params.scale1, params.bias1, stats.mean1, stats.var1, w)
    m1l, inv1l = tile(stats.mean1), tile(1.0 / jnp.sqrt(stats.var1 + BN_EPS))
    pix2 = choose_pix(w, f, f)
    wflip2 = _expand1(
        jnp.flip(params.w2, axis=(0, 1)).transpose(0, 1, 3, 2).astype(dtype),
        pix2)
    if _FOLD_REDUCE:
        # stage-1's bwd_reduce folds into this dgrad (its operand is the
        # dgrad's own output rows, still in VMEM per chunk)
        dd2, s1raw = _dgrad_reduce(dg2, wflip2, mask2, h2,
                                   (a1l, b1l, m1l, inv1l), c=f, f=f, w=w,
                                   h=hh, pix=pix2, dtype=dtype, drop=drop,
                                   seed=seed, interpret=interpret)
        s1 = _fold_sums(s1raw, w, f)
    else:
        dd2 = _dgrad(dg2, wflip2, mask2, c=f, f=f, w=w, h=hh, pix=pix2,
                     dtype=dtype, drop=drop, seed=seed, interpret=interpret)
        s1 = None
    dw2 = _wgrad(h2, dg2, "act", (a1l, b1l), mask2, c=f, f=f, w=w, h=hh,
                 pix=pix2, drop=drop, seed=seed, interpret=interpret)

    # ---- stage 1: BN1+LeakyReLU backward, conv1 dgrad/wgrad -------------
    if s1 is None:
        s1 = _fold_sums(_bwd_reduce(dd2, h2, a1l, b1l, m1l, inv1l, **kw),
                        w, f)
    dbias1, dscale1 = s1[0], s1[1]
    dh2 = _dpre(dd2, h2, (a1l, b1l, m1l, inv1l, tile(s1[0] / n),
                          tile(s1[1] / n)), dtype=dtype, **kw)

    if is_pair:
        # dual-input conv1 (UpBlock concat fold): d_skip/d_up are separate
        # packed dgrads with each half's flip-transposed weights; wgrad per
        # half, re-joined on the C axis. Each cotangent lands row-major for
        # its own consumer (the encoder block's bwd / the resize bwd) —
        # no [B,H,W,Ca+Cb] split, no layout copies.
        xa, xb = x
        ca, cbch = xa.shape[-1], xb.shape[-1]
        pixa = choose_pix(w, ca, f)
        if _DUAL_BWD and pixa == choose_pix(w, cbch, f):
            # shared-im2col dual dgrad + shared-bgrp dual wgrad (the bwd
            # mirror of the forward concat fold, VERDICT r3 #1)
            wfa, wfb = (
                _expand1(jnp.flip(wi, axis=(0, 1)).transpose(0, 1, 3, 2)
                         .astype(dtype), pixa)
                for wi in (params.w1[:, :, :ca], params.w1[:, :, ca:]))
            dxa2, dxb2 = _dgrad_pair(
                dh2, jnp.concatenate([wfa, wfb], axis=1), c=f, fa=ca,
                fb=cbch, w=w, h=hh, pix=pixa, dtype=dtype,
                interpret=interpret)
            dx = (_unpack(dxa2, w, ca).astype(xa.dtype),
                  _unpack(dxb2, w, cbch).astype(xb.dtype))
            dwa, dwb = _wgrad_pair(
                _pack(xa).astype(dtype), _pack(xb).astype(dtype), dh2,
                ca=ca, cb=cbch, f=f, w=w, h=hh, pix=pixa,
                interpret=interpret)
            dw1 = jnp.concatenate([dwa, dwb], axis=2)
        else:
            dxs, dws = [], []
            for xi, wi in ((xa, params.w1[:, :, :ca]),
                           (xb, params.w1[:, :, ca:])):
                ci = xi.shape[-1]
                pixi = choose_pix(w, ci, f)
                wflip = _expand1(
                    jnp.flip(wi, axis=(0, 1)).transpose(0, 1, 3, 2)
                    .astype(dtype), pixi)
                dxi2 = _dgrad(dh2, wflip, None, c=ci, f=f, w=w, h=hh,
                              pix=pixi, dtype=dtype, interpret=interpret)
                dxs.append(_unpack(dxi2, w, ci).astype(xi.dtype))
                dws.append(_wgrad(_pack(xi).astype(dtype), dh2, "identity",
                                  None, None, c=ci, f=f, w=w, h=hh,
                                  pix=pixi, interpret=interpret))
            dx = tuple(dxs)
            dw1 = jnp.concatenate(dws, axis=2)
    elif cin == 1:
        # stem: whether conv1 ran packed (in-kernel lane expand) or through
        # XLA, its transpose is the same C=1 conv pair.
        # dx (transpose conv F->1) is consumed only by input-gradient users
        # (VAT/SS-Net); in plain training the caller's partial-eval drops it
        # and XLA DCEs the conv. Keep it f32 (mixed bf16/f32 convs TypeError).
        dh = dh2.reshape(b, hh, w, f)  # free: [B*H, W*F] row-major split
        wflip = jnp.flip(params.w1, axis=(0, 1)).transpose(0, 1, 3, 2)
        dx = _conv3x3(dh.astype(jnp.float32),
                      wflip.astype(jnp.float32)).astype(x.dtype)
        # wgrad [3,3,1,F] as ONE tall-skinny MXU contraction straight off
        # the packed bf16 cotangent — the previous jax.vjp form unpacked and
        # cast dh2 to f32 in HBM first (~0.5 ms/step of data formatting at
        # 224^2 in the r12 step audit). f32 accumulation via
        # preferred_element_type; the 9-tap im2col of the 3.2 MB image is
        # cheap (pad + static slices).
        xi = x.reshape(b, hh, w).astype(dtype)
        xp = jnp.pad(xi, ((0, 0), (1, 1), (1, 1)))
        cols = jnp.stack([xp[:, ky:ky + hh, kx:kx + w]
                          for ky in range(3) for kx in range(3)], axis=-1)
        dw1 = jnp.einsum("bhwk,bhwf->kf", cols, dh,
                         preferred_element_type=jnp.float32).reshape(3, 3, 1, f)
    else:
        pix1 = choose_pix(w, cin, f)
        wflip1 = _expand1(
            jnp.flip(params.w1, axis=(0, 1)).transpose(0, 1, 3, 2).astype(
                dtype), pix1)
        dx2 = _dgrad(dh2, wflip1, None, c=cin, f=f, w=w, h=hh, pix=pix1,
                     dtype=dtype, interpret=interpret)
        dx = _unpack(dx2, w, cin)
        dw1 = _wgrad(_pack(x).astype(dtype), dh2, "identity", None, None,
                     c=cin, f=f, w=w, h=hh, pix=pix1, interpret=interpret)

    # conv biases feed BN directly: a constant shift moves the batch mean
    # by the same amount, so d(bias) is exactly zero in train mode
    zero_b = jnp.zeros_like(params.b1)
    dparams = ConvBlockParams(
        w1=dw1.astype(params.w1.dtype), b1=zero_b.astype(params.b1.dtype),
        scale1=dscale1.astype(params.scale1.dtype),
        bias1=dbias1.astype(params.bias1.dtype),
        w2=dw2.astype(params.w2.dtype),
        b2=jnp.zeros_like(params.b2),
        scale2=dscale2.astype(params.scale2.dtype),
        bias2=dbias2.astype(params.bias2.dtype))
    dmask = None if mask2 is None else jnp.zeros_like(mask2)
    dseed = None if seed is None else jnp.zeros_like(seed)
    if not is_pair:
        dx = dx.astype(x.dtype)
    return dx, dparams, dmask, dseed, None


fused_conv_block.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# plain packed conv (no BN/act) — stem, out_conv, 1x1-as-3x3 dispatch
#
# Round-3 profile finding (BENCH_NOTES.md): XLA's OWN convolutions at the
# large-spatial stages (stem 1->16, out_conv 16->4, UpBlock 1x1) choose
# batch-in-lanes layouts ({0,3,2,1}) because C<128 wastes the lane axis —
# and every Pallas custom-call boundary then pays a 0.3-0.5 ms transpose
# copy of a [32,224,3584]-class tensor (8.8 ms/step of copies total).
# Running these few remaining convs through the packed kernels removes the
# batch-minor layout anchors so row-major propagates end-to-end.
# ---------------------------------------------------------------------------


def plain_conv_supported(h: int, w: int, c: int, f: int) -> bool:
    """Dispatchable via channel padding: C pads up to 16 (stem), F pads up
    to 16 (small heads); beyond that the block kernel rules apply."""
    c_eff = c if c % 16 == 0 else 16 * ((c + 15) // 16)
    f_eff = f if f % 16 == 0 else 16 * ((f + 15) // 16)
    return supported(h, w, c_eff, f_eff)


def _plain_fwd_packed(x, w, bvec, interpret):
    b, hh, wimg, c = x.shape
    f = w.shape[-1]
    dtype = x.dtype
    pix = choose_pix(wimg, c, f)
    wbig = _expand1(w.astype(dtype), pix)
    h2, _ = _conv_stats(_pack(x), wbig, jnp.tile(bvec.astype(jnp.float32),
                                                 wimg),
                        c=c, f=f, h=hh, w=wimg, pix=pix, want_stats=False,
                        dtype=dtype, interpret=interpret)
    return _unpack(h2, wimg, f)


def fused_conv3x3_plain(x, w, b, interpret: bool = False):
    """SAME-padded 3x3 conv + bias on NHWC via the packed-lane kernels
    (jnp/XLA semantics identical to ``_conv3x3(x, w) + b``). Pads C/F to
    multiples of 16 itself (grads flow through jnp.pad/slice transposes
    OUTSIDE the custom_vjp); shapes the packed kernels cannot tile even
    after padding fall back to the XLA conv — a forced HPFG_FUSED_CONV=1
    on unsupported tiny shapes must degrade, not crash."""
    f = w.shape[-1]
    xp = pad_channels(x, 3)
    wp = pad_channels(pad_channels(w, 2), 3)
    if not supported(x.shape[1], x.shape[2], xp.shape[-1], wp.shape[-1]):
        return _conv3x3(x, w) + b  # incl. the c/f<=128 qualification caps
    y = _plain_aligned(xp, wp, pad_channels(b, 0), interpret)
    return y if y.shape[-1] == f else y[..., :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _plain_aligned(x, w, b, interpret: bool = False):
    """The packed-kernel core of fused_conv3x3_plain: C/F already aligned."""
    return _plain_fwd_packed(x, w, b, interpret)


def _plain_fwd(x, w, b, interpret):
    return _plain_fwd_packed(x, w, b, interpret), (x, w)


def _plain_bwd(interpret, res, dy):
    x, w = res
    b, hh, wimg, cin = x.shape
    f = w.shape[-1]
    dtype = x.dtype
    dy2 = _pack(dy).astype(dtype)

    pix1 = choose_pix(wimg, cin, f)
    wflip = _expand1(
        jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2).astype(dtype), pix1)
    dx2 = _dgrad(dy2, wflip, None, c=cin, f=f, w=wimg, h=hh, pix=pix1,
                 dtype=dtype, interpret=interpret)
    dx = _unpack(dx2, wimg, cin)
    dw = _wgrad(_pack(x).astype(dtype), dy2, "identity", None, None,
                c=cin, f=f, w=wimg, h=hh, pix=pix1, interpret=interpret)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2))
    return dx.astype(x.dtype), dw.astype(w.dtype), db


_plain_aligned.defvjp(_plain_fwd, _plain_bwd)


def pad_channels(arr, axis: int, mult: int = 16):
    """Zero-pad ``axis`` up to a multiple of ``mult`` (jnp.pad: the VJP is
    the matching slice, so padded-dispatch gradients stay exact)."""
    size = arr.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


# ---------------------------------------------------------------------------
# pure-jnp reference (tests + documentation of exact semantics)
# ---------------------------------------------------------------------------

def conv_block_reference(x, params: ConvBlockParams, mask, train: bool,
                         run_stats: FusedStats | None = None):
    """Bitwise-simple reference of the fused block (flax ConvBlock semantics:
    fp32 BN with biased batch variance, LeakyReLU 0.01, pre-scaled dropout
    mask between the convs)."""
    h = _conv3x3(x, params.w1.astype(x.dtype)) + params.b1

    def bn(pre, scale, bias, mean, var):
        inv = 1.0 / jnp.sqrt(var + BN_EPS)
        z = (pre - mean) * inv * scale + bias
        return jnp.where(z >= 0, z, z * LRELU_SLOPE)

    if train:
        m1 = jnp.mean(h, axis=(0, 1, 2))
        v1 = jnp.mean(h * h, axis=(0, 1, 2)) - m1 * m1
    else:
        m1, v1 = run_stats.mean1, run_stats.var1
    a = bn(h, params.scale1, params.bias1, m1, v1)
    if mask is not None:
        a = a * mask.astype(jnp.float32)
    g = _conv3x3(a.astype(x.dtype), params.w2.astype(x.dtype)) + params.b2
    if train:
        m2 = jnp.mean(g, axis=(0, 1, 2))
        v2 = jnp.mean(g * g, axis=(0, 1, 2)) - m2 * m2
    else:
        m2, v2 = run_stats.mean2, run_stats.var2
    y = bn(g, params.scale2, params.bias2, m2, v2)
    return y.astype(x.dtype), FusedStats(m1, v1, m2, v2)
