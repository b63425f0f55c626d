"""Fused window multi-head attention (Pallas TPU kernel).

The SwinUNet hot path (reference WindowAttention, model/swinunet.py:136-250)
is thousands of tiny (ws², ws²) attention problems per step. The XLA lowering
materializes the [Bn, heads, ws², ws²] score tensor in HBM between the two
matmuls; this kernel keeps Q/K/V tiles, the relative-position bias, the
shifted-window mask and the softmax entirely in VMEM, writing only the final
[block, L, dim] output — one HBM round-trip instead of four.

Grid: one program per block of windows. Window counts per image are tiny
(e.g. 32x32 windows of 7² tokens at 224px), so windows are flattened into the
batch dimension and tiled by WINDOW_BLOCK.

Used by models/swinunet.py when use_pallas=True on TPU; the jnp path is the
reference implementation for CPU tests (interpret=True covers the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW_BLOCK = 16  # windows per program


def _attn_drop_mask(seed_ref, pid, h: int, blk: int, l: int, keep: float):
    """Pre-scaled (1/keep or 0) attention-dropout mask [BLK, L, L] for head
    ``h`` of grid program ``pid``, regenerated from the same integer hash
    the fused ConvBlock uses (ops/pallas/conv_block.py) — zero HBM traffic,
    and the backward kernel rebuilds the identical mask from (seed, ids)."""
    from hpfg_tpu.ops.pallas.conv_block import _hash_mask

    win = jax.lax.broadcasted_iota(jnp.int32, (blk, l, l), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (blk, l, l), 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (blk, l, l), 2)
    rows = win * l + i  # flatten (window, query) into the hash row id
    return _hash_mask(seed_ref[0].astype(jnp.uint32), pid * 1024 + h,
                      rows, j, l, keep)


def attn_drop_mask_reference(seed, bn: int, heads: int, l: int, keep: float,
                             blk: int | None = None):
    """jnp oracle of the in-kernel attention-dropout mask: [Bn, H, L, L]
    pre-scaled masks exactly as the kernel regenerates them (tests)."""
    from hpfg_tpu.ops.pallas.conv_block import _hash_mask

    blk = blk or min(WINDOW_BLOCK, bn)
    seed_u32 = jnp.asarray(seed, jnp.uint32)
    out = []
    for w in range(bn):
        pid, win = w // blk, w % blk
        per_head = []
        for h in range(heads):
            i = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
            per_head.append(_hash_mask(seed_u32, pid * 1024 + h,
                                       win * l + i, j, l, keep))
        out.append(jnp.stack(per_head))
    return jnp.stack(out)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref, o_ref, *,
                 scale: float, heads: int, head_dim: int,
                 drop: float | None):
    """One block of windows.

    q/k/v: [BLK, L, H*D] (interleaved head-major packing: h*D + d)
    bias:  [H, L, L] relative-position bias
    mask:  [BLK, L, L] additive shifted-window mask (zeros when unshifted)
    seed:  [1] int32 SMEM scalar (in-kernel attention dropout; unused when
           drop is None)
    o:     [BLK, L, H*D]
    """
    blk, l, hd = q_ref.shape
    for h in range(heads):  # static unroll over heads
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, :, sl].astype(jnp.float32) * scale  # [BLK, L, D]
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        # scores: [BLK, L, L]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None, :, :]
        s = s + mask_ref[:, :, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if drop is not None:  # dropout on the attention probabilities
            p = p * _attn_drop_mask(seed_ref, pl.program_id(0), h, blk, l,
                                    drop)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _pad_windows(arrs, l, blk):
    """Pad the window axis of each [Bn, ...] array up to a multiple of blk
    (zeros; padded windows carry zero q/k/v/mask/do so they contribute
    nothing to outputs or accumulated bias gradients)."""
    bn = arrs[0].shape[0]
    pad = (-bn) % blk
    if not pad:
        return arrs, bn
    out = [jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
           for a in arrs]
    return out, bn


def _qkv_spec(blk, l, c):
    return pl.BlockSpec((blk, l, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


# seed marshalling (int32 in SMEM — Mosaic has no f32->u32 cast) is shared
# with the conv kernels: ONE copy of the round-2 lesson
from hpfg_tpu.ops.pallas.conv_block import _seed_arr, _seed_spec  # noqa: E402


def _forward_call(q, k, v, bias, mask, seed, heads, interpret, drop):
    bn, l, c = q.shape
    head_dim = c // heads
    scale = head_dim ** -0.5
    blk = min(WINDOW_BLOCK, bn)
    (q, k, v, mask), bn = _pad_windows([q, k, v, mask], l, blk)
    n_blocks = q.shape[0] // blk

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, heads=heads,
                          head_dim=head_dim, drop=drop),
        grid=(n_blocks,),
        in_specs=[
            _qkv_spec(blk, l, c), _qkv_spec(blk, l, c), _qkv_spec(blk, l, c),
            pl.BlockSpec((heads, l, l), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, l, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _seed_spec(),
        ],
        out_specs=_qkv_spec(blk, l, c),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32),
      _seed_arr(seed))
    return out[:bn]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref,
                     do_ref, dq_ref, dk_ref, dv_ref, dbias_ref, *,
                     scale: float, heads: int, head_dim: int,
                     drop: float | None):
    """Backward for one block of windows: recompute the softmax (residuals
    at ws²=49 tokens are cheaper to rebuild than to round-trip through HBM)
    then the standard attention VJP; the dropout mask is regenerated from
    the same hash as the forward. dbias accumulates across the sequential
    TPU grid into a single [H, L, L] block."""
    blk, l, _ = q_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    for h in range(heads):  # static unroll over heads
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[:, :, sl].astype(jnp.float32) * scale  # [BLK, L, D]
        k = k_ref[:, :, sl].astype(jnp.float32)
        v = v_ref[:, :, sl].astype(jnp.float32)
        do = do_ref[:, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None, :, :] + mask_ref[:, :, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [BLK, L, L]
        if drop is not None:
            # y = (m⊙p)@v: dv sees the masked probabilities, and
            # dL/dp = m ⊙ (do@vᵀ) before the softmax backward
            m = _attn_drop_mask(seed_ref, pl.program_id(0), h, blk, l, drop)
            pm = p * m
        else:
            pm = p
        # dv[b,j,d] = sum_i pm[b,i,j] do[b,i,d]
        dv = jax.lax.dot_general(
            pm, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # dp[b,i,j] = sum_d do[b,i,d] v[b,j,d]
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if drop is not None:
            dp = dp * m
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # dq[b,i,d] = scale * sum_j ds[b,i,j] k[b,j,d]
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # dk[b,j,d] = sum_i ds[b,i,j] (q*scale)[b,i,d]  (q already scaled)
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
        dbias_ref[h] += jnp.sum(ds, axis=0)


def _backward_call(q, k, v, bias, mask, seed, do, heads, interpret, drop):
    bn, l, c = q.shape
    head_dim = c // heads
    scale = head_dim ** -0.5
    blk = min(WINDOW_BLOCK, bn)
    (q, k, v, mask, do), bn = _pad_windows([q, k, v, mask, do], l, blk)
    n_blocks = q.shape[0] // blk

    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, heads=heads,
                          head_dim=head_dim, drop=drop),
        grid=(n_blocks,),
        in_specs=[
            _qkv_spec(blk, l, c), _qkv_spec(blk, l, c), _qkv_spec(blk, l, c),
            pl.BlockSpec((heads, l, l), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, l, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _seed_spec(),
            _qkv_spec(blk, l, c),
        ],
        out_specs=[
            _qkv_spec(blk, l, c), _qkv_spec(blk, l, c), _qkv_spec(blk, l, c),
            pl.BlockSpec((heads, l, l), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((heads, l, l), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32),
      _seed_arr(seed), do)
    return dq[:bn], dk[:bn], dv[:bn], dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _window_attention(q, k, v, bias, mask, seed, heads, interpret, drop):
    return _forward_call(q, k, v, bias, mask, seed, heads, interpret, drop)


def _wa_fwd(q, k, v, bias, mask, seed, heads, interpret, drop):
    out = _forward_call(q, k, v, bias, mask, seed, heads, interpret, drop)
    return out, (q, k, v, bias, mask, seed)


def _wa_bwd(heads, interpret, drop, res, do):
    q, k, v, bias, mask, seed = res
    dq, dk, dv, dbias = _backward_call(q, k, v, bias, mask, seed,
                                       do.astype(q.dtype), heads, interpret,
                                       drop)
    # The shifted-window mask is built from iota comparisons — a constant;
    # a zero cotangent is exact and skips an [Bn, L, L] HBM write.
    dseed = None if seed is None else jnp.zeros_like(seed)
    return dq, dk, dv, dbias.astype(bias.dtype), jnp.zeros_like(mask), dseed


_window_attention.defvjp(_wa_fwd, _wa_bwd)


@functools.partial(jax.jit,
                   static_argnames=("heads", "interpret", "drop"))
def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray, mask: jnp.ndarray, heads: int,
                     interpret: bool = False, drop: float | None = None,
                     seed=None) -> jnp.ndarray:
    """Fused per-window attention (differentiable: custom VJP with a
    recompute-softmax Pallas backward).

    q/k/v: [Bn, L, C] window tokens (C = heads * head_dim)
    bias:  [heads, L, L] relative position bias
    mask:  [Bn, L, L] additive mask (pass zeros when not shifted)
    drop/seed: in-kernel attention dropout — ``drop`` is the KEEP
    probability (static), ``seed`` an f32 scalar holding a small int; the
    [Bn, H, L, L] mask is regenerated from an integer hash inside both the
    forward and backward kernels (zero HBM traffic; reference semantics:
    nn.Dropout on the softmax probabilities, model/swinunet.py:171,237).
    Returns [Bn, L, C].
    """
    return _window_attention(q, k, v, bias, mask, seed, heads, interpret,
                             drop)


def window_attention_reference(q, k, v, bias, mask, heads):
    """jnp oracle with identical semantics (used in tests and as the
    non-TPU fallback)."""
    bn, l, c = q.shape
    head_dim = c // heads
    scale = head_dim ** -0.5
    qh = q.reshape(bn, l, heads, head_dim).transpose(0, 2, 1, 3)
    kh = k.reshape(bn, l, heads, head_dim).transpose(0, 2, 1, 3)
    vh = v.reshape(bn, l, heads, head_dim).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhld,bhmd->bhlm", qh.astype(jnp.float32) * scale,
                   kh.astype(jnp.float32))
    s = s + bias[None].astype(jnp.float32) + mask[:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhlm,bhmd->bhld", p, vh.astype(jnp.float32))
    return o.transpose(0, 2, 1, 3).reshape(bn, l, c).astype(q.dtype)
