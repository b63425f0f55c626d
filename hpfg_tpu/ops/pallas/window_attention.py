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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                 scale: float, heads: int, head_dim: int):
    """One block of windows.

    q/k/v: [BLK, L, H*D] (interleaved head-major packing: h*D + d)
    bias:  [H, L, L] relative-position bias
    mask:  [BLK, L, L] additive shifted-window mask (zeros when unshifted)
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
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray, mask: jnp.ndarray, heads: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused per-window attention.

    q/k/v: [Bn, L, C] window tokens (C = heads * head_dim)
    bias:  [heads, L, L] relative position bias
    mask:  [Bn, L, L] additive mask (pass zeros when not shifted)
    Returns [Bn, L, C].
    """
    bn, l, c = q.shape
    head_dim = c // heads
    scale = head_dim ** -0.5

    blk = min(WINDOW_BLOCK, bn)
    pad = (-bn) % blk
    if pad:
        zq = jnp.zeros((pad, l, c), q.dtype)
        q = jnp.concatenate([q, zq])
        k = jnp.concatenate([k, zq.astype(k.dtype)])
        v = jnp.concatenate([v, zq.astype(v.dtype)])
        mask = jnp.concatenate(
            [mask, jnp.zeros((pad, l, l), mask.dtype)])
    n_blocks = q.shape[0] // blk

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, heads=heads,
                          head_dim=head_dim),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, l, l), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, l, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32))
    return out[:bn]


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
