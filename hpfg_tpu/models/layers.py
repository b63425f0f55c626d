"""Shared model building blocks, NHWC Flax linen.

TPU conventions used across the zoo:
  * NHWC activations so channels ride the 128-lane axis;
  * compute dtype configurable (bfloat16 by default at train time), float32
    parameters and normalization statistics;
  * resizes/pools expressed as small separable matmuls (MXU-friendly,
    jit-static) instead of gather loops.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# Normalization compute dtype. float32 is the safe default; setting this to
# bfloat16 halves the activation traffic around every BatchNorm (the train
# step is HBM-bandwidth-bound, see bench notes) — statistics still accumulate
# in float32 inside the XLA reduction.
NORM_DTYPE = jnp.float32


def set_norm_dtype(dtype) -> None:
    global NORM_DTYPE
    NORM_DTYPE = dtype


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    """torch nn.LeakyReLU default slope is 0.01."""
    return jax.nn.leaky_relu(x, negative_slope)


def _align_corners_weights(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic [out, in] bilinear interpolation matrix with
    align_corners=True sampling (torch nn.Upsample(align_corners=True))."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        w[:, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def _interp_precision(dtype) -> jax.lax.Precision:
    """fp32 interpolation matmuls need HIGHEST (TPU fp32 'default' is a
    3-pass bf16 decomposition — parity tests would drift); bf16 inputs take
    the native single-pass MXU path (HIGHEST would force a 6x-cost fp32
    upcast for an interpolation that is noise-level in bf16 training)."""
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _resize_einsum(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Separable-matmul bilinear resize (MXU path; exact fp32 w/ HIGHEST)."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    prec = _interp_precision(x.dtype)
    wh = jnp.asarray(_align_corners_weights(h_in, h_out), x.dtype)
    ww = jnp.asarray(_align_corners_weights(w_in, w_out), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=prec)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x, precision=prec)
    return x


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True on NHWC via two separable
    matmuls (reference uses nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True), model/unet.py:51). Static shapes → constants folded
    by XLA, contraction runs on the MXU.

    Measured dead end (round 2): a banded gather-lerp formulation (2 taps
    per output, gather-only custom transpose) looked traffic-optimal on
    paper but benched 676 → 541 img/s — TPU gathers along the sublane axis
    lose badly to the "wasteful" dense MXU contraction. Keep the einsum."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    return _resize_einsum(x, out_hw)


def resize_bilinear_packed_rows(x: jnp.ndarray,
                                out_hw: tuple[int, int]) -> jnp.ndarray:
    """Same bilinear align-corners resize with the interpolation order
    swapped and the ROW pass run on the packed [B, H, W*C] form: columns
    interpolate at the input height (4x less data at a 2x upsample), then
    one row matmul produces the output directly in the row-major packed
    layout the fused dual-input ConvBlock consumes — no 'bowc' intermediate,
    whose layout transposes cost ~0.5 ms/step in the r3 copy audit.
    Numerically the separable passes commute (same weights tensor product);
    summation order differs only at bf16 noise level."""
    b, h_in, w_in, c = x.shape
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    prec = _interp_precision(x.dtype)
    if w_in != w_out:
        ww = jnp.asarray(_align_corners_weights(w_in, w_out), x.dtype)
        x = jnp.einsum("ow,bhwc->bhoc", ww, x, precision=prec)
    if h_in != h_out:
        wh = jnp.asarray(_align_corners_weights(h_in, h_out), x.dtype)
        xp = jnp.einsum("oh,bhl->bol", wh, x.reshape(b, h_in, w_out * c),
                        precision=prec)
        x = xp.reshape(b, h_out, w_out, c)
    return x


def _adaptive_pool_weights(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic [out, in] averaging matrix replicating torch
    AdaptiveAvgPool2d window math: window i = [floor(i*in/out), ceil((i+1)*in/out))."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = int(np.floor(i * in_size / out_size))
        hi = int(np.ceil((i + 1) * in_size / out_size))
        w[i, lo:hi] = 1.0 / (hi - lo)
    return w


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch-style adaptive average pooling on NHWC via separable matmuls."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    prec = _interp_precision(x.dtype)
    wh = jnp.asarray(_adaptive_pool_weights(h_in, h_out), x.dtype)
    ww = jnp.asarray(_adaptive_pool_weights(w_in, w_out), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=prec)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x, precision=prec)
    return x


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, C]."""
    return jnp.mean(x, axis=(1, 2))


# Fused-ConvBlock dispatch: None = auto (Pallas kernels on TPU when the
# shape is supported), True/False force. Overridable via HPFG_FUSED_CONV.
import os as _os

_FUSED_CONV: bool | None = (
    None if _os.environ.get("HPFG_FUSED_CONV", "auto") == "auto"
    else _os.environ.get("HPFG_FUSED_CONV") == "1")

# Dual-input (UpBlock concat-fold) dispatch in auto mode; see
# ConvBlock._use_fused_pair. Default ON: TPU gate green (Mosaic-vs-interpret
# numeric, fwd+VJP) and bench 814.9 -> 874.3 img/s (+7.3%, BENCH_NOTES
# session-9 A/B). HPFG_FUSED_PAIR=0 restores the concat+single-input form.
_FUSED_PAIR: bool = _os.environ.get("HPFG_FUSED_PAIR", "1") == "1"

# In-kernel C=1 stem expand (no HBM channel pad). Default ON: TPU gate
# green, bench-neutral (814.9 vs 814.9) but reads the 3.2 MB unpadded image
# instead of a 51 MB lane-padded copy (BENCH_NOTES session-9 A/B).
# HPFG_FUSED_STEM=0 restores the HBM pre-pad form.
_FUSED_STEM: bool = _os.environ.get("HPFG_FUSED_STEM", "1") == "1"


def fused_pair_dispatch(h: int, w: int, ca: int, cb: int, f: int) -> bool:
    """Whether a (skip, up) pair of these shapes takes the dual-input fused
    ConvBlock (shared by ConvBlock._use_fused_pair and UpBlock's choice of
    resize form). auto takes the dual-input kernels by default (green TPU
    gate + bench, BENCH_NOTES session-9); HPFG_FUSED_PAIR=0 opts out."""
    from hpfg_tpu.ops.pallas.conv_block import profitable, supported_cat

    if not supported_cat(h, w, ca, cb, f):
        return False
    if _FUSED_CONV is not None:
        return _FUSED_CONV
    return (_FUSED_PAIR
            and jax.default_backend() == "tpu"
            and profitable(h, w, ca + cb, f))


def set_fused_conv(enabled: bool | None) -> None:
    """Force (True/False) or restore auto (None) fused ConvBlock dispatch."""
    global _FUSED_CONV
    _FUSED_CONV = enabled


class ConvBlock(nn.Module):
    """conv3x3-BN-LeakyReLU-dropout-conv3x3-BN-LeakyReLU
    (reference ConvBlock, model/unet.py:12-28).

    On TPU the whole block dispatches to the fused Pallas kernels in
    ops/pallas/conv_block.py (packed-lane conv + in-pass batch statistics);
    the flax module path below is the init/reference/fallback implementation
    — both share this module's parameter and batch_stats tree, so
    checkpoints and torch weight ports are interchangeable.
    """

    features: int
    dropout_p: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> jnp.ndarray:
        # x may be a PAIR (skip, up) from UpBlock: the fused path folds the
        # channel concat into the dual-im2col conv1 kernel so the
        # [B,H,W,Ca+Cb] interleave (and its layout copies at the Pallas
        # boundary) never materializes. Everywhere else the pair degrades
        # to an explicit concat.
        if isinstance(x, tuple):
            if self._use_fused_pair(x):
                return self._fused(x, train)
            x = jnp.concatenate(x, axis=-1)
        if self._use_fused(x):
            return self._fused(x, train)
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(9 * x.shape[-1]),
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=NORM_DTYPE, name="bn1")(x)
        x = leaky_relu(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(9 * self.features),
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=NORM_DTYPE, name="bn2")(x)
        x = leaky_relu(x)
        return x.astype(self.dtype)

    # ---- fused dispatch ------------------------------------------------
    def _use_fused(self, x: jnp.ndarray) -> bool:
        if self.is_initializing():
            return False  # flax path registers params/stats
        from hpfg_tpu.ops.pallas.conv_block import profitable, supported

        if x.ndim != 4 or not supported(x.shape[1], x.shape[2], x.shape[3],
                                        self.features):
            return False
        if _FUSED_CONV is not None:
            return _FUSED_CONV  # forced on (tests) / off
        # auto: TPU only, and only the large-spatial stages where the
        # packed kernels measurably beat the XLA lowering
        return (jax.default_backend() == "tpu"
                and profitable(x.shape[1], x.shape[2], x.shape[3],
                               self.features))

    def _use_fused_pair(self, pair) -> bool:
        if self.is_initializing():
            return False
        xa, xb = pair
        if (xa.ndim != 4 or xb.ndim != 4
                or xa.shape[:3] != xb.shape[:3]):
            return False
        return fused_pair_dispatch(xa.shape[1], xa.shape[2], xa.shape[3],
                                   xb.shape[-1], self.features)

    def _fused(self, x, train: bool) -> jnp.ndarray:
        from hpfg_tpu.ops.pallas import conv_block as cb

        p1 = self.get_variable("params", "conv1")
        p2 = self.get_variable("params", "conv2")
        n1 = self.get_variable("params", "bn1")
        n2 = self.get_variable("params", "bn2")
        w1 = p1["kernel"]
        if isinstance(x, tuple):
            x = tuple(t.astype(self.dtype) for t in x)
        else:
            x = x.astype(self.dtype)
        s1 = self.get_variable("batch_stats", "bn1")
        s2 = self.get_variable("batch_stats", "bn2")
        if not isinstance(x, tuple) and x.shape[-1] == 1 and not _FUSED_STEM:
            # stem via HBM channel pad 1->16 (the r3-gated program). With
            # HPFG_FUSED_STEM=1 the unpadded image passes through and the
            # kernel lane-expands it in VMEM instead (_conv_stats_c1) — the
            # pad is a 16x-inflated materialization plus a layout copy,
            # ~0.7 ms/step in the r3 copy audit.
            x = cb.pad_channels(x, axis=3)
            w1 = cb.pad_channels(w1, axis=2)
        params = cb.ConvBlockParams(
            w1=w1, b1=p1["bias"], scale1=n1["scale"],
            bias1=n1["bias"], w2=p2["kernel"], b2=p2["bias"],
            scale2=n2["scale"], bias2=n2["bias"])

        drop = seed = None
        if train and self.dropout_p > 0.0:
            # in-kernel hash dropout: the kernels regenerate the mask from
            # (seed, image, row, lane) — no [B, H, W*F] mask in HBM. The
            # seed rides in an f32 scalar (small int, exact).
            drop = 1.0 - self.dropout_p
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 1 << 23).astype(jnp.float32)

        run_stats = None
        if not train:
            run_stats = cb.FusedStats(s1["mean"], s1["var"],
                                      s2["mean"], s2["var"])
        interpret = jax.default_backend() != "tpu"
        y, stats = cb.fused_conv_block(x, params, None, seed, train,
                                       interpret, drop, run_stats)
        if train and not self.is_initializing():
            m = 0.9  # flax BatchNorm momentum used on the module path
            if self.is_mutable_collection("batch_stats"):
                self.put_variable("batch_stats", "bn1", {
                    "mean": m * s1["mean"] + (1 - m) * stats.mean1,
                    "var": m * s1["var"] + (1 - m) * stats.var1})
                self.put_variable("batch_stats", "bn2", {
                    "mean": m * s2["mean"] + (1 - m) * stats.mean2,
                    "var": m * s2["var"] + (1 - m) * stats.var2})
        return y.astype(self.dtype)


_POOL_IMPL = _os.environ.get("HPFG_POOL", "pairwise")


def _pool_pairwise(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.maximum(x[:, 0::2], x[:, 1::2])
    return jnp.maximum(r[:, :, 0::2], r[:, :, 1::2])


@jax.custom_vjp
def _max_pool_2x2_maskgrad(x: jnp.ndarray) -> jnp.ndarray:
    return _pool_pairwise(x)


def _maskgrad_fwd(x):
    y = _pool_pairwise(x)
    return y, (x, y)


def _maskgrad_bwd(res, dy):
    # dx = dy routed to the window max by an equality mask: one fused
    # elementwise pass over [B, H, W, C] (the 2x nearest-upsamples of y/dy
    # are broadcasts that fuse), instead of the strided-slice pad/scatter
    # chain autodiff emits for the pairwise forward (r3 step audit:
    # ~1.2 ms/step at the 224²/112² pools). Exact ties receive the full
    # cotangent EACH (pairwise autodiff splits 0.5/0.5) — measure-zero
    # for continuous activations, same caveat as the forward variants.
    x, y = res
    b, h, w, c = x.shape
    six = (b, h // 2, 2, w // 2, 2, c)
    yu = jnp.broadcast_to(y[:, :, None, :, None, :], six).reshape(x.shape)
    du = jnp.broadcast_to(dy[:, :, None, :, None, :], six).reshape(x.shape)
    return (jnp.where(x == yu, du, jnp.zeros((), dy.dtype)),)


_max_pool_2x2_maskgrad.defvjp(_maskgrad_fwd, _maskgrad_bwd)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool (identical to nn.max_pool((2,2),(2,2)) for
    even H/W).

    TPU rationale: reduce_window lowers to a standalone op whose backward is
    a SelectAndScatter (profiled at 1.2 + 1.0 ms per 224²x16 pool on v5e).
    The default 'pairwise' form is two stride-2 jnp.maximum's: its autodiff
    backward is elementwise selects + interleaves that fuse with neighbors —
    the round-3 trace showed the 6-D reshape+max form costing ~4.5 ms/step
    in layout copies (eq-against-rebroadcast backward at 224²/112² stages).
    Ties distribute gradient evenly instead of picking one element —
    measure-zero for continuous activations.

    'maskgrad' keeps the pairwise forward but swaps the backward for a
    hand-written eq-mask custom_vjp (one fused elementwise pass, no
    strided-slice scatter-adds) — measured on chip at 869.6 vs the 884.3
    pairwise baseline (r6 A/B): the eq-broadcast layouts lose; kept
    opt-in for the record. 'halves' pools on the row-major flattened form
    (contiguous-half maxima, free bitcast reshapes) — the r12 candidate."""
    b, h, w, c = x.shape
    if _POOL_IMPL not in ("pairwise", "sliced", "reshape", "maskgrad",
                          "halves"):
        # validate BEFORE the odd-size fallback: a typo'd HPFG_POOL must
        # error on every call, not only when H/W happen to be even
        raise ValueError(f"unknown HPFG_POOL={_POOL_IMPL!r} "
                         "(pairwise | sliced | reshape | maskgrad | halves)")
    if h % 2 or w % 2:
        return nn.max_pool(x, (2, 2), strides=(2, 2))
    if _POOL_IMPL == "maskgrad":
        return _max_pool_2x2_maskgrad(x)
    if _POOL_IMPL == "halves":
        # row-major contiguous-halves form: every reshape below is a free
        # bitcast (merges adjacent row-major dims) and every slice is a
        # CONTIGUOUS half — no strided slices (pairwise: scatter-add bwd),
        # no 5/6-D layouts (sliced/reshape), no eq-broadcasts (maskgrad).
        # Row pairs concatenate into one [2WC] row; column pairs into one
        # [2C] block. The r12 copy audit showed the NHWC pool forms force
        # layout renegotiation around every Pallas row-major boundary.
        xr = x.reshape(b * h // 2, 2 * w * c)
        m = jnp.maximum(xr[:, :w * c], xr[:, w * c:])
        mr = m.reshape(b * (h // 2) * (w // 2), 2 * c)
        return jnp.maximum(mr[:, :c], mr[:, c:]).reshape(b, h // 2, w // 2, c)
    if _POOL_IMPL == "pairwise":
        return _pool_pairwise(x)
    if _POOL_IMPL == "sliced":
        # contiguous-slice pairing: reshape (free) + unit slices, whose
        # backward is pad+select — avoids both the strided-slice
        # scatter-add/gather of 'pairwise' (r3 audit: ~1.2 ms/step at
        # down1/down2) and the eq-vs-rebroadcast of 'reshape'
        xr = x.reshape(b, h // 2, 2, w, c)
        r = jnp.maximum(xr[:, :, 0], xr[:, :, 1])
        rr = r.reshape(b, h // 2, w // 2, 2, c)
        return jnp.maximum(rr[:, :, :, 0], rr[:, :, :, 1])
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


class DownBlock(nn.Module):
    """2x2 max-pool then ConvBlock (reference DownBlock, model/unet.py:31-42)."""

    features: int
    dropout_p: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = max_pool_2x2(x)
        return ConvBlock(self.features, self.dropout_p, self.dtype,
                         name="conv")(x, train)


def use_plain_fused(h: int, w: int, c: int, f: int) -> bool:
    """Dispatch gate for the plain packed conv (stem/out_conv/1x1 sites):
    mirrors ConvBlock._use_fused — forced flag first, else TPU + the
    profitable large-spatial band (channel-padded support check)."""
    from hpfg_tpu.ops.pallas.conv_block import plain_conv_supported, profitable

    if not plain_conv_supported(h, w, c, f):
        return False
    if _FUSED_CONV is not None:
        return _FUSED_CONV
    return (jax.default_backend() == "tpu"
            and profitable(h, w, max(16, c), max(16, f)))


class UpBlock(nn.Module):
    """1x1 conv, bilinear x2 upsample (align_corners), skip concat, ConvBlock
    (reference UpBlock, model/unet.py:45-58)."""

    skip_features: int
    features: int
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        f = self.skip_features
        if not self.is_initializing() and use_plain_fused(h, w, c, f):
            # packed 1x1 (zero-padded to the 3x3 kernel layout — only the
            # center tap is nonzero, so SAME semantics are exact and the
            # tap-gradient transpose slices the center back out): keeps the
            # 112²-stage tensors in the custom-calls' row-major layout
            # instead of anchoring batch-in-lanes via an XLA conv
            from hpfg_tpu.ops.pallas import conv_block as cb

            p = self.get_variable("params", "conv1x1")
            w3 = jnp.zeros((3, 3, c, f), p["kernel"].dtype)
            w3 = w3.at[1, 1].set(p["kernel"][0, 0])
            x = cb.fused_conv3x3_plain(
                x.astype(self.dtype), w3.astype(self.dtype), p["bias"],
                jax.default_backend() != "tpu")
        else:
            x = nn.Conv(self.skip_features, (1, 1), dtype=self.dtype,
                        kernel_init=TORCH_KERNEL_INIT,
                        bias_init=torch_bias_init(x.shape[-1]),
                        name="conv1x1")(x)
        target = (skip.shape[1], skip.shape[2])
        if not self.is_initializing() and fused_pair_dispatch(
                target[0], target[1], skip.shape[3], f, self.features):
            # packed-row resize: the upsampled half lands directly in the
            # row-major packed layout the dual-input kernel consumes
            x = resize_bilinear_packed_rows(x, target)
        else:
            x = resize_bilinear_align_corners(x, target)
        # pass the halves as a pair: the fused ConvBlock folds the channel
        # concat into its dual-im2col conv1 (falls back to an explicit
        # concatenate off the fused path)
        return ConvBlock(self.features, self.dropout_p, self.dtype,
                         name="conv")((skip, x), train)


class ProjectionNeck(nn.Module):
    """DenseCL-style non-linear projection neck
    (reference projection_conv, model/unet.py:120-152).

    Returns (global [B, out_dim], dense [B, s*s, out_dim]): global branch is
    GAP → Linear-ReLU-Linear, dense branch is adaptive-avg-pool to (s, s) →
    1x1 conv-ReLU-1x1 conv. Dense output is spatial-major (the reference keeps
    [B, out_dim, s*s]; downstream losses L2-normalize per spatial position
    along the channel axis, which is identical math in either orientation).
    """

    hid_dim: int = 2048
    out_dim: int = 128
    s: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        g = global_avg_pool(x.astype(self.dtype))
        g = nn.Dense(self.hid_dim, dtype=self.dtype,
                     kernel_init=TORCH_KERNEL_INIT,
                     bias_init=torch_bias_init(g.shape[-1]), name="mlp1")(g)
        g = jax.nn.relu(g)
        g = nn.Dense(self.out_dim, dtype=self.dtype,
                     kernel_init=TORCH_KERNEL_INIT,
                     bias_init=torch_bias_init(self.hid_dim), name="mlp2")(g)

        d = x
        if self.s:
            d = adaptive_avg_pool(d, (self.s, self.s))
        d = nn.Conv(self.hid_dim, (1, 1), dtype=self.dtype,
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(d.shape[-1]), name="conv1")(d)
        d = jax.nn.relu(d)
        d = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(self.hid_dim), name="conv2")(d)
        d = d.reshape(d.shape[0], -1, self.out_dim)  # [B, s*s, out_dim]
        return g, d


class DropPath(nn.Module):
    """Stochastic depth per sample (reference model/base.py DropPath)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def trunc_normal_init(stddev: float = 0.02):
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


# torch-default parameter init: the reference's UNet family uses raw
# nn.Conv2d/nn.Linear (model/unet.py:15-25), whose defaults are kernel
# kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)) and bias
# U(+-1/sqrt(fan_in)). Flax defaults (lecun_normal kernel: ~1.73x the std;
# zero bias) are a systematically different draw — measured as a small but
# consistent dice deficit in the CPS training-parity study
# (PARITY_TRAIN.md), so the torch-mirroring models init-match too.
# variance_scaling(1/3, fan_in, uniform) has limit sqrt(3*(1/3)/fan_in)
# = 1/sqrt(fan_in) — exactly kaiming_uniform(a=sqrt(5)).
TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")


def torch_bias_init(fan_in: int):
    """torch's default bias init, U(+-1/sqrt(fan_in)) with the WEIGHT's
    fan_in (flax bias initializers only see the bias shape, so the caller
    supplies it: kh*kw*cin for convs, in_features for dense)."""
    bound = 1.0 / float(np.sqrt(max(int(fan_in), 1)))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def sequence_to_image(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """[B, H*W, C] → [B, H, W, C]."""
    b, n, c = x.shape
    return x.reshape(b, hw[0], hw[1], c)


def image_to_sequence(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, H*W, C]."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)
