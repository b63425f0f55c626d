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


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with align_corners=True on NHWC via two separable
    matmuls (reference uses nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True), model/unet.py:51). Static shapes → constants folded
    by XLA, contraction runs on the MXU."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_align_corners_weights(h_in, h_out), x.dtype)
    ww = jnp.asarray(_align_corners_weights(w_in, w_out), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x, precision=jax.lax.Precision.HIGHEST)
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
    wh = jnp.asarray(_adaptive_pool_weights(h_in, h_out), x.dtype)
    ww = jnp.asarray(_adaptive_pool_weights(w_in, w_out), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x, precision=jax.lax.Precision.HIGHEST)
    return x


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, C]."""
    return jnp.mean(x, axis=(1, 2))


class ConvBlock(nn.Module):
    """conv3x3-BN-LeakyReLU-dropout-conv3x3-BN-LeakyReLU
    (reference ConvBlock, model/unet.py:12-28)."""

    features: int
    dropout_p: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=NORM_DTYPE, name="bn1")(x)
        x = leaky_relu(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=NORM_DTYPE, name="bn2")(x)
        x = leaky_relu(x)
        return x.astype(self.dtype)


class DownBlock(nn.Module):
    """2x2 max-pool then ConvBlock (reference DownBlock, model/unet.py:31-42)."""

    features: int
    dropout_p: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return ConvBlock(self.features, self.dropout_p, self.dtype,
                         name="conv")(x, train)


class UpBlock(nn.Module):
    """1x1 conv, bilinear x2 upsample (align_corners), skip concat, ConvBlock
    (reference UpBlock, model/unet.py:45-58)."""

    skip_features: int
    features: int
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.skip_features, (1, 1), dtype=self.dtype,
                    name="conv1x1")(x)
        x = resize_bilinear_align_corners(x, (skip.shape[1], skip.shape[2]))
        x = jnp.concatenate([skip, x], axis=-1)
        return ConvBlock(self.features, self.dropout_p, self.dtype,
                         name="conv")(x, train)


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
        g = nn.Dense(self.hid_dim, dtype=self.dtype, name="mlp1")(g)
        g = jax.nn.relu(g)
        g = nn.Dense(self.out_dim, dtype=self.dtype, name="mlp2")(g)

        d = x
        if self.s:
            d = adaptive_avg_pool(d, (self.s, self.s))
        d = nn.Conv(self.hid_dim, (1, 1), dtype=self.dtype, name="conv1")(d)
        d = jax.nn.relu(d)
        d = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv2")(d)
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


def sequence_to_image(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """[B, H*W, C] → [B, H, W, C]."""
    b, n, c = x.shape
    return x.reshape(b, hw[0], hw[1], c)


def image_to_sequence(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, H*W, C]."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)
