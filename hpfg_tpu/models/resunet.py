"""ResUNet and ResUNet++ (reference: model/resunet.py, model/resunet_plus.py).

The reference ships these unregistered (model/builder.py never dispatches to
them — dead-code inventory rows); here they are implemented AND registered
under `resunet` / `resunet_plusplus` for completeness.

ResUNet (resunet.py:37-95): filters [64, 128, 256, 512], pre-activation
residual conv blocks (BN-ReLU-conv x2 + skip conv), stride-2 downsampling,
ConvTranspose-style upsampling (here align-corners bilinear + conv), skip
concats, 1x1 sigmoid-free head.

ResUNet++ (resunet_plus.py:156-196): stem block, squeeze-excitation gated
residual stages, ASPP bridge, attention-gated decoder blocks, ASPP + 1x1
output head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hpfg_tpu.models.layers import resize_bilinear_align_corners


def _bn(x, train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)(x)


class ResidualConv(nn.Module):
    """BN-ReLU-conv3x3(stride) - BN-ReLU-conv3x3 + strided skip conv
    (reference ResidualConv, resunet.py:4-23)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = _bn(x, train, "bn1")
        y = jax.nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, dtype=self.dtype, name="conv1")(y)
        y = _bn(y, train, "bn2")
        y = jax.nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(y)
        skip = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                       padding=1, dtype=self.dtype, name="skip")(x)
        return y + skip


class ResUNet(nn.Module):
    """reference ResUNet (resunet.py:37-95)."""

    in_channels: int = 3
    num_classes: int = 1
    filters: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        f = self.filters
        y = nn.Conv(f[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="input_conv1")(x)
        y = _bn(y, train, "input_bn")
        y = jax.nn.relu(y).astype(self.dtype)
        y = nn.Conv(f[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="input_conv2")(y)
        skip = nn.Conv(f[0], (3, 3), padding="SAME", dtype=self.dtype,
                       name="input_skip")(x)
        x1 = y + skip
        x2 = ResidualConv(f[1], 2, self.dtype, name="residual_conv_1")(x1, train)
        x3 = ResidualConv(f[2], 2, self.dtype, name="residual_conv_2")(x2, train)
        x4 = ResidualConv(f[3], 2, self.dtype, name="bridge")(x3, train)

        def up(z, skip_feat, feat, name):
            z = resize_bilinear_align_corners(
                z, (z.shape[1] * 2, z.shape[2] * 2))
            z = jnp.concatenate([z, skip_feat.astype(z.dtype)], axis=-1)
            return ResidualConv(feat, 1, self.dtype, name=name)(z, train)

        y = up(x4, x3, f[2], "up_residual_conv1")
        y = up(y, x2, f[1], "up_residual_conv2")
        y = up(y, x1, f[0], "up_residual_conv3")
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="output_layer")(y)
        return y.astype(jnp.float32)

    def val(self, x):
        return self(x, train=False)


class SqueezeExcitation(nn.Module):
    """reference Squeeze_Excitation (resunet_plus.py:4-21)."""

    features: int
    ratio: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(self.features // self.ratio, use_bias=False,
                     dtype=self.dtype)(s)
        s = jax.nn.relu(s)
        s = nn.Dense(self.features, use_bias=False, dtype=self.dtype)(s)
        s = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x * s[:, None, None, :]


class StemBlock(nn.Module):
    """reference Stem_Block (resunet_plus.py:23-45)."""

    features: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, dtype=self.dtype, name="c1_conv1")(x)
        y = _bn(y, train, "c1_bn")
        y = jax.nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="c1_conv2")(y)
        s = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                    dtype=self.dtype, name="c2_conv")(x)
        s = _bn(s, train, "c2_bn").astype(self.dtype)
        return SqueezeExcitation(self.features, dtype=self.dtype,
                                 name="attn")(y + s)


class ResNetBlockSE(nn.Module):
    """reference ResNet_Block (resunet_plus.py:47-71)."""

    features: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = _bn(x, train, "bn1")
        y = jax.nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, dtype=self.dtype, name="conv1")(y)
        y = _bn(y, train, "bn2")
        y = jax.nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(y)
        s = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                    dtype=self.dtype, name="skip")(x)
        s = _bn(s, train, "skip_bn").astype(self.dtype)
        return SqueezeExcitation(self.features, dtype=self.dtype,
                                 name="attn")(y + s)


class ASPP(nn.Module):
    """reference ASPP (resunet_plus.py:73-107): dilated 3x3 branches at
    rates 6/12/18 + 1x1 fuse."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        outs = []
        for i, rate in enumerate((6, 12, 18)):
            y = nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_dilation=(rate, rate), dtype=self.dtype,
                        name=f"c{i + 1}")(x)
            y = _bn(y, train, f"bn{i + 1}").astype(self.dtype)
            outs.append(y)
        y = outs[0] + outs[1] + outs[2]
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out")(y)


class AttentionBlock(nn.Module):
    """reference Attention_Block (resunet_plus.py:109-139): gate g (coarse)
    modulates x (skip) before decoding."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool):
        gc = _bn(g, train, "g_bn")
        gc = jax.nn.relu(gc).astype(self.dtype)
        gc = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                     name="g_conv")(gc)
        gp = nn.max_pool(gc, (2, 2), strides=(2, 2))
        xc = _bn(x, train, "x_bn")
        xc = jax.nn.relu(xc).astype(self.dtype)
        xc = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                     name="x_conv")(xc)
        gate = _bn(gp + xc, train, "gc_bn")
        gate = jax.nn.relu(gate).astype(self.dtype)
        gate = nn.Conv(1, (1, 1), dtype=self.dtype, name="gc_conv")(gate)
        return gate * x


class ResUNetPlusPlus(nn.Module):
    """reference build_resunetplusplus (resunet_plus.py:156-196):
    channels 16/32/64/128/256, ASPP bridge + attention decoder."""

    in_channels: int = 3
    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        c1 = StemBlock(16, 1, self.dtype, name="c1")(x, train)
        c2 = ResNetBlockSE(32, 2, self.dtype, name="c2")(c1, train)
        c3 = ResNetBlockSE(64, 2, self.dtype, name="c3")(c2, train)
        c4 = ResNetBlockSE(128, 2, self.dtype, name="c4")(c3, train)
        b1 = ASPP(256, self.dtype, name="b1")(c4, train)

        def decode(skip_hi, z, feat, name):
            a = AttentionBlock(z.shape[-1], self.dtype,
                               name=f"{name}_attn")(skip_hi, z, train)
            a = resize_bilinear_align_corners(
                a, (a.shape[1] * 2, a.shape[2] * 2))
            a = jnp.concatenate([a, skip_hi.astype(a.dtype)], axis=-1)
            return ResNetBlockSE(feat, 1, self.dtype,
                                 name=f"{name}_res")(a, train)

        d1 = decode(c3, b1, 128, "d1")
        d2 = decode(c2, d1, 64, "d2")
        d3 = decode(c1, d2, 32, "d3")
        y = ASPP(16, self.dtype, name="aspp_out")(d3, train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="output")(y)
        return y.astype(jnp.float32)

    def val(self, x):
        return self(x, train=False)
