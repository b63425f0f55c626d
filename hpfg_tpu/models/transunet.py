"""TransUNet (reference: model/transunet.py).

CNN encoder of ResNet-style bottlenecks (7x7/2 stem then 3 stride-2
bottlenecks), a ViT over the 1/16 bottleneck grid (8 blocks, 4 heads,
mlp 512, patch 1 on the 14x14 grid; reference transunet.py:90-140, 206-241),
then a conv decoder with skip concats and align-corners upsampling
(transunet.py:182-204). out_channels=128 (reference :265-289).

Parity notes (reference quirks preserved deliberately):
  * attention multiplies the logits by sqrt(head_dim) instead of dividing
    (reference MultiHeadAttention.dk, transunet.py:12,21);
  * transformer blocks are post-norm (x = LN(x + attn(x)), transunet.py:64-74);
  * the positional embedding is initialized uniform[0, 1) (torch.rand,
    transunet.py:101).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hpfg_tpu.models.layers import (TORCH_KERNEL_INIT,
                                    resize_bilinear_align_corners,
                                    torch_bias_init)

# The reference transunet defines no _init_weights — every Linear/Conv2d
# keeps torch defaults (kaiming_uniform(a=sqrt(5)) kernel, uniform bias).
_KI = TORCH_KERNEL_INIT


class MultiHeadAttention(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, use_bias=False, kernel_init=_KI,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        # NOTE: multiplied (not divided) by sqrt(head_dim) — reference parity
        energy = jnp.einsum("bhid,bhjd->bhij", q, k,
                            preferred_element_type=jnp.float32) * (hd ** 0.5)
        attn = jax.nn.softmax(energy, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, use_bias=False, kernel_init=_KI,
                        dtype=self.dtype, name="out")(out)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = MultiHeadAttention(self.dim, self.heads, self.dtype,
                               name="attn")(x)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm1")(x + y).astype(self.dtype)
        y = nn.Dense(self.mlp_dim, kernel_init=_KI,
                     bias_init=torch_bias_init(self.dim),
                     dtype=self.dtype, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        y = nn.Dense(self.dim, kernel_init=_KI,
                     bias_init=torch_bias_init(self.mlp_dim),
                     dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(x + y).astype(self.dtype)
        return x


class ViT(nn.Module):
    """Non-classification ViT over an already-downsampled grid
    (reference ViT, transunet.py:90-128; patch_dim=1, cls token dropped)."""

    num_tokens: int
    dim: int
    heads: int
    mlp_dim: int
    blocks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, train: bool):
        x = nn.Dense(self.dim, kernel_init=_KI,
                     bias_init=torch_bias_init(tokens.shape[-1]),
                     dtype=self.dtype, name="projection")(tokens)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim), jnp.float32)
        pos = self.param("embedding", nn.initializers.uniform(1.0),
                         (self.num_tokens + 1, self.dim), jnp.float32)
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1) + pos[None].astype(x.dtype)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        for i in range(self.blocks):
            x = TransformerBlock(self.dim, self.heads, self.mlp_dim,
                                 self.dtype, name=f"block{i}")(x, train)
        return x[:, 1:, :]


def _bn_relu(x, train, dtype, name):
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=jnp.float32, name=name)(x)
    return jax.nn.relu(x).astype(dtype)


class EncoderBottleneck(nn.Module):
    """1x1 → 3x3/2 → 1x1 with BN-projected residual
    (reference transunet.py:143-179; the 3x3 always strides 2)."""

    out_channels: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        down = nn.Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2,
                       use_bias=False, kernel_init=_KI, dtype=self.dtype,
                       name="down_conv")(x)
        down = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32,
                            name="down_bn")(down).astype(self.dtype)
        width = self.out_channels
        y = nn.Conv(width, (1, 1), use_bias=False, kernel_init=_KI,
                    dtype=self.dtype, name="conv1")(x)
        y = _bn_relu(y, train, self.dtype, "norm1")
        # symmetric padding=1 (transunet.py:155); SAME at stride 2 is (0, 1)
        y = nn.Conv(width, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, kernel_init=_KI, dtype=self.dtype,
                    name="conv2")(y)
        y = _bn_relu(y, train, self.dtype, "norm2")
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=_KI, dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="norm3")(y).astype(self.dtype)
        return jax.nn.relu(y + down).astype(self.dtype)


class DecoderBottleneck(nn.Module):
    """x2 align-corners upsample, optional skip concat, double conv-BN-ReLU
    (reference transunet.py:182-204)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        x = resize_bilinear_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
        if skip is not None:
            x = jnp.concatenate([skip.astype(x.dtype), x], axis=-1)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=_KI,
                    bias_init=torch_bias_init(9 * x.shape[-1]),
                    dtype=self.dtype, name="conv1")(x)
        x = _bn_relu(x, train, self.dtype, "bn1")
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=_KI,
                    bias_init=torch_bias_init(9 * self.out_channels),
                    dtype=self.dtype, name="conv2")(x)
        x = _bn_relu(x, train, self.dtype, "bn2")
        return x


class TransUNet(nn.Module):
    image_size: int = 224
    num_classes: int = 4
    in_channels: int = 3
    out_channels: int = 128
    head_num: int = 4
    mlp_dim: int = 512
    block_num: int = 8
    patch_dim: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        oc = self.out_channels
        # stem + bottlenecks (reference Encoder, transunet.py:206-241)
        # torch pads the 7x7/2 stem symmetrically (padding=3,
        # transunet.py:210); XLA SAME would pad (2, 3) — border parity
        x = nn.Conv(oc, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=_KI, dtype=self.dtype,
                    name="conv1")(x)
        x1 = _bn_relu(x, train, self.dtype, "norm1")
        x2 = EncoderBottleneck(oc * 2, dtype=self.dtype,
                               name="encoder1")(x1, train)
        x3 = EncoderBottleneck(oc * 4, dtype=self.dtype,
                               name="encoder2")(x2, train)
        x4 = EncoderBottleneck(oc * 8, dtype=self.dtype,
                               name="encoder3")(x3, train)

        grid = self.image_size // self.patch_dim
        tokens = x4.reshape(x4.shape[0], grid * grid, oc * 8)
        tokens = ViT(grid * grid, oc * 8, self.head_num, self.mlp_dim,
                     self.block_num, self.dtype, name="vit")(tokens, train)
        x4 = tokens.reshape(x4.shape[0], grid, grid, oc * 8)
        x4 = nn.Conv(512, (3, 3), padding="SAME", kernel_init=_KI,
                     bias_init=torch_bias_init(9 * oc * 8),
                     dtype=self.dtype, name="conv2")(x4)
        x4 = _bn_relu(x4, train, self.dtype, "norm2")

        # decoder (reference transunet.py:244-261)
        y = DecoderBottleneck(oc * 2, self.dtype, name="decoder1")(x4, x3, train)
        y = DecoderBottleneck(oc, self.dtype, name="decoder2")(y, x2, train)
        y = DecoderBottleneck(oc // 2, self.dtype, name="decoder3")(y, x1, train)
        y = DecoderBottleneck(oc // 8, self.dtype, name="decoder4")(y, None, train)
        y = nn.Conv(self.num_classes, (1, 1), kernel_init=_KI,
                    bias_init=torch_bias_init(oc // 8),
                    dtype=self.dtype, name="head")(y)
        return y.astype(jnp.float32)

    def val(self, x):
        return self(x, train=False)


def build_transunet(name: str, img_size: int, in_channels: int,
                    num_classes: int, dtype=jnp.float32):
    """reference get_transunet (transunet.py:265-289) and the LIDC variant
    (transunet_LIDC.py — same topology sized by image_size)."""
    return TransUNet(image_size=img_size, num_classes=num_classes,
                     in_channels=in_channels, dtype=dtype)
