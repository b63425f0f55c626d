"""SegFormer / MiT (reference: model/segformer.py).

MiT hierarchical encoder: overlap patch embeds (7/4 then 3/2), efficient
attention with spatial-reduction (sr_ratios 8/4/2/1, heads 1/2/5/8), MixFFN
with a depthwise 3x3 conv, per-stage LayerNorm (reference segformer.py:92-275);
all-MLP SegFormerHead fusing all stages at 1/4 scale then upsampling to full
resolution with align_corners=False bilinear (reference segformer.py:298-342 —
jax.image.resize 'linear' uses the same half-pixel convention).

`segformer` = B0 backbone, `segformer_plus` = B1 + DenseCL necks
(reference segformer.py:414-433).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hpfg_tpu.models.layers import (DropPath, ProjectionNeck,
                                    TORCH_KERNEL_INIT, torch_bias_init)

# The reference segformer defines a trunc_normal_ helper but never applies
# it (no self.apply(_init_weights) anywhere in model/segformer.py) — every
# Linear/Conv2d keeps torch defaults, mirrored here via TORCH_KERNEL_INIT
# + torch_bias_init.
_KI = TORCH_KERNEL_INIT

MIT_SETTINGS = {
    "B0": ([32, 64, 160, 256], [2, 2, 2, 2]),
    "B1": ([64, 128, 320, 512], [2, 2, 2, 2]),
    "B2": ([64, 128, 320, 512], [3, 4, 6, 3]),
    "B3": ([64, 128, 320, 512], [3, 4, 18, 3]),
    "B4": ([64, 128, 320, 512], [3, 8, 27, 3]),
    "B5": ([64, 128, 320, 512], [3, 6, 40, 3]),
}
STAGE_HEADS = (1, 2, 5, 8)
STAGE_SR = (8, 4, 2, 1)


def _resize_half_pixel(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear, align_corners=False (torch F.interpolate default)."""
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="linear")


class EfficientAttention(nn.Module):
    """Spatial-reduction attention (reference Attention, segformer.py:92-129)."""

    dim: int
    heads: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, kernel_init=_KI, bias_init=torch_bias_init(c),
                     dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, self.heads, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            kernel_init=_KI,
                            bias_init=torch_bias_init(
                                self.sr_ratio * self.sr_ratio * c),
                            dtype=self.dtype, name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="norm")(kv_in).astype(self.dtype)
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(self.dim * 2, kernel_init=_KI,
                      bias_init=torch_bias_init(kv_in.shape[-1]),
                      dtype=self.dtype, name="kv")(kv_in)
        kv = kv.reshape(b, n_kv, 2, self.heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.einsum("bhld,bhmd->bhlm", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, kernel_init=_KI,
                        bias_init=torch_bias_init(self.dim),
                        dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """fc1 → DWConv3x3 → GELU → fc2 (reference MLP+DWConv, segformer.py:131-157)."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, kernel_init=_KI,
                     bias_init=torch_bias_init(x.shape[-1]),
                     dtype=self.dtype, name="fc1")(x)
        x = nn.Conv(self.hidden, (3, 3), padding="SAME",
                    feature_group_count=self.hidden, kernel_init=_KI,
                    bias_init=torch_bias_init(9),  # depthwise fan_in = kh*kw
                    dtype=self.dtype, name="dwconv")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, kernel_init=_KI,
                        bias_init=torch_bias_init(self.hidden),
                        dtype=self.dtype, name="fc2")(x)


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        y = EfficientAttention(self.dim, self.heads, self.sr_ratio,
                               self.dtype, name="attn")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        y = MixFFN(self.dim, self.dim * 4, self.dtype, name="mlp")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class OverlapPatchEmbed(nn.Module):
    """Conv patch embed with overlap + LN (reference PatchEmbed, segformer.py:159-178)."""

    dim: int
    patch_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=(self.stride, self.stride),
                    padding=p // 2, kernel_init=_KI,
                    bias_init=torch_bias_init(p * p * x.shape[-1]),
                    dtype=self.dtype, name="proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return x.astype(self.dtype)


class MiT(nn.Module):
    """Mix Transformer encoder returning 4 NHWC stage features
    (reference MiT, segformer.py:213-273)."""

    model_name: str = "B0"
    in_channels: int = 3
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @property
    def embed_dims(self) -> list[int]:
        return MIT_SETTINGS[self.model_name][0]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> list[jnp.ndarray]:
        dims, depths = MIT_SETTINGS[self.model_name]
        total = sum(depths)
        import numpy as np

        dpr = np.linspace(0, self.drop_path_rate, total)
        feats = []
        cur = 0
        for s in range(4):
            patch = OverlapPatchEmbed(
                dims[s], 7 if s == 0 else 3, 4 if s == 0 else 2, self.dtype,
                name=f"patch_embed{s + 1}")
            x = patch(x)
            for i in range(depths[s]):
                x = MiTBlock(dims[s], STAGE_HEADS[s], STAGE_SR[s],
                             float(dpr[cur + i]), self.dtype,
                             name=f"block{s + 1}_{i}")(x, train)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"norm{s + 1}")(x).astype(self.dtype)
            cur += depths[s]
            feats.append(x)
        return feats


class SegFormerHead(nn.Module):
    """All-MLP decode head (reference SegFormerHead, segformer.py:298-321)."""

    num_classes: int
    image_size: Sequence[int]
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray], train: bool) -> jnp.ndarray:
        h, w = feats[0].shape[1], feats[0].shape[2]
        outs = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.embed_dim, kernel_init=_KI,
                         bias_init=torch_bias_init(f.shape[-1]),
                         dtype=self.dtype, name=f"linear_c{i + 1}")(f)
            if i > 0:
                y = _resize_half_pixel(y, (h, w))
            outs.append(y)
        x = jnp.concatenate(outs[::-1], axis=-1)
        x = nn.Conv(self.embed_dim, (1, 1), use_bias=False, kernel_init=_KI,
                    dtype=self.dtype, name="linear_fuse")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = jax.nn.relu(x).astype(self.dtype)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=_KI,
                    bias_init=torch_bias_init(self.embed_dim),
                    dtype=self.dtype, name="linear_pred")(x)
        x = _resize_half_pixel(x.astype(jnp.float32), tuple(self.image_size))
        return x


class SegFormer(nn.Module):
    """reference SegFormer (segformer.py:385-399), B0 backbone."""

    image_size: Sequence[int] = (224, 224)
    in_channels: int = 3
    num_classes: int = 4
    model_name: str = "B0"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = MiT(self.model_name, self.in_channels,
                           dtype=self.dtype)
        self.decoder = SegFormerHead(self.num_classes, self.image_size,
                                     256, self.dtype)

    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        return self.decoder(self.encoder(x, train), train)

    def val(self, x):
        return self(x, train=False)


class SegFormerPlus(nn.Module):
    """reference SegFormer_Plus (segformer.py:402-421), B1 + DenseCL necks."""

    image_size: Sequence[int] = (224, 224)
    in_channels: int = 3
    num_classes: int = 4
    model_name: str = "B1"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = MiT(self.model_name, self.in_channels,
                           dtype=self.dtype)
        self.decoder = SegFormerHead(self.num_classes, self.image_size,
                                     256, self.dtype)
        self.dense_projection_high = ProjectionNeck(hid_dim=2048, out_dim=128,
                                                    s=4, dtype=self.dtype)
        self.dense_projection_head = ProjectionNeck(hid_dim=1024, out_dim=128,
                                                    s=4, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        feats = self.encoder(x, train)
        logits = self.decoder(feats, train)
        high = self.dense_projection_high(feats[-1])
        head = self.dense_projection_head(logits.astype(self.dtype))
        return logits, high, head

    def val(self, x):
        x = x.astype(self.dtype)
        return self.decoder(self.encoder(x, False), False)


def build_segformer(name: str, img_size: int, in_channels: int,
                    num_classes: int, dtype=jnp.float32):
    size = (img_size, img_size)
    if name.endswith("plus"):
        return SegFormerPlus(image_size=size, in_channels=in_channels,
                             num_classes=num_classes, dtype=dtype)
    return SegFormer(image_size=size, in_channels=in_channels,
                     num_classes=num_classes, dtype=dtype)
