"""CMT conv-transformer hybrid encoder + SegFormer head
(reference: model/cmt.py).

Encoder (reference CMT, cmt.py:154-303): 3-conv GELU+BN stem at stride 2,
four stages of [2x2-conv patch embed + LN] → CMT blocks. Each block
(cmt.py:97-120): local perception unit (3x3 depthwise conv residual), LN →
spatial-reduction attention with a learned relative-position bias table
([heads, N, N/sr²], torch.randn init, cmt.py:198-206), LN → inverted-residual
MixFFN with depthwise conv (cmt.py:18-49). Defaults = CMT-Tiny
(embed dims [46, 92, 184, 368], stem 16, heads [1, 2, 4, 8], depths
[2, 2, 10, 2], mlp ratio 3.6, sr [8, 4, 2, 1]).

`cmt` registry key = CMT_S (cmt_xs encoder, cmt.py:316-324: dims
[52, 104, 208, 416], depths [3, 3, 12, 3], mlp 3.77); `cmt_plus` = CMT_Plus
(cmt_tiny encoder + DenseCL necks, cmt.py:461-474).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.models.layers import (DropPath, ProjectionNeck,
                                    TORCH_KERNEL_INIT, torch_bias_init)

# Reference init: CMT defines _init_weights (model/cmt.py:240-254) but never
# self.apply's it (only uniformer.py:290 does), so every Linear/Conv2d keeps
# torch defaults — kaiming_uniform(a=sqrt(5)) kernel + uniform(1/sqrt(fan_in))
# bias. relative_pos_* stays torch.randn (cmt.py:198-206).
_KI_DENSE = TORCH_KERNEL_INIT
_KI_CONV = TORCH_KERNEL_INIT
from hpfg_tpu.models.segformer import SegFormerHead


def _bn(x, train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)(x)


class CMTMlp(nn.Module):
    """1x1 conv-GELU-BN → depthwise 3x3 residual → GELU-BN → 1x1 conv-BN
    (reference Mlp, cmt.py:18-49). Operates on NHWC."""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.hidden, (1, 1), kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(x.shape[-1]),
                    dtype=self.dtype, name="conv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = _bn(x, train, "bn1").astype(self.dtype)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        y = nn.Conv(self.hidden, (3, 3), padding="SAME",
                    feature_group_count=self.hidden, kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(9),  # depthwise fan_in
                    dtype=self.dtype, name="proj")(x)
        x = jax.nn.gelu(y + x, approximate=False)
        x = _bn(x, train, "proj_bn").astype(self.dtype)
        x = nn.Conv(self.out, (1, 1), kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(self.hidden),
                    dtype=self.dtype, name="conv2")(x)
        x = _bn(x, train, "bn2").astype(self.dtype)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class CMTAttention(nn.Module):
    """SR attention + learned relative position bias (reference cmt.py:51-95)."""

    dim: int
    num_heads: int
    sr_ratio: int
    qk_ratio: int = 1
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos, train: bool):
        b, h, w, c = x.shape
        n = h * w
        qk_dim = self.dim // self.qk_ratio
        hd_qk = qk_dim // self.num_heads
        hd_v = self.dim // self.num_heads
        scale = hd_qk ** -0.5

        tokens = x.reshape(b, n, c)
        q = nn.Dense(qk_dim, use_bias=self.qkv_bias, kernel_init=_KI_DENSE,
                     bias_init=torch_bias_init(c),
                     dtype=self.dtype, name="q")(tokens)
        q = q.reshape(b, n, self.num_heads, hd_qk).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            feature_group_count=self.dim,
                            kernel_init=_KI_CONV,
                            bias_init=torch_bias_init(self.sr_ratio ** 2),
                            dtype=self.dtype,
                            name="sr_conv")(x)
            kv_in = _bn(kv_in, train, "sr_bn").astype(self.dtype)
        m = kv_in.shape[1] * kv_in.shape[2]
        kv_tokens = kv_in.reshape(b, m, c)
        k = nn.Dense(qk_dim, use_bias=self.qkv_bias, kernel_init=_KI_DENSE,
                     bias_init=torch_bias_init(c),
                     dtype=self.dtype, name="k")(kv_tokens)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, kernel_init=_KI_DENSE,
                     bias_init=torch_bias_init(c),
                     dtype=self.dtype, name="v")(kv_tokens)
        k = k.reshape(b, m, self.num_heads, hd_qk).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.num_heads, hd_v).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = attn + rel_pos[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, kernel_init=_KI_DENSE,
                        bias_init=torch_bias_init(self.dim),
                        dtype=self.dtype, name="proj")(out)


class CMTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rel_pos, train: bool):
        # local perception unit (reference Block.forward, cmt.py:112-115)
        y = nn.Conv(self.dim, (3, 3), padding="SAME",
                    feature_group_count=self.dim, kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(9),  # depthwise fan_in
                    dtype=self.dtype, name="lpu")(x)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        y = CMTAttention(self.dim, self.num_heads, self.sr_ratio,
                         dtype=self.dtype, name="attn")(y, rel_pos, train)
        x = x + DropPath(self.drop_path, name="dp1")(y, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        y = CMTMlp(int(self.dim * self.mlp_ratio), self.dim,
                   dtype=self.dtype, name="mlp")(y, train)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class CMT(nn.Module):
    """4-stage CMT encoder returning NHWC stage features."""

    img_size: int = 224
    in_channels: int = 3
    embed_dims: Sequence[int] = (46, 92, 184, 368)
    stem_channel: int = 16
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[float] = (3.6, 3.6, 3.6, 3.6)
    depths: Sequence[int] = (2, 2, 10, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        for i in range(3):
            stride = (2, 2) if i == 0 else (1, 1)
            ksize = (7, 7) if i == 0 else (3, 3)
            # torch symmetric padding (cmt.py:176-186: 7x7/2 pad 3, 3x3/1
            # pad 1); XLA SAME pads the strided stem (2, 3) — border parity
            x = nn.Conv(self.stem_channel, ksize, strides=stride,
                        padding=ksize[0] // 2, kernel_init=_KI_CONV,
                        bias_init=torch_bias_init(
                            ksize[0] * ksize[1] * x.shape[-1]),
                        dtype=self.dtype, name=f"stem_conv{i + 1}")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = _bn(x, train, f"stem_norm{i + 1}").astype(self.dtype)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        feats = []
        cur = 0
        for s in range(4):
            x = nn.Conv(self.embed_dims[s], (2, 2), strides=(2, 2),
                        kernel_init=_KI_CONV,
                        bias_init=torch_bias_init(4 * x.shape[-1]),
                        dtype=self.dtype,
                        name=f"patch_embed_{s}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"patch_norm_{s}")(x).astype(self.dtype)
            n = x.shape[1] * x.shape[2]
            m = n // (self.sr_ratios[s] ** 2)
            rel_pos = self.param(f"relative_pos_{s}",
                                 nn.initializers.normal(1.0),
                                 (self.num_heads[s], n, m), jnp.float32)
            for i in range(self.depths[s]):
                x = CMTBlock(self.embed_dims[s], self.num_heads[s],
                             self.mlp_ratios[s], self.sr_ratios[s],
                             float(dpr[cur + i]), self.dtype,
                             name=f"block{s}_{i}")(x, rel_pos, train)
            cur += self.depths[s]
            feats.append(x)
        return feats


def cmt_tiny_kwargs():
    return dict(embed_dims=(46, 92, 184, 368), stem_channel=16,
                depths=(2, 2, 10, 2), mlp_ratios=(3.6,) * 4)


def cmt_xs_kwargs():
    return dict(embed_dims=(52, 104, 208, 416), stem_channel=16,
                depths=(3, 3, 12, 3), mlp_ratios=(3.77,) * 4)


class CMTSeg(nn.Module):
    """CMT_S: cmt_xs encoder + SegFormerHead (reference cmt.py:440-458)."""

    image_size: Sequence[int] = (224, 224)
    in_channels: int = 3
    num_classes: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = cmt_xs_kwargs()
        self.encoder = CMT(img_size=self.image_size[0],
                           in_channels=self.in_channels, dtype=self.dtype,
                           **kw)
        self.decoder = SegFormerHead(self.num_classes, self.image_size, 256,
                                     self.dtype)

    def __call__(self, x, train: bool = False):
        return self.decoder(self.encoder(x, train), train)

    def val(self, x):
        return self(x, train=False)


class CMTPlus(nn.Module):
    """CMT_Plus: cmt_tiny encoder + head + DenseCL necks (reference cmt.py:461-487)."""

    image_size: Sequence[int] = (224, 224)
    in_channels: int = 3
    num_classes: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = cmt_tiny_kwargs()
        self.encoder = CMT(img_size=self.image_size[0],
                           in_channels=self.in_channels, dtype=self.dtype,
                           **kw)
        self.decoder = SegFormerHead(self.num_classes, self.image_size, 256,
                                     self.dtype)
        self.dense_projection_high = ProjectionNeck(hid_dim=2048, out_dim=128,
                                                    s=4, dtype=self.dtype)
        self.dense_projection_head = ProjectionNeck(hid_dim=1024, out_dim=128,
                                                    s=4, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        feats = self.encoder(x, train)
        logits = self.decoder(feats, train)
        high = self.dense_projection_high(feats[-1])
        head = self.dense_projection_head(logits.astype(self.dtype))
        return logits, high, head

    def val(self, x):
        return self.decoder(self.encoder(x, False), False)


def build_cmt(name: str, img_size: int, in_channels: int, num_classes: int,
              dtype=jnp.float32):
    size = (img_size, img_size)
    if name.endswith("plus"):
        return CMTPlus(image_size=size, in_channels=in_channels,
                       num_classes=num_classes, dtype=dtype)
    return CMTSeg(image_size=size, in_channels=in_channels,
                  num_classes=num_classes, dtype=dtype)
