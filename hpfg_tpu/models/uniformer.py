"""UniFormer encoder + SegFormer head (reference: model/uniformer.py).

uniformer_small (reference uniformer.py:332-338): depths [3, 4, 8, 3], dims
[64, 128, 320, 512], head_dim 64, mlp 4, LN eps 1e-6. Stages 1-2 use conv
blocks (CBlock: depthwise pos-conv residual, BN → 1x1 → 5x5 depthwise → 1x1
residual, BN → conv-MLP; uniformer.py:84-103), stages 3-4 use global
self-attention blocks (SABlock with a depthwise pos-conv; uniformer.py:106-141),
each stage ends with BatchNorm. Patch embeds: 4x4 then 2x2 convs with LN
(uniformer.py:178-199). `Uniformer_Plus` adds the SegFormer head + DenseCL
necks (uniformer.py:508-527).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.models.layers import (DropPath, ProjectionNeck,
                                    TORCH_KERNEL_INIT, torch_bias_init,
                                    trunc_normal_init)

# Reference init (model/uniformer.py:292-299 _init_weights, self.apply'd):
# Linear trunc_normal(std=.02) + zero bias; LayerNorm (1, 0). Conv2d layers
# (pos_embed DW convs, CBlock 1x1/5x5 convs, patch embeds) are NOT covered
# and keep torch defaults (kaiming_uniform(a=sqrt(5)) + uniform bias).
_KI_DENSE = trunc_normal_init(0.02)
_KI_CONV = TORCH_KERNEL_INIT
from hpfg_tpu.models.segformer import SegFormerHead


def _bn(x, train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)(x)


class CBlock(nn.Module):
    """Convolutional UniFormer block (reference uniformer.py:84-103)."""

    dim: int
    mlp_ratio: float
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x + nn.Conv(self.dim, (3, 3), padding="SAME",
                        feature_group_count=self.dim, kernel_init=_KI_CONV,
                        bias_init=torch_bias_init(9),  # depthwise fan_in
                        dtype=self.dtype, name="pos_embed")(x)
        y = _bn(x, train, "norm1").astype(self.dtype)
        y = nn.Conv(self.dim, (1, 1), kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(self.dim),
                    dtype=self.dtype, name="conv1")(y)
        y = nn.Conv(self.dim, (5, 5), padding="SAME",
                    feature_group_count=self.dim, kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(25),  # depthwise fan_in
                    dtype=self.dtype, name="attn")(y)
        y = nn.Conv(self.dim, (1, 1), kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(self.dim),
                    dtype=self.dtype, name="conv2")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, train)
        y = _bn(x, train, "norm2").astype(self.dtype)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Conv(hidden, (1, 1), kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(self.dim),
                    dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), kernel_init=_KI_CONV,
                    bias_init=torch_bias_init(hidden),
                    dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class SABlock(nn.Module):
    """Self-attention UniFormer block (reference uniformer.py:106-141)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x + nn.Conv(self.dim, (3, 3), padding="SAME",
                        feature_group_count=self.dim, kernel_init=_KI_CONV,
                        bias_init=torch_bias_init(9),  # depthwise fan_in
                        dtype=self.dtype, name="pos_embed")(x)
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm1")(t).astype(self.dtype)
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, kernel_init=_KI_DENSE,
                       dtype=self.dtype, name="qkv")(y)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhij,bhjd->bhid", attn, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, h * w, self.dim)
        o = nn.Dense(self.dim, kernel_init=_KI_DENSE, dtype=self.dtype,
                     name="proj")(o)
        t = t + DropPath(self.drop_path, name="dp1")(o, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm2")(t).astype(self.dtype)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, kernel_init=_KI_DENSE, dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, kernel_init=_KI_DENSE, dtype=self.dtype,
                     name="mlp_fc2")(y)
        t = t + DropPath(self.drop_path, name="dp2")(y, train)
        return t.reshape(b, h, w, c)


class UniFormer(nn.Module):
    """4-stage encoder returning NHWC features (reference uniformer.py:202-331)."""

    in_channels: int = 3
    depth: Sequence[int] = (3, 4, 8, 3)
    embed_dim: Sequence[int] = (64, 128, 320, 512)
    head_dim: int = 64
    mlp_ratio: float = 4.0
    # reference UniFormer defaults drop_path_rate=0.1 (uniformer.py:224) and
    # uniformer_small does not override it (uniformer.py:332-338)
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depth))
        heads = [d // self.head_dim for d in self.embed_dim]
        feats = []
        cur = 0
        for s in range(4):
            p = 4 if s == 0 else 2
            x = nn.Conv(self.embed_dim[s], (p, p), strides=(p, p),
                        kernel_init=_KI_CONV,
                        bias_init=torch_bias_init(p * p * x.shape[-1]),
                        dtype=self.dtype, name=f"patch_embed{s + 1}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             name=f"patch_norm{s + 1}")(x).astype(self.dtype)
            if s == 0:
                x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
            for i in range(self.depth[s]):
                rate = float(dpr[cur + i])
                if s < 2:
                    x = CBlock(self.embed_dim[s], self.mlp_ratio, rate,
                               self.dtype, name=f"block{s + 1}_{i}")(x, train)
                else:
                    x = SABlock(self.embed_dim[s], heads[s], self.mlp_ratio,
                                rate, self.dtype,
                                name=f"block{s + 1}_{i}")(x, train)
            cur += self.depth[s]
            x = _bn(x, train, f"norm{s + 1}").astype(self.dtype)
            feats.append(x)
        return feats


class UniformerPlus(nn.Module):
    """reference Uniformer_Plus (uniformer.py:508-527):
    uniformer_small encoder + SegFormerHead + DenseCL necks."""

    img_size: int = 224
    in_channels: int = 3
    num_classes: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = UniFormer(in_channels=self.in_channels,
                                 dtype=self.dtype)
        self.decoder = SegFormerHead(self.num_classes,
                                     (self.img_size, self.img_size), 256,
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
