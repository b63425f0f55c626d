"""Swin-Transformer U-Net (reference: model/swinunet.py).

Architecture (reference get_swinunet, swinunet.py:725-760): PatchEmbed(4),
embed 96, 4 stages depths (2, 2, 6, 2), heads (3, 6, 12, 24), window 7
(224 px) / 8 (256 px), mlp ratio 4, drop 0.1, attn drop 0.1, drop path 0.2;
decoder of PatchExpanding stages with linear skip-fusions; Final 4x patch
expansion + 1x1 conv head. `SwinUNetPlus` adds the DenseCL necks on the
8C bottleneck and the logits head (swinunet.py:690-718).

TPU-first notes:
  * NHWC throughout; window partition/reverse are pure reshapes/transposes
    that XLA folds into the attention einsums;
  * the shifted-window attention mask is a compile-time numpy constant
    (static shapes), no dynamic slicing;
  * attention runs in bf16 on the MXU with fp32 softmax.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.models.layers import (DropPath, ProjectionNeck,
                                    TORCH_KERNEL_INIT, torch_bias_init,
                                    trunc_normal_init)

# Reference init (model/swinunet.py:624-634 init_weights, applied to every
# submodule): nn.Linear weights trunc_normal(std=.02) + zero bias;
# LayerNorm (1, 0). Conv2d layers (patch-embed proj, 1x1 head) are NOT
# covered by init_weights and keep torch defaults.
_DENSE_INIT = trunc_normal_init(0.02)


@functools.lru_cache(maxsize=None)
def _relative_position_index(ws: int) -> np.ndarray:
    """[ws², ws²] indices into the (2ws-1)² bias table
    (reference WindowAttention.__init__, swinunet.py:155-170)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, ws², ws²]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def _shift_attention_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask [num_windows, ws², ws²] with 0 / -100 entries
    (reference WindowAttention.create_mask, swinunet.py:184-205)."""
    img_mask = np.zeros((h, w))
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws_ in slices:
            img_mask[hs, ws_] = cnt
            cnt += 1
    mask = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    mask = mask.reshape(-1, ws * ws)
    attn_mask = mask[:, None, :] - mask[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] → [B·nH·nW, ws², C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with relative position bias
    (reference swinunet.py:136-250)."""

    dim: int
    window_size: int
    num_heads: int
    shift: bool = False
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        shift = ws // 2 if self.shift else 0
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * ws - 1) ** 2, self.num_heads), jnp.float32)
        rel_idx = _relative_position_index(ws)
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(
            ws * ws, ws * ws, self.num_heads)
        rel_bias = rel_bias.transpose(2, 0, 1)  # [heads, ws², ws²]

        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        windows = window_partition(x.astype(self.dtype), ws)  # [Bn, L, C]
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       kernel_init=_DENSE_INIT,
                       dtype=self.dtype, name="qkv")(windows)

        # fused Pallas path (fwd + custom-VJP bwd; in-kernel hash dropout
        # covers train-mode attn_drop with zero HBM mask traffic)
        if self.use_pallas:
            from hpfg_tpu.ops.pallas.window_attention import window_attention

            l = ws * ws
            qq = qkv[..., :self.dim]
            kk = qkv[..., self.dim:2 * self.dim]
            vv = qkv[..., 2 * self.dim:]
            if shift:
                smask = jnp.asarray(_shift_attention_mask(h, w, ws, shift))
                mask = jnp.tile(smask, (b, 1, 1))
            else:
                mask = jnp.zeros((qq.shape[0], l, l), jnp.float32)
            drop = seed = None
            if train and self.attn_drop > 0.0:
                drop = 1.0 - self.attn_drop
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    1 << 23).astype(jnp.float32)
            out = window_attention(qq, kk, vv, rel_bias, mask,
                                   heads=self.num_heads, drop=drop,
                                   seed=seed)
        else:
            qkv = qkv.reshape(-1, ws * ws, 3, self.num_heads, head_dim)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

            attn = jnp.einsum("bhld,bhmd->bhlm", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = attn + rel_bias[None]

            if shift:
                smask = jnp.asarray(_shift_attention_mask(h, w, ws, shift))
                nw = smask.shape[0]
                attn = attn.reshape(-1, nw, self.num_heads, ws * ws, ws * ws)
                attn = attn + smask[None, :, None]
                attn = attn.reshape(-1, self.num_heads, ws * ws, ws * ws)

            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)

            out = jnp.einsum(
                "bhlm,bhmd->bhld", attn.astype(self.dtype), v,
                preferred_element_type=jnp.float32).astype(self.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, self.dim)
        out = nn.Dense(self.dim, kernel_init=_DENSE_INIT, dtype=self.dtype,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)

        out = window_reverse(out, ws, h, w)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.hidden, kernel_init=_DENSE_INIT, dtype=self.dtype,
                     name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out, kernel_init=_DENSE_INIT, dtype=self.dtype,
                     name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class SwinBlock(nn.Module):
    """LN → (S)W-MSA → residual+droppath → LN → MLP → residual
    (reference SwinTransformerBlock, swinunet.py:251-279)."""

    dim: int
    num_heads: int
    window_size: int
    shift: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y = WindowAttention(self.dim, self.window_size, self.num_heads,
                            self.shift, self.qkv_bias, self.attn_drop,
                            self.drop, self.use_pallas, self.dtype,
                            name="attn")(y, train)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                self.dtype, name="mlp")(y, train)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class PatchEmbedding(nn.Module):
    """Conv patchify to NHWC tokens (reference swinunet.py:27-49)."""

    patch_size: int = 4
    embed_dim: int = 96
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(p * p * x.shape[-1]),
                    name="proj")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x.astype(self.dtype)


class PatchMergingExact(nn.Module):
    """2x2 neighborhood concat in the reference's exact order
    ([0::2,0::2], [1::2,0::2], [0::2,1::2], [1::2,1::2]; swinunet.py:69-75)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, kernel_init=_DENSE_INIT,
                     dtype=self.dtype, name="reduction")(x)
        return x


class PatchExpanding(nn.Module):
    """Linear C→2C + 2x2 depth-to-space + LN over C/2 (reference swinunet.py:85-97)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = nn.Dense(2 * self.dim, use_bias=False, kernel_init=_DENSE_INIT,
                     dtype=self.dtype, name="expand")(x)
        x = x.reshape(b, h, w, 2, 2, self.dim // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2,
                                                  self.dim // 2)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)


class FinalPatchExpanding(nn.Module):
    """Linear C→p²C + pxp depth-to-space + LN (reference swinunet.py:100-111;
    p = patch_size, 4 for the 224 models, 2 for the LIDC variant,
    swinunet_LIDC.py:101-111)."""

    dim: int
    patch: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch
        x = nn.Dense(p * p * self.dim, use_bias=False, kernel_init=_DENSE_INIT,
                     dtype=self.dtype, name="expand")(x)
        x = x.reshape(b, h, w, p, p, self.dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, self.dim)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)


def _drop_path_rates(drop_path: float, depths: Sequence[int]):
    total = sum(depths)
    rates = np.linspace(0, drop_path, total)
    out, start = [], 0
    for d in depths:
        out.append(list(rates[start:start + d]))
        start += d
    return out


class SwinStage(nn.Module):
    """depth x SwinBlock (+ optional PatchMerging)
    (reference BasicBlock, swinunet.py:281-330)."""

    index: int
    embed_dim: int
    window_size: int
    depths: Sequence[int]
    num_heads: Sequence[int]
    mlp_ratio: float
    qkv_bias: bool
    drop_rate: float
    attn_drop_rate: float
    drop_path: float
    patch_merging: bool
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        dim = self.embed_dim * 2 ** self.index
        rates = _drop_path_rates(self.drop_path, self.depths)[self.index]
        for i in range(self.depths[self.index]):
            x = SwinBlock(dim, self.num_heads[self.index], self.window_size,
                          shift=(i % 2 == 1), mlp_ratio=self.mlp_ratio,
                          qkv_bias=self.qkv_bias, drop=self.drop_rate,
                          attn_drop=self.attn_drop_rate,
                          drop_path=float(rates[i]),
                          use_pallas=self.use_pallas, dtype=self.dtype,
                          name=f"block{i}")(x, train)
        if self.patch_merging:
            x = PatchMergingExact(dim, self.dtype, name="downsample")(x)
        return x


class SwinStageUp(nn.Module):
    """decoder stage (reference BasicBlockUp, swinunet.py:333-380):
    index remapped to len(depths)-index-2."""

    index: int
    embed_dim: int
    window_size: int
    depths: Sequence[int]
    num_heads: Sequence[int]
    mlp_ratio: float
    qkv_bias: bool
    drop_rate: float
    attn_drop_rate: float
    drop_path: float
    patch_expanding: bool
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        idx = len(self.depths) - self.index - 2
        dim = self.embed_dim * 2 ** idx
        rates = _drop_path_rates(self.drop_path, self.depths)[idx]
        for i in range(self.depths[idx]):
            x = SwinBlock(dim, self.num_heads[idx], self.window_size,
                          shift=(i % 2 == 1), mlp_ratio=self.mlp_ratio,
                          qkv_bias=self.qkv_bias, drop=self.drop_rate,
                          attn_drop=self.attn_drop_rate,
                          drop_path=float(rates[i]),
                          use_pallas=self.use_pallas, dtype=self.dtype,
                          name=f"block{i}")(x, train)
        if self.patch_expanding:
            x = PatchExpanding(dim, self.dtype, name="upsample")(x)
        return x


class SwinUNetEncoder(nn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    window_size: int = 7
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = PatchEmbedding(self.patch_size, self.embed_dim, True, self.dtype,
                           name="patch_embed")(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        feats = []
        n = len(self.depths)
        for i in range(n):
            if i != n - 1:
                feats.append(x)
            x = SwinStage(i, self.embed_dim, self.window_size, self.depths,
                          self.num_heads, self.mlp_ratio, self.qkv_bias,
                          self.drop_rate, self.attn_drop_rate,
                          self.drop_path_rate, patch_merging=(i != n - 1),
                          use_pallas=self.use_pallas, dtype=self.dtype,
                          name=f"layer{i}")(x, train)
        feats.append(x)
        return feats


class SwinUNetDecoder(nn.Module):
    num_classes: int
    embed_dim: int = 96
    window_size: int = 7
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_size: int = 4
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool):
        n = len(self.depths)
        x = PatchExpanding(self.embed_dim * 2 ** (n - 1), self.dtype,
                           name="first_patch_expanding")(feats[-1])
        for i in range(n - 1):
            skip = feats[len(feats) - i - 2]
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            dim = self.embed_dim * 2 ** (n - 2 - i)
            x = nn.Dense(dim, kernel_init=_DENSE_INIT, dtype=self.dtype,
                         name=f"skip{i}")(x)
            x = SwinStageUp(i, self.embed_dim, self.window_size, self.depths,
                            self.num_heads, self.mlp_ratio, self.qkv_bias,
                            self.drop_rate, self.attn_drop_rate,
                            self.drop_path_rate,
                            patch_expanding=(i < n - 2),
                            use_pallas=self.use_pallas, dtype=self.dtype,
                            name=f"layer_up{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_up")(x)
        x = FinalPatchExpanding(self.embed_dim, self.patch_size, self.dtype,
                                name="final_patch_expanding")(x)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                    kernel_init=TORCH_KERNEL_INIT,
                    dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)


class SwinUNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 4
    patch_size: int = 4
    embed_dim: int = 96
    window_size: int = 7
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.1
    drop_path_rate: float = 0.2
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(patch_size=self.patch_size, embed_dim=self.embed_dim,
                  window_size=self.window_size, depths=self.depths,
                  num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                  qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
                  attn_drop_rate=self.attn_drop_rate,
                  drop_path_rate=self.drop_path_rate,
                  use_pallas=self.use_pallas, dtype=self.dtype)
        self.encoder = SwinUNetEncoder(**kw)
        self.decoder = SwinUNetDecoder(num_classes=self.num_classes, **kw)

    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        return self.decoder(self.encoder(x, train), train)

    def val(self, x):
        return self(x, train=False)


class SwinUNetPlus(SwinUNet):
    """SwinUNet + DenseCL necks (reference SwinUnet_Plus, swinunet.py:690-718)."""

    def setup(self):
        super().setup()
        self.dense_projection_high = ProjectionNeck(
            hid_dim=2048, out_dim=128, s=4, dtype=self.dtype)
        self.dense_projection_head = ProjectionNeck(
            hid_dim=1024, out_dim=128, s=4, dtype=self.dtype)

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


def build_swinunet(name: str, img_size: int, in_channels: int,
                   num_classes: int, dtype=jnp.float32):
    """reference get_swinunet / get_swinunet_plus (swinunet.py:720-779) and
    get_swinunet_LIDC (swinunet_LIDC.py: 96x96 variant, window 6)."""
    patch_size = 4
    if name == "swinunet_lidc":
        # LIDC variant: patch 2 + small windows (swinunet_LIDC.py:619-645)
        patch_size = 2
        if img_size == 96:
            window_size = 3
        elif img_size == 64:
            window_size = 4
        else:
            raise NotImplementedError(f"LIDC img_size {img_size}")
    elif img_size == 224:
        window_size = 7
    elif img_size == 256:
        window_size = 8
    else:
        raise NotImplementedError(f"img_size {img_size}")
    cls = SwinUNetPlus if name.endswith("plus") else SwinUNet
    use_pallas = jax.default_backend() not in ("cpu",)
    return cls(in_channels=in_channels, num_classes=num_classes,
               patch_size=patch_size, window_size=window_size,
               use_pallas=use_pallas, dtype=dtype)
