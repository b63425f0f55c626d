"""Swin-MAE — masked-autoencoder pretraining of a Swin encoder
(reference: model/swin_mae.py:560-810).

Config (reference swin_mae(), swin_mae.py:803-810): img 224, patch 4,
depths (2, 2, 2, 2), embed 96, heads (3, 6, 12, 24), window 7,
decoder_embed_dim 768 (= bottleneck 8·96), drop path 0.1.

Window masking (reference swin_mae.py:649-705): adjacent r×r = 4×4 patch
windows are masked together; a uniform-noise argsort keeps
(1 − mask_ratio)·d² windows and fills the rest with a learned mask token.
TPU redesign: instead of argsort + per-sample numpy setdiff1d loops, the kept
window ids scatter into a binary keep mask and a single `where` applies the
mask token — fixed shapes, no host round-trip, jit/vmap friendly, identical
distribution.

`__call__` returns (reconstruction, mask) unpatchified to image space
(reference swin_mae.py:793-800); the trainer computes
mean((pred − img)²·mask)/mask_ratio (reference 2022_12_CVPR_Swin-MAE.py:112).

A fixed 2-D sin-cos positional table is kept for parity with the reference's
initialization (swin_mae.py:27-79, 604-605) — note the reference never adds
it to the tokens in forward_encoder (swin_mae.py:751-758), and neither do we.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.models.swinunet import (
    PatchEmbedding,
    PatchExpanding,
    SwinStage,
    SwinStageUp,
)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Fixed sin-cos table (reference swin_mae.py:27-79)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (reference order)
    grid = np.stack(grid).reshape(2, -1)
    emb = np.concatenate([_1d(embed_dim // 2, grid[0]),
                          _1d(embed_dim // 2, grid[1])], axis=1)
    return emb.astype(np.float32)


class SwinMAE(nn.Module):
    in_channels: int = 3
    img_size: int = 224
    patch_size: int = 4
    mask_ratio: float = 0.75
    embed_dim: int = 96
    decoder_embed_dim: int = 768
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    norm_pix_loss: bool = False
    mask_window: int = 4  # r: r*r patches masked together
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    def setup(self):
        self.patch_embed = PatchEmbedding(self.patch_size, self.embed_dim,
                                          True, self.dtype)
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim),
            jnp.float32)
        self.pos_embed = jnp.asarray(get_2d_sincos_pos_embed(
            self.embed_dim, self.grid))  # kept-but-unused, see module doc
        n = len(self.depths)
        kw = dict(embed_dim=self.embed_dim, window_size=self.window_size,
                  depths=self.depths, num_heads=self.num_heads,
                  mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                  drop_rate=self.drop_rate,
                  attn_drop_rate=self.attn_drop_rate,
                  drop_path=self.drop_path_rate,
                  use_pallas=self.use_pallas, dtype=self.dtype)
        self.layers = [SwinStage(index=i, patch_merging=(i != n - 1),
                                 name=f"layer{i}", **kw)
                       for i in range(n)]
        self.first_patch_expanding = PatchExpanding(self.decoder_embed_dim,
                                                    self.dtype)
        self.layers_up = [SwinStageUp(index=i,
                                      patch_expanding=(i < n - 2),
                                      name=f"layer_up{i}", **kw)
                          for i in range(n - 1)]
        self.norm_up = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        # Reference init (model/swin_mae.py:608-618): Linear weights
        # xavier_uniform + zero bias; mask_token normal(.02). The swin
        # blocks shared with swinunet keep that file's trunc_normal(.02)
        # Linear init — a documented deviation (the reference's own two
        # files disagree; both are ~N(0, small) draws).
        self.decoder_pred = nn.Dense(
            self.patch_size ** 2 * self.in_channels,
            kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype)

    # ------------------------------------------------------------------
    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """NHWC [N, H, W, C] → [N, L, p²·C] (reference swin_mae.py:622-633)."""
        n, h, w, c = imgs.shape
        p = self.patch_size
        x = imgs.reshape(n, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, (h // p) * (w // p), p * p * c)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        """[N, L, p²·C] → NHWC (reference swin_mae.py:635-647)."""
        n, l, _ = x.shape
        p = self.patch_size
        g = int(round(l ** 0.5))
        x = x.reshape(n, g, g, p, p, self.in_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, g * p, g * p, self.in_channels)

    def window_masking(self, x: jnp.ndarray, rng: jax.Array):
        """x: [B, H, W, C] tokens → (masked tokens, mask [B, L])."""
        b, h, w, c = x.shape
        l = h * w
        r = self.mask_window
        d = h // r
        keep_windows = int(d * d * (1.0 - self.mask_ratio))

        noise = jax.random.uniform(rng, (b, d * d))
        sparse_shuffle = jnp.argsort(noise, axis=1)
        sparse_keep = sparse_shuffle[:, :keep_windows]  # [B, keep]

        # top-left patch index of each kept window, then all r² offsets
        part = (sparse_keep // d) * d * r * r + (sparse_keep % d) * r
        offsets = jnp.asarray([h * i + j for i in range(r)
                               for j in range(r)], jnp.int32)
        index_keep = (part[:, :, None] + offsets[None, None, :]).reshape(b, -1)

        keep_mask = jax.vmap(
            lambda idx: jnp.zeros((l,), jnp.float32).at[idx].set(1.0)
        )(index_keep)  # [B, L], 1 = keep

        tokens = x.reshape(b, l, c)
        mask_token = self.mask_token.astype(tokens.dtype)
        x_masked = jnp.where(keep_mask[:, :, None] > 0, tokens, mask_token)
        return x_masked.reshape(b, h, w, c), 1.0 - keep_mask

    # ------------------------------------------------------------------
    def forward_encoder(self, x: jnp.ndarray, rng: jax.Array, train: bool):
        x = self.patch_embed(x)
        x, mask = self.window_masking(x, rng)
        for layer in self.layers:
            x = layer(x, train)
        return x, mask

    def forward_decoder(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = self.first_patch_expanding(x)
        for layer in self.layers_up:
            x = layer(x, train)
        x = self.norm_up(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        return self.decoder_pred(x.astype(self.dtype)).astype(jnp.float32)

    def forward_loss(self, imgs, pred, mask) -> jnp.ndarray:
        """Masked per-patch MSE (reference swin_mae.py:775-791; the entry
        script uses its own image-space variant, 2022_12…py:112)."""
        target = self.patchify(imgs.astype(jnp.float32))
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)
        rng = self.make_rng("mask") if train else jax.random.PRNGKey(0)
        latent, mask = self.forward_encoder(x, rng, train)
        pred = self.forward_decoder(latent, train)
        pred_img = self.unpatchify(pred)
        mask_img = self.unpatchify(
            jnp.repeat(mask[:, :, None],
                       self.patch_size ** 2 * self.in_channels, axis=-1))
        return pred_img, mask_img
