"""UCTransNet — UNet with a channel-wise cross-scale transformer
(reference: model/UCTransNet.py; shipped unregistered in the reference,
registered here as `uctransnet` for completeness).

Structure (reference UCTransNet, UCTransNet.py:465-506): conv-BN-ReLU UNet
encoder (64·[1,2,4,8,8]); the four skip features go through the
ChannelTransformer (CCT): per-scale patch embeddings to a common token grid
(patch sizes [16, 8, 4, 2] → same n_patches), 4 Block_ViT layers of
channel-wise multi-head cross attention against the concatenated 960-channel
KV (UCTransNet.py:75-209), then per-scale reconstruction convs upsample back;
decoder uses CCA channel-attention gated skips (UCTransNet.py:423-463) and a
sigmoid head (deep_supervision flag kept for API parity).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn_relu(x, train, dtype, name):
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=jnp.float32, name=name)(x)
    return jax.nn.relu(x).astype(dtype)


class ConvBatchNorm(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        return _bn_relu(x, train, self.dtype, "norm")


class NConvs(nn.Module):
    features: int
    n: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.n):
            x = ConvBatchNorm(self.features, self.dtype, name=f"conv{i}")(x, train)
        return x


class ChannelAttentionOrg(nn.Module):
    """Channel-wise multi-head cross attention (reference Attention_org,
    UCTransNet.py:75-209). Tokens [B, N, C_i] attend over CHANNELS: queries
    are per-scale channel vectors, keys/values come from the 960-channel
    concatenation; `psi` is a per-(sample, head) instance norm on the score
    map."""

    channel_num: Sequence[int]
    num_heads: int = 4
    kv_size: int = 960
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embs, emb_all, train: bool):
        outs = []
        ks = [nn.Dense(self.kv_size, use_bias=False, dtype=self.dtype,
                       name=f"key_{h}")(emb_all) for h in range(self.num_heads)]
        vs = [nn.Dense(self.kv_size, use_bias=False, dtype=self.dtype,
                       name=f"value_{h}")(emb_all) for h in range(self.num_heads)]
        k = jnp.stack(ks, axis=1)  # [B, H, N, 960]
        v = jnp.stack(vs, axis=1)
        for i, emb in enumerate(embs):
            qs = [nn.Dense(self.channel_num[i], use_bias=False,
                           dtype=self.dtype, name=f"query{i}_{h}")(emb)
                  for h in range(self.num_heads)]
            q = jnp.stack(qs, axis=1)  # [B, H, N, C_i]
            q = q.transpose(0, 1, 3, 2)  # [B, H, C_i, N]
            scores = jnp.einsum("bhcn,bhnk->bhck", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(float(self.kv_size))
            # psi: InstanceNorm2d over (C_i, 960) per (B, head), no affine
            mean = scores.mean(axis=(2, 3), keepdims=True)
            var = scores.var(axis=(2, 3), keepdims=True)
            scores = (scores - mean) * jax.lax.rsqrt(var + 1e-5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhck,bhnk->bhcn", probs.astype(self.dtype), v,
                             preferred_element_type=jnp.float32)
            ctx = jnp.mean(ctx, axis=1)  # mean over heads → [B, C_i, N]
            ctx = ctx.transpose(0, 2, 1).astype(self.dtype)  # [B, N, C_i]
            out = nn.Dense(self.channel_num[i], use_bias=False,
                           dtype=self.dtype, name=f"out{i}")(ctx)
            outs.append(out)
        return outs


class BlockViT(nn.Module):
    channel_num: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embs, train: bool):
        normed = [nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                               name=f"attn_norm{i}")(e).astype(self.dtype)
                  for i, e in enumerate(embs)]
        emb_all = jnp.concatenate(normed, axis=-1)
        emb_all = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                               name="attn_norm_all")(emb_all).astype(self.dtype)
        attn_out = ChannelAttentionOrg(self.channel_num, dtype=self.dtype,
                                       name="channel_attn")(normed, emb_all,
                                                            train)
        embs = [e + a for e, a in zip(embs, attn_out)]
        outs = []
        for i, e in enumerate(embs):
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name=f"ffn_norm{i}")(e).astype(self.dtype)
            y = nn.Dense(self.channel_num[i] * 4, dtype=self.dtype,
                         name=f"ffn{i}_fc1")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dense(self.channel_num[i], dtype=self.dtype,
                         name=f"ffn{i}_fc2")(y)
            outs.append(e + y)
        return outs


class ChannelTransformer(nn.Module):
    """reference ChannelTransformer (UCTransNet.py:330-370)."""

    channel_num: Sequence[int]
    patch_sizes: Sequence[int]
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool):
        embs, grids = [], []
        for i, (f, p) in enumerate(zip(feats, self.patch_sizes)):
            e = nn.Conv(self.channel_num[i], (p, p), strides=(p, p),
                        dtype=self.dtype, name=f"patch_embed{i}")(f)
            g = e.shape[1]
            grids.append(g)
            e = e.reshape(e.shape[0], g * g, self.channel_num[i])
            pos = self.param(f"pos_embed{i}", nn.initializers.zeros,
                             (1, g * g, self.channel_num[i]), jnp.float32)
            e = e + pos.astype(e.dtype)
            e = nn.Dropout(0.1, deterministic=not train)(e)
            embs.append(e)
        for l in range(self.num_layers):
            embs = BlockViT(self.channel_num, self.dtype,
                            name=f"block{l}")(embs, train)
        embs = [nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name=f"encoder_norm{i}")(e).astype(self.dtype)
                for i, e in enumerate(embs)]
        outs = []
        for i, (e, p, g) in enumerate(zip(embs, self.patch_sizes, grids)):
            img = e.reshape(e.shape[0], g, g, self.channel_num[i])
            img = jnp.repeat(jnp.repeat(img, p, axis=1), p, axis=2)
            img = nn.Conv(self.channel_num[i], (1, 1), dtype=self.dtype,
                          name=f"reconstruct{i}")(img)
            img = _bn_relu(img, train, self.dtype, f"reconstruct_bn{i}")
            outs.append(feats[i] + img)  # residual (reference mtc usage)
        return outs


class CCA(nn.Module):
    """Channel-wise cross attention gate (reference CCA, UCTransNet.py:423-448)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x):
        ax = jnp.mean(x, axis=(1, 2))
        ag = jnp.mean(g, axis=(1, 2))
        att_x = nn.Dense(self.features, dtype=self.dtype, name="mlp_x")(ax)
        att_g = nn.Dense(self.features, dtype=self.dtype, name="mlp_g")(ag)
        scale = jax.nn.sigmoid(((att_x + att_g) / 2.0).astype(jnp.float32))
        return jax.nn.relu(x * scale[:, None, None, :].astype(x.dtype))


class UpBlockAttention(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        skip = CCA(skip.shape[-1], self.dtype, name="coatt")(up, skip)
        y = jnp.concatenate([skip, up], axis=-1)
        return NConvs(self.features, 2, self.dtype, name="nconvs")(y, train)


class UCTransNet(nn.Module):
    img_size: int = 224
    in_channels: int = 3
    num_classes: int = 1
    base: int = 64
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        c = self.base
        x1 = ConvBatchNorm(c, self.dtype, name="inc")(x, train)
        x2 = NConvs(c * 2, 2, self.dtype, name="down1")(
            nn.max_pool(x1, (2, 2), strides=(2, 2)), train)
        x3 = NConvs(c * 4, 2, self.dtype, name="down2")(
            nn.max_pool(x2, (2, 2), strides=(2, 2)), train)
        x4 = NConvs(c * 8, 2, self.dtype, name="down3")(
            nn.max_pool(x3, (2, 2), strides=(2, 2)), train)
        x5 = NConvs(c * 8, 2, self.dtype, name="down4")(
            nn.max_pool(x4, (2, 2), strides=(2, 2)), train)
        x1, x2, x3, x4 = ChannelTransformer(
            (c, c * 2, c * 4, c * 8), (16, 8, 4, 2), dtype=self.dtype,
            name="mtc")([x1, x2, x3, x4], train)
        y = UpBlockAttention(c * 4, self.dtype, name="up4")(x5, x4, train)
        y = UpBlockAttention(c * 2, self.dtype, name="up3")(y, x3, train)
        y = UpBlockAttention(c, self.dtype, name="up2")(y, x2, train)
        y = UpBlockAttention(c, self.dtype, name="up1")(y, x1, train)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="outc")(y)
        # reference applies a sigmoid head (UCTransNet.py:487, BCE-style)
        return jax.nn.sigmoid(y.astype(jnp.float32))

    def val(self, x):
        return self(x, train=False)
