"""UNet family (reference: model/unet.py, model/unet_large.py, model/unet_LIDC.py).

Five-level UNet with channels [16, 32, 64, 128, 256], LeakyReLU + BatchNorm,
encoder dropout schedule [0.05, 0.1, 0.2, 0.3, 0.5], bilinear(align_corners)
decoder upsampling, 3x3 output head (reference: model/unet.py:155-175).

`UNetPlus` adds the two DenseCL projection necks: one on the 256-channel
bottleneck (hid 2048) and one on the logits head (hid 1024)
(reference: model/unet.py:178-206); forward returns
(logits, (g_high, d_high), (g_head, d_head)) and `.val` returns logits only.

TPU-first: NHWC, bfloat16-capable compute dtype, all shapes static.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from hpfg_tpu.models.layers import ConvBlock, DownBlock, ProjectionNeck, UpBlock


class UNetEncoder(nn.Module):
    in_conv_features: int = 16
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert len(self.feature_chns) == 5
        ft, dp = self.feature_chns, self.dropout
        self.in_conv = ConvBlock(ft[0], dp[0], self.dtype)
        self.down1 = DownBlock(ft[1], dp[1], self.dtype)
        self.down2 = DownBlock(ft[2], dp[2], self.dtype)
        self.down3 = DownBlock(ft[3], dp[3], self.dtype)
        self.down4 = DownBlock(ft[4], dp[4], self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool) -> list[jnp.ndarray]:
        x0 = self.in_conv(x, train)
        x1 = self.down1(x0, train)
        x2 = self.down2(x1, train)
        x3 = self.down3(x2, train)
        x4 = self.down4(x3, train)
        return [x0, x1, x2, x3, x4]


class UNetDecoder(nn.Module):
    num_classes: int
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ft = self.feature_chns
        self.up1 = UpBlock(ft[3], ft[3], 0.0, self.dtype)
        self.up2 = UpBlock(ft[2], ft[2], 0.0, self.dtype)
        self.up3 = UpBlock(ft[1], ft[1], 0.0, self.dtype)
        self.up4 = UpBlock(ft[0], ft[0], 0.0, self.dtype)
        from hpfg_tpu.models.layers import TORCH_KERNEL_INIT, torch_bias_init

        self.out_conv = nn.Conv(self.num_classes, (3, 3), padding="SAME",
                                kernel_init=TORCH_KERNEL_INIT,
                                bias_init=torch_bias_init(9 * ft[0]),
                                dtype=self.dtype)

    def forward_feature(self, feature: list[jnp.ndarray], train: bool) -> jnp.ndarray:
        x0, x1, x2, x3, x4 = feature
        x = self.up1(x4, x3, train)
        x = self.up2(x, x2, train)
        x = self.up3(x, x1, train)
        return self.up4(x, x0, train)

    def __call__(self, feature: list[jnp.ndarray], train: bool) -> jnp.ndarray:
        x = self.forward_feature(feature, train)
        # logits in float32 for numerically stable losses
        return self._head(x).astype(jnp.float32)

    def _head(self, x: jnp.ndarray) -> jnp.ndarray:
        """3x3 logits head. On TPU at the fused stages this dispatches to
        the packed plain-conv kernel with F padded 4->16 (sliced back) —
        an XLA head conv anchors batch-in-lanes layouts at 224² and costs
        ~1 ms/step in transpose copies around the Pallas boundaries
        (round-3 profile, BENCH_NOTES.md)."""
        from hpfg_tpu.models.layers import use_plain_fused

        b, h, w, c = x.shape
        f = self.num_classes
        if not self.is_initializing() and use_plain_fused(h, w, c, f):
            import jax

            from hpfg_tpu.ops.pallas import conv_block as cb

            p = self.get_variable("params", "out_conv")
            # fused_conv3x3_plain pads C/F to the 16-lane alignment and
            # slices the output back itself — no caller-side padding
            return cb.fused_conv3x3_plain(x.astype(self.dtype),
                                          p["kernel"].astype(self.dtype),
                                          p["bias"],
                                          jax.default_backend() != "tpu")
        return self.out_conv(x)


class UNet(nn.Module):
    """Plain UNet: logits [B, H, W, C] (reference UNet, model/unet.py:155-175)."""

    in_channels: int = 1
    num_classes: int = 4
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = UNetEncoder(self.feature_chns[0], self.feature_chns,
                                   self.dropout, self.dtype)
        self.decoder = UNetDecoder(self.num_classes, self.feature_chns,
                                   self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        return self.decoder(self.encoder(x, train), train)

    def val(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x, train=False)


class UNetPlus(nn.Module):
    """UNet + DenseCL projection necks (reference UNet_Plus, model/unet.py:178-206).

    __call__ returns (logits, (g_high, d_high), (g_head, d_head)).
    """

    in_channels: int = 1
    num_classes: int = 4
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = UNetEncoder(self.feature_chns[0], self.feature_chns,
                                   self.dropout, self.dtype)
        self.decoder = UNetDecoder(self.num_classes, self.feature_chns,
                                   self.dtype)
        self.dense_projection_high = ProjectionNeck(hid_dim=2048, out_dim=128,
                                                    s=4, dtype=self.dtype)
        self.dense_projection_head = ProjectionNeck(hid_dim=1024, out_dim=128,
                                                    s=4, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)
        feature = self.encoder(x, train)
        logits = self.decoder(feature, train)
        high = self.dense_projection_high(feature[-1])
        head = self.dense_projection_head(logits.astype(self.dtype))
        return logits, high, head

    def val(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        return self.decoder(self.encoder(x, False), False)


class DoubleConvLarge(nn.Module):
    """conv-BN-ReLU-dropout-conv-BN-ReLU with bias-free convs and an
    optional mid-channel bottleneck (reference DoubleConv,
    model/unet_large.py:7-19 — ReLU, unlike the small UNet's LeakyReLU)."""

    out: int
    mid: int | None = None
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        import jax

        from hpfg_tpu.models.layers import TORCH_KERNEL_INIT

        mid = self.out if self.mid is None else self.mid
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=TORCH_KERNEL_INIT, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = jax.nn.relu(x).astype(self.dtype)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        x = nn.Conv(self.out, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=TORCH_KERNEL_INIT, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn2")(x)
        return jax.nn.relu(x).astype(self.dtype)


class UNetLarge(nn.Module):
    """reference UNet_Large (model/unet_large.py:62-97): bias-free ReLU
    DoubleConvs, a factor-2 bottleneck (down4 emits base_c*8, not *16,
    when bilinear), up path = bilinear(align_corners) x2 upsample →
    pad-to-skip → concat([skip, x]) → DoubleConv(out, mid=concat//2)
    with NO 1x1 conv (unet_large.py:30-52), and a 1x1 logits head.
    builder.py:37-38 instantiates base_c=32; the unregistered
    unet_large_LIDC.py variant is the same topology at base_c=64."""

    in_channels: int = 1
    num_classes: int = 4
    base_c: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from hpfg_tpu.models.layers import (TORCH_KERNEL_INIT,
                                            resize_bilinear_align_corners,
                                            torch_bias_init)

        x = x.astype(self.dtype)
        c = self.base_c
        x1 = DoubleConvLarge(c, dtype=self.dtype, name="in_conv")(x, train)
        feats, y = [x1], x1
        for i, out in enumerate((c * 2, c * 4, c * 8, c * 8), start=1):
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            y = DoubleConvLarge(out, dtype=self.dtype,
                                name=f"down{i}")(y, train)
            feats.append(y)

        x1, x2, x3, x4, y = feats
        for i, (skip, out) in enumerate(
                zip((x4, x3, x2, x1), (c * 4, c * 2, c, c)), start=1):
            y = resize_bilinear_align_corners(
                y, (y.shape[1] * 2, y.shape[2] * 2))
            dy = skip.shape[1] - y.shape[1]
            dx = skip.shape[2] - y.shape[2]
            if dy or dx:  # odd-size inputs (reference F.pad, :43-49)
                y = jnp.pad(y, ((0, 0), (dy // 2, dy - dy // 2),
                                (dx // 2, dx - dx // 2), (0, 0)))
            y = jnp.concatenate([skip.astype(y.dtype), y], axis=-1)
            y = DoubleConvLarge(out, mid=y.shape[-1] // 2, dtype=self.dtype,
                                name=f"up{i}")(y, train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=TORCH_KERNEL_INIT,
                         bias_init=torch_bias_init(c), dtype=self.dtype,
                         name="out_conv")(y)
        return logits.astype(jnp.float32)

    def val(self, x: jnp.ndarray) -> jnp.ndarray:
        return self(x, train=False)


class UNetLIDC(UNet):
    """UNet sized for LIDC binary masks (reference UNet_LIDC,
    model/unet_LIDC.py:131-155): same topology, in_channels=3, 1-class-style
    binary head handled by num_classes."""
