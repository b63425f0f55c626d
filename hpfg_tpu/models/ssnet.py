"""SS-Net model (reference: model/ss_net.py).

UNet encoder/decoder where the decoder also returns its last 16-channel
feature map (ss_net.py:108-114), plus:
  * projection_head / prediction_head MLPs 16→32→32 with BatchNorm1d
    (ss_net.py:129-143)
  * per-class selector MLPs `contrastive_class_selector_{c}` and
    `..._memory{c}` 32→32→1 with LeakyReLU(0.2) (ss_net.py:144-158)

__call__ returns (logits, last_feature) with NHWC feature maps.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hpfg_tpu.models.unet import UNetEncoder
from hpfg_tpu.models.layers import UpBlock


class SSNetDecoder(nn.Module):
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

    def __call__(self, feature, train: bool):
        x0, x1, x2, x3, x4 = feature
        x = self.up1(x4, x3, train)
        x = self.up2(x, x2, train)
        x = self.up3(x, x1, train)
        x_last = self.up4(x, x0, train)
        return self.out_conv(x_last).astype(jnp.float32), x_last


class MLPHead(nn.Module):
    """Linear-BN-ReLU-Linear head over [N, F] rows (torch BatchNorm1d)."""

    hidden: int
    out: int
    negative_slope: float = 0.0  # 0 → plain ReLU
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from hpfg_tpu.models.layers import TORCH_KERNEL_INIT, torch_bias_init

        x = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=TORCH_KERNEL_INIT,
                     bias_init=torch_bias_init(x.shape[-1]))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(x)
        if self.negative_slope:
            x = jax.nn.leaky_relu(x, self.negative_slope)
        else:
            x = jax.nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype,
                        kernel_init=TORCH_KERNEL_INIT,
                        bias_init=torch_bias_init(self.hidden))(x)


class SSNet(nn.Module):
    in_channels: int = 1
    num_classes: int = 4
    feature_chns: Sequence[int] = (16, 32, 64, 128, 256)
    dropout: Sequence[float] = (0.05, 0.1, 0.2, 0.3, 0.5)
    feat_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = UNetEncoder(self.feature_chns[0], self.feature_chns,
                                   self.dropout, self.dtype)
        self.decoder = SSNetDecoder(self.num_classes, self.feature_chns,
                                    self.dtype)
        self.projection_head = MLPHead(self.feat_dim, self.feat_dim,
                                       dtype=self.dtype)
        self.prediction_head = MLPHead(self.feat_dim, self.feat_dim,
                                       dtype=self.dtype)
        self.selectors = [
            MLPHead(self.feat_dim, 1, negative_slope=0.2, dtype=self.dtype,
                    name=f"contrastive_class_selector_{c}")
            for c in range(self.num_classes)]
        self.selectors_memory = [
            MLPHead(self.feat_dim, 1, negative_slope=0.2, dtype=self.dtype,
                    name=f"contrastive_class_selector_memory{c}")
            for c in range(self.num_classes)]

    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        feature = self.encoder(x, train)
        logits, last = self.decoder(feature, train)
        return logits, last

    def val(self, x):
        return self(x, train=False)[0]

    def init_all(self, x, train: bool = True):
        """Initialization entry point that touches EVERY submodule — flax
        lazy-creates parameters per method, and the projection/prediction/
        selector heads are only reached through their own methods during
        training (reference heads: ss_net.py:129-158)."""
        logits, feat = self(x, train=train)
        rows = feat.reshape(-1, feat.shape[-1])[:2]
        p = self.project(rows, train)
        q = self.predict(p, train)
        for c in range(self.num_classes):
            self.select(c, q, train)
            self.select_memory(c, q, train)
        return logits, feat

    # --- heads as callable methods (reference forward_projection_head etc.)
    def project(self, features, train: bool = False):
        return self.projection_head(features.astype(self.dtype), train)

    def predict(self, features, train: bool = False):
        return self.prediction_head(features.astype(self.dtype), train)

    def select(self, c: int, features, train: bool = False):
        return self.selectors[c](features.astype(self.dtype), train)

    def select_memory(self, c: int, features, train: bool = False):
        return self.selectors_memory[c](features.astype(self.dtype), train)
