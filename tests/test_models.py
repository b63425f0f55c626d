"""Model zoo golden-shape tests.

Heavy transformer compiles are expensive on this host, so each model runs
once at a small input; output contracts (shapes, tuple structure, val method)
are what's under test. 224-scale configs are covered by the TPU-side bench
and graft entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpfg_tpu.config import Config
from hpfg_tpu.models import build_model

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
        "mask": jax.random.PRNGKey(2)}


def _init_apply(model, x, train=False):
    variables = model.init(RNGS, x, train=train)
    rngs = {"dropout": jax.random.PRNGKey(3), "mask": jax.random.PRNGKey(4)}
    if train:
        out = model.apply(variables, x, train=True, rngs=rngs,
                          mutable=["batch_stats"])[0]
    else:
        out = model.apply(variables, x, train=False)
    return variables, out


class TestUNetFamily:
    def test_unet_shapes(self):
        cfg = Config(model="unet", in_channels=1, num_classes=4,
                     feature_chns=[4, 8, 16, 32, 64])
        m = build_model(cfg)
        x = jnp.zeros((2, 32, 32, 1))
        _, out = _init_apply(m, x)
        assert out.shape == (2, 32, 32, 4)
        assert out.dtype == jnp.float32

    def test_unet_plus_contract(self):
        cfg = Config(model="unet_plus", in_channels=1, num_classes=4,
                     feature_chns=[4, 8, 16, 32, 64])
        m = build_model(cfg)
        x = jnp.zeros((2, 32, 32, 1))
        variables, out = _init_apply(m, x)
        logits, high, head = out
        assert logits.shape == (2, 32, 32, 4)
        assert high[0].shape == (2, 128) and high[1].shape == (2, 16, 128)
        assert head[0].shape == (2, 128) and head[1].shape == (2, 16, 128)
        val = m.apply(variables, x, method=m.val)
        assert val.shape == (2, 32, 32, 4)

    def test_param_structure_has_encoder_decoder(self):
        """HPFG's backbone EMA requires top-level encoder/decoder keys
        (reference main.py:68-76)."""
        cfg = Config(model="unet_plus", in_channels=1, num_classes=4,
                     feature_chns=[4, 8, 16, 32, 64])
        m = build_model(cfg)
        variables = m.init(RNGS, jnp.zeros((1, 32, 32, 1)), train=False)
        keys = set(variables["params"].keys())
        assert {"encoder", "decoder", "dense_projection_high",
                "dense_projection_head"} <= keys

    def test_full_size_unet_param_count(self):
        """Reference UNet channel plan [16,32,64,128,256] ≈ 1.8M params."""
        cfg = Config(model="unet", in_channels=1, num_classes=4)
        m = build_model(cfg)
        variables = m.init(RNGS, jnp.zeros((1, 32, 32, 1)), train=False)
        n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
        assert 1.5e6 < n < 2.5e6


class TestSSNet:
    def test_outputs_and_heads(self):
        cfg = Config(model="ssnet", in_channels=1, num_classes=4,
                     feature_chns=[4, 8, 16, 32, 64])
        from hpfg_tpu.models.ssnet import SSNet

        m = SSNet(in_channels=1, num_classes=4,
                  feature_chns=(4, 8, 16, 32, 64))
        x = jnp.zeros((2, 32, 32, 1))
        variables = m.init(RNGS, x, train=False, method=m.init_all)
        logits, feat = m.apply(variables, x, train=False)
        assert logits.shape == (2, 32, 32, 4)
        assert feat.shape == (2, 32, 32, 4)  # first feature channel count
        rows = jnp.zeros((7, 4))
        proj = m.apply(variables, rows, train=False, method=m.project)
        assert proj.shape == (7, 32)
        pred = m.apply(variables, proj, train=False, method=m.predict)
        assert pred.shape == (7, 32)
        sel = m.apply(variables, 0, pred, train=False, method=m.select)
        assert sel.shape == (7, 1)


class TestSwinMAE:
    def test_reconstruction_and_mask(self):
        from hpfg_tpu.models.swin_mae import SwinMAE

        # geometry: patch 4 → grid 16; stages 16/8/4/2 with window 2
        m = SwinMAE(in_channels=1, img_size=64, window_size=2,
                    mask_ratio=0.75, embed_dim=8, decoder_embed_dim=64,
                    num_heads=(1, 2, 4, 8))
        x = jnp.ones((2, 64, 64, 1))
        variables = m.init(RNGS, x, train=True)
        pred, mask = m.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(3),
                                   "mask": jax.random.PRNGKey(4)})
        assert pred.shape == x.shape and mask.shape == x.shape
        # 16x16 patch grid, 4x4 mask windows → 4 of 16 windows kept
        ratio = float(np.asarray(mask).mean())
        assert ratio == pytest.approx(0.75, abs=0.01)

    def test_patchify_roundtrip(self):
        from hpfg_tpu.models.swin_mae import SwinMAE

        m = SwinMAE(in_channels=1, img_size=64, window_size=2, embed_dim=8,
                    decoder_embed_dim=64, num_heads=(1, 2, 4, 8))
        x = jnp.arange(2 * 64 * 64, dtype=jnp.float32).reshape(2, 64, 64, 1)
        m_bound = m.bind(m.init(RNGS, jnp.zeros((1, 64, 64, 1)),
                                train=False))
        np.testing.assert_allclose(
            np.asarray(m_bound.unpatchify(m_bound.patchify(x))),
            np.asarray(x))


@pytest.mark.parametrize("name,size,chans", [
    ("segformer", 32, 3),
    ("resunet", 32, 3),
    ("resunet_plusplus", 32, 3),
    ("transunet", 32, 3),
    ("cmt", 32, 3),
    ("uniformer_plus", 32, 3),
])
class TestSmallZoo:
    def test_forward(self, name, size, chans):
        cfg = Config(model=name, in_channels=chans, num_classes=2,
                     train_crop_size=[size, size])
        m = build_model(cfg)
        x = jnp.zeros((1, size, size, chans))
        _, out = _init_apply(m, x)
        if isinstance(out, tuple):  # *_plus contract
            out = out[0]
        assert out.shape == (1, size, size, 2)


class TestUCTransNet:
    def test_forward_sigmoid_head(self):
        cfg = Config(model="uctransnet", in_channels=3, num_classes=1,
                     train_crop_size=[32, 32])
        m = build_model(cfg)
        x = jnp.zeros((1, 32, 32, 3))
        _, out = _init_apply(m, x)
        assert out.shape == (1, 32, 32, 1)
        arr = np.asarray(out)
        assert arr.min() >= 0.0 and arr.max() <= 1.0  # sigmoid head


class TestReferenceInitParity:
    """Init distributions must match each reference file's rules
    (PARITY_TRAIN.md 'Init-distribution fix'): a silent revert to flax
    defaults (lecun_normal, zero bias) re-opens the measured dice gap."""

    def test_unet_torch_default_init(self):
        from hpfg_tpu.models.unet import UNet

        m = UNet(in_channels=1, num_classes=4)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 32, 32, 1)), train=True)
        k = np.asarray(
            v["params"]["encoder"]["in_conv"]["conv2"]["kernel"])
        b = np.asarray(v["params"]["encoder"]["in_conv"]["conv2"]["bias"])
        fan_in = 9 * k.shape[2]
        bound = 1.0 / np.sqrt(fan_in)
        # kaiming_uniform(a=sqrt(5)): U(+-bound); uniform std = bound/sqrt(3)
        assert np.abs(k).max() <= bound + 1e-6
        assert k.std() == pytest.approx(bound / np.sqrt(3), rel=0.25)
        # torch bias init is ALSO U(+-bound) — flax's zeros would fail here
        assert np.abs(b).max() > 0.2 * bound
        assert np.abs(b).max() <= bound + 1e-6

    def test_swinunet_trunc_normal_dense(self):
        from hpfg_tpu.models.swinunet import Mlp

        m = Mlp(hidden=384, out=96)
        v = m.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((2, 49, 96)), train=False)
        k = np.asarray(v["params"]["fc1"]["kernel"])
        b = np.asarray(v["params"]["fc1"]["bias"])
        # reference init_weights: trunc_normal(std=.02) weight, zero bias
        assert k.std() == pytest.approx(0.02, rel=0.2)
        assert np.all(b == 0)

    def test_cmt_torch_default_init(self):
        """Reference CMT defines _init_weights but never self.apply's it
        (model/cmt.py — only uniformer.py:290 applies), so every Linear/
        Conv2d keeps torch defaults: kaiming_uniform(a=sqrt(5)) kernel +
        uniform(+-1/sqrt(fan_in)) bias."""
        from hpfg_tpu.models.cmt import CMTAttention

        m = CMTAttention(dim=64, num_heads=2, sr_ratio=1)
        v = m.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 8, 8, 64)),
                   jnp.zeros((2, 64, 64)), train=False)
        k = np.asarray(v["params"]["q"]["kernel"])
        b = np.asarray(v["params"]["q"]["bias"])
        bound = 1.0 / np.sqrt(k.shape[0])
        assert np.abs(k).max() <= bound + 1e-6
        assert k.std() == pytest.approx(bound / np.sqrt(3), rel=0.25)
        assert np.abs(b).max() > 0.2 * bound
        assert np.abs(b).max() <= bound + 1e-6
