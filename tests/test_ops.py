"""Ramp-ups, EMA, CutMix, schedules, layers unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpfg_tpu.config import Config
from hpfg_tpu.ops.cutmix import box_masks
from hpfg_tpu.ops.ema import ema_update, ema_update_subtree
from hpfg_tpu.ops.rampup import linear_rampup, sigmoid_rampup
from hpfg_tpu.train.optim import build_lr_schedule, build_optimizer


class TestRampup:
    def test_sigmoid_endpoints(self):
        assert float(sigmoid_rampup(0, 100)) == pytest.approx(np.exp(-5.0), rel=1e-5)
        assert float(sigmoid_rampup(100, 100)) == pytest.approx(1.0)
        assert float(sigmoid_rampup(1000, 100)) == pytest.approx(1.0)

    def test_linear(self):
        assert float(linear_rampup(50, 100)) == pytest.approx(0.5)
        assert float(linear_rampup(200, 100)) == pytest.approx(1.0)

    def test_zero_length_is_one(self):
        assert float(sigmoid_rampup(0, 0)) == 1.0
        assert float(linear_rampup(0, 0)) == 1.0


class TestEMA:
    def test_warmup_alpha(self):
        # at step 0, alpha_eff = min(1 - 1/1, 0.99) = 0 -> ema == params
        p = {"w": jnp.ones(3)}
        e = {"w": jnp.zeros(3)}
        out = ema_update(p, e, 0.99, 0)
        np.testing.assert_allclose(np.asarray(out["w"]), 1.0)

    def test_steady_state(self):
        p = {"w": jnp.ones(3)}
        e = {"w": jnp.zeros(3)}
        out = ema_update(p, e, 0.99, 10_000)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.01, rtol=1e-5)

    def test_subtree_only(self):
        p = {"encoder": {"w": jnp.ones(2)}, "neck": {"w": jnp.ones(2)}}
        e = {"encoder": {"w": jnp.zeros(2)}, "neck": {"w": jnp.zeros(2)}}
        out = ema_update_subtree(p, e, 0.99, 10_000, keys=("encoder",))
        assert float(out["encoder"]["w"][0]) == pytest.approx(0.01, rel=1e-5)
        assert float(out["neck"]["w"][0]) == 0.0


class TestCutMix:
    def test_shape_and_binary(self, rng):
        masks = box_masks(rng, 4, (64, 64))
        assert masks.shape == (4, 64, 64, 1)
        vals = np.unique(np.asarray(masks))
        assert set(vals).issubset({0.0, 1.0})

    def test_area_in_expected_range(self, rng):
        # prop_range (0.25, 0.5), 4 boxes, inverted: union area is below the
        # sum of box areas (overlap toggles off), above a loose floor.
        masks = box_masks(rng, 64, (64, 64))
        area = float(np.asarray(masks).mean())
        assert 0.1 < area < 0.6

    def test_deterministic_in_key(self, rng):
        m1 = box_masks(rng, 2, (32, 32))
        m2 = box_masks(rng, 2, (32, 32))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


class TestSchedules:
    def _cfg(self, **kw):
        base = dict(opt="sgd", lr=0.01, weight_decay=5e-4, momentum=0.9,
                    sched="medical", total_itrs=30000, step_size=1500,
                    warmup_epochs=1, warmup_lr=1e-4, min_lr=1e-6)
        base.update(kw)
        return Config(base)

    def test_medical_decay(self):
        sched = build_lr_schedule(self._cfg())
        assert float(sched(0)) == pytest.approx(0.01)
        assert float(sched(30000)) == pytest.approx(0.0, abs=1e-8)
        expected = 0.01 * (1 - 15000 / 30000) ** 0.9
        assert float(sched(15000)) == pytest.approx(expected, rel=1e-5)

    def test_poly_min_lr_floor(self):
        sched = build_lr_schedule(self._cfg(sched="poly"))
        assert float(sched(30000)) == pytest.approx(1e-6)

    def test_cosine_warmup(self):
        sched = build_lr_schedule(self._cfg(sched="cosine"))
        assert float(sched(0)) == pytest.approx(1e-4, rel=1e-3)
        # end of warmup (1 epoch * 1500 iters) should be near base lr
        assert float(sched(1500)) == pytest.approx(0.01, rel=0.01)
        assert float(sched(29999)) < 1e-3

    def test_optimizers_build_and_step(self):
        import optax

        for opt in ("sgd", "adamW", "adam"):
            tx, sched = build_optimizer(self._cfg(opt=opt))
            params = {"w": jnp.ones(4)}
            state = tx.init(params)
            grads = {"w": jnp.ones(4)}
            updates, state = tx.update(grads, state, params)
            new = optax.apply_updates(params, updates)
            assert np.all(np.isfinite(np.asarray(new["w"])))
            assert not np.allclose(np.asarray(new["w"]), 1.0)

    def test_sgd_matches_torch_first_step(self):
        """First SGD step with momentum+wd must match torch semantics."""
        import optax
        import torch

        w0 = np.array([1.0, -2.0, 3.0], dtype=np.float32)
        g = np.array([0.1, 0.2, -0.3], dtype=np.float32)

        tw = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, weight_decay=5e-4)
        tw.grad = torch.tensor(g)
        opt.step()

        cfg = self._cfg(sched="constant")
        tx, _ = build_optimizer(cfg)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        new = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(new["w"]), tw.detach().numpy(),
                                   rtol=1e-5)


class TestLayers:
    def test_align_corners_resize_matches_torch(self, np_rng):
        import torch
        import torch.nn.functional as F

        from hpfg_tpu.models.layers import resize_bilinear_align_corners

        x = np_rng.normal(size=(1, 7, 9, 3)).astype(np.float32)
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (14, 18)))
        tx = torch.tensor(x).permute(0, 3, 1, 2)
        expected = F.interpolate(tx, size=(14, 18), mode="bilinear",
                                 align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_packed_rows_resize_matches_nhwc_form(self, np_rng):
        """resize_bilinear_packed_rows (row pass on the packed [B,H,W*C]
        form, used on the fused-pair path) == the NHWC separable form; the
        swapped pass order differs only in float summation order."""
        from hpfg_tpu.models.layers import (resize_bilinear_align_corners,
                                            resize_bilinear_packed_rows)

        x = np_rng.normal(size=(2, 8, 12, 16)).astype(np.float32)
        ref = np.asarray(
            resize_bilinear_align_corners(jnp.asarray(x), (16, 24)))
        got = np.asarray(
            resize_bilinear_packed_rows(jnp.asarray(x), (16, 24)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_adaptive_pool_matches_torch(self, np_rng):
        import torch

        from hpfg_tpu.models.layers import adaptive_avg_pool

        x = np_rng.normal(size=(2, 14, 14, 5)).astype(np.float32)
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), (4, 4)))
        tx = torch.tensor(x).permute(0, 3, 1, 2)
        expected = torch.nn.AdaptiveAvgPool2d((4, 4))(tx).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)



class TestMaxPoolVariants:
    """The three HPFG_POOL lowerings of max_pool_2x2 are the same function
    (max is associative); they differ only in which backward XLA emits.
    Pin value AND gradient equality on continuous data (ties are
    measure-zero) plus the odd-size nn.max_pool fallback."""

    IMPLS = ("pairwise", "sliced", "reshape", "maskgrad", "halves")

    def _variants(self, monkeypatch, x):
        import flax.linen as fnn

        from hpfg_tpu.models import layers

        outs, grads = {}, {}
        for impl in self.IMPLS:
            monkeypatch.setattr(layers, "_POOL_IMPL", impl)
            outs[impl] = np.asarray(layers.max_pool_2x2(x))
            grads[impl] = np.asarray(jax.grad(
                lambda t: jnp.sum(jnp.sin(layers.max_pool_2x2(t))))(x))
        ref = np.asarray(fnn.max_pool(x, (2, 2), strides=(2, 2)))
        return outs, grads, ref

    def test_value_and_grad_agree(self, np_rng, monkeypatch):
        x = jnp.asarray(np_rng.normal(size=(2, 8, 12, 5)), jnp.float32)
        outs, grads, ref = self._variants(monkeypatch, x)
        for impl in self.IMPLS:
            np.testing.assert_array_equal(outs[impl], ref, err_msg=impl)
            np.testing.assert_allclose(grads[impl], grads["pairwise"],
                                       atol=1e-6, err_msg=impl)
        # every input cell contributes to exactly one 2x2 window; with no
        # ties exactly one cell per window carries the full cotangent
        nz = np.count_nonzero(grads["pairwise"])
        assert nz == ref.size

    def test_odd_size_falls_back(self, np_rng, monkeypatch):
        import flax.linen as fnn

        from hpfg_tpu.models import layers

        x = jnp.asarray(np_rng.normal(size=(1, 7, 9, 3)), jnp.float32)
        for impl in self.IMPLS:
            monkeypatch.setattr(layers, "_POOL_IMPL", impl)
            np.testing.assert_array_equal(
                np.asarray(layers.max_pool_2x2(x)),
                np.asarray(fnn.max_pool(x, (2, 2), strides=(2, 2))),
                err_msg=impl)

    def test_unknown_impl_raises(self, np_rng, monkeypatch):
        from hpfg_tpu.models import layers

        monkeypatch.setattr(layers, "_POOL_IMPL", "bogus")
        x = jnp.asarray(np_rng.normal(size=(1, 4, 4, 2)), jnp.float32)
        with pytest.raises(ValueError, match="HPFG_POOL"):
            layers.max_pool_2x2(x)
        # odd sizes must ALSO error (not silently take the fallback)
        x_odd = jnp.asarray(np_rng.normal(size=(1, 5, 7, 2)), jnp.float32)
        with pytest.raises(ValueError, match="HPFG_POOL"):
            layers.max_pool_2x2(x_odd)
