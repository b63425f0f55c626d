"""Single-step + short-run tests for every SSL algorithm on synthetic data."""

import jax
import numpy as np
import pytest

from hpfg_tpu.config import Config
from hpfg_tpu.data.acdc import get_ssl_acdc_loader
from hpfg_tpu.train.algorithms import build_algorithm
from tests.helpers import tiny_cfg, tiny_model_block


def _ssl_loaders(root):
    return get_ssl_acdc_loader(root, 4, 8, (32, 32), 0.4)


def _run_steps(algo, loaders, n=3):
    state = algo.init_state(jax.random.PRNGKey(0))
    batches = algo.batches(loaders)
    step = jax.jit(algo.step, donate_argnums=(0,))
    metrics = None
    for _ in range(n):
        state, metrics = step(state, next(batches))
    return state, {k: float(np.asarray(v)) for k, v in metrics.items()}


class TestUAMT:
    def test_step_and_threshold(self, synthetic_acdc):
        cfg = tiny_cfg(synthetic_acdc)
        algo = build_algorithm("uamt", cfg)
        state, metrics = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=2)
        assert np.isfinite(metrics["loss"])
        # threshold at iter 2 of 20: (0.75 + 0.25*sigmoid_rampup(2, 20)) * ln2
        expected = (0.75 + 0.25 * np.exp(-5 * (1 - 2 / 20) ** 2)) * np.log(2)
        assert metrics["threshold"] == pytest.approx(expected, rel=1e-4)
        assert int(np.asarray(state.step)) == 2

    def test_mc_unroll_chunk1_equals_map(self, synthetic_acdc):
        """mc_mode=unroll consumes the identical per-pass keys as lax.map at
        mc_chunk=1 — same init, same batch ⇒ equal step outputs up to the
        T-pass mean's fp32 reduction order (sequential vs stacked-reduce)."""
        rng = np.random.default_rng(0)
        batch = {
            "label_img": rng.normal(size=(4, 32, 32, 1)).astype(np.float32),
            "label": rng.integers(0, 4, (4, 32, 32)).astype(np.int32),
            "unlabel_img": rng.normal(size=(8, 32, 32, 1)).astype(np.float32),
        }

        def one_step(mode, chunk):
            cfg = tiny_cfg(synthetic_acdc)
            cfg.mc_mode, cfg.mc_chunk = mode, chunk
            algo = build_algorithm("uamt", cfg)
            state = algo.init_state(jax.random.PRNGKey(7))
            state, metrics = jax.jit(algo.step)(state, batch)
            leaf = np.asarray(jax.tree_util.tree_leaves(state.model.params)[0])
            return {k: float(np.asarray(v)) for k, v in metrics.items()}, leaf

        m_map, p_map = one_step("map", 1)
        m_unr, p_unr = one_step("unroll", 1)
        assert m_map["loss"] == pytest.approx(m_unr["loss"], rel=1e-6)
        assert m_map["loss_consistency"] == pytest.approx(
            m_unr["loss_consistency"], rel=1e-5, abs=1e-8)
        np.testing.assert_allclose(p_map, p_unr, rtol=1e-5, atol=1e-7)

    def test_mc_unroll_chunk2_runs(self, synthetic_acdc):
        """Reference-shaped doubled-batch MC passes (mc_chunk=2) run finite
        (/root/reference/2019_07_MICCAI_Uncertainty_Aware_ACDC.py:134-141)."""
        cfg = tiny_cfg(synthetic_acdc)
        cfg.mc_mode, cfg.mc_chunk = "unroll", 2
        algo = build_algorithm("uamt", cfg)
        _, metrics = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=1)
        assert np.isfinite(metrics["loss"])
        assert np.isfinite(metrics["loss_consistency"])


class TestCPS:
    def test_dual_students_diverge_from_init(self, synthetic_acdc):
        cfg = tiny_cfg(synthetic_acdc)
        cfg.model1 = tiny_model_block(model="unet")
        cfg.model2 = tiny_model_block(model="unet")
        algo = build_algorithm("cps", cfg)
        state, metrics = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=3)
        assert np.isfinite(metrics["loss"])
        assert metrics["loss_semi"] >= 0
        # independently initialized students stay different
        l1 = np.asarray(jax.tree_util.tree_leaves(state.model1.params)[0])
        l2 = np.asarray(jax.tree_util.tree_leaves(state.model2.params)[0])
        assert not np.allclose(l1, l2)


class TestCTCT:
    def test_step_runs(self, synthetic_acdc):
        cfg = tiny_cfg(synthetic_acdc)
        cfg.model1 = tiny_model_block(model="unet")
        cfg.model2 = tiny_model_block(model="unet", lr=0.01)
        algo = build_algorithm("ctct", cfg)
        _, metrics = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=2)
        assert np.isfinite(metrics["loss"])
        assert "lr1" in metrics and "lr2" in metrics


class TestICT:
    def test_step_runs(self, synthetic_acdc):
        cfg = tiny_cfg(synthetic_acdc, ict_alpha=0.2)
        algo = build_algorithm("ict", cfg)
        _, metrics = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=2)
        assert np.isfinite(metrics["loss"])
        assert metrics["loss_consistency"] >= 0


class TestS4CVNet:
    def test_step_and_gate(self, synthetic_acdc):
        cfg = tiny_cfg(synthetic_acdc)
        cfg.model1 = tiny_model_block(model="unet")
        cfg.model2 = tiny_model_block(model="unet")
        algo = build_algorithm("s4cvnet", cfg)
        state, metrics = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=2)
        assert np.isfinite(metrics["loss"])
        assert len(algo.eval_models(state)) == 3


class TestHPFG:
    def test_full_step(self, synthetic_acdc):
        cfg = tiny_cfg(synthetic_acdc)
        cfg.model1 = tiny_model_block(model="unet_plus")
        cfg.model2 = tiny_model_block(model="unet_plus")
        algo = build_algorithm("hpfg", cfg)
        state, metrics = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=3)
        for key in ("loss", "loss_sup", "loss_semi", "loss_contrastive",
                    "pseudo_sup1", "consistency_weight"):
            assert key in metrics and np.isfinite(metrics[key])
        assert int(np.asarray(state.step)) == 3

    def test_backbone_ema_ties_model2_to_model1(self, synthetic_acdc):
        """After one step with ema_decay=0, model2's encoder must equal
        model1's (reference update_ema_variables_backbone, main.py:68-76:
        at step 1 alpha_eff = min(1 - 1/2, 0) = 0 → full copy)."""
        cfg = tiny_cfg(synthetic_acdc, ema_decay=0.0)
        cfg.model1 = tiny_model_block(model="unet_plus")
        cfg.model2 = tiny_model_block(model="unet_plus")
        algo = build_algorithm("hpfg", cfg)
        state, _ = _run_steps(algo, _ssl_loaders(synthetic_acdc), n=1)
        e1 = jax.tree_util.tree_leaves(state.model1.params["encoder"])
        e2 = jax.tree_util.tree_leaves(state.model2.params["encoder"])
        for a, b in zip(e1, e2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        # neck params are NOT tied (independently initialized; compare a
        # kernel leaf — biases are all-zero at init on both sides)
        n1 = [l for l in jax.tree_util.tree_leaves(
            state.model1.params["dense_projection_high"]) if l.ndim >= 2]
        n2 = [l for l in jax.tree_util.tree_leaves(
            state.model2.params["dense_projection_high"]) if l.ndim >= 2]
        assert not np.allclose(np.asarray(n1[0]), np.asarray(n2[0]))

    def test_loss_decreases_supervised_part(self, synthetic_acdc):
        cfg = tiny_cfg(synthetic_acdc, lr=0.05)
        cfg.model1 = tiny_model_block(model="unet_plus", lr=0.05)
        cfg.model2 = tiny_model_block(model="unet_plus", lr=0.05)
        algo = build_algorithm("hpfg", cfg)
        loaders = _ssl_loaders(synthetic_acdc)
        state = algo.init_state(jax.random.PRNGKey(0))
        batches = algo.batches(loaders)
        step = jax.jit(algo.step, donate_argnums=(0,))
        sups = []
        for _ in range(30):
            state, metrics = step(state, next(batches))
            sups.append(float(np.asarray(metrics["loss_sup"])))
        assert np.mean(sups[-8:]) < np.mean(sups[:8])


class TestDonationSafety:
    """Regression: EMA teachers must start as fresh buffers — aliased
    student/teacher leaves get donated twice in one Execute() and crash
    (opaquely on the TPU plugin)."""

    def test_no_aliased_leaves_at_init(self, synthetic_acdc):
        import jax

        cfg = tiny_cfg(synthetic_acdc)
        for name in ("mean_teacher", "uamt", "ict"):
            algo = build_algorithm(name, cfg)
            state = algo.init_state(jax.random.PRNGKey(0))
            student = jax.tree_util.tree_leaves(state.model.params)
            teacher = jax.tree_util.tree_leaves(state.ema.params)
            for s, t in zip(student, teacher):
                assert s.unsafe_buffer_pointer() != t.unsafe_buffer_pointer(), name

    def test_donated_step_executes_twice(self, synthetic_acdc):
        import jax

        cfg = tiny_cfg(synthetic_acdc)
        algo = build_algorithm("mean_teacher", cfg)
        state = algo.init_state(jax.random.PRNGKey(0))
        batches = algo.batches(_ssl_loaders(synthetic_acdc))
        step = jax.jit(algo.step, donate_argnums=(0,))
        state, m = step(state, next(batches))
        assert np.isfinite(float(np.asarray(m["loss"])))
        state, m = step(state, next(batches))
        assert np.isfinite(float(np.asarray(m["loss"])))
