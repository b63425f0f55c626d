"""End-to-end: supervised + mean-teacher training on synthetic ACDC."""

import numpy as np
import pytest

from hpfg_tpu.train.algorithms import build_algorithm
from hpfg_tpu.train.trainer import Trainer
from tests.helpers import tiny_cfg


class TestSupervised:
    def test_loss_decreases_and_eval_runs(self, synthetic_acdc, tmp_path):
        cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8,
                       total_itrs=30, step_size=15)
        algo = build_algorithm("supervised", cfg)
        trainer = Trainer(cfg, algo, workdir=str(tmp_path / "run"),
                          enable_tb=False)
        state = trainer.fit()
        assert int(np.asarray(state.step)) == 30
        # eval ran twice and produced dice in [0, 1]
        assert len(trainer.history) == 2
        dice = trainer.history[-1]["results"]["model1"][0]
        assert 0.0 <= dice <= 1.0
        # best checkpoint written
        assert trainer.ckpt.exists("best_model1") or dice == 0.0
        assert trainer.ckpt.exists("last")

    def test_loss_actually_decreases(self, synthetic_acdc, tmp_path):
        import jax

        cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8,
                       total_itrs=40, step_size=1000)
        algo = build_algorithm("supervised", cfg)
        state = algo.init_state(jax.random.PRNGKey(0))
        from hpfg_tpu.train.algorithms.base import sup_batches
        from hpfg_tpu.data.acdc import get_acdc_loader

        train_loader, _ = get_acdc_loader(synthetic_acdc, 8, (32, 32))
        batches = sup_batches(train_loader)
        step = jax.jit(algo.step, donate_argnums=(0,))
        losses = []
        for _ in range(40):
            state, metrics = step(state, next(batches))
            losses.append(float(np.asarray(metrics["loss"])))
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_device_cache_mode_trains(self, synthetic_acdc, tmp_path):
        """device_cache: N host batches upload once; every step indexes the
        cache by state.step on device (zero per-iter H2D)."""
        cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8,
                       total_itrs=8, step_size=4, device_cache=3,
                       device_augment=True)
        algo = build_algorithm("supervised", cfg)
        trainer = Trainer(cfg, algo, workdir=str(tmp_path / "run"),
                          enable_tb=False)
        state = trainer.fit()
        assert int(np.asarray(state.step)) == 8
        assert len(trainer.history) == 2
        dice = trainer.history[-1]["results"]["model1"][0]
        assert 0.0 <= dice <= 1.0

    def test_resume_restores_exact_state(self, synthetic_acdc, tmp_path):
        cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8,
                       total_itrs=10, step_size=100)
        algo = build_algorithm("supervised", cfg)
        trainer = Trainer(cfg, algo, workdir=str(tmp_path / "run"),
                          enable_tb=False)
        state = trainer.fit(eval_enabled=False)
        import jax

        fresh = algo.init_state(jax.random.PRNGKey(0))
        restored = trainer.ckpt.restore("last", fresh)
        assert int(np.asarray(restored.step)) == 10
        leaf_a = jax.tree_util.tree_leaves(state.model.params)[0]
        leaf_b = jax.tree_util.tree_leaves(restored.model.params)[0]
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))

    def test_midrun_exception_still_cleans_up(self, synthetic_acdc,
                                              tmp_path):
        """ADVICE r4: an exception mid-run must still join the overlapped
        eval worker and shut the pool down (else interpreter shutdown blocks
        on the non-daemon thread), and the primary error must surface."""
        cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8,
                       total_itrs=20, step_size=2, prefetch=0)
        algo = build_algorithm("supervised", cfg)

        orig_batches = algo.batches

        def poisoned(loaders):
            it = orig_batches(loaders)
            for i in range(5):  # past an eval boundary (step_size=2)
                yield next(it)
            raise RuntimeError("loader died mid-run")

        algo.batches = poisoned
        trainer = Trainer(cfg, algo, workdir=str(tmp_path / "run"),
                          enable_tb=False)
        with pytest.raises(RuntimeError, match="loader died mid-run"):
            trainer.fit()
        assert trainer._eval_pool is None  # pool shut down in finally
        assert trainer._eval_future is None  # worker joined, not leaked


class TestMeanTeacher:
    def test_train_and_teacher_tracks_student(self, synthetic_acdc, tmp_path):
        import jax

        # batch sizes must divide the 8-device test mesh (shard_batch errors
        # loudly on ragged training batches by design)
        cfg = tiny_cfg(synthetic_acdc, total_itrs=12, step_size=6,
                       batch_size=8, unlabel_batch_size=8)
        algo = build_algorithm("mean_teacher", cfg)
        trainer = Trainer(cfg, algo, workdir=str(tmp_path / "run"),
                          enable_tb=False)
        state = trainer.fit()
        assert int(np.asarray(state.step)) == 12
        # both student and teacher evaluated
        assert set(trainer.history[-1]["results"]) == {"model1", "model2"}
        # teacher parameters moved away from pure init copy but are not
        # identical to the student (EMA lag)
        s = np.asarray(jax.tree_util.tree_leaves(state.model.params)[0])
        t = np.asarray(jax.tree_util.tree_leaves(state.ema.params)[0])
        assert not np.allclose(s, t)

    def test_metrics_contain_ssl_terms(self, synthetic_acdc):
        import jax

        cfg = tiny_cfg(synthetic_acdc)
        algo = build_algorithm("mean_teacher", cfg)
        state = algo.init_state(jax.random.PRNGKey(0))
        batches = algo.batches(
            __import__("hpfg_tpu.data.acdc", fromlist=["get_ssl_acdc_loader"])
            .get_ssl_acdc_loader(cfg.data_path, 4, 8, (32, 32), 0.4))
        step = jax.jit(algo.step, donate_argnums=(0,))
        state, metrics = step(state, next(batches))
        for key in ("loss", "loss_sup", "loss_consistency",
                    "consistency_weight", "lr"):
            assert key in metrics
        # rampup at iter 1: weight = 0.1 * exp(-5) ~ 6.7e-4
        w = float(np.asarray(metrics["consistency_weight"]))
        assert w == pytest.approx(0.1 * np.exp(-5.0), rel=1e-3)


class TestDeterminism:
    def test_same_seed_same_loss(self, synthetic_acdc):
        """Exact reproducibility: identical config+seed → bit-identical
        losses (single jax.random key discipline, SURVEY §7 hard parts)."""
        import jax

        def two_steps():
            cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8)
            algo = build_algorithm("supervised", cfg)
            state = algo.init_state(jax.random.PRNGKey(7))
            from hpfg_tpu.data.acdc import get_acdc_loader
            from hpfg_tpu.train.algorithms.base import sup_batches

            train_loader, _ = get_acdc_loader(synthetic_acdc, 8, (32, 32),
                                              seed=5)
            batches = sup_batches(train_loader)
            step = jax.jit(algo.step)
            losses = []
            for _ in range(2):
                state, metrics = step(state, next(batches))
                losses.append(float(np.asarray(metrics["loss"])))
            return losses

        assert two_steps() == two_steps()
