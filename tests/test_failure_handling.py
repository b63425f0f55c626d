"""Failure-detection utilities (SURVEY §5.3): opaque-TPU-error decoding and
the periodic-checkpoint / auto-resume policy."""

import numpy as np
import pytest

from hpfg_tpu.utils.errors import decode_tpu_error, error_hints


class TestDecode:
    def test_donation_aliasing_signature(self):
        e = RuntimeError("INVALID_ARGUMENT: Attempt to donate the same "
                         "buffer twice in Execute()")
        hint = decode_tpu_error(e)
        assert hint and "ALIASED" in hint

    def test_oom_signature(self):
        e = RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating "
                         "1073741824 bytes")
        hint = decode_tpu_error(e)
        assert hint and "batch_size" in hint

    def test_opaque_invalidargument(self):
        e = RuntimeError("jaxlib.xla_extension.XlaRuntimeError: "
                         "INVALID_ARGUMENT: TPU backend error")
        hint = decode_tpu_error(e)
        assert hint and "ONE TPU job" in hint

    def test_unknown_error_is_none(self):
        assert decode_tpu_error(ValueError("plain bug")) is None

    def test_error_hints_reraises_with_log(self):
        records = []

        class L:
            def error(self, msg, *a):
                records.append(msg % a if a else msg)

        with pytest.raises(RuntimeError):
            with error_hints(L()):
                raise RuntimeError("INVALID_ARGUMENT: TPU backend error")
        assert records and "HINT" in records[0]


class TestPeriodicCheckpoint:
    def test_trainer_writes_last_at_eval_boundary(self, synthetic_acdc,
                                                  tmp_path):
        from hpfg_tpu.train.algorithms import build_algorithm
        from hpfg_tpu.train.trainer import Trainer
        from tests.helpers import tiny_cfg

        cfg = tiny_cfg(synthetic_acdc, datasets="sup_acdc", batch_size=8,
                       total_itrs=10, step_size=5)
        algo = build_algorithm("supervised", cfg)
        trainer = Trainer(cfg, algo, workdir=str(tmp_path / "run"),
                          enable_tb=False)
        state = trainer.fit()
        trainer.ckpt.wait()
        assert trainer.ckpt.exists("last")
        # the periodic "last" from iter 5/10 resumes exactly
        import jax

        fresh = algo.init_state(jax.random.PRNGKey(0))
        restored = trainer.ckpt.restore("last", fresh)
        assert int(np.asarray(restored.step)) == 10


class TestRotatingCheckpoint:
    def _mgr(self, d):
        from hpfg_tpu.utils.checkpoint import CheckpointManager
        return CheckpointManager(str(d))

    def test_restart_overwrites_older_slot_first(self, tmp_path):
        """After a restart (fresh manager), the first rotating save must
        target the OLDER committed slot — starting at a fixed index would
        delete the newest recovery point before its replacement commits,
        re-opening the crash window the rotation exists to close."""
        import time as _time

        import jax.numpy as jnp

        d = tmp_path / "ckpt"
        m1 = self._mgr(d)
        m1.save_rotating({"step": jnp.asarray(1)})   # -> last_a
        m1.wait()
        _time.sleep(0.05)  # distinct mtimes
        m1.save_rotating({"step": jnp.asarray(2)})   # -> last_b (newest)
        m1.wait()
        assert m1.latest_resume_tag() == "last_b"

        m2 = self._mgr(d)  # fresh manager = process restart
        m2.save_rotating({"step": jnp.asarray(3)})   # must overwrite last_a
        m2.wait()
        restored = m2.restore("last_b")
        assert int(np.asarray(restored["step"])) == 2  # newest survived
        assert int(np.asarray(m2.restore("last_a")["step"])) == 3

    def test_fresh_directory_starts_at_a(self, tmp_path):
        import jax.numpy as jnp

        m = self._mgr(tmp_path / "ckpt2")
        m.save_rotating({"step": jnp.asarray(7)})
        m.wait()
        assert m.exists("last_a") and not m.exists("last_b")


class TestPersistentCacheGuard:
    """enable_persistent_cache must NEVER turn the on-disk XLA cache on for
    CPU compiles (XLA:CPU AOT entries SIGILL on reload, CLAUDE.md) — and
    the decision must not rely on env vars read at jax-import time."""

    def test_env_mode_stays_off_for_cpu_or_unset(self, monkeypatch):
        from hpfg_tpu.utils.runtime import enable_persistent_cache

        for plat in ("cpu", "CPU", "tpu,cpu", ""):
            monkeypatch.setenv("JAX_PLATFORMS", plat)
            assert enable_persistent_cache() is False
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        assert enable_persistent_cache() is False
        assert enable_persistent_cache(platform="cpu") is False

    def test_enables_for_explicit_accelerator(self, monkeypatch):
        import jax

        from hpfg_tpu.utils.runtime import (enable_persistent_cache,
                                            repo_root)

        before = jax.config.jax_compilation_cache_dir
        try:
            monkeypatch.setenv("JAX_PLATFORMS", "axon")
            assert enable_persistent_cache() is True
            assert jax.config.jax_compilation_cache_dir.endswith(".jax_cache")
            assert repo_root() in jax.config.jax_compilation_cache_dir
            jax.config.update("jax_compilation_cache_dir", None)
            assert enable_persistent_cache(platform="tpu") is True
        finally:
            # restore: leaving the cache enabled would poison later CPU
            # compiles in this very suite
            jax.config.update("jax_compilation_cache_dir", before)
        assert jax.config.jax_compilation_cache_dir == before
