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
