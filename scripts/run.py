"""Generic training entry point.

The reference hard-codes one config path per algorithm script
(e.g. main.py:19); here every entry script is a thin wrapper over this
runner, which reads the algorithm name from the config's ``algorithm:`` key
(overridable) and accepts --config / --set CLI flags.

Usage:
    python scripts/run.py --config configs/hpfg_unet_plus_30k_224x224_ACDC.yaml
    python scripts/run.py --config ... --set total_itrs=100 --set lr=0.02
    python scripts/run.py --config ... --validate-data   # check data tree only

A data preflight (hpfg_tpu/data/preflight.py) also runs automatically before
any model is built, so a misconfigured data_path fails in seconds with
actionable messages instead of after a multi-minute compile; disable with
--set preflight=0.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(default_config: str, algorithm: str | None = None, argv=None):
    import jax
    import jax.numpy as jnp

    # persistent compile cache for EXPLICITLY non-cpu platforms only (env
    # mode: the backend must stay uninitialized until after the distributed
    # setup below) — XLA:CPU AOT entries reload with mismatched machine
    # features and can SIGILL (hpfg_tpu/utils/runtime.py)
    from hpfg_tpu.utils.runtime import enable_persistent_cache

    enable_persistent_cache()

    from hpfg_tpu.config import parse_config
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.trainer import Trainer

    argv = list(sys.argv[1:] if argv is None else argv)
    validate_only = "--validate-data" in argv
    if validate_only:
        argv.remove("--validate-data")
    cfg = parse_config("hpfg_tpu trainer", default_config, argv)

    from hpfg_tpu.data.preflight import preflight_or_raise, validate_data_tree

    if validate_only:
        issues = validate_data_tree(str(cfg.get("data_path", "")),
                                    str(cfg.get("datasets", "")),
                                    int(cfg.get("num_classes", 4)))
        for line in issues:
            print(f"[validate-data] {line}")
        print(f"[validate-data] {'FAIL' if issues else 'OK'}: "
              f"{cfg.get('data_path')!r} ({cfg.get('datasets')})")
        raise SystemExit(1 if issues else 0)
    preflight_or_raise(cfg)
    jax.config.update("jax_default_prng_impl",
                      str(cfg.get("prng_impl", "rbg")))
    if cfg.get("distributed"):
        # multi-host: one process per host; coordinator/topology from args,
        # env vars, or TPU-pod autodiscovery (parallel/distributed.py)
        from hpfg_tpu.parallel.distributed import init_distributed

        init_distributed()
    algo_name = algorithm or cfg.get("algorithm")
    if algo_name is None:
        raise SystemExit("config must define `algorithm:` (or pass one)")
    dtype = jnp.bfloat16 if str(cfg.get("precision", "bf16")) == "bf16" \
        else jnp.float32
    algo = build_algorithm(algo_name, cfg, dtype=dtype)
    trainer = Trainer(cfg, algo)
    state = None  # fit() initializes (and applies pretrain_ckpt transfers)
    ckpt_tag = cfg.get("ckpt")
    if ckpt_tag and str(ckpt_tag).lower() not in ("none", "null"):
        # explicit request: a missing checkpoint raises instead of silently
        # degrading to scratch training without the pretrain transfer
        state = trainer.resume(trainer.init_state(), str(ckpt_tag),
                               strict=True)
    elif cfg.get("auto_resume") and \
            trainer.ckpt.latest_resume_tag("last") is not None:
        # crash-recovery: pick up the newest committed periodic checkpoint
        # (last / last_a / last_b) the Trainer writes at eval boundaries
        state = trainer.resume(trainer.init_state(), "last")

    from hpfg_tpu.utils.errors import error_hints

    with error_hints(trainer.logger):
        trainer.fit(state)
    return trainer


if __name__ == "__main__":
    run("configs/hpfg_unet_plus_30k_224x224_ACDC.yaml")
