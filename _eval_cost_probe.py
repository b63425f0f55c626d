"""Decompose the ~1.4 s/boundary eval cost (GAP_PROBE_r05 follow-up).

Per eval boundary the trainer does: snapshot Execute → (worker) evaluate()
over eval_models × volumes → best-dice orbax saves when dice improves →
rotating orbax save. This times each piece in isolation at steady state,
plus evaluate()'s interior split (device fwd+fetch vs host zoom/EDT
metrics) via a timing shim around evaluate_volumes internals.

Run (TPU free):  timeout 3600 python -u _eval_cost_probe.py
Writes EVAL_COST_r05.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from hpfg_tpu.utils.runtime import (enable_persistent_cache,  # noqa: E402
                                    require_live_device)

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_prng_impl", "rbg")


def main() -> int:
    require_live_device("eval_cost_probe")

    data_root = os.path.join(REPO, ".data", "probe_acdc")
    if not os.path.exists(os.path.join(data_root, "train_slices.list")):
        from hpfg_tpu.data.synthetic import make_synthetic_acdc

        make_synthetic_acdc(data_root, n_train_slices=96, n_test_volumes=2,
                            depth=4)

    from hpfg_tpu.config import parse_config
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.trainer import Trainer

    cfg = parse_config(
        "eval_cost", "configs/mean_teacher_unet_30k_224x224_ACDC.yaml",
        ["--set", f"data_path={data_root}",
         "--set", "save_path=.data/evalcost_run",
         "--set", "label_num=0.25",
         "--set", "total_itrs=100",
         "--set", "device_cache=4",
         "--set", "device_augment=1"])
    algo = build_algorithm("mean_teacher", cfg, dtype=jnp.bfloat16)
    trainer = Trainer(cfg, algo, enable_tb=False)
    state = trainer.init_state()
    batches = algo.batches(trainer.loaders)
    mega = trainer._build_device_cache(batches, 4)
    for _ in range(30):
        state, metrics = trainer._jit_cached(state, mega)
    float(np.asarray(metrics["loss"]))

    import jax as _jax

    from hpfg_tpu.train.algorithms.base import tree_copy

    jit_snapshot = _jax.jit(tree_copy)

    # warm every path once (compiles + first-write costs out of the way)
    snap = jit_snapshot(state)
    trainer.evaluate(snap, 1)
    trainer.ckpt.save_rotating(snap)
    trainer.ckpt.wait()

    def timed(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    # 1. snapshot Execute (readback-bounded)
    def do_snap():
        s = jit_snapshot(state)
        float(np.asarray(jax.tree_util.tree_leaves(s)[0]).reshape(-1)[0])
        return s

    t_snap, snap = timed(do_snap)

    # 2. full evaluate() at steady state (best_dice saturated after the
    #    warm call, so best-ckpt saves are excluded; verified below)
    best_before = dict(trainer.best_dice)
    t_eval, _ = timed(lambda: trainer.evaluate(snap, 2))
    best_saves_fired = trainer.best_dice != best_before

    # 3. interior split of one evaluate: shim SliceForward.__call__ and the
    #    metric fn to accumulate time
    from hpfg_tpu.evals import volume as vol_mod

    acc = {"fwd_device_s": 0.0, "metrics_host_s": 0.0}
    orig_call = vol_mod.SliceForward.__call__
    orig_metric = vol_mod.calculate_metric_percase

    def timed_call(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_call(self, *a, **kw)
        acc["fwd_device_s"] += time.perf_counter() - t0
        return out

    def timed_metric(*a, **kw):
        t0 = time.perf_counter()
        out = orig_metric(*a, **kw)
        acc["metrics_host_s"] += time.perf_counter() - t0
        return out

    vol_mod.SliceForward.__call__ = timed_call
    vol_mod.calculate_metric_percase = timed_metric
    try:
        t_eval_shim = time.perf_counter()
        trainer.evaluate(snap, 3)
        t_eval_shim = time.perf_counter() - t_eval_shim
    finally:
        vol_mod.SliceForward.__call__ = orig_call
        vol_mod.calculate_metric_percase = orig_metric

    # 4. rotating orbax save (the every-boundary crash-recovery ckpt),
    #    including its async finalize
    def do_rot():
        trainer.ckpt.save_rotating(snap)
        trainer.ckpt.wait()

    t_rot, _ = timed(do_rot)

    # 5. best-dice orbax save (fires only while dice still improves)
    def do_best():
        trainer.ckpt.save("best_probe", snap)
        trainer.ckpt.wait()

    t_best, _ = timed(do_best)

    artifact = {
        "snapshot_s": round(t_snap, 3),
        "evaluate_s": round(t_eval, 3),
        "evaluate_split": {
            "total_s": round(t_eval_shim, 3),
            "fwd_device_s": round(acc["fwd_device_s"], 3),
            "metrics_host_s": round(acc["metrics_host_s"], 3),
            "other_s": round(t_eval_shim - acc["fwd_device_s"]
                             - acc["metrics_host_s"], 3),
        },
        "rotating_ckpt_s": round(t_rot, 3),
        "best_ckpt_s": round(t_best, 3),
        "best_saves_fired_during_t_eval": bool(best_saves_fired),
        "boundary_estimate_s": round(t_snap + t_eval + t_rot, 3),
        "note": "GAP_PROBE_r05 measured ~1.4-1.5 s/boundary of loop-time "
                "tax; this splits it. eval_models=2 (student+teacher), "
                "2 synthetic volumes.",
    }
    with open(os.path.join(REPO, "EVAL_COST_r05.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
