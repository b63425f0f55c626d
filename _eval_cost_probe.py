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

    # 3. interior split of one evaluate: shim the pieces evaluate_volumes
    #    actually calls — SliceForward.device_chunks (H2D + forward
    #    Executes), the confusion jit + its readbacks (wrap
    #    volume_confusion_sums minus device_chunks), and binary_hd95 (host
    #    EDT)
    from hpfg_tpu.evals import metrics as met_mod
    from hpfg_tpu.evals import volume as vol_mod

    acc = {"fwd_s": 0.0, "hd95_s": 0.0, "conf_total_s": 0.0}
    orig_chunks = vol_mod.SliceForward.device_chunks
    orig_hd95 = met_mod.binary_hd95
    orig_conf = vol_mod.volume_confusion_sums

    def timed_chunks(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_chunks(self, *a, **kw)
        acc["fwd_s"] += time.perf_counter() - t0
        return out

    def timed_hd95(*a, **kw):
        t0 = time.perf_counter()
        out = orig_hd95(*a, **kw)
        acc["hd95_s"] += time.perf_counter() - t0
        return out

    def timed_conf(*a, **kw):
        t0 = time.perf_counter()
        out = orig_conf(*a, **kw)
        acc["conf_total_s"] += time.perf_counter() - t0
        return out

    vol_mod.SliceForward.device_chunks = timed_chunks
    met_mod.binary_hd95 = timed_hd95
    vol_mod.volume_confusion_sums = timed_conf
    try:
        t_eval_shim = time.perf_counter()
        trainer.evaluate(snap, 3)
        t_eval_shim = time.perf_counter() - t_eval_shim
    finally:
        vol_mod.SliceForward.device_chunks = orig_chunks
        met_mod.binary_hd95 = orig_hd95
        vol_mod.volume_confusion_sums = orig_conf

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
            "fwd_h2d_and_forward_s": round(acc["fwd_s"], 3),
            "confusion_and_readbacks_s": round(acc["conf_total_s"]
                                               - acc["fwd_s"], 3),
            "hd95_host_edt_s": round(acc["hd95_s"], 3),
            "other_s": round(t_eval_shim - acc["conf_total_s"]
                             - acc["hd95_s"], 3),
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
