"""Decompose the sustained-vs-bench gap (VERDICT r4 #6).

SUSTAINED_r04 steady = 816.3 img/s (39.2 ms/iter) vs bench 909.4 (35.2):
a ~4 ms/iter residual asserted as "dispatch floor + in-window eval device
work" but never measured. This probe runs FOUR segments in one process on
the same device-cached Trainer loop and bounds each with real readbacks:

  bare     cached loop, evals OFF, ckpts OFF   → cached-loop floor vs bench
  eval     + overlapped eval every EVERY        → eval device work per iter
  ckpt     + rotating ckpt in the eval worker   → ckpt cost per iter
  full     + best-dice saves (Trainer default)  — should equal SUSTAINED

Segments reuse one compiled step; segment boundaries are readback-bounded
(the tunnel's block_until_ready does not sync — CLAUDE.md).

Run (TPU free):  timeout 7200 python -u _gap_probe.py [GAP_PROBE_r05.json]
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
                                    require_healthy_dispatch,
                                    require_live_device)

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_prng_impl", "rbg")

WARM = 200          # per-process warmup before the first segment
SEG = 400           # iters per segment
EVERY = 100         # eval cadence inside eval/ckpt/full segments


def _sync(tree) -> float:
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "GAP_PROBE_r05.json"
    require_live_device("gap_probe")
    health = require_healthy_dispatch("gap_probe")

    data_root = os.path.join(REPO, ".data", "probe_acdc")
    if not os.path.exists(os.path.join(data_root, "train_slices.list")):
        from hpfg_tpu.data.synthetic import make_synthetic_acdc

        make_synthetic_acdc(data_root, n_train_slices=96, n_test_volumes=2,
                            depth=4)

    from hpfg_tpu.config import parse_config
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.trainer import Trainer

    cfg = parse_config(
        "gap_probe", "configs/mean_teacher_unet_30k_224x224_ACDC.yaml",
        ["--set", f"data_path={data_root}",
         "--set", "save_path=.data/gap_run",
         "--set", "label_num=0.25",
         "--set", "total_itrs=4000",
         "--set", "device_cache=12",
         "--set", "device_augment=1"])
    algo = build_algorithm("mean_teacher", cfg, dtype=jnp.bfloat16)
    trainer = Trainer(cfg, algo, enable_tb=False)
    state = trainer.init_state()
    batches = algo.batches(trainer.loaders)
    mega = trainer._build_device_cache(batches, 12)
    images = sum(v.shape[1] for k, v in mega.items()
                 if "img" in k or k == "image")

    # warmup: step + eval + ckpt compiles all done before any timing
    metrics = None
    for i in range(1, WARM + 1):
        state, metrics = trainer._jit_cached(state, mega)
        if i == WARM // 2:
            trainer._dispatch_eval(state, i, save_rotating=True)
    trainer._join_eval()
    _sync(metrics)

    results = {}

    def segment(name: str, do_eval: bool, save_rotating: bool):
        nonlocal state, metrics
        _sync(metrics)
        t0 = time.time()
        for i in range(1, SEG + 1):
            state, metrics = trainer._jit_cached(state, mega)
            if do_eval and i % EVERY == 0:
                trainer._dispatch_eval(state, i,
                                       save_rotating=save_rotating)
        _sync(metrics)
        t1 = time.time()
        trainer._join_eval()  # worker drains OUTSIDE the timed window only
        # if it outlived the segment; the timed window already contains its
        # overlapped device work, which is exactly what we want to measure
        ms = 1e3 * (t1 - t0) / SEG
        results[name] = {"ms_per_iter": round(ms, 2),
                         "img_per_s": round(images / ms * 1e3, 1)}
        print(f"[gap] {name}: {ms:.2f} ms/iter "
              f"({images / ms * 1e3:.1f} img/s)", flush=True)

    segment("bare", do_eval=False, save_rotating=False)
    segment("eval", do_eval=True, save_rotating=False)
    segment("ckpt", do_eval=True, save_rotating=True)
    segment("full", do_eval=True, save_rotating=True)  # repeat = stability

    bare = results["bare"]["ms_per_iter"]
    artifact = {
        "workload": "mean_teacher 8+24 @224² bf16, device_cache=12, "
                    f"{SEG} iters/segment, eval cadence {EVERY}",
        "segments": results,
        "deltas_ms_per_iter": {
            "eval_minus_bare": round(results["eval"]["ms_per_iter"] - bare, 2),
            "ckpt_minus_eval": round(results["ckpt"]["ms_per_iter"]
                                     - results["eval"]["ms_per_iter"], 2),
        },
        "dispatch_health": health,
        "note": "bare vs bench.py = cached-loop+dispatch floor; "
                "eval-bare = overlapped-eval device work per iter at this "
                "cadence; ckpt-eval = rotating-ckpt cost per iter",
    }
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
