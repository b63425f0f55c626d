"""SUSTAINED refresh: full Trainer loop on real TPU in device_cache mode.

Recreates the lost _sustained_r03.py (the artifact SUSTAINED_r03.json
survives; the script did not survive the 2026-08-19 host reboot). Same
workload: mean_teacher unet 8+24 @ 224x224 bf16, synthetic ACDC,
device_cache=12 (one H2D upload, in-jit dynamic_index_in_dim batch select,
on-device augment), eval every 500, async rotating checkpoints, 1500 iters.

Steady rate = iters (WARM, ITERS] bounded by REAL device readbacks on both
ends (the tunnel's block_until_ready does not sync — CLAUDE.md).

Run (TPU free):  timeout 7200 python -u _sustained_probe.py [out.json]
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

WARM, ITERS, EVAL_EVERY = 500, 1500, 500


def _sync(tree) -> float:
    """Force a real device->host readback (block_until_ready lies here)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SUSTAINED_r03.json"
    require_live_device("sustained_probe")
    # refuse to record numbers through a wedged tunnel (exits rc=3 when the
    # dispatch median stays >0.5 s; VERDICT r3 #4 / the 371.8 phantom)
    health = require_healthy_dispatch("sustained_probe")

    data_root = os.path.join(REPO, ".data", "probe_acdc")
    if not os.path.exists(os.path.join(data_root, "train_slices.list")):
        from hpfg_tpu.data.synthetic import make_synthetic_acdc

        make_synthetic_acdc(data_root, n_train_slices=96, n_test_volumes=2,
                            depth=4)

    from hpfg_tpu.config import parse_config
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.trainer import Trainer

    cfg = parse_config(
        "sustained_probe", "configs/mean_teacher_unet_30k_224x224_ACDC.yaml",
        ["--set", f"data_path={data_root}",
         "--set", "save_path=.data/sustained_run",
         "--set", "label_num=0.25",
         "--set", f"total_itrs={ITERS}",
         "--set", "device_cache=12",
         "--set", "device_augment=1"])
    algo = build_algorithm("mean_teacher", cfg, dtype=jnp.bfloat16)
    trainer = Trainer(cfg, algo, enable_tb=False)
    state = trainer.init_state()
    batches = algo.batches(trainer.loaders)
    mega = trainer._build_device_cache(batches, 12)
    images_per_step = sum(v.shape[1] for k, v in mega.items()
                          if "img" in k or k == "image")

    t0 = time.time()
    metrics = None
    t_warm = None
    for i in range(1, ITERS + 1):
        state, metrics = trainer._jit_cached(state, mega)
        if i == WARM // 2:
            # compile the eval + checkpoint paths during warmup so the
            # steady window measures steady-state evals+ckpts, not their
            # one-time compiles (which otherwise land at exactly iter 500)
            trainer._dispatch_eval(state, i, save_rotating=True)
        if i == WARM:
            trainer._join_eval()
            _sync(metrics)  # real readback bounds the steady segment start
            t_warm = time.time()
        if i % EVAL_EVERY == 0:
            # overlapped eval (Trainer.async_eval default): snapshot +
            # worker thread carrying the rotating ckpt too — the trainer's
            # own boundary behavior (trainer.py eval block)
            trainer._dispatch_eval(state, i, save_rotating=True)
    loss = _sync(metrics)  # real readback bounds the end
    t_end = time.time()
    trainer._join_eval()
    _ = _sync(state)  # param readback (first leaf): the steps really ran
    wall = t_end - t0
    steady = (ITERS - WARM) * images_per_step / (t_end - t_warm)

    artifact = {
        "workload": "mean_teacher unet 8+24 @ 224x224 bf16, synthetic ACDC, "
                    "device_cache=12 (one H2D upload, in-jit "
                    "dynamic_index_in_dim batch select, on-device augment), "
                    "eval every 500, async checkpoints",
        "iters": ITERS,
        "wall_s": round(wall, 1),
        "img_per_s_incl_compile": round(ITERS * images_per_step / wall, 1),
        "img_per_s_steady": round(steady, 1),
        "final_loss": loss,
        "final_dice": max(trainer.best_dice.values())
        if getattr(trainer, "best_dice", None) else None,
        "dispatch_health": health,
        "eval_mode": "overlapped" if trainer.async_eval else "sync",
    }
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
