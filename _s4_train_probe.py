"""Real-TPU 100-iter train smoke of s4cvnet (unet + swinunet student) —
VERDICT.md round-2 item #2's outstanding artifact: proves the swinunet
Pallas window-attention custom VJP trains end-to-end on the chip and the
loss decreases. Writes S4_SMOKE_r03.json.

Run:  timeout 3600 python -u _s4_train_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from hpfg_tpu.utils.runtime import enable_persistent_cache, require_live_device  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_default_prng_impl", "rbg")


def main() -> int:
    require_live_device("s4_train_probe")

    data_root = os.path.join(REPO, ".data", "probe_acdc")
    if not os.path.exists(os.path.join(data_root, "train_slices.list")):
        from hpfg_tpu.data.synthetic import make_synthetic_acdc

        make_synthetic_acdc(data_root, n_train_slices=96, n_test_volumes=2,
                            depth=4)

    from hpfg_tpu.config import parse_config
    from hpfg_tpu.parallel.mesh import shard_batch
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.trainer import Trainer

    cfg = parse_config(
        "s4_train_probe", "configs/s4cvnet_unet_30k_224x224_ACDC.yaml",
        ["--set", f"data_path={data_root}",
         "--set", "save_path=.data/s4_probe_run",
         "--set", "label_num=0.25",
         "--set", "total_itrs=100"])
    algo = build_algorithm("s4cvnet", cfg, dtype=jnp.bfloat16)
    trainer = Trainer(cfg, algo, enable_tb=False)
    state = trainer.init_state()
    batches = algo.batches(trainer.loaders)

    t0 = time.time()
    losses: list[tuple[int, float]] = []
    metrics = None
    for i in range(1, 101):
        batch = shard_batch(trainer.mesh, next(batches))
        state, metrics = trainer._jit_step(state, batch)
        if i == 1 or i % 10 == 0:
            flushed = {k: float(np.asarray(v)) for k, v in metrics.items()}
            loss = flushed.get("loss", next(iter(flushed.values())))
            losses.append((i, loss))
            print(f"iter {i:3d} loss {loss:.4f} "
                  f"({time.time() - t0:.0f}s elapsed)", flush=True)
    wall = time.time() - t0

    head = float(np.mean([v for _, v in losses[:3]]))
    tail = float(np.mean([v for _, v in losses[-3:]]))
    dice = {}
    try:
        trainer.evaluate(state, 100)
        dice = dict(trainer.best_dice)
    except Exception as e:  # eval is a bonus, not the smoke's claim
        dice = {"eval_error": str(e)}

    artifact = {
        "config": "configs/s4cvnet_unet_30k_224x224_ACDC.yaml",
        "workload": "s4cvnet unet+swinunet 8+24 @ 224x224 bf16, synthetic "
                    "ACDC (96 slices, label_num=0.25), 100 iters on real TPU",
        "platform": jax.devices()[0].platform,
        "iters": 100,
        "wall_s": round(wall, 1),
        "losses": [[i, round(v, 4)] for i, v in losses],
        "loss_head_mean": round(head, 4),
        "loss_tail_mean": round(tail, 4),
        "loss_decreased": tail < head,
        "dice": dice,
    }
    with open(os.path.join(REPO, "S4_SMOKE_r03.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"s4_smoke_ok": bool(tail < head),
                      "head": head, "tail": tail}))
    return 0 if tail < head else 1


if __name__ == "__main__":
    sys.exit(main())
