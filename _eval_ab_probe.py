"""A/B the OLD per-model eval path vs the NEW evaluate_volumes_multi on
TPU (SUSTAINED_r05 read 744.9 vs r4's 816.3 while bench.py held at 911 —
the boundary path regressed; this isolates where).

Times, at steady state (everything compiled/warm):
  multi    trainer.evaluate (evaluate_volumes_multi path)
  single   the r4-equivalent loop: evaluate_volumes per eval_model
  pieces   put_slices / forward / confusion+dice / pred readback / EDT

Run (TPU free):  timeout 3600 python -u _eval_ab_probe.py
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
    require_live_device("eval_ab_probe")

    data_root = os.path.join(REPO, ".data", "probe_acdc")
    if not os.path.exists(os.path.join(data_root, "train_slices.list")):
        from hpfg_tpu.data.synthetic import make_synthetic_acdc

        make_synthetic_acdc(data_root, n_train_slices=96, n_test_volumes=2,
                            depth=4)

    from hpfg_tpu.config import parse_config
    from hpfg_tpu.evals.volume import evaluate_volumes
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.algorithms.base import eval_variables
    from hpfg_tpu.train.trainer import Trainer

    cfg = parse_config(
        "eval_ab", "configs/mean_teacher_unet_30k_224x224_ACDC.yaml",
        ["--set", f"data_path={data_root}",
         "--set", "save_path=.data/evalab_run",
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

    # warm both paths fully (compiles + first-write)
    trainer.evaluate(state, 1)
    eval_models = algo.eval_models(state)
    for name, (model, mstate) in eval_models.items():
        fwd = trainer._slice_forward(model)
        evaluate_volumes(fwd, eval_variables(mstate), trainer.test_loader,
                         trainer.num_classes, trainer.test_crop,
                         zoom_order=0)

    def timed(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return [round(t, 3) for t in ts]

    t_multi = timed(lambda: trainer.evaluate(state, 2))

    def single_path():
        for name, (model, mstate) in eval_models.items():
            fwd = trainer._slice_forward(model)
            evaluate_volumes(fwd, eval_variables(mstate),
                             trainer.test_loader, trainer.num_classes,
                             trainer.test_crop, zoom_order=0)

    t_single = timed(single_path)

    # piece timings inside one multi pass
    from hpfg_tpu.evals import volume as vol_mod

    acc = {"put": 0.0, "fwd": 0.0}
    orig_put = vol_mod.SliceForward.put_slices
    orig_fwd = vol_mod.SliceForward.forward_chunks

    def tput(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_put(self, *a, **k)
        acc["put"] += time.perf_counter() - t0
        return out

    def tfwd(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_fwd(self, *a, **k)
        acc["fwd"] += time.perf_counter() - t0
        return out

    vol_mod.SliceForward.put_slices = tput
    vol_mod.SliceForward.forward_chunks = tfwd
    try:
        t0 = time.perf_counter()
        trainer.evaluate(state, 3)
        t_shim = time.perf_counter() - t0
    finally:
        vol_mod.SliceForward.put_slices = orig_put
        vol_mod.SliceForward.forward_chunks = orig_fwd

    artifact = {
        "multi_s": t_multi,
        "single_s": t_single,
        "multi_pieces": {"total_s": round(t_shim, 3),
                         "put_slices_s": round(acc["put"], 3),
                         "forward_dispatch_s": round(acc["fwd"], 3)},
        "note": "multi = trainer.evaluate (new path incl. best-ckpt saves "
                "+ logging); single = bare r4-equivalent evaluate_volumes "
                "loop (no ckpt/logging)",
    }
    with open(os.path.join(REPO, "_chain/EVAL_AB_r05.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
