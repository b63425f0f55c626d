"""Benchmark EVERY BASELINE.json parity config (VERDICT r3 #2).

BASELINE.json names five configs; bench.py covers only mean_teacher. This
script measures steady-state training throughput for all five at canonical
shapes and writes BENCH_ALL_r04.json:

  supervised  unet       (reference sup_ACDC.py:13-125)
  mean_teacher unet      (2017_03_NIPS_Mean_Teacher_ACDC.py)
  cps         unet       (2021_06_CVPR_CPS_ACDC.py:61-169)
  ctct        unet+segformer (2021_12_MIDL_CTCT_ACDC.py:68-214)
  hpfg        unet_plus  (main.py:79-289)

Methodology = bench.py's (readback-bounded, no overhead subtraction, one
resident synthetic batch so the number isolates step compute); a dispatch
health preamble refuses to record through a wedged tunnel (utils/runtime).

Run (TPU free):  timeout 7200 python -u bench_all.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from hpfg_tpu.utils.runtime import (enable_persistent_cache,  # noqa: E402
                                    require_healthy_dispatch,
                                    require_live_device)

A100_REF_IMG_PER_SEC = 800.0  # bench.py's documented estimate
WARMUP = 10
ITERS = 30

CONFIGS = (
    ("supervised", "configs/unet_30k_224x224_ACDC.yaml"),
    ("mean_teacher", "configs/mean_teacher_unet_30k_224x224_ACDC.yaml"),
    ("cps", "configs/cps_unet_30k_224x224_ACDC.yaml"),
    ("ctct", "configs/ctct_unet_segformer_30k_224x224_ACDC.yaml"),
    ("hpfg", "configs/hpfg_unet_plus_30k_224x224_ACDC.yaml"),
)

# HPFG_BENCH_SET=extra: transformer-family / MC-teacher perf probes
# (VERDICT r3 weak #6 — gate proves these compile+step; this records
# throughput, incl. whether UAMT's T=8 lax.map MC passes are
# scan-pathological on this backend). Writes BENCH_EXTRA_r04.json.
EXTRA_CONFIGS = (
    ("uamt", "configs/uncertainty_aware_unet_30k_224x224_ACDC.yaml"),
    # mc_mode A/B: statically-unrolled chunked MC passes vs the lax.map
    # default (train/algorithms/uamt.py — chunk=2 is reference BN semantics,
    # chunk=8 is one folded [T·U] teacher forward)
    ("uamt_unroll2", "configs/uncertainty_aware_unet_30k_224x224_ACDC.yaml",
     {"mc_mode": "unroll", "mc_chunk": 2}),
    ("uamt_unroll8", "configs/uncertainty_aware_unet_30k_224x224_ACDC.yaml",
     {"mc_mode": "unroll", "mc_chunk": 8}),
    ("swinunet_lidc", "configs/swinunet_30k_96x96_LIDC.yaml"),
    ("ccnet_swinunet", "configs/ccnet_swinunet_30k_224x224_ACDC.yaml"),
    ("ccnet_cmt", "configs/ccnet_cmt_30k_224x224_ACDC.yaml"),
)


def make_batch(cfg, algo_name: str) -> dict:
    """Synthetic batch at the config's canonical shapes (tpu_gate recipe)."""
    rng = np.random.default_rng(0)
    h, w = (int(v) for v in cfg.train_crop_size)
    cin = int(cfg.get("in_channels", 1))
    ncls = int(cfg.num_classes)
    lb = int(cfg.batch_size)

    def img(n):
        return rng.normal(size=(n, h, w, cin)).astype(np.float32)

    def lbl(n):
        return rng.integers(0, ncls, (n, h, w)).astype(np.int32)

    if algo_name in ("supervised", "swin_mae"):
        return {"image": img(lb), "label": lbl(lb)}
    ub = int(cfg.unlabel_batch_size)
    batch = {"label_img": img(lb), "label": lbl(lb), "unlabel_img": img(ub)}
    if algo_name == "hpfg":
        batch["label_img1"] = img(lb)
        batch["label1"] = lbl(lb)
    return batch


def bench_one(name: str, cfg_path: str, overrides: dict | None = None) -> dict:
    from hpfg_tpu.config import load_config
    from hpfg_tpu.parallel.mesh import get_mesh, shard_batch
    from hpfg_tpu.train.algorithms import build_algorithm

    cfg = load_config(os.path.join(REPO, cfg_path))
    for k, v in (overrides or {}).items():
        setattr(cfg, k, v)
    algo = build_algorithm(str(cfg.algorithm), cfg, dtype=jnp.bfloat16)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = shard_batch(get_mesh(), make_batch(cfg, str(cfg.algorithm)))
    images_per_step = sum(v.shape[0] for k, v in batch.items()
                          if "img" in k or k == "image")

    step = jax.jit(algo.step, donate_argnums=(0,))
    from hpfg_tpu.utils.profiling import compiled_flops, mfu
    step_flops = compiled_flops(step.lower(state, batch).compile())
    t_c0 = time.perf_counter()
    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    warm_loss = float(np.asarray(metrics["loss"]))  # real readback
    assert np.isfinite(warm_loss), f"{name}: non-finite warmup loss"
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    final_loss = float(np.asarray(metrics["loss"]))  # sync + readback
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"{name}: non-finite loss"

    per_chip = ITERS * images_per_step / elapsed / len(jax.devices())
    step_mfu = mfu(step_flops, elapsed / ITERS)
    row = {
        "metric": f"{name}_images_per_sec_per_chip",
        "config": cfg_path,
        **({"overrides": overrides} if overrides else {}),
        "model": str(cfg.get("model", "")),
        "images_per_step": images_per_step,
        "step_ms": round(1e3 * elapsed / ITERS, 2),
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "step_gflops": round(step_flops / 1e9, 1),
        **({"mfu": round(step_mfu, 4)} if step_mfu is not None else {}),
        "warmup_s": round(compile_s, 1),
    }
    # vs_baseline only where a baseline exists: the 800 img/s estimate is
    # for the mean_teacher config specifically (VERDICT r4 #10 — dividing
    # heavier workloads by the MT bar misreads as "below baseline").
    if name == "mean_teacher":
        row["vs_baseline"] = round(per_chip / A100_REF_IMG_PER_SEC, 4)
    return row


def main() -> int:
    require_live_device("bench_all")
    enable_persistent_cache(platform=jax.devices()[0].platform)
    health = require_healthy_dispatch("bench_all")
    extra = os.environ.get("HPFG_BENCH_SET", "") == "extra"
    configs = EXTRA_CONFIGS if extra else CONFIGS
    rnd = os.environ.get("HPFG_BENCH_ROUND", "r05")
    out_name = (f"BENCH_EXTRA_{rnd}.json" if extra
                else f"BENCH_ALL_{rnd}.json")
    rows = []
    for entry in configs:
        name, cfg_path = entry[0], entry[1]
        overrides = entry[2] if len(entry) > 2 else None
        print(f"[bench_all] {name} ({cfg_path}) ...", flush=True)
        row = bench_one(name, cfg_path, overrides)
        rows.append(row)
        print(json.dumps(row), flush=True)
    artifact = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "dispatch_health": health,
                "methodology": "bench.py's: resident synthetic batch, "
                               f"{WARMUP} warmup + {ITERS} timed iters, "
                               "readback-bounded, no overhead subtraction",
                "rows": rows}
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"bench_all_ok": True,
                      "summary": {r["metric"]: r["value"] for r in rows}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
