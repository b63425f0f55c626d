"""TPU compile gate: lower + compile (no execution) every train-step program
that dispatches Pallas kernels under jax.grad, at the REAL config shapes.

Round-2 post-mortem (VERDICT.md): two Mosaic lowering crashes (f32→u32
dropout-seed cast; missing window-attention VJP) shipped invisible to the
CPU interpret-mode test suite and broke bench.py / all swinunet training on
TPU. Mosaic only runs when a real TPU backend compiles the kernel — so this
gate jit-lowers the full donated train step of the canonical configs on the
chip. Run it (plus bench.py) before any end-of-round snapshot:

    python scripts/tpu_gate.py          # writes TPU_GATE.json

Compile-only (`.lower(...).compile()`) is sufficient: both round-2 defects
were trace/lowering-time failures, and compiles hit the persistent cache on
re-runs. Exit code 0 iff every config compiles.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_default_prng_impl", "rbg")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Every config whose train step reaches a Pallas kernel under jax.grad:
# fused ConvBlock (+ in-kernel hash dropout) via every unet family model,
# fused W/SW-MSA window attention (custom VJP) via every swinunet model.
GATE_CONFIGS = (
    "configs/mean_teacher_unet_30k_224x224_ACDC.yaml",
    "configs/hpfg_unet_plus_30k_224x224_ACDC.yaml",
    "configs/s4cvnet_unet_30k_224x224_ACDC.yaml",
    "configs/swinunet_30k_96x96_LIDC.yaml",
    "configs/ccnet_swinunet_30k_224x224_ACDC.yaml",
)


def make_batch(cfg, algo_name: str) -> dict:
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


def gate_one(cfg_path: str) -> dict:
    from hpfg_tpu.config import load_config
    from hpfg_tpu.train.algorithms import build_algorithm

    cfg = load_config(os.path.join(REPO, cfg_path))
    algo_name = str(cfg.algorithm)
    dtype = jnp.bfloat16 if str(cfg.get("precision", "bf16")) == "bf16" \
        else jnp.float32
    algo = build_algorithm(algo_name, cfg, dtype=dtype)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray, make_batch(cfg, algo_name))

    t0 = time.perf_counter()
    jax.jit(algo.step, donate_argnums=(0,)).lower(state, batch).compile()
    return {"config": cfg_path, "algorithm": algo_name, "ok": True,
            "compile_s": round(time.perf_counter() - t0, 1)}


def main() -> int:
    results, ok = [], True
    platform = jax.devices()[0].platform
    for cfg_path in GATE_CONFIGS:
        print(f"[gate] {cfg_path} ...", flush=True)
        try:
            res = gate_one(cfg_path)
        except Exception as e:  # noqa: BLE001 — gate every config, report all
            res = {"config": cfg_path, "ok": False,
                   "error": f"{type(e).__name__}: {e}",
                   "traceback": traceback.format_exc()[-2000:]}
            ok = False
        print(f"[gate] -> {'OK' if res['ok'] else 'FAIL'} "
              f"{res.get('compile_s', '')}", flush=True)
        results.append(res)
    artifact = {"ok": ok, "platform": platform,
                "n_devices": len(jax.devices()),
                "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "results": results}
    with open(os.path.join(REPO, "TPU_GATE.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"tpu_gate_ok": ok,
                      "n": len(results),
                      "failed": [r["config"] for r in results
                                 if not r["ok"]]}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
