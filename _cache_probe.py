"""device_cache augmentation decomposition probe.

The biggest unattacked e2e number (CLAUDE.md): bench.py's raw step runs at
~810 img/s but the full device_cache Trainer loop sustains ~599 — ~14 ms/iter
of cached-step overhead. Candidates: the on-device augmentation (rot90/flip
batch decomposition vs the shared-angle rotation gather), the cache
dynamic-slice + wire-dtype restore, and metric outputs. This probe measures
the steady rate of the REAL cached step under four augment variants:

  off      device_augment=0 (cache slice + restore only)
  rotflip  only the rot90/flip family (no rotation gather)
  rotonly  only the shared-angle rotation gather (no rot90/flip)
  on       full augment (shipping default)

Usage:
  python -u _cache_probe.py            # orchestrates all 4 (serial subprocs)
  python -u _cache_probe.py run on     # one mode, prints one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MODES = ("off", "rotflip", "rotonly", "on")
WARM, TIMED = 30, 400


def _patch_augment(mode: str) -> None:
    import jax
    import jax.numpy as jnp

    import hpfg_tpu.ops.augment as aug

    if mode in ("on", "off"):
        return  # "off" disables device_augment entirely; nothing to patch.

    def stream_rotflip(rng, images, masks):
        b = images.shape[0]
        k_p1, _, k_rot, k_flip, _ = jax.random.split(rng, 5)
        p1 = jax.random.uniform(k_p1, (b,))
        ks = jax.random.randint(k_rot, (b,), 0, 4)
        axes = jax.random.randint(k_flip, (b,), 0, 2)
        rf_img, rf_msk = aug._rot_flip_batch(images, masks, ks, axes)
        use = p1 > 0.5
        return (jnp.where(use[:, None, None, None], rf_img, images),
                jnp.where(use[:, None, None], rf_msk, masks))

    def stream_rotonly(rng, images, masks):
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        _, k_p2, _, _, k_angle = jax.random.split(rng, 5)
        p2 = jax.random.uniform(k_p2, (b,))
        angle = jax.random.randint(k_angle, (), -20, 20)
        yi, xi, valid = aug._rotation_index_maps(h, w, angle)
        rot_img = jnp.where(valid[None, :, :, None], images[:, yi, xi, :], 0.0)
        rot_msk = jnp.where(valid[None, :, :], masks[:, yi, xi],
                            jnp.zeros((), masks.dtype))
        use = p2 > 0.5
        return (jnp.where(use[:, None, None, None], rot_img, images),
                jnp.where(use[:, None, None], rot_msk, masks))

    aug._augment_stream_fast = {"rotflip": stream_rotflip,
                                "rotonly": stream_rotonly}[mode]


def run_one(mode: str) -> int:
    from hpfg_tpu.utils.runtime import (enable_persistent_cache,
                                        require_live_device)

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    require_live_device(f"cache_probe:{mode}")
    _patch_augment(mode)

    data_root = os.path.join(REPO, ".data", "probe_acdc")
    if not os.path.exists(os.path.join(data_root, "train_slices.list")):
        from hpfg_tpu.data.synthetic import make_synthetic_acdc

        make_synthetic_acdc(data_root, n_train_slices=96, n_test_volumes=2,
                            depth=4)

    from hpfg_tpu.config import parse_config
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.trainer import Trainer

    cfg = parse_config(
        "cache_probe", "configs/mean_teacher_unet_30k_224x224_ACDC.yaml",
        ["--set", f"data_path={data_root}",
         "--set", "save_path=.data/cache_probe_run",
         "--set", "label_num=0.25",
         "--set", "device_cache=12",
         "--set", f"device_augment={0 if mode == 'off' else 1}"])
    algo = build_algorithm("mean_teacher", cfg, dtype=jnp.bfloat16)
    trainer = Trainer(cfg, algo, enable_tb=False)
    state = trainer.init_state()
    batches = algo.batches(trainer.loaders)
    mega = trainer._build_device_cache(batches, 12)
    images_per_step = sum(v.shape[1] for k, v in mega.items()
                          if "img" in k or k == "image")

    t0 = time.time()
    metrics = None
    for _ in range(WARM):
        state, metrics = trainer._jit_cached(state, mega)
    float(np.asarray(metrics["loss"]))  # sync: compile + warm done
    warm_s = time.time() - t0

    t0 = time.time()
    for _ in range(TIMED):
        state, metrics = trainer._jit_cached(state, mega)
    loss = float(np.asarray(metrics["loss"]))  # sync (dispatch-only timing
    dt = time.time() - t0                      # lies on this tunnel)
    print(json.dumps({"mode": mode,
                      "img_per_s": round(TIMED * images_per_step / dt, 1),
                      "ms_per_iter": round(dt / TIMED * 1e3, 2),
                      "warm_s": round(warm_s, 1),
                      "loss": round(loss, 4)}), flush=True)
    return 0


def orchestrate() -> int:
    rows = []
    for mode in MODES:
        print(f"[cache_probe] mode={mode} ...", flush=True)
        p = subprocess.run(
            [sys.executable, "-u", __file__, "run", mode],
            capture_output=True, text=True, timeout=3600, cwd=REPO)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            rows.append({"mode": mode, "error": p.stderr[-800:]})
            print(f"[cache_probe] mode={mode} FAILED rc={p.returncode}\n"
                  f"{p.stderr[-800:]}", flush=True)
            continue
        rows.append(json.loads(line[-1]))
        print(f"[cache_probe] {line[-1]}", flush=True)

    ok = [r for r in rows if "img_per_s" in r]
    base = {r["mode"]: r.get("ms_per_iter") for r in ok}
    artifact = {
        "workload": "mean_teacher unet 8+24 @ 224x224 bf16, device_cache=12,"
                    " steady rate over 400 iters (post-warm) per augment"
                    " variant",
        "rows": rows,
        "marginal_ms": {
            "rotflip_vs_off": round(base["rotflip"] - base["off"], 2)
            if "rotflip" in base and "off" in base else None,
            "rotonly_vs_off": round(base["rotonly"] - base["off"], 2)
            if "rotonly" in base and "off" in base else None,
            "full_vs_off": round(base["on"] - base["off"], 2)
            if "on" in base and "off" in base else None,
        },
    }
    with open(os.path.join(REPO, "CACHE_PROBE_r03.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"cache_probe_ok": len(ok) == len(MODES)}))
    return 0 if len(ok) == len(MODES) else 1


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "run":
        sys.exit(run_one(sys.argv[2]))
    sys.exit(orchestrate())
