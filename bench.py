"""Benchmark: mean_teacher UNet 224x224 ACDC training throughput.

Measures the BASELINE.md headline metric — labeled+unlabeled images/sec/chip
for the mean-teacher UNet configuration (8 labeled + 24 unlabeled @ 224x224x1,
reference config/mean_teacher_unet_30k_224x224_ACDC.yaml) — on the local
accelerator, and prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.json published:{}),
so the denominator is an estimated A100 reference throughput of 800 img/s
(PyTorch fp32/TF32 single-GPU step: student fwd+bwd + teacher fwd on 32
images, host-side data loading) — documented so the ratio is auditable.
vs_baseline = measured / 800; the driver's north star is vs_baseline ≥ 5.

Measurement notes (see CLAUDE.md): this dev environment reaches the TPU via
a tunnel; pipelined Execute dispatch costs <1 ms/iter (measured round 2 —
a null jit loops at 0.64 ms and K-steps-per-Execute unrolling changes
nothing), so the reported per-iter time is real serialized device compute.
The canonical-batch, readback-verified number is reported — no overhead
subtraction, no batch inflation.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# rbg is the TPU-native counter PRNG: threefry dropout-mask generation costs
# ~20% of the UNet train step (measured); parity is distributional anyway.
jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.config import Config
from hpfg_tpu.parallel.mesh import get_mesh, shard_batch
from hpfg_tpu.train.algorithms import build_algorithm
from hpfg_tpu.utils.runtime import enable_persistent_cache, require_live_device

A100_REF_IMG_PER_SEC = 800.0  # estimated PyTorch reference on A100 (see docstring)

LABEL_BS = 8
UNLABEL_BS = 24
HW = 224
WARMUP = 10
ITERS = 50


def main():
    require_live_device("bench.py")
    # cache only for non-CPU backends (XLA:CPU AOT entries can SIGILL on
    # reload, CLAUDE.md); decided from the now-live backend
    enable_persistent_cache(platform=jax.devices()[0].platform)
    cfg = Config(
        datasets="acdc", num_classes=4, in_channels=1,
        train_crop_size=[HW, HW], test_crop_size=[HW, HW],
        batch_size=LABEL_BS, unlabel_batch_size=UNLABEL_BS,
        label_num=0.05, consistency=0.1, consistency_rampup=200.0,
        ema_decay=0.99, model="unet", seed=1337,
        total_itrs=30000, step_size=200,
        opt="sgd", lr=0.01, weight_decay=1e-4, momentum=0.9,
        sched="medical", warmup_epochs=0, warmup_lr=1e-4, min_lr=1e-6,
    )
    algo = build_algorithm("mean_teacher", cfg, dtype=jnp.bfloat16)
    state = algo.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    mesh = get_mesh()
    batch = shard_batch(mesh, {
        "label_img": rng.normal(size=(LABEL_BS, HW, HW, 1)).astype(np.float32),
        "label": rng.integers(0, 4, (LABEL_BS, HW, HW)).astype(np.int32),
        "unlabel_img": rng.normal(
            size=(UNLABEL_BS, HW, HW, 1)).astype(np.float32),
    })

    step = jax.jit(algo.step, donate_argnums=(0,))
    # FLOPs of the exact compiled step (cost analysis; reused by the timed
    # loop via the jit cache) → published MFU (VERDICT r4 #4)
    from hpfg_tpu.utils.profiling import compiled_flops, mfu
    step_flops = compiled_flops(step.lower(state, batch).compile())
    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    # force a real device→host readback: catches silently failing executions
    warm_loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(warm_loss), f"non-finite warmup loss {warm_loss}"

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    final_loss = float(np.asarray(metrics["loss"]))  # sync + readback
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    n_chips = len(jax.devices())
    images_per_sec = ITERS * (LABEL_BS + UNLABEL_BS) / elapsed
    per_chip = images_per_sec / n_chips
    step_mfu = mfu(step_flops, elapsed / ITERS)
    print(json.dumps({
        "metric": "mean_teacher_unet_acdc_224_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / A100_REF_IMG_PER_SEC, 4),
        "step_gflops": round(step_flops / 1e9, 1),
        **({"mfu": round(step_mfu, 4)} if step_mfu is not None else {}),
    }))


if __name__ == "__main__":
    main()
