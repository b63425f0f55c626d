"""Per-op device-time audit of the canonical bench step (TPU).

Rebuild of the round-3 `_copy_audit.py` (lost to a host reset) as a
maintained tool: runs the exact bench.py workload (mean_teacher unet 8+24
@ 224x224 bf16) under jax.profiler.trace and attributes device time per
XLA op, grouped into categories (Pallas custom-calls, fusions, copies /
transposes, convolutions, reduces, scatter/gather, infeed/outfeed, other).
This is the tool that located the 6.46 ms/step of layout-copy glue behind
the round-3 fused-pair/stem/pool work (BENCH_NOTES.md "Round-3 copy
audit") — re-run it whenever the step composition changes to find the next
target.

Usage (TPU must be free — ONE job at a time, CLAUDE.md):
    timeout 1800 python -u scripts/step_audit.py [n_steps]

Prints a category table + the top-40 ops by device time, then writes the
raw rows to /tmp/step_audit.json.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hpfg_tpu.utils.runtime import enable_persistent_cache, require_live_device  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_default_prng_impl", "rbg")

LABEL_BS, UNLABEL_BS, HW = 8, 24, 224

CATEGORIES = [
    # (label, regex over the op name) — first match wins
    ("pallas conv/wattn (custom-call)", r"custom-call|tpu_custom_call|conv_rows|fused_conv|wgrad|dgrad|window_attention"),
    ("copy / transpose / bitcast", r"^(%?)(copy|transpose|bitcast)"),
    ("convolution (XLA)", r"convolution"),
    ("reduce / reduce-window", r"reduce"),
    ("scatter / gather / dynamic", r"scatter|gather|dynamic-slice|dynamic-update"),
    ("select-and-scatter", r"select-and-scatter"),
    ("dot / matmul", r"^(%?)dot"),
    ("fusion (elementwise etc.)", r"^(%?)fusion"),
    ("infeed/outfeed/host", r"infeed|outfeed|host|transfer"),
]


def build_step():
    from hpfg_tpu.config import Config
    from hpfg_tpu.parallel.mesh import get_mesh, shard_batch
    from hpfg_tpu.train.algorithms import build_algorithm

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
    return step, state, batch


def device_events(trace_dir):
    """Yield (name, dur_us) for events on TPU/device tracks of the newest
    trace.json.gz under trace_dir (TensorBoard profile plugin layout)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map pid -> process name from metadata events
    pname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pname.items()
                   if re.search(r"TPU|/device|Chip", n, re.I)}
    if not device_pids:  # fall back: anything that's not clearly host python
        device_pids = {p for p, n in pname.items()
                       if n and "python" not in n.lower()}
        print(f"[audit] no explicit TPU track; using {sorted(device_pids)} "
              f"of {pname}")
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and "dur" in e):
            yield e.get("name", "?"), float(e["dur"])


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    require_live_device("step_audit")
    enable_persistent_cache(platform=jax.devices()[0].platform)
    step, state, batch = build_step()
    for _ in range(5):
        state, metrics = step(state, batch)
    float(np.asarray(metrics["loss"]))  # real sync (tunnel, CLAUDE.md)

    trace_dir = "/tmp/step_audit_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, metrics = step(state, batch)
        float(np.asarray(metrics["loss"]))

    totals, rows = {}, {}
    for name, dur in device_events(trace_dir):
        rows[name] = rows.get(name, 0.0) + dur
    for name, dur in rows.items():
        for label, pat in CATEGORIES:
            if re.search(pat, name, re.I):
                break
        else:
            label = "other"
        totals[label] = totals.get(label, 0.0) + dur

    grand = sum(totals.values())
    print(f"\n== step_audit: {n_steps} steps, device total "
          f"{grand / 1e3:.2f} ms ({grand / 1e3 / n_steps:.3f} ms/step) ==")
    for label, dur in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {dur / 1e3 / n_steps:8.3f} ms/step  {label}")
    print("\n-- top 40 ops --")
    for name, dur in sorted(rows.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {dur / 1e3 / n_steps:8.3f} ms/step  {name[:110]}")
    with open("/tmp/step_audit.json", "w") as f:
        json.dump({"n_steps": n_steps, "rows": rows, "totals": totals}, f)


if __name__ == "__main__":
    main()
