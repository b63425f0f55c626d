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


def build_step(cfg_path: str | None = None):
    from hpfg_tpu.config import Config
    from hpfg_tpu.parallel.mesh import get_mesh, shard_batch
    from hpfg_tpu.train.algorithms import build_algorithm

    if cfg_path:
        # audit any canonical config's donated step (e.g. the HPFG
        # flagship) — shapes + batch synthesized exactly as bench_all does
        from bench_all import make_batch
        from hpfg_tpu.config import load_config

        cfg = load_config(cfg_path)
        algo = build_algorithm(str(cfg.algorithm), cfg, dtype=jnp.bfloat16)
        state = algo.init_state(jax.random.PRNGKey(0))
        batch = shard_batch(get_mesh(), make_batch(cfg, str(cfg.algorithm)))
        return jax.jit(algo.step, donate_argnums=(0,)), state, batch

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
    """Yield (name, dur_us, args) for LEAF events on TPU/device tracks of
    the newest trace.json.gz under trace_dir (TensorBoard profile plugin
    layout). Parent spans — the per-Execute `jit_step(...)` envelope and
    the bare step-number rows — are skipped so totals aren't double-counted
    (they made 'other' read 97 ms/step in the first r12 run). The XLA
    device track carries `args` metadata per op: `source` (repo file:line),
    `tf_op` (jaxpr path incl. jvp/transpose markers), `hlo_category`,
    `long_name` (full HLO with shapes/layouts) — everything needed to
    attribute a hot op without an HLO dump."""
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
            name = e.get("name", "?")
            if name.startswith("jit_") or re.fullmatch(r"\d+", name):
                continue  # parent/envelope spans, not ops
            yield name, float(e["dur"]), e.get("args") or {}


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else None
    require_live_device("step_audit")
    enable_persistent_cache(platform=jax.devices()[0].platform)
    step, state, batch = build_step(cfg_path)
    for _ in range(5):
        state, metrics = step(state, batch)
    float(np.asarray(metrics["loss"]))  # real sync (tunnel, CLAUDE.md)

    trace_dir = "/tmp/step_audit_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, metrics = step(state, batch)
        float(np.asarray(metrics["loss"]))

    totals, rows, detail = {}, {}, {}
    by_src, by_site, by_cat = {}, {}, {}
    site_re = re.compile(r"(in_conv|down\d|up\d|_head|loss|softmax)")
    for name, dur, args in device_events(trace_dir):
        rows[name] = rows.get(name, 0.0) + dur
        if name not in detail and ("long_name" in args or "source" in args):
            detail[name] = {"long_name": args.get("long_name", "")[:400],
                            "source": args.get("source", ""),
                            "tf_op": args.get("tf_op", "")[:200]}
        cat = args.get("hlo_category", "?")
        by_cat[cat] = by_cat.get(cat, 0.0) + dur
        src = args.get("source", "?").replace("/root/repo/", "")
        by_src[src] = by_src.get(src, 0.0) + dur
        tf = args.get("tf_op", "")
        stage = ("bwd" if "transpose(jvp" in tf
                 else "eval" if tf.startswith("jit(step)/UNet")
                 else "fwd")
        m = site_re.search(tf)
        site = m.group(1) if m else "(glue)"
        key = f"{site}/{stage}"
        by_site[key] = by_site.get(key, 0.0) + dur
    for name, dur in rows.items():
        for label, pat in CATEGORIES:
            if re.search(pat, name, re.I):
                break
        else:
            label = "other"
        totals[label] = totals.get(label, 0.0) + dur

    grand = sum(totals.values())
    ms = lambda d: d / 1e3 / n_steps

    def table(title, d, top):
        print(f"\n-- {title} --")
        for k, v in sorted(d.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms(v):8.3f} ms/step  {k[:100]}")

    print(f"\n== step_audit: {n_steps} steps, device total "
          f"{grand / 1e3:.2f} ms ({ms(grand):.3f} ms/step) ==")
    table("by op category (name regex)", totals, 12)
    table("by hlo_category", by_cat, 12)
    table("by source line", by_src, 25)
    table("by model site / pass", by_site, 30)
    table("top ops", rows, 30)
    # shape-level attribution of the hottest copies / data-formatting ops
    # (VERDICT r4 #2: the ~8 ms/step of copies needs operand shapes to fix)
    print("\n-- top copy/format ops with HLO shapes --")
    fmt = [(v, k) for k, v in rows.items()
           if re.match(r"copy|transpose|bitcast|convert|reshape|tile|pad",
                       k)]
    for v, k in sorted(fmt, reverse=True)[:20]:
        d = detail.get(k, {})
        print(f"  {ms(v):7.3f} ms/step {k}\n"
              f"      {d.get('long_name', '')[:160]}\n"
              f"      src={d.get('source', '?')} tf={d.get('tf_op', '')[:90]}")
    top_detail = {k: detail[k] for _, k in
                  sorted(((v, k) for k, v in rows.items()), reverse=True)[:80]
                  if k in detail}
    with open("/tmp/step_audit.json", "w") as f:
        json.dump({"n_steps": n_steps, "rows": rows, "totals": totals,
                   "by_source": by_src, "by_site": by_site,
                   "by_hlo_category": by_cat, "detail": top_detail}, f)


if __name__ == "__main__":
    main()
