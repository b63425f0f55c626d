"""On-chip Mosaic layout probe for the SHIFT-im2col halo assembly.

The im2col gate (TPU_GATE_im2col.json, 2026-08-19) fails with
  tpu.concatenate: result/input offset mismatch on non-concat dimension
because the halo columns are built from VALUE slices at lane offset
(pix-1)*C = 112 and sublane offsets i*G % 8 != 0, and Mosaic cannot
relayout those offsets inside a concat even in fp32.

This probe compiles + EXECUTES four candidate constructions as tiny
standalone pallas_calls at the real failing shape (C=16, W=224, pix=8,
TH=112) and checks each against a NumPy oracle:

  p0_repro    — the committed construction (expected FAIL, sanity)
  p1_rollcol  — lcol made canonical via a full-width lane roll, but the
                per-dy row shifts still VALUE slices + concats
  p2_scratch  — roll-canonical lcol/rcol stored to VMEM scratch pads,
                per-dy slabs re-LOADED at misaligned row offsets
                (ref loads canonicalize layout; `_padded_rows` pattern)
  p3_subroll  — per-dy row shifts via pltpu.roll on the sublane axis

Run with the TPU free (one TPU job at a time). Results to
_chain/mosaic_probe.json.
"""
import json
import os
import traceback

INTERPRET = os.environ.get("HPFG_PROBE_INTERPRET", "0") == "1"
if INTERPRET:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, W, PIX, TH = 16, 224, 8, 112
THE, G = TH + 2, W // PIX
M = TH * G
NR = THE * G  # group rows

rng = np.random.default_rng(0)
X = rng.standard_normal((THE, W * C), dtype=np.float32)


def oracle(x):
    g32 = x.reshape(NR, PIX * C)
    j = np.arange(NR)
    lcol = np.where((j % G == G - 1)[:, None], 0.0, g32[:, (PIX - 1) * C:])
    rcol = np.where((j % G == 0)[:, None], 0.0, g32[:, :C])
    zrow = np.zeros((1, C), np.float32)
    lpad = np.concatenate([zrow, lcol], 0)
    rpad = np.concatenate([rcol, zrow], 0)
    halos = []
    for i in range(3):
        s = i * G
        halos += [lpad[s:s + M], rpad[s + 1:s + 1 + M]]
    return np.concatenate(halos, 1)


EXPECT = oracle(X)


def _cols(g32):
    """(lcol, rcol) with the boundary masks; lcol canonical via lane roll."""
    ridx = jax.lax.broadcasted_iota(jnp.int32, (NR, C), 0)
    lcol = jnp.where(ridx % G == G - 1, 0.0, pltpu.roll(g32, C, 1)[:, :C])
    rcol = jnp.where(ridx % G == 0, 0.0, g32[:, :C])
    return lcol, rcol


def k0_repro(x_ref, o_ref):
    g32 = x_ref[...].reshape(NR, PIX * C)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (NR, C), 0)
    lcol = jnp.where(ridx % G == G - 1, 0.0, g32[:, (PIX - 1) * C:])
    rcol = jnp.where(ridx % G == 0, 0.0, g32[:, :C])
    zrow = jnp.zeros((1, C), jnp.float32)
    halos = []
    for i in range(3):
        s = i * G
        left = (jnp.concatenate([zrow, lcol[:M - 1]], 0) if s == 0
                else lcol[s - 1:s - 1 + M])
        right = (rcol[s + 1:s + 1 + M] if s + 1 + M <= NR
                 else jnp.concatenate([rcol[s + 1:], zrow], 0))
        halos += [left, right]
    o_ref[...] = jnp.concatenate(halos, 1)


def k1_rollcol(x_ref, o_ref):
    g32 = x_ref[...].reshape(NR, PIX * C)
    lcol, rcol = _cols(g32)
    zrow = jnp.zeros((1, C), jnp.float32)
    halos = []
    for i in range(3):
        s = i * G
        left = (jnp.concatenate([zrow, lcol[:M - 1]], 0) if s == 0
                else lcol[s - 1:s - 1 + M])
        right = (rcol[s + 1:s + 1 + M] if s + 1 + M <= NR
                 else jnp.concatenate([rcol[s + 1:], zrow], 0))
        halos += [left, right]
    o_ref[...] = jnp.concatenate(halos, 1)


def k2_scratch(x_ref, o_ref, lpad, rpad):
    g32 = x_ref[...].reshape(NR, PIX * C)
    lcol, rcol = _cols(g32)
    lpad[0:1] = jnp.zeros((1, C), jnp.float32)
    lpad[1:1 + NR] = lcol
    rpad[0:NR] = rcol
    rpad[NR:NR + 1] = jnp.zeros((1, C), jnp.float32)
    halos = []
    for i in range(3):
        s = i * G
        halos += [lpad[s:s + M], rpad[s + 1:s + 1 + M]]
    o_ref[...] = jnp.concatenate(halos, 1)


def k3_subroll(x_ref, o_ref):
    g32 = x_ref[...].reshape(NR, PIX * C)
    lcol, rcol = _cols(g32)
    zrow = jnp.zeros((1, C), jnp.float32)
    lpadv = jnp.concatenate([zrow, lcol], 0)
    rpadv = jnp.concatenate([rcol, zrow], 0)
    halos = []
    for i in range(3):
        s = i * G
        halos += [(lpadv[:M] if s == 0 else pltpu.roll(lpadv, -s, 0)[:M]),
                  pltpu.roll(rpadv, -(s + 1), 0)[:M]]
    o_ref[...] = jnp.concatenate(halos, 1)


def k4_evenroll(x_ref, o_ref):
    """Row shifts via sublane rolls of the even-row-count [NR, C] columns
    (NR % 8 == 0, tile-aligned) + iota masks for the two out-of-range edge
    rows — no odd-row rolls, no sublane concats, no scratch."""
    g32 = x_ref[...].reshape(NR, PIX * C)
    lcol, rcol = _cols(g32)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (M, C), 0)
    halos = []
    for i in range(3):
        s = i * G
        # left_i[j] = lcol[s+j-1], 0 when s+j-1 < 0
        lsh = pltpu.roll(lcol, (1 - s) % NR, 0)[:M]
        halos.append(jnp.where(jrow + s - 1 < 0, 0.0, lsh))
        # right_i[j] = rcol[s+j+1], 0 when s+j+1 >= NR
        rsh = pltpu.roll(rcol, (-(s + 1)) % NR, 0)[:M]
        halos.append(jnp.where(jrow + s + 1 >= NR, 0.0, rsh))
    o_ref[...] = jnp.concatenate(halos, 1)


def run(name, kernel, scratch=()):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, 6 * C), jnp.float32),
            scratch_shapes=list(scratch),
            interpret=INTERPRET,
        )(jnp.asarray(X))
        got = np.asarray(out)
        err = float(np.abs(got - EXPECT).max())
        ok = err < 1e-6
        print(f"[probe] {name}: {'OK' if ok else 'WRONG'} max_err={err}")
        return {"name": name, "lowered": True, "exact": ok, "max_err": err}
    except Exception as e:
        first = str(e).split("\n")[0][:300]
        print(f"[probe] {name}: FAIL {type(e).__name__}: {first}")
        return {"name": name, "lowered": False, "error": first,
                "trace_tail": traceback.format_exc()[-600:]}


def main():
    print(f"[probe] devices: {jax.devices()}")
    pads = (pltpu.VMEM((NR + 1, C), jnp.float32),
            pltpu.VMEM((NR + 1, C), jnp.float32))
    results = [
        run("p0_repro", k0_repro),
        run("p1_rollcol", k1_rollcol),
        run("p2_scratch", k2_scratch, pads),
        run("p3_subroll", k3_subroll),
        run("p4_evenroll", k4_evenroll),
    ]
    tag = "_interp" if INTERPRET else ""
    with open(f"_chain/mosaic_probe{tag}.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"mosaic_probe": [
        (r["name"], r.get("exact", False)) for r in results]}))


if __name__ == "__main__":
    main()
