"""Training-trajectory parity: PyTorch reference CPS vs the rebuild.

Same methodology as scripts/parity_train.py (Mean-Teacher) and
scripts/parity_hpfg.py, applied to the dual-student CPS recipe of
/root/reference/2021_06_CVPR_CPS_ACDC.py:61-169:

  * two independently-initialized students, one concatenated
    labeled+unlabeled forward through each
  * loss = Med_Sup(out1_lab, y) + Med_Sup(out2_lab, y)
         + w(t) * (Med_Sup(out1_unlab, argmax out2_unlab.detach())
                 + Med_Sup(out2_unlab, argmax out1_unlab.detach()))
    with w(t) = consistency * sigmoid_rampup(it // 150, rampup)
    (get_current_consistency_weight, utils/utils.py:67-69)
  * two SGD optimizers, both stepped on the joint loss; per-iteration
    medical poly-0.9 decay on both (2021_06...py:115-120)

The torch side drives the reference's own model/unet.py UNet with the
Med_Sup_Loss definition restated inline (utils/loss/medloss.py:46-56).
Init and dropout RNGs differ per framework -> distributional (not bitwise)
parity; acceptance band ±0.5 dice points (BASELINE.md). CPS exercises the
rebuild's dual-model path (DualAlgorithm: one joint backward, two optax
updates) that Mean-Teacher/HPFG parity does not isolate.

Run (CPU, ~15 min on 1 core):
    JAX_PLATFORMS=cpu python scripts/parity_cps.py --iters 1000

Appends a CPS section to PARITY_TRAIN.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

import parity_train as pt  # noqa: E402  (shared helpers, constants)

HW = pt.HW
NUM_CLASSES = pt.NUM_CLASSES
LABEL_BS, UNLABEL_BS = pt.LABEL_BS, pt.UNLABEL_BS
LR, MOMENTUM, WD = pt.LR, pt.MOMENTUM, pt.WD


# ---------------------------------------------------------------------------
# torch reference side
# ---------------------------------------------------------------------------

def run_torch(imgs, lbls, vols, sched, iters, eval_every, seed=0):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    spec = importlib.util.spec_from_file_location(
        "ref_unet", f"{REFERENCE_ROOT}/model/unet.py")
    ref_unet = importlib.util.module_from_spec(spec)
    sys.modules["ref_unet"] = ref_unet
    spec.loader.exec_module(ref_unet)

    # two independently-initialized students (sequential manual_seed draws)
    model1 = ref_unet.UNet(in_channels=1, num_classes=NUM_CLASSES)
    model2 = ref_unet.UNet(in_channels=1, num_classes=NUM_CLASSES)
    opt1 = torch.optim.SGD(model1.parameters(), lr=LR, momentum=MOMENTUM,
                           weight_decay=WD)
    opt2 = torch.optim.SGD(model2.parameters(), lr=LR, momentum=MOMENTUM,
                           weight_decay=WD)

    def med_sup_loss(logits, target):
        ce = F.cross_entropy(logits, target, ignore_index=255)
        soft = torch.softmax(logits, dim=1)
        onehot = F.one_hot(target, NUM_CLASSES).permute(0, 3, 1, 2).float()
        dims = (0, 2, 3)
        inter = (soft * onehot).sum(dims)
        denom = soft.sum(dims) + onehot.sum(dims)
        dice = 1.0 - ((2 * inter + 1e-5) / (denom + 1e-5)).mean()
        return 0.5 * ce + 0.5 * dice

    t_imgs = torch.from_numpy(imgs)[:, None]
    t_lbls = torch.from_numpy(lbls)

    def eval_dice(model):
        model.eval()
        preds = []
        with torch.no_grad():
            for vol, _ in vols:
                x = torch.from_numpy(vol)[:, None]
                preds.append(model(x).argmax(1).numpy())
        model.train()
        return pt.mean_dice(preds, [g for _, g in vols])

    curve = []
    for it, (li, ui) in enumerate(sched):
        x = torch.cat([t_imgs[li], t_imgs[ui]])
        y = t_lbls[li]
        out1, out2 = model1(x), model2(x)
        loss_sup = (med_sup_loss(out1[:LABEL_BS], y)
                    + med_sup_loss(out2[:LABEL_BS], y))
        pseudo1 = out1[LABEL_BS:].detach().argmax(1)
        pseudo2 = out2[LABEL_BS:].detach().argmax(1)
        loss_semi = (med_sup_loss(out1[LABEL_BS:], pseudo2)
                     + med_sup_loss(out2[LABEL_BS:], pseudo1))
        loss = loss_sup + pt.rampup_weight(it) * loss_semi
        for opt in (opt1, opt2):
            for g in opt.param_groups:
                g["lr"] = pt.lr_at(it, iters)
            opt.zero_grad()
        loss.backward()
        opt1.step()
        opt2.step()
        if (it + 1) % eval_every == 0:
            d1 = eval_dice(model1)
            curve.append((it + 1, d1, float(loss)))
            print(f"[torch] iter {it+1}: m1 dice {d1:.4f} "
                  f"loss {float(loss):.4f}", flush=True)
    return curve, eval_dice(model2)


# ---------------------------------------------------------------------------
# rebuild side
# ---------------------------------------------------------------------------

def run_jax(imgs, lbls, vols, sched, iters, eval_every, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hpfg_tpu.config import Config
    from hpfg_tpu.evals.volume import SliceForward
    from hpfg_tpu.train.algorithms import build_algorithm
    from hpfg_tpu.train.algorithms.base import eval_variables

    cfg = Config(
        datasets="acdc", num_classes=NUM_CLASSES, in_channels=1,
        train_crop_size=[HW, HW], test_crop_size=[HW, HW],
        batch_size=LABEL_BS, unlabel_batch_size=UNLABEL_BS,
        label_num=0.5, consistency=pt.CONSISTENCY,
        consistency_rampup=pt.RAMPUP, model="unet", seed=0,
        total_itrs=iters, step_size=eval_every, opt="sgd", lr=LR,
        weight_decay=WD, momentum=MOMENTUM, sched="medical",
    )
    algo = build_algorithm("cps", cfg, dtype=jnp.float32)
    state = algo.init_state(jax.random.PRNGKey(seed))
    step = jax.jit(algo.step, donate_argnums=(0,))

    imgs4 = imgs[..., None]

    def eval_dice(state, which):
        model, mstate = algo.eval_models(state)[which]

        def apply_fn(variables, x):
            if hasattr(model, "val"):
                return model.apply(variables, x, method=model.val)
            return model.apply(variables, x, train=False)

        fwd = SliceForward(apply_fn, chunk=8, wire_dtype=np.float32)
        variables = eval_variables(mstate)
        preds = [fwd(variables, v[..., None].astype(np.float32))
                 for v, _ in vols]
        return pt.mean_dice(preds, [g for _, g in vols])

    curve = []
    for it, (li, ui) in enumerate(sched):
        batch = {
            "label_img": jnp.asarray(imgs4[li]),
            "label": jnp.asarray(lbls[li].astype(np.int32)),
            "unlabel_img": jnp.asarray(imgs4[ui]),
        }
        state, metrics = step(state, batch)
        if (it + 1) % eval_every == 0:
            d1 = eval_dice(state, "model1")
            loss = float(np.asarray(metrics["loss"]))
            curve.append((it + 1, d1, loss))
            print(f"[jax]   iter {it+1}: m1 dice {d1:.4f} loss {loss:.4f}",
                  flush=True)
    return curve, eval_dice(state, "model2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--data", default="/tmp/parity_acdc_cps")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_TRAIN.md"))
    ap.add_argument("--seed", type=int, default=0,
                    help="framework RNG seed (init + dropout); the data and "
                         "batch schedule stay fixed across seeds")
    ap.add_argument("--no-append", action="store_true",
                    help="print tail stats only (multi-seed study runs)")
    args = ap.parse_args()

    imgs, lbls, vols = pt.make_data(args.data)
    sched = pt.batch_schedule(len(imgs), args.iters)

    t0 = time.time()
    torch_curve, torch_m2 = run_torch(imgs, lbls, vols, sched, args.iters,
                                      args.eval_every, seed=args.seed)
    t_torch = time.time() - t0
    t0 = time.time()
    jax_curve, jax_m2 = run_jax(imgs, lbls, vols, sched, args.iters,
                                args.eval_every, seed=args.seed)
    t_jax = time.time() - t0

    if args.no_append:
        k = min(5, len(jax_curve))
        tail_t = float(np.mean([d for _, d, _ in torch_curve[-k:]]))
        tail_j = float(np.mean([d for _, d, _ in jax_curve[-k:]]))
        print(f"SEED {args.seed}: torch tail {tail_t:.4f} "
              f"jax tail {tail_j:.4f} gap {tail_j - tail_t:+.4f} "
              f"m2 torch {torch_m2:.4f} jax {jax_m2:.4f}")
        return

    lines = [
        "", "", "## CPS (dual students)", "",
        f"Same matched setting, {args.iters} iters ({HW}² fp32, "
        f"{LABEL_BS}+{UNLABEL_BS} batch, joint backward, two SGD "
        "optimizers, per-iter medical decay, sigmoid consistency ramp). "
        "Reference driver: 2021_06_CVPR_CPS_ACDC.py:61-169 over the "
        "reference's own model/unet.py; exercises the rebuild's "
        "DualAlgorithm path (one joint grad, two optax updates).",
        "",
        "| iter | torch m1 dice | jax m1 dice | Δ dice "
        "| torch loss | jax loss |",
        "|---|---|---|---|---|---|",
    ]
    for (it, dt_, lt), (_, dj, lj) in zip(torch_curve, jax_curve):
        lines.append(f"| {it} | {dt_:.4f} | {dj:.4f} | {dj - dt_:+.4f} "
                     f"| {lt:.4f} | {lj:.4f} |")
    k = min(5, len(jax_curve))
    tail_t = float(np.mean([d for _, d, _ in torch_curve[-k:]]))
    tail_j = float(np.mean([d for _, d, _ in jax_curve[-k:]]))
    gap = tail_j - tail_t
    lines += [
        "",
        f"Converged-tail gap (mean of last {k} model1 evals): {gap:+.4f} "
        f"({'WITHIN' if abs(gap) <= 0.005 else 'OUTSIDE'} the ±0.5-point "
        f"band). Final model2 dice: torch {torch_m2:.4f}, jax {jax_m2:.4f} "
        f"(Δ {jax_m2 - torch_m2:+.4f}).",
        f"Wall time (1-core CPU): torch {t_torch:.0f}s, jax {t_jax:.0f}s "
        "(incl. compile).",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended CPS section to {args.out}")


if __name__ == "__main__":
    main()
