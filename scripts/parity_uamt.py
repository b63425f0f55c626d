"""Training-trajectory parity: PyTorch reference UAMT vs the rebuild.

Same harness as parity_train.py (shared phantoms, identical batch-index
schedule, fp32, no augmentation), but the Uncertainty-Aware Mean-Teacher
recipe (/root/reference/2019_07_MICCAI_Uncertainty_Aware_ACDC.py:82-176):

  sup  = 0.5·CE(ignore 255) + 0.5·soft-dice            (labeled half, :150-154)
  target = ONE noisy teacher pass on the unlabeled half (:128-131)
  uncertainty = entropy of the mean of T=8 noisy teacher passes, run as
      T/2 iterations over a DOUBLED unlabeled batch     (:133-146)
  mask = uncertainty < (0.75 + 0.25·sigmoid_rampup(it, total))·ln 2  (:160-161)
  cons = Σ(mask·(softmax(student_u) − softmax(teacher))²) / (2·Σmask + 1e-16)
  loss = sup + w(it)·cons,  w = consistency·sigmoid_rampup(it//150, rampup)

The rebuild side runs `mc_mode=unroll, mc_chunk=2` — the statically-unrolled
doubled-batch MC form whose BN-batch semantics match the reference loop
exactly (hpfg_tpu/train/algorithms/uamt.py). Dropout/init/noise RNGs differ
by framework -> distributional parity, ±0.5-dice band (BASELINE.md).

Run (CPU, ~25 min on 1 core):
    JAX_PLATFORMS=cpu python scripts/parity_uamt.py --iters 1000

Appends a "## UAMT" section to PARITY_TRAIN.md.
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
REFERENCE_ROOT = "/root/reference"

from parity_train import (  # noqa: E402
    CONSISTENCY, EMA_DECAY, HW, LABEL_BS, LR, MOMENTUM, NUM_CLASSES,
    RAMPUP, UNLABEL_BS, WD, batch_schedule, lr_at, make_data, mean_dice,
    rampup_weight)

T_MC = 8


def sigmoid_rampup_iters(it: int, total: int) -> float:
    """sigmoid_rampup over raw iterations (threshold ramp, reference
    utils/utils.py:70-79 with length=total_itrs)."""
    t = np.clip(it / total, 0.0, 1.0)
    return float(np.exp(-5.0 * (1.0 - t) ** 2))


# ---------------------------------------------------------------------------
# torch reference side (recipe restated from the reference driver)
# ---------------------------------------------------------------------------

def run_torch(imgs, lbls, vols, sched, iters, eval_every):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    spec = importlib.util.spec_from_file_location(
        "ref_unet", f"{REFERENCE_ROOT}/model/unet.py")
    ref_unet = importlib.util.module_from_spec(spec)
    sys.modules["ref_unet"] = ref_unet
    spec.loader.exec_module(ref_unet)

    model = ref_unet.UNet(in_channels=1, num_classes=NUM_CLASSES)
    ema = ref_unet.UNet(in_channels=1, num_classes=NUM_CLASSES)
    ema.load_state_dict(model.state_dict())
    for p in ema.parameters():
        p.requires_grad_(False)
    opt = torch.optim.SGD(model.parameters(), lr=LR, momentum=MOMENTUM,
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

    t_imgs = torch.from_numpy(imgs)[:, None]  # [N,1,H,W]
    t_lbls = torch.from_numpy(lbls)

    def eval_dice():
        model.eval()
        preds = []
        with torch.no_grad():
            for vol, _ in vols:
                x = torch.from_numpy(vol)[:, None]
                preds.append(model(x).argmax(1).numpy())
        model.train()
        return mean_dice(preds, [g for _, g in vols])

    def noisy(x):
        return x + torch.clamp(torch.randn_like(x) * 0.1, -0.2, 0.2)

    curve = []
    for it, (li, ui) in enumerate(sched):
        cur = it + 1
        xl, y = t_imgs[li], t_lbls[li]
        xu = t_imgs[ui]
        out = model(torch.cat([xl, xu]))

        with torch.no_grad():
            # consistency target: one noisy pass (:128-131)
            ema_out = ema(noisy(xu))
            # uncertainty: T/2 doubled-batch passes (:133-146)
            preds = []
            for _ in range(T_MC // 2):
                xr = xu.repeat(2, 1, 1, 1)
                preds.append(torch.softmax(ema(noisy(xr)), dim=1))
            preds = torch.cat(preds).reshape(
                T_MC, xu.shape[0], NUM_CLASSES, HW, HW).mean(0)
            unc = -(preds * torch.log(preds + 1e-6)).sum(1, keepdim=True)

        sup = med_sup_loss(out[:LABEL_BS], y)
        thr = (0.75 + 0.25 * sigmoid_rampup_iters(cur, iters)) * np.log(2.0)
        mask = (unc < thr).float()
        dist = (torch.softmax(out[LABEL_BS:], 1)
                - torch.softmax(ema_out, 1)) ** 2
        cons = (mask * dist).sum() / (2 * mask.sum() + 1e-16)
        loss = sup + rampup_weight(it) * cons

        for g in opt.param_groups:
            g["lr"] = lr_at(it, iters)
        opt.zero_grad()
        loss.backward()
        opt.step()
        alpha = min(1.0 - 1.0 / (it + 1), EMA_DECAY)
        with torch.no_grad():
            for pe, ps in zip(ema.parameters(), model.parameters()):
                pe.mul_(alpha).add_(ps, alpha=1 - alpha)
        if cur % eval_every == 0:
            d = eval_dice()
            curve.append((cur, d, float(loss)))
            print(f"[torch] iter {cur}: dice {d:.4f} loss {float(loss):.4f}",
                  flush=True)
    return curve


# ---------------------------------------------------------------------------
# rebuild side
# ---------------------------------------------------------------------------

def run_jax(imgs, lbls, vols, sched, iters, eval_every):
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
        label_num=0.5, consistency=CONSISTENCY, consistency_rampup=RAMPUP,
        ema_decay=EMA_DECAY, model="unet", seed=0, total_itrs=iters,
        step_size=eval_every, opt="sgd", lr=LR, weight_decay=WD,
        momentum=MOMENTUM, sched="medical",
        mc_mode="unroll", mc_chunk=2,  # reference doubled-batch BN semantics
    )
    algo = build_algorithm("uamt", cfg, dtype=jnp.float32)
    state = algo.init_state(jax.random.PRNGKey(0))
    step = jax.jit(algo.step, donate_argnums=(0,))

    imgs4 = imgs[..., None]

    def eval_dice(state):
        model, mstate = algo.eval_models(state)["model1"]

        def apply_fn(variables, x):
            if hasattr(model, "val"):
                return model.apply(variables, x, method=model.val)
            return model.apply(variables, x, train=False)

        fwd = SliceForward(apply_fn, chunk=8, wire_dtype=np.float32)
        variables = eval_variables(mstate)
        preds = [fwd(variables, v[..., None].astype(np.float32))
                 for v, _ in vols]
        return mean_dice(preds, [g for _, g in vols])

    curve = []
    for it, (li, ui) in enumerate(sched):
        batch = {
            "label_img": jnp.asarray(imgs4[li]),
            "label": jnp.asarray(lbls[li].astype(np.int32)),
            "unlabel_img": jnp.asarray(imgs4[ui]),
        }
        state, metrics = step(state, batch)
        if (it + 1) % eval_every == 0:
            d = eval_dice(state)
            loss = float(np.asarray(metrics["loss"]))
            curve.append((it + 1, d, loss))
            print(f"[jax]   iter {it+1}: dice {d:.4f} loss {loss:.4f}",
                  flush=True)
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--data", default="/tmp/parity_acdc_uamt")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_TRAIN.md"))
    args = ap.parse_args()

    imgs, lbls, vols = make_data(args.data)
    sched = batch_schedule(len(imgs), args.iters)

    t0 = time.time()
    torch_curve = run_torch(imgs, lbls, vols, sched, args.iters,
                            args.eval_every)
    t_torch = time.time() - t0
    t0 = time.time()
    jax_curve = run_jax(imgs, lbls, vols, sched, args.iters, args.eval_every)
    t_jax = time.time() - t0

    lines = [
        "",
        "",
        "## UAMT (uncertainty-gated Mean-Teacher)",
        "",
        f"Same matched setting ({HW}² fp32, {LABEL_BS}+{UNLABEL_BS} batch), "
        "UAMT recipe: one noisy teacher target, T=8 MC-dropout passes as "
        "T/2 doubled-batch forwards, entropy threshold "
        "(0.75+0.25·rampup)·ln2, masked-MSE consistency. Reference driver: "
        "2019_07_MICCAI_Uncertainty_Aware_ACDC.py:82-176. Rebuild side runs "
        "mc_mode=unroll/mc_chunk=2 (train/algorithms/uamt.py) — the form "
        "whose BN-batch shape matches the reference loop exactly.",
        "",
        "| iter | torch dice | jax dice | Δ dice | torch loss | jax loss |",
        "|---|---|---|---|---|---|",
    ]
    for (it, dt_, lt), (_, dj, lj) in zip(torch_curve, jax_curve):
        lines.append(f"| {it} | {dt_:.4f} | {dj:.4f} | {dj - dt_:+.4f} "
                     f"| {lt:.4f} | {lj:.4f} |")
    k = min(5, len(jax_curve))
    tail_t = float(np.mean([d for _, d, _ in torch_curve[-k:]]))
    tail_j = float(np.mean([d for _, d, _ in jax_curve[-k:]]))
    tail_gap = tail_j - tail_t
    lines += [
        "",
        f"Converged-tail gap (mean of last {k} evals): {tail_gap:+.4f} "
        f"({'WITHIN' if abs(tail_gap) <= 0.005 else 'OUTSIDE'} the "
        "±0.5-point band).",
        f"Wall time (1-core CPU): torch {t_torch:.0f}s, jax {t_jax:.0f}s "
        "(incl. compile).",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended UAMT section to {args.out} (tail gap {tail_gap:+.4f})")


if __name__ == "__main__":
    main()
