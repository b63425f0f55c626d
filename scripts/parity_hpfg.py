"""Training-trajectory parity: PyTorch reference HPFG vs the rebuild.

Same methodology as scripts/parity_train.py (Mean-Teacher), applied to the
FLAGSHIP algorithm. The torch side re-drives the reference's own modules
(model/unet.py UNet_Plus, utils/loss/dense_loss.py Dense_Loss,
utils/loss/diceloss.py DiceLoss) with the exact HPFG loop of
/root/reference/main.py:125-223:

  * two labeled batches + one unlabeled; labeled#2 tiled x(U/L)
  * CutMix mix into model1's input; CPS pseudo labels composited with the
    mask (:149-180)
  * loss = sup(m1)+sup(m2) + 7*w*pseudo_sup1
         + w*(consistency2 [gated it>=1000] + Dense_Loss(h1,ema_h1)
         + Dense_Loss(h2,ema_h2)),  w = consistency*linear_rampup(it//150)
  * dual EMA after the step: model1.encoder/decoder -> model2 backbone
    (main.py:68-76,208), then model2 -> ema_model (:209)

The reference's BoxMaskGenerator lives in utils/utils.py, whose module-level
imports (torchvision) are absent in this image — both sides draw masks from
this repo's ops/cutmix.box_masks, whose box/overlap semantics are
parity-tested against the reference (tests/test_ops.py). Masks, dropout and
init RNGs differ per framework -> distributional parity, band ±0.5 dice.

Run (CPU, ~20 min on 1 core):
    JAX_PLATFORMS=cpu python scripts/parity_hpfg.py --iters 1200

Appends an HPFG section to PARITY_TRAIN.md.
"""

from __future__ import annotations

import argparse
import copy
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
EMA_DECAY = pt.EMA_DECAY
CONSISTENCY, RAMPUP = pt.CONSISTENCY, pt.RAMPUP
CPS_SCALE = 7.0
MT_GATE = 1000


def _load_ref(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REFERENCE_ROOT, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def hpfg_schedule(n_slices: int, iters: int, seed: int = 0):
    """(labeled, labeled#2, unlabeled) index triples, shared by both sides."""
    rng = np.random.default_rng(seed)
    n_lab = n_slices // 2
    return [(rng.integers(0, n_lab, LABEL_BS),
             rng.integers(0, n_lab, LABEL_BS),
             rng.integers(0, n_slices, UNLABEL_BS))
            for _ in range(iters)]


def cutmix_masks(iters: int, seed: int = 123):
    """[iters, U, H, W, 1] float32 masks from the repo's parity-tested
    generator (drawn once, outside both training loops)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hpfg_tpu.ops.cutmix import box_masks

    out = []
    key = jax.random.PRNGKey(seed)
    for i in range(iters):
        out.append(np.asarray(box_masks(jax.random.fold_in(key, i),
                                        UNLABEL_BS, (HW, HW))))
    return np.stack(out)


def linear_w(it: int) -> float:
    # consistency * linear_rampup(it // 150, rampup) (main.py:183-185,
    # utils/utils.py:89-95)
    return CONSISTENCY * float(min((it // 150) / RAMPUP, 1.0))


# ---------------------------------------------------------------------------
# torch reference side (main.py:125-223 re-driven on reference modules)
# ---------------------------------------------------------------------------

def run_torch(imgs, lbls, vols, sched, masks, iters, eval_every,
              seed=0):
    import torch

    torch.manual_seed(seed)
    ref_unet = _load_ref("ref_unet_hpfg", "model/unet.py")
    ref_dense = _load_ref("ref_dense", "utils/loss/dense_loss.py")
    ref_dice = _load_ref("ref_dice", "utils/loss/diceloss.py")

    model1 = ref_unet.UNet_Plus(in_channels=1, num_classes=NUM_CLASSES)
    model2 = ref_unet.UNet_Plus(in_channels=1, num_classes=NUM_CLASSES)
    ema = copy.deepcopy(model2)
    for p in ema.parameters():
        p.requires_grad_(False)
    opt1 = torch.optim.SGD(model1.parameters(), lr=LR, momentum=MOMENTUM,
                           weight_decay=WD)
    opt2 = torch.optim.SGD(model2.parameters(), lr=LR, momentum=MOMENTUM,
                           weight_decay=WD)
    dense_loss = ref_dense.Dense_Loss(LABEL_BS + UNLABEL_BS,
                                      torch.device("cpu"))
    dice_loss = ref_dice.DiceLoss(NUM_CLASSES)
    ce = torch.nn.CrossEntropyLoss(ignore_index=255)

    t_imgs = torch.from_numpy(imgs)[:, None]
    t_lbls = torch.from_numpy(lbls)
    reps = UNLABEL_BS // LABEL_BS

    def eval_dice(model):
        model.eval()
        preds = []
        with torch.no_grad():
            for vol, _ in vols:
                x = torch.from_numpy(vol)[:, None]
                preds.append(model.val(x).argmax(1).numpy())
        model.train()
        return pt.mean_dice(preds, [g for _, g in vols])

    curve = []
    for it, (li, li1, ui) in enumerate(sched):
        cur = it + 1
        label_img, target = t_imgs[li], t_lbls[li]
        label_img1 = t_imgs[li1].repeat(reps, 1, 1, 1)
        target1 = t_lbls[li1].repeat(reps, 1, 1)
        unlabel = t_imgs[ui]
        # ops/cutmix masks are NHWC; reference uses NCHW (main.py:145-150)
        m = torch.from_numpy(masks[it]).permute(0, 3, 1, 2)

        batch_un_mix = label_img1 * (1.0 - m) + unlabel * m
        batch_mix = torch.cat([label_img, batch_un_mix], dim=0)
        volume_batch = torch.cat([label_img, unlabel], dim=0)

        out1, _, _ = model1(batch_mix)
        soft1 = torch.softmax(out1, dim=1)
        out2, h1, h2 = model2(volume_batch)
        soft2 = torch.softmax(out2, dim=1)
        with torch.no_grad():
            ema_out, ema_h1, ema_h2 = ema(volume_batch)
            ema_soft = torch.softmax(ema_out.detach(), dim=1)

        loss_sup = 0.5 * (ce(out1[:LABEL_BS], target)
                          + dice_loss(soft1[:LABEL_BS], target.unsqueeze(1))) \
            + 0.5 * (ce(out2[:LABEL_BS], target)
                     + dice_loss(soft2[:LABEL_BS], target.unsqueeze(1)))
        loss_contr = dense_loss(h1, ema_h1) + dense_loss(h2, ema_h2)

        m_hw = m.squeeze(1)
        pseudo1 = torch.argmax(ema_soft[LABEL_BS:], dim=1).float()
        pseudo1 = target1.float() * (1.0 - m_hw) + pseudo1 * m_hw
        pseudo_sup1 = dice_loss(soft1[LABEL_BS:], pseudo1.unsqueeze(1))

        w = linear_w(cur)
        cons2 = torch.mean((soft2[LABEL_BS:] - ema_soft[LABEL_BS:]) ** 2) \
            if cur >= MT_GATE else torch.zeros(())
        loss = loss_sup + CPS_SCALE * w * pseudo_sup1 \
            + w * cons2 + w * loss_contr

        lr = pt.lr_at(it, iters)
        for opt in (opt1, opt2):
            for g in opt.param_groups:
                g["lr"] = lr
        opt1.zero_grad()
        opt2.zero_grad()
        loss.backward()
        opt1.step()
        opt2.step()

        alpha = min(1.0 - 1.0 / cur, EMA_DECAY)
        with torch.no_grad():
            # model1 backbone -> model2 backbone (main.py:68-76, 208)
            for sub in ("encoder", "decoder"):
                for pe, ps in zip(getattr(model2, sub).parameters(),
                                  getattr(model1, sub).parameters()):
                    pe.mul_(alpha).add_(ps, alpha=1 - alpha)
            # model2 -> ema (utils/utils.py:82-86, main.py:209)
            for pe, ps in zip(ema.parameters(), model2.parameters()):
                pe.mul_(alpha).add_(ps, alpha=1 - alpha)

        if cur % eval_every == 0:
            d = eval_dice(model1)
            curve.append((cur, d, float(loss)))
            print(f"[torch] iter {cur}: m1 dice {d:.4f} loss {float(loss):.4f}",
                  flush=True)
    return curve, eval_dice(ema)


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
        label_num=0.5, consistency=CONSISTENCY, consistency_rampup=RAMPUP,
        ema_decay=EMA_DECAY, model="unet_plus", seed=0, total_itrs=iters,
        step_size=eval_every, opt="sgd", lr=LR, weight_decay=WD,
        momentum=MOMENTUM, sched="medical",
    )
    algo = build_algorithm("hpfg", cfg, dtype=jnp.float32)
    state = algo.init_state(jax.random.PRNGKey(seed))
    step = jax.jit(algo.step, donate_argnums=(0,))

    imgs4 = imgs[..., None]

    def eval_dice(state, which="model1"):
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
    for it, (li, li1, ui) in enumerate(sched):
        batch = {
            "label_img": jnp.asarray(imgs4[li]),
            "label": jnp.asarray(lbls[li].astype(np.int32)),
            "label_img1": jnp.asarray(imgs4[li1]),
            "label1": jnp.asarray(lbls[li1].astype(np.int32)),
            "unlabel_img": jnp.asarray(imgs4[ui]),
        }
        state, metrics = step(state, batch)
        if (it + 1) % eval_every == 0:
            d = eval_dice(state)
            loss = float(np.asarray(metrics["loss"]))
            curve.append((it + 1, d, loss))
            print(f"[jax]   iter {it+1}: m1 dice {d:.4f} loss {loss:.4f}",
                  flush=True)
    return curve, eval_dice(state, "ema")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--data", default="/tmp/parity_hpfg_acdc")
    ap.add_argument("--seed", type=int, default=0,
                    help="framework RNG seed (init + dropout); data, batch "
                         "schedule and CutMix masks stay fixed across seeds")
    ap.add_argument("--no-append", action="store_true",
                    help="print tail stats only (multi-seed study runs)")
    args = ap.parse_args()

    imgs, lbls, vols = pt.make_data(args.data)
    sched = hpfg_schedule(len(imgs), args.iters)
    masks = cutmix_masks(args.iters)

    t0 = time.time()
    torch_curve, torch_ema = run_torch(imgs, lbls, vols, sched, masks,
                                       args.iters, args.eval_every,
                                       seed=args.seed)
    t_torch = time.time() - t0
    t0 = time.time()
    jax_curve, jax_ema = run_jax(imgs, lbls, vols, sched, args.iters,
                                 args.eval_every, seed=args.seed)
    t_jax = time.time() - t0

    if args.no_append:
        k = min(5, len(jax_curve))
        tail_t = float(np.mean([d for _, d, _ in torch_curve[-k:]]))
        tail_j = float(np.mean([d for _, d, _ in jax_curve[-k:]]))
        print(f"SEED {args.seed}: torch tail {tail_t:.4f} "
              f"jax tail {tail_j:.4f} gap {tail_j - tail_t:+.4f} "
              f"ema torch {torch_ema:.4f} jax {jax_ema:.4f}")
        return

    tail = min(5, len(torch_curve))
    tgap = (np.mean([d for _, d, _ in jax_curve[-tail:]])
            - np.mean([d for _, d, _ in torch_curve[-tail:]]))
    lines = [
        "",
        "## HPFG (flagship)",
        "",
        f"Same matched setting, {args.iters} iters ({HW}² fp32, "
        f"{LABEL_BS}+{UNLABEL_BS} batch, reps x{UNLABEL_BS // LABEL_BS}, "
        f"CPS weight {CPS_SCALE:g}, MT gate {MT_GATE}, linear rampup, "
        "dual EMA). Reference driver: main.py:125-223 over the reference's "
        "own UNet_Plus / Dense_Loss / DiceLoss modules.",
        "",
        "| iter | torch m1 dice | jax m1 dice | Δ dice | torch loss | jax loss |",
        "|---|---|---|---|---|---|",
    ]
    for (it, td, tl), (_, jd, jl) in zip(torch_curve, jax_curve):
        lines.append(f"| {it} | {td:.4f} | {jd:.4f} | {jd - td:+.4f} "
                     f"| {tl:.4f} | {jl:.4f} |")
    lines += [
        "",
        f"Converged-tail gap (mean of last {tail} evals): {tgap:+.4f} "
        f"({'WITHIN' if abs(tgap) < 0.005 else 'vs'} the ±0.5-point band). "
        f"Final EMA-teacher dice: torch {torch_ema:.4f}, jax {jax_ema:.4f}.",
        f"Wall time (1-core CPU): torch {t_torch:.0f}s, jax {t_jax:.0f}s "
        "(incl. compile).",
    ]
    with open(os.path.join(REPO, "PARITY_TRAIN.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
