"""HPFG — Hybrid Pseudo-labeling and Feature-Guided SSL (the flagship paper
algorithm; reference: main.py:79-289).

Per iteration (reference line refs in parens):
  * draw 1 unlabeled batch (24) + TWO independent labeled batches (8 each);
    the second labeled batch is tiled ×(U/L) to unlabeled size (:128-143)
  * sample CutMix box masks M (:145-147; here on-device, ops/cutmix.py)
  * batch_un_mix = label1·(1−M) + unlabel·M; model1 (student A, *_plus)
    forwards [label, batch_un_mix] (:149-152)
  * model2 (student B, *_plus) and its EMA teacher forward
    [label, unlabel]; teacher no-grad (:155-161)
  * loss_sup   = ½(CE+Dice) per student on the labeled half (:164-170)
  * loss_contr = Dense_Loss(h1, ema_h1) + Dense_Loss(h2, ema_h2) (:172)
  * pseudo labels: argmax of teacher on unlabeled, CutMix-composited with the
    tiled labeled GT (:176-178); dice pseudo-supervision for model1 (:180)
  * MT MSE teacher→model2, gated cur_itrs ≥ 1000; the model1 consistency
    term is permanently 0 (commented out at :190)
  * loss = sup + 7·w·pseudo_sup1 + w·(consistency2 + loss_contr),
    w = consistency · linear_rampup(it // 150, rampup) (:183-197)
  * dual EMA: model1.encoder/decoder → model2 backbone (:208, main.py:68-76)
    then model2 → ema_model (:209), in that order after the optimizer steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.ops.cutmix import box_masks
from hpfg_tpu.ops.ema import ema_update, ema_update_subtree
from hpfg_tpu.ops.losses import (
    dense_contrastive_loss,
    dice_loss_multiclass,
    med_sup_loss,
)
from hpfg_tpu.ops.rampup import linear_rampup
from hpfg_tpu.train.algorithms import ALGORITHMS
from hpfg_tpu.train.algorithms.base import apply_train, tree_copy
from hpfg_tpu.train.algorithms.dual import DualAlgorithm, TeacherDualState


@ALGORITHMS.register("hpfg")
class HPFG(DualAlgorithm):
    name = "hpfg"
    requires_features = True  # both students must be *_plus models
    mt_gate_iters: int = 1000
    cps_scale: float = 7.0
    backbone_keys = ("encoder", "decoder")

    def init_state(self, rng) -> TeacherDualState:
        rng, init_rng = jax.random.split(rng)
        m1, m2 = self._init_pair(init_rng, self.label_bs + self.unlabel_bs)
        return TeacherDualState(step=jnp.zeros((), jnp.int32), rng=rng,
                                model1=m1, model2=m2, ema=tree_copy(m2),
                                opt_state1=self.tx1.init(m1.params),
                                opt_state2=self.tx2.init(m2.params))

    def step(self, state: TeacherDualState, batch):
        cur_itrs = state.step + 1
        rng, r1, r2, rt, rm = jax.random.split(state.rng, 5)
        lb, ub = self.label_bs, self.unlabel_bs
        reps = ub // lb

        label_img = batch["label_img"]
        unlabel_img = batch["unlabel_img"]
        label_img1 = jnp.tile(batch["label_img1"], (reps, 1, 1, 1))
        target_label1 = jnp.tile(batch["label1"], (reps, 1, 1))

        mask = box_masks(rm, ub, self.crop)  # [U, H, W, 1] in {0, 1}
        batch_un_mix = label_img1 * (1.0 - mask) + unlabel_img * mask
        batch_mix = jnp.concatenate([label_img, batch_un_mix], axis=0)
        volume_batch = jnp.concatenate([label_img, unlabel_img], axis=0)

        # teacher (EMA of model2) forward, no grad
        (ema_out, ema_h1, ema_h2), new_ema = apply_train(
            self.net2, state.ema, volume_batch, rt)
        ema_soft = jax.lax.stop_gradient(jax.nn.softmax(ema_out, axis=-1))
        ema_h1 = jax.lax.stop_gradient(ema_h1)
        ema_h2 = jax.lax.stop_gradient(ema_h2)

        w = self.consistency * linear_rampup(cur_itrs // self.epoch_iters, self.rampup)
        mt_on = (cur_itrs >= self.mt_gate_iters).astype(jnp.float32)

        mask_hw = mask[..., 0]
        pseudo1 = jnp.argmax(ema_soft[lb:], axis=-1).astype(jnp.float32)
        pseudo1 = target_label1.astype(jnp.float32) * (1.0 - mask_hw) \
            + pseudo1 * mask_hw
        pseudo1 = pseudo1.astype(jnp.int32)

        def loss_fn(params_pair):
            p1, p2 = params_pair
            (out1, _, _), new_m1 = apply_train(
                self.net1, state.model1.replace(params=p1), batch_mix, r1)
            (out2, h1, h2), new_m2 = apply_train(
                self.net2, state.model2.replace(params=p2), volume_batch, r2)
            soft1 = jax.nn.softmax(out1, axis=-1)
            soft2 = jax.nn.softmax(out2, axis=-1)

            loss_sup = (med_sup_loss(out1[:lb], batch["label"], self.num_classes)
                        + med_sup_loss(out2[:lb], batch["label"], self.num_classes))
            loss_contr = (dense_contrastive_loss(h1, ema_h1)
                          + dense_contrastive_loss(h2, ema_h2))
            pseudo_sup1 = dice_loss_multiclass(soft1[lb:], pseudo1,
                                               self.num_classes)
            consistency2 = mt_on * jnp.mean((soft2[lb:] - ema_soft[lb:]) ** 2)

            model1_loss = self.cps_scale * w * pseudo_sup1
            model2_loss = w * consistency2 + w * loss_contr
            loss_semi = model1_loss + model2_loss
            loss = loss_sup + loss_semi
            return loss, (new_m1, new_m2, loss_sup, loss_semi, loss_contr,
                          pseudo_sup1)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (state.model1.params, state.model2.params))
        new_m1, new_m2, loss_sup, loss_semi, loss_contr, pseudo_sup1 = aux
        g1, g2 = grads
        up1, opt1 = self.tx1.update(g1, state.opt_state1, state.model1.params)
        up2, opt2 = self.tx2.update(g2, state.opt_state2, state.model2.params)
        params1 = optax.apply_updates(state.model1.params, up1)
        params2 = optax.apply_updates(state.model2.params, up2)

        # dual EMA, same order as the reference (:208-209):
        # 1) model2's backbone ← EMA of model1's freshly stepped backbone
        params2 = ema_update_subtree(params1, params2, self.ema_decay,
                                     cur_itrs, keys=self.backbone_keys)
        # 2) ema_model ← EMA of the (backbone-mixed) model2
        ema_params = ema_update(params2, state.ema.params, self.ema_decay,
                                cur_itrs)

        new_state = state.replace(
            step=cur_itrs, rng=rng,
            model1=new_m1.replace(params=params1),
            model2=new_m2.replace(params=params2),
            ema=new_ema.replace(params=ema_params),
            opt_state1=opt1, opt_state2=opt2)
        metrics = {
            "loss": loss, "loss_sup": loss_sup, "loss_semi": loss_semi,
            "loss_contrastive": loss_contr, "pseudo_sup1": pseudo_sup1,
            "consistency_weight": w,
            "lr1": self.schedule1(state.step),
            "lr2": self.schedule2(state.step),
        }
        return new_state, metrics

    def batches(self, loaders):
        """Unlabeled stream + TWO independent labeled cycles
        (reference: main.py:119-135)."""
        label_loader, unlabel_loader = loaders[0], loaders[1]
        it_a = label_loader.cycle()
        it_b = label_loader.cycle()
        while True:
            for unlabel_img, _ in unlabel_loader:
                label_img, label = next(it_a)
                label_img1, label1 = next(it_b)
                yield {
                    "label_img": label_img, "label": label,
                    "label_img1": label_img1, "label1": label1,
                    "unlabel_img": unlabel_img,
                }

    def eval_models(self, state):
        return {"model1": (self.net1, state.model1),
                "model2": (self.net2, state.model2),
                "ema": (self.net2, state.ema)}
