"""S4CVNet (reference: 2022_08_CVPR_S4CVNet_ACDC.py:70-244).

Dual students + an EMA teacher of model2. Per iteration:
  * both students forward [labeled, unlabeled]; teacher forwards NOISED
    unlabeled input (clamp(N(0, 0.1), ±0.2), :108-110)
  * supervised CE+Dice for both students
  * cross pseudo supervision both directions, dice-only, weight 7·w_cps
    with LINEAR ramp (:136-145)
  * MT MSE consistency teacher→both students, gated cur_itrs >= 1000 (:146-150)
  * EMA update: model2 → ema (:166)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.ops.ema import ema_update
from hpfg_tpu.ops.losses import dice_loss_multiclass, med_sup_loss
from hpfg_tpu.ops.rampup import linear_rampup
from hpfg_tpu.train.algorithms import ALGORITHMS
from hpfg_tpu.train.algorithms.base import apply_train, ssl_batches, tree_copy
from hpfg_tpu.train.algorithms.dual import DualAlgorithm, TeacherDualState


@ALGORITHMS.register("s4cvnet")
class S4CVNet(DualAlgorithm):
    name = "s4cvnet"
    mt_gate_iters: int = 1000
    cps_scale: float = 7.0

    def init_state(self, rng) -> TeacherDualState:
        rng, init_rng = jax.random.split(rng)
        m1, m2 = self._init_pair(init_rng, self.label_bs + self.unlabel_bs)
        return TeacherDualState(step=jnp.zeros((), jnp.int32), rng=rng,
                                model1=m1, model2=m2, ema=tree_copy(m2),
                                opt_state1=self.tx1.init(m1.params),
                                opt_state2=self.tx2.init(m2.params))

    def step(self, state: TeacherDualState, batch):
        cur_itrs = state.step + 1
        rng, r1, r2, rt, rn = jax.random.split(state.rng, 5)
        lb = self.label_bs
        x = jnp.concatenate([batch["label_img"], batch["unlabel_img"]], axis=0)

        noise = jnp.clip(jax.random.normal(rn, batch["unlabel_img"].shape) * 0.1,
                         -0.2, 0.2)
        ema_out, new_ema = apply_train(self.net2, state.ema,
                                       batch["unlabel_img"] + noise, rt)
        ema_soft = jax.lax.stop_gradient(jax.nn.softmax(ema_out, axis=-1))

        w = self.consistency * linear_rampup(cur_itrs // self.epoch_iters, self.rampup)
        mt_on = (cur_itrs >= self.mt_gate_iters).astype(jnp.float32)

        def loss_fn(params_pair):
            p1, p2 = params_pair
            out1, new_m1 = apply_train(self.net1,
                                       state.model1.replace(params=p1), x, r1)
            out2, new_m2 = apply_train(self.net2,
                                       state.model2.replace(params=p2), x, r2)
            soft1 = jax.nn.softmax(out1, axis=-1)
            soft2 = jax.nn.softmax(out2, axis=-1)
            loss_sup = (med_sup_loss(out1[:lb], batch["label"], self.num_classes)
                        + med_sup_loss(out2[:lb], batch["label"], self.num_classes))
            pseudo1 = jax.lax.stop_gradient(jnp.argmax(soft1[lb:], axis=-1))
            pseudo2 = jax.lax.stop_gradient(jnp.argmax(soft2[lb:], axis=-1))
            ps1 = dice_loss_multiclass(soft1[lb:], pseudo2, self.num_classes)
            ps2 = dice_loss_multiclass(soft2[lb:], pseudo1, self.num_classes)
            cons1 = mt_on * jnp.mean((soft1[lb:] - ema_soft) ** 2)
            cons2 = mt_on * jnp.mean((soft2[lb:] - ema_soft) ** 2)
            loss_semi = (self.cps_scale * w * (ps1 + ps2)
                         + w * (cons1 + cons2))
            loss = loss_sup + loss_semi
            return loss, (new_m1, new_m2, loss_sup, loss_semi)

        (loss, (new_m1, new_m2, loss_sup, loss_semi)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                (state.model1.params, state.model2.params)))
        g1, g2 = grads
        up1, opt1 = self.tx1.update(g1, state.opt_state1, state.model1.params)
        up2, opt2 = self.tx2.update(g2, state.opt_state2, state.model2.params)
        params1 = optax.apply_updates(state.model1.params, up1)
        params2 = optax.apply_updates(state.model2.params, up2)
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
            "consistency_weight": w,
            "lr1": self.schedule1(state.step),
            "lr2": self.schedule2(state.step),
        }
        return new_state, metrics

    def batches(self, loaders):
        return ssl_batches(loaders[0], loaders[1])

    def eval_models(self, state):
        return {"model1": (self.net1, state.model1),
                "model2": (self.net2, state.model2),
                "ema": (self.net2, state.ema)}
