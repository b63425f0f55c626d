"""CPS — Cross Pseudo Supervision (reference: 2021_06_CVPR_CPS_ACDC.py:61-169).

Two independently initialized students; each supervises the other with hard
argmax pseudo-labels on the unlabeled half through Med_Sup_Loss, weighted by
the sigmoid consistency ramp. Both optimizers step on the joint loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.ops.losses import med_sup_loss
from hpfg_tpu.ops.rampup import sigmoid_rampup
from hpfg_tpu.train.algorithms import ALGORITHMS
from hpfg_tpu.train.algorithms.base import apply_train, ssl_batches
from hpfg_tpu.train.algorithms.dual import DualAlgorithm, DualState


@ALGORITHMS.register("cps")
class CPS(DualAlgorithm):
    name = "cps"

    def init_state(self, rng) -> DualState:
        rng, init_rng = jax.random.split(rng)
        m1, m2 = self._init_pair(init_rng, self.label_bs + self.unlabel_bs)
        return DualState(step=jnp.zeros((), jnp.int32), rng=rng,
                         model1=m1, model2=m2,
                         opt_state1=self.tx1.init(m1.params),
                         opt_state2=self.tx2.init(m2.params))

    def step(self, state: DualState, batch):
        cur_itrs = state.step + 1
        rng, r1, r2 = jax.random.split(state.rng, 3)
        lb = self.label_bs
        x = jnp.concatenate([batch["label_img"], batch["unlabel_img"]], axis=0)
        consistency_weight = self.consistency * sigmoid_rampup(
            cur_itrs // self.epoch_iters, self.rampup)

        def loss_fn(params_pair):
            p1, p2 = params_pair
            out1, new_m1 = apply_train(self.net1,
                                       state.model1.replace(params=p1), x, r1)
            out2, new_m2 = apply_train(self.net2,
                                       state.model2.replace(params=p2), x, r2)
            loss_sup = (med_sup_loss(out1[:lb], batch["label"], self.num_classes)
                        + med_sup_loss(out2[:lb], batch["label"], self.num_classes))
            pseudo1 = jax.lax.stop_gradient(jnp.argmax(out1[lb:], axis=-1))
            pseudo2 = jax.lax.stop_gradient(jnp.argmax(out2[lb:], axis=-1))
            loss_semi = (med_sup_loss(out1[lb:], pseudo2, self.num_classes)
                         + med_sup_loss(out2[lb:], pseudo1, self.num_classes))
            loss = loss_sup + consistency_weight * loss_semi
            return loss, (new_m1, new_m2, loss_sup, loss_semi)

        (loss, (new_m1, new_m2, loss_sup, loss_semi)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                (state.model1.params, state.model2.params)))
        g1, g2 = grads
        up1, opt1 = self.tx1.update(g1, state.opt_state1, state.model1.params)
        up2, opt2 = self.tx2.update(g2, state.opt_state2, state.model2.params)
        params1 = optax.apply_updates(state.model1.params, up1)
        params2 = optax.apply_updates(state.model2.params, up2)

        new_state = state.replace(
            step=cur_itrs, rng=rng,
            model1=new_m1.replace(params=params1),
            model2=new_m2.replace(params=params2),
            opt_state1=opt1, opt_state2=opt2)
        metrics = {
            "loss": loss, "loss_sup": loss_sup, "loss_semi": loss_semi,
            "consistency_weight": consistency_weight,
            "lr": self.schedule1(state.step),
        }
        return new_state, metrics

    def batches(self, loaders):
        return ssl_batches(loaders[0], loaders[1])

    def eval_models(self, state):
        return {"model1": (self.net1, state.model1),
                "model2": (self.net2, state.model2)}
