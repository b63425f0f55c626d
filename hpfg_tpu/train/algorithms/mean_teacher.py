"""Mean-Teacher (reference: 2017_03_NIPS_Mean-Teacher_ACDC.py:63-162).

Student + EMA teacher. Per iteration:
  * x = concat(labeled, unlabeled)
  * supervised Med_Sup_Loss on the labeled half of the student output
  * MSE between student/teacher softmax on the unlabeled half, weighted by
    consistency * sigmoid_rampup(step // 150, rampup)
  * EMA update of teacher params with warmup alpha.

Both forwards run in TRAIN mode (teacher keeps dropout noise and evolves its
own BN running stats — exactly the reference's `ema_model.train()` behavior,
2017_03…py:70; EMA copies parameters only, not buffers, utils/utils.py:82-86).
The whole iteration is one jitted XLA program; teacher and student parameters
stay resident in HBM.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.ops.ema import ema_update
from hpfg_tpu.ops.losses import med_sup_loss
from hpfg_tpu.ops.rampup import sigmoid_rampup
from hpfg_tpu.train.algorithms import ALGORITHMS
from hpfg_tpu.train.algorithms.base import (
    Algorithm,
    ModelState,
    apply_train,
    init_model,
    ssl_batches,
    tree_copy,
)
from hpfg_tpu.train.optim import build_optimizer


class MeanTeacherState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model: ModelState
    ema: ModelState
    opt_state: Any


@ALGORITHMS.register(["mean_teacher", "mt"])
class MeanTeacher(Algorithm):
    name = "mean_teacher"

    def __init__(self, cfg, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        self.model = self._build(cfg)
        self.tx, self.schedule = build_optimizer(cfg)
        self.label_bs = int(cfg.batch_size)
        self.unlabel_bs = int(cfg.unlabel_batch_size)
        self.consistency = float(cfg.get("consistency", 0.1))
        self.rampup = float(cfg.get("consistency_rampup", 200.0))
        self.ema_decay = float(cfg.get("ema_decay", 0.99))

    def init_state(self, rng) -> MeanTeacherState:
        rng, init_rng = jax.random.split(rng)
        mstate = init_model(self.model, init_rng,
                            self._sample_shape(self.label_bs + self.unlabel_bs))
        # teacher starts as a fresh-buffer copy of the student
        # (reference deepcopy, 2017_03…py:55; see base.tree_copy)
        return MeanTeacherState(step=jnp.zeros((), jnp.int32), rng=rng,
                                model=mstate, ema=tree_copy(mstate),
                                opt_state=self.tx.init(mstate.params))

    def step(self, state: MeanTeacherState, batch):
        cur_itrs = state.step + 1  # reference increments before use
        rng, s_rng, t_rng = jax.random.split(state.rng, 3)
        lb = self.label_bs

        x = jnp.concatenate([batch["label_img"], batch["unlabel_img"]], axis=0)

        # teacher forward (no grad), train mode
        ema_out, new_ema = apply_train(self.model, state.ema, x, t_rng)
        ema_soft = jax.lax.stop_gradient(jax.nn.softmax(ema_out, axis=-1))

        consistency_weight = self.consistency * sigmoid_rampup(
            cur_itrs // self.epoch_iters, self.rampup)

        def loss_fn(params):
            out, new_model = apply_train(
                self.model, state.model.replace(params=params), x, s_rng)
            out_soft = jax.nn.softmax(out, axis=-1)
            loss_sup = med_sup_loss(out[:lb], batch["label"], self.num_classes)
            loss_cons = jnp.mean((out_soft[lb:] - ema_soft[lb:]) ** 2)
            loss = loss_sup + consistency_weight * loss_cons
            return loss, (new_model, loss_sup, loss_cons)

        (loss, (new_model, loss_sup, loss_cons)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.model.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.model.params)
        params = optax.apply_updates(state.model.params, updates)

        ema_params = ema_update(params, state.ema.params, self.ema_decay,
                                cur_itrs)

        new_state = state.replace(
            step=cur_itrs, rng=rng,
            model=new_model.replace(params=params),
            ema=new_ema.replace(params=ema_params),
            opt_state=opt_state)
        metrics = {
            "loss": loss,
            "loss_sup": loss_sup,
            "loss_consistency": loss_cons,
            "consistency_weight": consistency_weight,
            "lr": self.schedule(state.step),
        }
        return new_state, metrics

    def batches(self, loaders):
        return ssl_batches(loaders[0], loaders[1])

    def eval_models(self, state):
        return {"model1": (self.model, state.model),
                "model2": (self.model, state.ema)}
