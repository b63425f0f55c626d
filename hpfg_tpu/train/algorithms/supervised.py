"""Supervised baseline (reference: sup_ACDC.py:59-125 `Supervise`, train.py:14-84).

Plain CE+Dice training of a single model. Loss weights configurable:
sup_ACDC.py uses 0.5/0.5 (Med_Sup_Loss); train.py's variant uses 0.4/0.6
(train.py:48) — select via cfg.ce_weight / cfg.dice_weight.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.ops.losses import med_sup_loss
from hpfg_tpu.train.algorithms import ALGORITHMS
from hpfg_tpu.train.algorithms.base import (
    Algorithm,
    ModelState,
    apply_train,
    init_model,
    sup_batches,
)
from hpfg_tpu.train.optim import build_optimizer


class SupervisedState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model: ModelState
    opt_state: Any


@ALGORITHMS.register(["supervised", "sup"])
class Supervised(Algorithm):
    name = "supervised"

    def __init__(self, cfg, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        self.model = self._build(cfg)
        self.tx, self.schedule = build_optimizer(cfg)
        self.ce_weight = float(cfg.get("ce_weight", 0.5))
        self.dice_weight = float(cfg.get("dice_weight", 0.5))

    def init_state(self, rng) -> SupervisedState:
        rng, init_rng = jax.random.split(rng)
        mstate = init_model(self.model, init_rng,
                            self._sample_shape(int(self.cfg.batch_size)))
        return SupervisedState(step=jnp.zeros((), jnp.int32), rng=rng,
                               model=mstate,
                               opt_state=self.tx.init(mstate.params))

    def step(self, state: SupervisedState, batch):
        rng, d_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logits, new_model = apply_train(
                self.model, state.model.replace(params=params),
                batch["image"], d_rng)
            if isinstance(logits, tuple):
                # *_plus models return (logits, high, head); supervised
                # training consumes logits only (reference ccnet_* 100%
                # configs pair sup datasets with plus models)
                logits = logits[0]
            loss = med_sup_loss(logits, batch["label"], self.num_classes,
                                self.ce_weight, self.dice_weight)
            return loss, new_model

        (loss, new_model), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.model.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.model.params)
        params = optax.apply_updates(state.model.params, updates)
        new_state = state.replace(
            step=state.step + 1, rng=rng,
            model=new_model.replace(params=params), opt_state=opt_state)
        metrics = {"loss": loss, "lr": self.schedule(state.step)}
        return new_state, metrics

    def batches(self, loaders):
        return sup_batches(loaders[0])

    def eval_models(self, state):
        return {"model1": (self.model, state.model)}
