"""UAMT — Uncertainty-Aware Mean Teacher
(reference: 2019_07_MICCAI_Uncertainty_Aware_ACDC.py:82-222).

Mean-Teacher plus MC-dropout uncertainty gating:
  * teacher consistency target = ONE noisy teacher pass on the unlabeled half
    (gaussian noise clamp(N(0, 0.1), ±0.2), :129-132)
  * uncertainty = entropy of the MEAN of T=8 noisy teacher passes (:134-147)
  * threshold ramped (0.75 + 0.25·sigmoid_rampup(it, total)) · ln 2 (:158)
  * consistency = sum(mask·mse) / (2·sum(mask) + 1e-16) (:159-160)

TPU note: the reference loops T/2 times over a doubled batch; here the T
noisy passes run as a `lax.map` over stacked rng keys — one compiled loop,
teacher weights read once from HBM per pass.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.ops.ema import ema_update
from hpfg_tpu.ops.losses import med_sup_loss, softmax_mse_loss
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


class UAMTState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model: ModelState
    ema: ModelState
    opt_state: Any


def _noisy(rng, x):
    noise = jnp.clip(jax.random.normal(rng, x.shape, x.dtype) * 0.1, -0.2, 0.2)
    return x + noise


@ALGORITHMS.register(["uamt", "uncertainty_aware"])
class UAMT(Algorithm):
    name = "uamt"
    T: int = 8

    def __init__(self, cfg, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        self.model = self._build(cfg)
        self.tx, self.schedule = build_optimizer(cfg)
        self.label_bs = int(cfg.batch_size)
        self.unlabel_bs = int(cfg.unlabel_batch_size)
        self.consistency = float(cfg.get("consistency", 0.1))
        self.rampup = float(cfg.get("consistency_rampup", 200.0))
        self.ema_decay = float(cfg.get("ema_decay", 0.99))
        self.total_itrs = int(cfg.total_itrs)

    def init_state(self, rng) -> UAMTState:
        rng, init_rng = jax.random.split(rng)
        mstate = init_model(self.model, init_rng,
                            self._sample_shape(self.label_bs + self.unlabel_bs))
        return UAMTState(step=jnp.zeros((), jnp.int32), rng=rng,
                         model=mstate, ema=tree_copy(mstate),
                         opt_state=self.tx.init(mstate.params))

    def step(self, state: UAMTState, batch):
        cur_itrs = state.step + 1
        rng, s_rng, t_rng, n_rng, mc_rng = jax.random.split(state.rng, 5)
        lb = self.label_bs
        unlabeled = batch["unlabel_img"]
        x = jnp.concatenate([batch["label_img"], unlabeled], axis=0)

        # single noisy teacher pass → consistency target
        ema_out, new_ema = apply_train(self.model, state.ema,
                                       _noisy(n_rng, unlabeled), t_rng)
        ema_out = jax.lax.stop_gradient(ema_out)

        # T noisy MC passes → uncertainty map (teacher, no grad)
        def one_pass(keys):
            noise_key, drop_key = keys
            out, _ = apply_train(self.model, state.ema,
                                 _noisy(noise_key, unlabeled), drop_key)
            return jax.nn.softmax(out, axis=-1)

        keys = (jax.random.split(mc_rng, self.T),
                jax.random.split(jax.random.fold_in(mc_rng, 1), self.T))
        preds = jax.lax.map(one_pass, keys)  # [T, U, H, W, C]
        preds = jax.lax.stop_gradient(jnp.mean(preds, axis=0))
        uncertainty = -jnp.sum(preds * jnp.log(preds + 1e-6), axis=-1,
                               keepdims=True)  # [U, H, W, 1]

        threshold = (0.75 + 0.25 * sigmoid_rampup(
            cur_itrs, self.total_itrs)) * jnp.log(2.0)
        mask = (uncertainty < threshold).astype(jnp.float32)

        consistency_weight = self.consistency * sigmoid_rampup(
            cur_itrs // self.epoch_iters, self.rampup)

        def loss_fn(params):
            out, new_model = apply_train(
                self.model, state.model.replace(params=params), x, s_rng)
            loss_sup = med_sup_loss(out[:lb], batch["label"], self.num_classes)
            dist = softmax_mse_loss(out[lb:], ema_out)
            loss_cons = jnp.sum(mask * dist) / (2 * jnp.sum(mask) + 1e-16)
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
            "threshold": threshold,
            "lr": self.schedule(state.step),
        }
        return new_state, metrics

    def batches(self, loaders):
        return ssl_batches(loaders[0], loaders[1])

    def eval_models(self, state):
        return {"model1": (self.model, state.model),
                "model2": (self.model, state.ema)}
