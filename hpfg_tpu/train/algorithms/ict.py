"""ICT-MedSeg — Interpolation Consistency Training
(reference: 2022_02_ISBI_ICT-MedSeg_ACDC.py:65-195).

The unlabeled batch is split in half and beta(α, α)-mixed pairwise
(:112-117); the student sees [labeled, mixed]; the EMA teacher's predictions
on the two unmixed halves are mixed with the SAME factors (:124-127) and the
consistency term is the softmax MSE between them. EMA teacher as in MT.
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


class ICTState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model: ModelState
    ema: ModelState
    opt_state: Any


@ALGORITHMS.register(["ict", "ict_medseg", "scc"])
class ICTMedSeg(Algorithm):
    """`scc` alias: 2022_06-CMIG_SCC.py is a byte-level near-copy of the ICT
    trainer pointing at a missing config (reference: 2022_06-CMIG_SCC.py:19)."""

    name = "ict"

    def __init__(self, cfg, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        self.model = self._build(cfg)
        self.tx, self.schedule = build_optimizer(cfg)
        self.label_bs = int(cfg.batch_size)
        self.unlabel_bs = int(cfg.unlabel_batch_size)
        self.consistency = float(cfg.get("consistency", 0.1))
        self.rampup = float(cfg.get("consistency_rampup", 200.0))
        self.ema_decay = float(cfg.get("ema_decay", 0.99))
        self.ict_alpha = float(cfg.get("ict_alpha", 0.2))

    def init_state(self, rng) -> ICTState:
        rng, init_rng = jax.random.split(rng)
        mstate = init_model(
            self.model, init_rng,
            self._sample_shape(self.label_bs + self.unlabel_bs // 2))
        return ICTState(step=jnp.zeros((), jnp.int32), rng=rng,
                        model=mstate, ema=tree_copy(mstate),
                        opt_state=self.tx.init(mstate.params))

    def step(self, state: ICTState, batch):
        cur_itrs = state.step + 1
        rng, s_rng, t_rng, mix_rng = jax.random.split(state.rng, 4)
        lb = self.label_bs
        half = self.unlabel_bs // 2
        u0 = batch["unlabel_img"][:half]
        u1 = batch["unlabel_img"][half:half * 2]

        factors = jax.random.beta(mix_rng, self.ict_alpha, self.ict_alpha,
                                  (half, 1, 1, 1)).astype(jnp.float32)
        mixed = u0 * (1.0 - factors) + u1 * factors
        x = jnp.concatenate([batch["label_img"], mixed], axis=0)

        t_rng0, t_rng1 = jax.random.split(t_rng)
        ema0, new_ema = apply_train(self.model, state.ema, u0, t_rng0)
        ema1, new_ema = apply_train(self.model, new_ema, u1, t_rng1)
        pred_mixed = jax.lax.stop_gradient(
            jax.nn.softmax(ema0, axis=-1) * (1.0 - factors)
            + jax.nn.softmax(ema1, axis=-1) * factors)

        consistency_weight = self.consistency * sigmoid_rampup(
            cur_itrs // self.epoch_iters, self.rampup)

        def loss_fn(params):
            out, new_model = apply_train(
                self.model, state.model.replace(params=params), x, s_rng)
            out_soft = jax.nn.softmax(out, axis=-1)
            loss_sup = med_sup_loss(out[:lb], batch["label"], self.num_classes)
            loss_cons = jnp.mean((out_soft[lb:] - pred_mixed) ** 2)
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
            "loss": loss, "loss_sup": loss_sup, "loss_consistency": loss_cons,
            "consistency_weight": consistency_weight,
            "lr": self.schedule(state.step),
        }
        return new_state, metrics

    def batches(self, loaders):
        return ssl_batches(loaders[0], loaders[1])

    def eval_models(self, state):
        return {"model1": (self.model, state.model),
                "model2": (self.model, state.ema)}
