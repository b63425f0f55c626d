"""UAMT — Uncertainty-Aware Mean Teacher
(reference: 2019_07_MICCAI_Uncertainty_Aware_ACDC.py:82-222).

Mean-Teacher plus MC-dropout uncertainty gating:
  * teacher consistency target = ONE noisy teacher pass on the unlabeled half
    (gaussian noise clamp(N(0, 0.1), ±0.2), :129-132)
  * uncertainty = entropy of the MEAN of T=8 noisy teacher passes (:134-147)
  * threshold ramped (0.75 + 0.25·sigmoid_rampup(it, total)) · ln 2 (:158)
  * consistency = sum(mask·mse) / (2·sum(mask) + 1e-16) (:159-160)

TPU note: the reference loops T/2 times over a doubled batch
(:134-141 — `volume_batch_r = unlabeled.repeat(2,1,1,1)`). Two forms here:
  * mc_mode="map" (default): T noisy passes as a `lax.map` over stacked rng
    keys — one compiled loop, teacher weights read once from HBM per pass.
  * mc_mode="unroll": statically-unrolled T/mc_chunk forwards, each on a
    chunk-tiled batch [chunk·U, ...]. mc_chunk=2 reproduces the reference's
    doubled-batch BN statistics exactly; larger chunks trade BN-batch
    fidelity for fewer, larger MXU dispatches. `lax.scan`-family loops are
    pathological on some backends (CLAUDE.md) — this is the measured escape
    hatch (A/B via bench_all HPFG_BENCH_SET=extra).
At mc_chunk=1 the unroll form consumes the IDENTICAL per-pass keys as map —
equal outputs up to the T-pass mean's fp32 reduction order
(tests/test_algorithms.py::TestUAMT).
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
        self.mc_mode = str(cfg.get("mc_mode", "map"))
        self.mc_chunk = int(cfg.get("mc_chunk", 2))
        if self.mc_mode not in ("map", "unroll"):
            raise ValueError(f"mc_mode must be map|unroll, got {self.mc_mode}")
        # mc_chunk is only consumed by unroll mode — a config carrying a
        # non-divisor chunk with mc_mode=map must not fail (ADVICE r4)
        if self.mc_mode == "unroll" and self.T % self.mc_chunk:
            raise ValueError(f"mc_chunk={self.mc_chunk} must divide T={self.T}")

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
        noise_keys = jax.random.split(mc_rng, self.T)
        drop_keys = jax.random.split(jax.random.fold_in(mc_rng, 1), self.T)
        if self.mc_mode == "map":
            def one_pass(keys):
                noise_key, drop_key = keys
                out, _ = apply_train(self.model, state.ema,
                                     _noisy(noise_key, unlabeled), drop_key)
                return jax.nn.softmax(out, axis=-1)

            preds = jax.lax.map(one_pass, (noise_keys, drop_keys))
            preds = jnp.mean(preds, axis=0)  # [T, U, H, W, C] -> [U, ...]
        else:
            # statically-unrolled chunked passes: each forward sees a
            # [chunk·U, ...] batch with per-copy iid noise (reference BN
            # semantics at chunk=2, /root/reference/
            # 2019_07_MICCAI_Uncertainty_Aware_ACDC.py:134-141)
            c, u = self.mc_chunk, unlabeled.shape[0]
            psum = 0.0
            for i in range(self.T // c):
                noise = jnp.concatenate(
                    [jnp.clip(jax.random.normal(noise_keys[i * c + j],
                                                unlabeled.shape,
                                                unlabeled.dtype) * 0.1,
                              -0.2, 0.2) for j in range(c)], axis=0)
                xin = jnp.tile(unlabeled, (c,) + (1,) * (unlabeled.ndim - 1))
                out, _ = apply_train(self.model, state.ema, xin + noise,
                                     drop_keys[i * c])
                sm = jax.nn.softmax(out, axis=-1)
                psum = psum + jnp.sum(
                    sm.reshape((c, u) + sm.shape[1:]), axis=0)
            preds = psum / self.T
        preds = jax.lax.stop_gradient(preds)
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
