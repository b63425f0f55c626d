"""SS-Net — smoothness + class-separation SSL
(reference: 2022_03_MICCAI_SS-Net_ACDC.py:68-212).

Per iteration:
  * forward [labeled, unlabeled] through SSNet → (logits, 16-d embeddings)
  * smoothness: VAT adversarial dice on the full batch (:172, ops/vat.py)
  * class separation: prototype memory bank of projected features from
    correctly-predicted non-background labeled pixels (:122-140), then a
    learned-attention contrastive loss between prediction-head features and
    the bank for both labeled (true labels) and unlabeled (pseudo labels)
    rows (:143-167)
  * loss = dice + w · (VAT + 0.1 · (contr_labeled + contr_unlabeled)) —
    the reference computes CE but does not add it (:175-179); kept as a
    logged metric only for parity.

TPU notes: the memory bank is a fixed [C, 32, 32] array inside the donated
train state (ops/ssnet_memory.py); selector-head BatchNorms see all rows with
validity masks instead of boolean-packed subsets (documented deviation —
distributional parity).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.ops.losses import cross_entropy_loss, dice_loss_multiclass
from hpfg_tpu.ops.rampup import sigmoid_rampup
from hpfg_tpu.ops.ssnet_memory import (
    contrastive_class_to_class_learned_memory,
    update_memory,
)
from hpfg_tpu.ops.vat import vat_loss
from hpfg_tpu.train.algorithms import ALGORITHMS
from hpfg_tpu.train.algorithms.base import (
    Algorithm,
    ModelState,
    ssl_batches,
)
from hpfg_tpu.train.optim import build_optimizer


class SSNetState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model: ModelState
    opt_state: Any
    memory: jnp.ndarray        # [C, K, F]
    memory_valid: jnp.ndarray  # [C, K] bool


@ALGORITHMS.register("ssnet")
class SSNetAlgorithm(Algorithm):
    name = "ssnet"
    elements_per_class: int = 32

    def __init__(self, cfg, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        cfg = cfg.copy()
        cfg.model = "ssnet"
        self.model = self._build(cfg)
        self.tx, self.schedule = build_optimizer(cfg)
        self.label_bs = int(cfg.batch_size)
        self.unlabel_bs = int(cfg.unlabel_batch_size)
        self.consistency = float(cfg.get("consistency", 0.1))
        self.rampup = float(cfg.get("consistency_rampup", 200.0))
        self.magnitude = float(cfg.get("magnitude", 6.0))
        self.feat_dim = int(cfg.get("feat_dim", 32))

    def init_state(self, rng) -> SSNetState:
        rng, p_rng, d_rng = jax.random.split(rng, 3)
        dummy = jnp.zeros(
            self._sample_shape(self.label_bs + self.unlabel_bs), jnp.float32)
        variables = self.model.init({"params": p_rng, "dropout": d_rng},
                                    dummy, train=True,
                                    method=self.model.init_all)
        from hpfg_tpu.train.algorithms.base import ModelState as _MS

        mstate = _MS(params=variables["params"],
                     batch_stats=variables.get("batch_stats", {}))
        c, k, f = self.num_classes, self.elements_per_class, self.feat_dim
        return SSNetState(step=jnp.zeros((), jnp.int32), rng=rng,
                          model=mstate, opt_state=self.tx.init(mstate.params),
                          memory=jnp.zeros((c, k, f), jnp.float32),
                          memory_valid=jnp.zeros((c, k), bool))

    # -- helpers over flax methods --------------------------------------
    def _variables(self, params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def _head(self, variables, method_name, feats, c=None, train=True):
        """Apply a head method in train-mode BN with discarded stat updates
        (the reference's BN1d train behavior; stat tracking irrelevant for
        these heads)."""
        method = getattr(self.model, method_name)
        args = (c, feats) if c is not None else (feats,)
        out = self.model.apply(variables, *args, train=train, method=method,
                               mutable=["batch_stats"])[0]
        return out

    def step(self, state: SSNetState, batch):
        cur_itrs = state.step + 1
        rng, f_rng, v_rng, vd_rng = jax.random.split(state.rng, 4)
        lb = self.label_bs
        x = jnp.concatenate([batch["label_img"], batch["unlabel_img"]], axis=0)
        target = batch["label"].astype(jnp.int32)
        consistency_weight = self.consistency * sigmoid_rampup(
            cur_itrs // self.epoch_iters, self.rampup)

        def loss_fn(params):
            variables = self._variables(params, state.model.batch_stats)
            (outputs, embedding), mut = self.model.apply(
                variables, x, train=True, rngs={"dropout": f_rng},
                mutable=["batch_stats"])
            new_stats = mut.get("batch_stats", state.model.batch_stats)
            soft = jax.nn.softmax(outputs, axis=-1)

            labeled_feat = embedding[:lb].reshape(-1, embedding.shape[-1])
            unlabeled_feat = embedding[lb:].reshape(-1, embedding.shape[-1])
            pred_label = jnp.argmax(soft[:lb], axis=-1)
            pseudo_label = jnp.argmax(soft[lb:], axis=-1).reshape(-1)
            flat_target = target.reshape(-1)
            correct = ((pred_label == target) & (pred_label > 0)).reshape(-1)

            # ---- memory refresh (no grad; eval-mode projection,
            # reference 2022_03…py:131-140)
            proj_mem = jax.lax.stop_gradient(self._head(
                variables, "project", jax.lax.stop_gradient(labeled_feat),
                train=False))
            scores = jnp.stack([
                jax.nn.sigmoid(jax.lax.stop_gradient(self._head(
                    variables, "select", proj_mem, c=c)))[:, 0]
                for c in range(self.num_classes)])
            memory, memory_valid = update_memory(
                proj_mem, flat_target, correct, scores,
                state.memory, state.memory_valid, self.num_classes)

            # ---- contrastive losses (train-mode heads over ALL rows,
            # reference :143-167)
            proj_l = self._head(variables, "project", labeled_feat)
            pred_l = self._head(variables, "predict", proj_l)
            loss_contr_l = contrastive_class_to_class_learned_memory(
                pred_l, flat_target, self.num_classes, memory, memory_valid,
                lambda c, f: self._head(variables, "select", f, c=c),
                lambda c, f: self._head(variables, "select_memory", f, c=c))

            proj_u = self._head(variables, "project", unlabeled_feat)
            pred_u = self._head(variables, "predict", proj_u)
            loss_contr_u = contrastive_class_to_class_learned_memory(
                pred_u, pseudo_label, self.num_classes, memory, memory_valid,
                lambda c, f: self._head(variables, "select", f, c=c),
                lambda c, f: self._head(variables, "select_memory", f, c=c))

            # ---- VAT smoothness (frozen BN stats, reference :172)
            def vat_apply(xv):
                out = self.model.apply(variables, xv, train=True,
                                       rngs={"dropout": vd_rng},
                                       mutable=["batch_stats"])[0]
                return out[0]  # logits

            # detached variables for the power iteration (see ops/vat.py)
            frozen_vars = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                                 variables)

            def vat_apply_frozen(xv):
                out = self.model.apply(frozen_vars, xv, train=True,
                                       rngs={"dropout": vd_rng},
                                       mutable=["batch_stats"])[0]
                return out[0]

            loss_lds = vat_loss(vat_apply, x, v_rng, epi=self.magnitude,
                                apply_fn_frozen=vat_apply_frozen)

            # ---- supervised terms
            loss_ce = cross_entropy_loss(outputs[:lb], target)
            loss_dice = dice_loss_multiclass(soft[:lb], target,
                                             self.num_classes)
            # reference total omits CE (2022_03…py:175-179)
            loss = loss_dice + consistency_weight * (
                loss_lds + 0.1 * (loss_contr_l + loss_contr_u))
            aux = (new_stats, memory, memory_valid, loss_ce, loss_dice,
                   loss_lds, loss_contr_l, loss_contr_u)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.model.params)
        (new_stats, memory, memory_valid, loss_ce, loss_dice, loss_lds,
         loss_contr_l, loss_contr_u) = aux
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.model.params)
        params = optax.apply_updates(state.model.params, updates)

        new_state = state.replace(
            step=cur_itrs, rng=rng,
            model=ModelState(params=params, batch_stats=new_stats),
            opt_state=opt_state, memory=memory, memory_valid=memory_valid)
        metrics = {
            "loss": loss, "loss_ce": loss_ce, "loss_dice": loss_dice,
            "loss_lds": loss_lds,
            "loss_contrastive": loss_contr_l + loss_contr_u,
            "consistency_weight": consistency_weight,
            "lr": self.schedule(state.step),
        }
        return new_state, metrics

    def batches(self, loaders):
        return ssl_batches(loaders[0], loaders[1])

    def eval_models(self, state):
        return {"model1": (self.model, state.model)}
