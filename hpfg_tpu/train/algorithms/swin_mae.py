"""Swin-MAE self-supervised pretraining
(reference: 2022_12_CVPR_Swin-MAE.py:79-164).

Per batch: (pred, mask) = model(img); loss = mean((pred − img)²·mask) /
mask_ratio (reference :112 — the script-side image-space variant, not the
model's forward_loss). AdamW + warmup-cosine schedule (:84-85 use timm
factories; here the shared optax factory).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from hpfg_tpu.train.algorithms import ALGORITHMS
from hpfg_tpu.train.algorithms.base import Algorithm, ModelState, sup_batches
from hpfg_tpu.train.optim import build_optimizer


class SwinMAEState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model: ModelState
    opt_state: Any


@ALGORITHMS.register(["swin_mae", "swinmae"])
class SwinMAEPretrain(Algorithm):
    name = "swin_mae"

    def __init__(self, cfg, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        cfg = cfg.copy()
        cfg.model = "swinmae"
        self.model = self._build(cfg)
        self.mask_ratio = float(cfg.get("mask_ratio", 0.75))
        self.tx, self.schedule = build_optimizer(cfg)

    def init_state(self, rng) -> SwinMAEState:
        rng, p_rng, d_rng, m_rng = jax.random.split(rng, 4)
        dummy = jnp.zeros(self._sample_shape(int(self.cfg.batch_size)),
                          jnp.float32)
        variables = self.model.init(
            {"params": p_rng, "dropout": d_rng, "mask": m_rng}, dummy,
            train=True)
        mstate = ModelState(params=variables["params"],
                            batch_stats=variables.get("batch_stats", {}))
        return SwinMAEState(step=jnp.zeros((), jnp.int32), rng=rng,
                            model=mstate,
                            opt_state=self.tx.init(mstate.params))

    def step(self, state: SwinMAEState, batch):
        rng, d_rng, m_rng = jax.random.split(state.rng, 3)
        img = batch["image"]

        def loss_fn(params):
            pred, mask = self.model.apply(
                {"params": params}, img, train=True,
                rngs={"dropout": d_rng, "mask": m_rng})
            loss = jnp.mean((pred - img) ** 2 * mask) / self.mask_ratio
            return loss, (pred, mask)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.model.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.model.params)
        params = optax.apply_updates(state.model.params, updates)
        new_state = state.replace(step=state.step + 1, rng=rng,
                                  model=state.model.replace(params=params),
                                  opt_state=opt_state)
        return new_state, {"loss": loss, "lr": self.schedule(state.step)}

    def batches(self, loaders):
        return sup_batches(loaders[0])

    def eval_models(self, state):
        # reconstruction pretraining has no dice eval; the trainer skips
        # models returning an empty dict
        return {}

    def image_panels(self, state, batch) -> dict:
        """image / masked-input / reconstruction panels
        (reference 2022_12_CVPR_Swin-MAE.py:124-148)."""
        import numpy as np

        img = jnp.asarray(batch["image"][:1])
        pred, mask = self.model.apply(
            {"params": state.model.params}, img, train=False)

        def to_uint8(x):
            x = np.asarray(x[0], np.float32)
            x = (x - x.min()) / max(float(x.max() - x.min()), 1e-6)
            if x.shape[-1] == 1:
                x = np.repeat(x, 3, axis=-1)
            return (x * 255).astype(np.uint8)

        masked = np.asarray(img) * (1.0 - np.asarray(mask))
        recon = np.asarray(img) * (1.0 - np.asarray(mask)) \
            + np.asarray(pred) * np.asarray(mask)
        return {
            "swin_mae/image": to_uint8(np.asarray(img)),
            "swin_mae/masked": to_uint8(masked),
            "swin_mae/reconstruction": to_uint8(recon),
        }
