"""Algorithm base class + shared state pytrees."""

from __future__ import annotations

from typing import Any, Iterator

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from hpfg_tpu.models import build_model
from hpfg_tpu.ops.rampup import DEFAULT_EPOCH_ITERS


class ModelState(flax.struct.PyTreeNode):
    """Parameters + BN running statistics for one network."""

    params: Any
    batch_stats: Any


def init_model(model, rng, sample_shape, train_shapes=None):
    """Initialize a model's variables from a dummy NHWC batch."""
    p_rng, d_rng = jax.random.split(rng)
    dummy = jnp.zeros(sample_shape, jnp.float32)
    variables = model.init({"params": p_rng, "dropout": d_rng}, dummy,
                           train=True)
    return ModelState(params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}))


def tree_copy(tree):
    """Fresh device buffers for every leaf.

    EMA teachers start as copies of the student (reference deepcopy,
    2017_03…py:55); distinct buffers are REQUIRED under donated jit steps —
    aliased student/teacher leaves would be donated twice in one Execute().
    """
    return jax.tree_util.tree_map(jnp.copy, tree)


def apply_train(model, mstate: ModelState, x, rng):
    """Train-mode forward with dropout rng + BN batch-stat update.

    Returns (outputs, new ModelState)."""
    variables = {"params": mstate.params}
    mutable = []
    if mstate.batch_stats:
        variables["batch_stats"] = mstate.batch_stats
        mutable = ["batch_stats"]
    out, mut = model.apply(variables, x, train=True, rngs={"dropout": rng},
                           mutable=mutable)
    new_stats = mut.get("batch_stats", mstate.batch_stats) if mutable else mstate.batch_stats
    return out, mstate.replace(batch_stats=new_stats)


def apply_eval(model, mstate: ModelState, x):
    variables = {"params": mstate.params}
    if mstate.batch_stats:
        variables["batch_stats"] = mstate.batch_stats
    return model.apply(variables, x, train=False)


def eval_variables(mstate: ModelState) -> dict:
    v = {"params": mstate.params}
    if mstate.batch_stats:
        v["batch_stats"] = mstate.batch_stats
    return v


class Algorithm:
    """Base: a config-built, jit-steppable training algorithm.

    Subclasses define:
      * init_state(rng) -> state pytree (must carry .step and .rng)
      * step(state, batch) -> (state, metrics)  — pure/jittable
      * batches(loaders) -> host-side iterator of batch dicts
      * eval_models(state) -> {name: (model, ModelState)} for in-loop eval
    """

    name: str = "base"
    #: models evaluated with logits-only `.val`-style forward
    flagship: str = "model1"

    def __init__(self, cfg, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.num_classes = int(cfg.get("num_classes", 4))
        crop = cfg.get("train_crop_size", [224, 224])
        self.crop = tuple(crop) if isinstance(crop, (list, tuple)) else (crop, crop)
        self.in_channels = int(cfg.get("in_channels", 1))
        #: iterations per nominal "epoch" for ramp-up schedules (the
        #: reference's hardcoded ``iter // 150``; see ops/rampup.py)
        self.epoch_iters = int(cfg.get("epoch_unit_iters",
                                       DEFAULT_EPOCH_ITERS))

    # ---- helpers ------------------------------------------------------
    def _sample_shape(self, batch_size: int):
        return (batch_size, *self.crop, self.in_channels)

    def _build(self, model_cfg):
        return build_model(model_cfg, dtype=self.dtype)

    # ---- interface ----------------------------------------------------
    def init_state(self, rng):
        raise NotImplementedError

    def step(self, state, batch):
        raise NotImplementedError

    def batches(self, loaders) -> Iterator[dict]:
        raise NotImplementedError

    def eval_models(self, state) -> dict:
        raise NotImplementedError


def ssl_batches(label_loader, unlabel_loader) -> Iterator[dict]:
    """The canonical SSL stream: iterate the unlabeled loader, cycle the
    labeled one eternally (reference: 2017_03_NIPS_Mean-Teacher_ACDC.py:81-87)."""
    label_iter = label_loader.cycle()
    while True:
        for unlabel_img, _ in unlabel_loader:
            label_img, label = next(label_iter)
            yield {
                "label_img": label_img,
                "label": label,
                "unlabel_img": unlabel_img,
            }


def sup_batches(train_loader) -> Iterator[dict]:
    while True:
        for image, label in train_loader:
            yield {"image": image, "label": label}
