"""Shared machinery for dual-student algorithms (CPS / CTCT / S4CVNet / HPFG).

The reference drives two models with two optimizers and one backward
(main.py:200-205); here the combined loss is differentiated w.r.t. the
(params1, params2) tuple in one pass and each branch gets its own optax
update — same math, one XLA program.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from hpfg_tpu.train.algorithms.base import Algorithm, ModelState, init_model
from hpfg_tpu.train.optim import build_optimizer


class DualState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model1: ModelState
    model2: ModelState
    opt_state1: Any
    opt_state2: Any


class TeacherDualState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array
    model1: ModelState
    model2: ModelState
    ema: ModelState
    opt_state1: Any
    opt_state2: Any


class DualAlgorithm(Algorithm):
    """Builds model1/model2 + their optimizers from nested config blocks
    (reference: config/hpfg_unet_plus_30k_224x224_ACDC.yaml model1:/model2:)."""

    #: keys copied from a flat (ccnet-style) config into synthesized
    #: model1/model2 blocks
    _FLAT_KEYS = ("model", "num_classes", "in_channels", "train_crop_size",
                  "feature_chns", "dropout",
                  "opt", "lr", "weight_decay", "momentum", "sched",
                  "warmup_epochs", "warmup_lr", "min_lr", "total_itrs",
                  "step_size")

    #: set True by algorithms (hpfg) whose loss unpacks the *_plus
    #: (logits, h1, h2) output triple from both students
    requires_features = False

    def __init__(self, cfg, dtype=jnp.float32):
        super().__init__(cfg, dtype)
        cfg1, cfg2 = cfg.get("model1"), cfg.get("model2")
        if cfg1 is None or cfg2 is None:
            # ccnet-style flat schema (reference
            # config/ccnet_unet_30k_224x224_ACDC.yaml): one model/optimizer
            # spec drives both students
            flat = {k: cfg[k] for k in self._FLAT_KEYS if k in cfg}
            cfg1 = cfg1 or type(cfg)(**flat)
            cfg2 = cfg2 or type(cfg)(**flat)
        # nested blocks may omit dataset-level keys; inherit them
        for sub in (cfg1, cfg2):
            for key in ("num_classes", "in_channels", "train_crop_size"):
                if key not in sub and key in cfg:
                    sub[key] = cfg[key]
        if self.requires_features:
            from hpfg_tpu.models import returns_features

            for sub in (cfg1, cfg2):
                if not returns_features(sub.model):
                    raise ValueError(
                        f"algorithm {self.name!r} needs *_plus students that "
                        f"return (logits, h1, h2) for its dense-contrastive "
                        f"loss, but got model {sub.model!r} (logits only). "
                        "The upstream config is broken the same way: "
                        "main.py:160 unpacks 3 outputs and plain models "
                        "(e.g. model/transunet.py:281-290) return one "
                        "tensor. Use the *_plus variant of the model.")
        self.net1 = self._build(cfg1)
        self.net2 = self._build(cfg2)
        self.tx1, self.schedule1 = build_optimizer(cfg1)
        self.tx2, self.schedule2 = build_optimizer(cfg2)
        self.label_bs = int(cfg.batch_size)
        self.unlabel_bs = int(cfg.unlabel_batch_size)
        self.consistency = float(cfg.get("consistency", 0.1))
        self.rampup = float(cfg.get("consistency_rampup", 200.0))
        self.ema_decay = float(cfg.get("ema_decay", 0.99))

    def _init_pair(self, rng, batch: int):
        r1, r2 = jax.random.split(rng)
        m1 = init_model(self.net1, r1, self._sample_shape(batch))
        m2 = init_model(self.net2, r2, self._sample_shape(batch))
        return m1, m2
