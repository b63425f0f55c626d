"""Optimizer + LR schedule factories (optax).

Reference surface: build_optimizer (utils/__init__.py:13-26) — sgd / adamW /
adam with torch semantics (weight decay added to the gradient for sgd/adam,
decoupled for adamW) — and build_lr_scheduler (utils/__init__.py:28-49) with
three schedules:

  * "medical":  lr = base * (1 - it/max_iters)^0.9  (utils/scheduler/medical_lr.py:7-17)
  * "poly":     lr = max(base * (1 - it/max_iters)^power, min_lr), power=0.1
                as wired by build_lr_scheduler (utils/__init__.py:40)
  * "cosine":   linspace warmup warmup_lr→base over warmup_epochs*iter_per_epoch
                steps, then final + 0.5*(base-final)*(1+cos(pi*i/decay_iters))
                (utils/scheduler/warmup_cosine.py:7-41)

Schedules are per-iteration functions of the step, evaluated inside the jitted
train step via optax injection — no host-side scheduler object.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def medical_lr(base_lr: float, max_iterations: int) -> Schedule:
    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(1.0 - t / max_iterations, 0.0, 1.0)
        return base_lr * frac ** 0.9

    return schedule


def poly_lr(base_lr: float, max_iters: int, power: float = 0.1,
            min_lr: float = 1e-6) -> Schedule:
    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(1.0 - t / max_iters, 0.0, 1.0)
        return jnp.maximum(base_lr * frac ** power, min_lr)

    return schedule


def warmup_cosine_lr(base_lr: float, warmup_epochs: int, warmup_lr: float,
                     final_lr: float, iter_per_epoch: int,
                     num_epochs: int) -> Schedule:
    warmup_iters = max(int(iter_per_epoch * warmup_epochs), 0)
    decay_iters = max(int(iter_per_epoch * (num_epochs - warmup_epochs)) + 1, 1)

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * (
            t / jnp.maximum(warmup_iters, 1))
        i = jnp.clip(t - warmup_iters, 0.0, decay_iters - 1)
        cos = final_lr + 0.5 * (base_lr - final_lr) * (
            1.0 + jnp.cos(jnp.pi * i / decay_iters))
        return jnp.where(t < warmup_iters, warm, cos)

    return schedule


def build_lr_schedule(cfg) -> Schedule:
    """Mirror of reference build_lr_scheduler (utils/__init__.py:28-49).

    Rate keys are float()-coerced: YAML 1.1 parses dot-less scientific
    notation (the reference configs' ``warmup_lr: 1e-05``) as a STRING,
    which would otherwise crash the warmup arithmetic at trace time.
    """
    sched = cfg.get("sched", "medical")
    if sched == "medical":
        return medical_lr(float(cfg.lr), cfg.total_itrs)
    if sched == "poly":
        return poly_lr(float(cfg.lr), cfg.total_itrs, power=0.1,
                       min_lr=float(cfg.get("min_lr", 1e-6)))
    if sched == "cosine":
        return warmup_cosine_lr(
            base_lr=float(cfg.lr),
            warmup_epochs=cfg.get("warmup_epochs", 0),
            warmup_lr=float(cfg.get("warmup_lr", 1e-4)),
            final_lr=float(cfg.get("min_lr", 1e-6)),
            iter_per_epoch=cfg.step_size,
            num_epochs=max(cfg.total_itrs // cfg.step_size, 1),
        )
    if sched == "constant":
        base = float(cfg.lr)
        return lambda step: jnp.asarray(base, jnp.float32)
    raise ValueError(f"unknown sched {sched!r}")


def build_optimizer(cfg) -> tuple[optax.GradientTransformation, Schedule]:
    """Mirror of reference build_optimizer (utils/__init__.py:13-26).

    Returns (tx, schedule). ``tx`` already folds in the schedule; ``schedule``
    is exposed separately so trainers can log the current lr.
    """
    schedule = build_lr_schedule(cfg)
    opt = cfg.get("opt", "sgd")
    wd = float(cfg.get("weight_decay", 0.0))
    if opt == "sgd":
        # torch SGD: grad += wd * param, then momentum buffer (dampening 0).
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(learning_rate=schedule,
                      momentum=float(cfg.get("momentum", 0.9))),
        )
    elif opt in ("adamw", "adamW"):
        tx = optax.adamw(learning_rate=schedule, weight_decay=wd)
    elif opt == "adam":
        # torch Adam's weight_decay is additive on the gradient (L2), not
        # decoupled.
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(learning_rate=schedule),
        )
    else:
        raise ValueError(f"unknown opt {opt!r}")
    return tx, schedule
