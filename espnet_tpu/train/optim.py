"""Optimizers + LR schedulers as optax transforms.

Behavioral contract: espnet2/tasks/abs_task.py:102-176 optimizer/scheduler
registries; espnet2/schedulers/{warmup_lr,noam_lr,tristage_lr,...}.py.
Schedulers are pure step->lr functions (optax schedules), the natural
JAX form of the reference's AbsBatchStepScheduler.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def warmup_lr(lr: float, warmup_steps: int = 25000):
    """WarmupLR (espnet2/schedulers/warmup_lr.py):
    lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def schedule(step):
        s = step + 1.0
        return lr * warmup_steps ** 0.5 * jnp_minimum(
            s ** -0.5, s * warmup_steps ** -1.5)

    return schedule


def noam_lr(model_size: int = 320, warmup_steps: int = 25000, lr: float = 10.0):
    """NoamLR (espnet2/schedulers/noam_lr.py)."""

    def schedule(step):
        s = step + 1.0
        return (lr * model_size ** -0.5
                * jnp_minimum(s ** -0.5, s * warmup_steps ** -1.5))

    return schedule


def tristage_lr(lr: float, warmup_ratio=0.1, hold_ratio=0.4, total_steps=25000,
                init_lr_scale=0.01, final_lr_scale=0.01):
    """TristageLR (espnet2/schedulers/tristage_lr.py behavior)."""
    warmup = int(total_steps * warmup_ratio)
    hold = int(total_steps * hold_ratio)
    decay = total_steps - warmup - hold
    init_lr = lr * init_lr_scale
    final_lr = lr * final_lr_scale
    decay_factor = -math.log(final_lr_scale) / max(decay, 1)

    def schedule(step):
        import jax.numpy as jnp
        s = jnp.asarray(step, jnp.float32)
        in_warm = init_lr + (lr - init_lr) * jnp.minimum(s / max(warmup, 1), 1.0)
        in_decay = lr * jnp.exp(-decay_factor * jnp.maximum(
            s - warmup - hold, 0.0))
        return jnp.where(s < warmup, in_warm,
                         jnp.where(s < warmup + hold, lr,
                                   jnp.maximum(in_decay, final_lr)))

    return schedule


def jnp_minimum(a, b):
    import jax.numpy as jnp
    return jnp.minimum(a, b)


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "noamlr": noam_lr,
    "tristagelr": tristage_lr,
}


def build_schedule(name: Optional[str], lr: float, conf: dict | None = None):
    conf = dict(conf or {})
    if name is None or name == "none":
        return lambda step: lr
    name = name.lower()
    if name == "warmuplr":
        return warmup_lr(lr, **conf)
    if name == "noamlr":
        conf.setdefault("lr", lr)
        return noam_lr(**conf)
    if name == "tristagelr":
        return tristage_lr(lr, **conf)
    if name == "exponentialdecaywarmup":
        warmup = conf.get("warmup_steps", 1000)
        max_lr, min_lr = conf.get("max_lr", lr), conf.get("min_lr", lr * 0.01)
        total = conf.get("total_steps", 100000)

        def schedule(step):
            import jax.numpy as jnp
            s = jnp.asarray(step, jnp.float32)
            w = min_lr + (max_lr - min_lr) * jnp.minimum(s / warmup, 1.0)
            frac = jnp.clip((s - warmup) / max(total - warmup, 1), 0.0, 1.0)
            d = max_lr * (min_lr / max_lr) ** frac
            return jnp.where(s < warmup, w, d)

        return schedule
    raise ValueError(f"unknown scheduler {name!r}")


def build_optimizer(name: str = "adam", lr: float = 1e-3,
                    scheduler: Optional[str] = None,
                    scheduler_conf: dict | None = None,
                    weight_decay: float = 0.0,
                    betas=(0.9, 0.999), eps: float = 1e-8,
                    grad_clip: Optional[float] = 5.0,
                    accum_grad: int = 1) -> optax.GradientTransformation:
    """Compose clip -> optimizer(schedule) -> accumulation, mirroring the
    trainer's clip+accum semantics (espnet2/train/trainer.py:701-775)."""
    schedule = build_schedule(scheduler, lr, scheduler_conf)
    name = name.lower()
    if name == "adam":
        core = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps) \
            if weight_decay == 0.0 else optax.adamw(
                schedule, b1=betas[0], b2=betas[1], eps=eps,
                weight_decay=weight_decay)
    elif name == "adamw":
        core = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    elif name == "sgd":
        core = optax.sgd(schedule)
    elif name == "adadelta":
        core = optax.adadelta(schedule)
    elif name == "adagrad":
        core = optax.adagrad(schedule)
    elif name == "rmsprop":
        core = optax.rmsprop(schedule)
    elif name == "lamb":
        core = optax.lamb(schedule, weight_decay=weight_decay)
    elif name == "adafactor":
        core = optax.adafactor(schedule)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    chain = []
    if grad_clip is not None and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(core)
    tx = optax.chain(*chain)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx
