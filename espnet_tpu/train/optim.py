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


def cosine_annealing_warmup_restarts(
        lr: float, first_cycle_steps: int = 10000, cycle_mult: float = 1.0,
        max_lr: float = None, min_lr: float = 1e-6, warmup_steps: int = 0,
        gamma: float = 1.0):
    """CosineAnnealingWarmupRestarts
    (espnet2/schedulers/cosine_anneal_warmup_restart.py): repeated
    cosine cycles with per-cycle linear warmup and max-lr decay gamma.
    Computed closed-form per step (no python state) so it composes as a
    pure optax schedule."""
    import jax.numpy as jnp
    max_lr = lr if max_lr is None else max_lr

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(s / first_cycle_steps)
            in_c = s - cycle * first_cycle_steps
            cycle_len = jnp.asarray(first_cycle_steps, jnp.float32)
        else:
            # geometric cycles: solve for n in sum_{i<n} c0*m^i <= s
            m = cycle_mult
            c0 = first_cycle_steps
            n = jnp.floor(jnp.log(jnp.maximum(
                s / c0 * (m - 1) + 1, 1.0)) / math.log(m))
            start = c0 * (m ** n - 1) / (m - 1)
            in_c = s - start
            cycle = n
            cycle_len = c0 * m ** n
        peak = max_lr * gamma ** cycle
        warm = min_lr + (peak - min_lr) * in_c / jnp.maximum(warmup_steps, 1)
        frac = (in_c - warmup_steps) / jnp.maximum(
            cycle_len - warmup_steps, 1)
        cos = min_lr + (peak - min_lr) * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.clip(frac, 0.0, 1.0)))
        return jnp.where(in_c < warmup_steps, warm, cos)

    return schedule


def piecewise_linear_warmup_lr(lr: float, warmup_steps_list=(0, 25000),
                               warmup_lr_list=(0.0, 0.001)):
    """PiecewiseLinearWarmupLR
    (espnet2/schedulers/piecewise_linear_warmup_lr.py): linear
    interpolation through (step, lr) knots, then inverse-sqrt decay like
    WarmupLR past the last knot."""
    import jax.numpy as jnp
    xs = jnp.asarray(warmup_steps_list, jnp.float32)
    ys = jnp.asarray(warmup_lr_list, jnp.float32)
    last = float(warmup_steps_list[-1])

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        w = jnp.interp(s, xs, ys)
        d = lr * last ** 0.5 * s ** -0.5
        return jnp.where(s <= last, w, d)

    return schedule


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "noamlr": noam_lr,
    "tristagelr": tristage_lr,
    "cosineannealingwarmuprestarts": cosine_annealing_warmup_restarts,
    "piecewiselinearwarmuplr": piecewise_linear_warmup_lr,
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
    if name in ("cosineannealingwarmuprestarts", "cosine_restarts"):
        return cosine_annealing_warmup_restarts(lr, **conf)
    if name in ("piecewiselinearwarmuplr", "piecewise_linear"):
        return piecewise_linear_warmup_lr(lr, **conf)
    raise ValueError(f"unknown scheduler {name!r}")


def no_decay_mask(params):
    """Weight-decay param grouping (espnet2/optimizers/optim_groups.py
    add_optimizer_hooks): biases, LayerNorm/BatchNorm scales and other
    1-D params are excluded from decoupled weight decay."""
    import jax

    def decay(path, x):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        return x.ndim >= 2 and name not in ("bias", "scale", "b")

    return jax.tree_util.tree_map_with_path(decay, params)


def build_optimizer(name: str = "adam", lr: float = 1e-3,
                    scheduler: Optional[str] = None,
                    scheduler_conf: dict | None = None,
                    weight_decay: float = 0.0,
                    betas=(0.9, 0.999), eps: float = 1e-8,
                    grad_clip: Optional[float] = 5.0,
                    accum_grad: int = 1,
                    decay_grouping: bool = True,
                    flatten: bool = False
                    ) -> optax.GradientTransformation:
    """Compose clip -> optimizer(schedule) -> accumulation, mirroring the
    trainer's clip+accum semantics (espnet2/train/trainer.py:701-775).
    With weight_decay > 0 and decay_grouping, biases/norm scales are
    excluded from decay (optim_groups.py contract)."""
    schedule = build_schedule(scheduler, lr, scheduler_conf)
    wd_mask = no_decay_mask if (weight_decay and decay_grouping) else None
    name = name.lower()
    if name == "adam":
        core = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps) \
            if weight_decay == 0.0 else optax.adamw(
                schedule, b1=betas[0], b2=betas[1], eps=eps,
                weight_decay=weight_decay, mask=wd_mask)
    elif name == "adamw":
        core = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay, mask=wd_mask)
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
    if flatten:
        # run the optimizer over ONE ravelled vector: a conformer tree
        # has ~450 small tensors and per-tensor adam lowers to hundreds
        # of tiny VPU loops (~2 ms of the 19 ms flagship step,
        # docs/DIAG_STEP_R5F.json); flattened it is 3 big fused passes.
        # Not used under mesh/fsdp where per-leaf ZeRO sharding needs
        # the tree structure (parallel/mesh.py auto_opt_sharding).
        tx = optax.flatten(tx)
    return tx
