"""Optimizers + LR schedules (optax).

Rebuild of reference ``src/mon/nn/optimizer.py``: 13 registered torch
optimizers (optimizer.py:78-90) map to optax; the custom schedulers —
``CosineAnnealingRestartLR`` (:97), ``CosineAnnealingRestartCyclicLR``,
``GradualWarmupScheduler``, ``MultiStepLRRestart``, ``VibrateLR`` (:398) —
become optax schedule functions (step -> lr factor * base_lr).

``build_optimizer(config)`` mirrors the reference's declarative
``configure_optimizers`` (nn/model.py:498-615): a dict with optimizer name,
kwargs and an optional nested scheduler spec.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from enhax.constants import LR_SCHEDULERS, OPTIMIZERS


# ---------------------------------------------------------------------------
# Optimizers (reference optimizer.py:78-90)
# ---------------------------------------------------------------------------

def _register_opt(name, fn, **aliases):
    OPTIMIZERS.register(name=name, obj=fn, aliases=aliases.get("aliases", ()))


_register_opt("adam", optax.adam)
_register_opt("adamw", optax.adamw)
_register_opt("adamax", optax.adamax)
_register_opt("sgd", optax.sgd)
_register_opt("rmsprop", optax.rmsprop)
_register_opt("adagrad", optax.adagrad)
_register_opt("adadelta", optax.adadelta)
_register_opt("nadam", optax.nadam)
_register_opt("radam", optax.radam)
_register_opt("lamb", optax.lamb)
_register_opt("lars", optax.lars)
_register_opt("lion", optax.lion)
_register_opt("adafactor", optax.adafactor)


# ---------------------------------------------------------------------------
# Schedules: each registered entry is a constructor returning
# ``schedule(step) -> lr`` given base_lr.
# ---------------------------------------------------------------------------

@LR_SCHEDULERS.register(name="cosine_annealing_restart_lr")
def cosine_annealing_restart_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_min: float = 0.0,
):
    """BasicSR-style cosine annealing with restarts (optimizer.py:97-150)."""
    import jax.numpy as jnp
    cum = [sum(periods[: i + 1]) for i in range(len(periods))]
    if len(periods) != len(restart_weights):
        raise ValueError("periods and restart_weights must have equal length")

    starts = jnp.asarray([0] + cum[:-1])
    pers = jnp.asarray(periods)
    ws = jnp.asarray(restart_weights)
    bounds = jnp.asarray(cum)

    def schedule(step):
        idx = jnp.sum(step > bounds)  # right-closest index (step <= cum[idx])
        idx = jnp.clip(idx, 0, len(periods) - 1)
        w = ws[idx]
        start = starts[idx]
        period = pers[idx]
        return eta_min + w * 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * (step - start) / period))

    return schedule


@LR_SCHEDULERS.register(name="cosine_annealing_restart_cyclic_lr")
def cosine_annealing_restart_cyclic_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1,),
    eta_mins: Sequence[float] = (0.0,),
):
    """Per-cycle eta_min variant (reference optimizer.py:200-260)."""
    import jax.numpy as jnp
    cum = [sum(periods[: i + 1]) for i in range(len(periods))]
    starts = jnp.asarray([0] + cum[:-1])
    pers = jnp.asarray(periods)
    ws = jnp.asarray(restart_weights)
    ems = jnp.asarray(eta_mins)
    bounds = jnp.asarray(cum)

    def schedule(step):
        idx = jnp.clip(jnp.sum(step > bounds), 0, len(periods) - 1)
        em = ems[jnp.clip(idx, 0, len(eta_mins) - 1)]
        return em + ws[idx] * 0.5 * (base_lr - em) * (
            1 + jnp.cos(jnp.pi * (step - starts[idx]) / pers[idx]))

    return schedule


@LR_SCHEDULERS.register(name="gradual_warmup",
                        aliases=["gradual_warmup_scheduler"])
def gradual_warmup(
    base_lr: float,
    multiplier: float = 1.0,
    total_epoch: int = 10,
    after_scheduler=None,
):
    """Linear warmup to multiplier*base_lr, then hand off (optimizer.py:262)."""
    import jax.numpy as jnp

    def schedule(step):
        warm = base_lr * ((multiplier - 1.0) * step / total_epoch + 1.0)
        if after_scheduler is not None:
            after = after_scheduler(jnp.maximum(step - total_epoch, 0))
        else:
            after = base_lr * multiplier
        return jnp.where(step < total_epoch, warm, after)

    return schedule


@LR_SCHEDULERS.register(name="multistep_lr_restart")
def multistep_lr_restart(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1,),
):
    """MultiStepLR with restart weights (optimizer.py:330-395).

    Closed form of the reference's stateful rule: a restart at step r
    RESETS lr to base_lr * weight and the decay restarts from there —
    lr(t) = base_lr * w(last restart <= t) * gamma^(#milestones in
    (last_restart, t]). The reference shifts restart epochs by +1
    (optimizer.py:378), reproduced here.
    """
    import jax.numpy as jnp
    ms = jnp.asarray(sorted(milestones))
    rs = jnp.asarray([r + 1 for r in restarts])
    rw = jnp.asarray(restart_weights, jnp.float32)

    def schedule(step):
        # last restart at or before step (0 with weight 1 if none yet)
        started = step >= rs
        any_started = jnp.any(started)
        last_idx = jnp.where(any_started,
                             jnp.argmax(jnp.where(started, rs, -1)), 0)
        last_r = jnp.where(any_started, rs[last_idx], 0)
        weight = jnp.where(any_started, rw[last_idx], 1.0)
        decays = jnp.sum((ms > last_r) & (ms <= step))
        return base_lr * weight * gamma ** decays

    return schedule


@LR_SCHEDULERS.register(name="vibrate_lr")
def vibrate_lr(base_lr: float, total_iter: int):
    """Decaying triangle-wave schedule (reference optimizer.py:398-440)."""
    import jax.numpy as jnp
    t_period = max(total_iter // 80, 2)
    th = max(t_period // 2, 1)

    def schedule(step):
        process = step / total_iter
        f = jnp.where(process < 3 / 8, 1 - process * 8 / 3,
            jnp.where(process < 5 / 8, 0.2, 0.1))
        t = step % t_period
        f2 = jnp.where(t >= th, 2 - t / th, t / th)
        weight = f * f2
        weight = jnp.where(step < th, jnp.maximum(weight, 0.1), weight)
        return base_lr * weight

    return schedule


@LR_SCHEDULERS.register(name="cosine_annealing_lr")
def cosine_annealing_lr(base_lr: float, t_max: int, eta_min: float = 0.0):
    import jax.numpy as jnp

    def schedule(step):
        return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * step / t_max))

    return schedule


@LR_SCHEDULERS.register(name="step_lr")
def step_lr(base_lr: float, step_size: int, gamma: float = 0.1):
    def schedule(step):
        return base_lr * gamma ** (step // step_size)
    return schedule


@LR_SCHEDULERS.register(name="multistep_lr")
def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    import jax.numpy as jnp
    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        return base_lr * gamma ** jnp.sum(step >= ms)
    return schedule


@LR_SCHEDULERS.register(name="exponential_lr")
def exponential_lr(base_lr: float, gamma: float = 0.99):
    def schedule(step):
        return base_lr * gamma**step
    return schedule


@LR_SCHEDULERS.register(name="constant_lr")
def constant_lr(base_lr: float):
    def schedule(step):
        return base_lr
    return schedule


@LR_SCHEDULERS.register(name="linear_lr")
def linear_lr(base_lr: float, start_factor: float = 1.0, end_factor: float = 0.0,
              total_iters: int = 1000):
    import jax.numpy as jnp

    def schedule(step):
        frac = jnp.clip(step / total_iters, 0.0, 1.0)
        return base_lr * (start_factor + (end_factor - start_factor) * frac)
    return schedule


# ---------------------------------------------------------------------------
# Declarative builder (reference nn/model.py:498-615 configure_optimizers)
# ---------------------------------------------------------------------------

def build_schedule(base_lr: float, spec: dict | None):
    """Build a schedule fn from a {name, **kwargs, after_scheduler?} dict."""
    if not spec:
        return base_lr
    spec = dict(spec)
    if "T_max" in spec:  # torch CosineAnnealingLR spelling
        spec["t_max"] = spec.pop("T_max")
    name = spec.pop("name")
    after = spec.pop("after_scheduler", None) or spec.pop("scheduler", None)
    if after is not None:
        spec["after_scheduler"] = build_schedule(base_lr, after)
    return LR_SCHEDULERS.build(name, base_lr=base_lr, **spec)


def freeze_after(param_filter, after_steps: int) -> optax.GradientTransformation:
    """Zero updates for matching params once the step count passes a threshold.

    The JAX-native form of the reference's epoch-gated ``requires_grad_ =
    False`` freezing (RSFNet rsfnet.py:159-162 freezes its soft-threshold
    lambdas/steps after ``freeze_epochs``): instead of mutating param flags —
    impossible under jit — a stateful transform masks their updates to zero
    past ``after_steps``. Chain it AFTER the optimizer — stateful optimizers
    (adam momentum) emit nonzero updates for zero gradients, so masking must
    hit the final updates, not the grads:

        tx = optax.chain(optax.adam(1e-4),
                         freeze_after(lambda p: "lambda_" in p, 2500))

    Args:
        param_filter: ``fn(path_str) -> bool``; path is "/".join of the
            param's pytree keys (e.g. "params/stage0/lambda_a").
        after_steps: optimizer step count after which matches stop updating.
    """
    def _path_str(path):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)

    def init_fn(params):
        del params
        return {"count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params=None):
        del params
        frozen = state["count"] >= after_steps
        def mask(path, u):
            if param_filter(_path_str(path)):
                return jnp.where(frozen, jnp.zeros_like(u), u)
            return u
        updates = jax.tree_util.tree_map_with_path(mask, updates)
        return updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(config: dict):
    """Build an optax GradientTransformation from a reference-style dict.

    config = {"optimizer": {"name": "adam", "lr": 1e-4, ...} | "adam",
              "lr_scheduler": {"scheduler": {"name": ..., ...}} | None,
              "grad_clip_norm": float | None}
    Also accepts the flat form {"name": "adam", "lr": ...}.
    """
    cfg = dict(config)
    opt_cfg = cfg.get("optimizer", cfg)
    if isinstance(opt_cfg, str):
        opt_cfg = {"name": opt_cfg}
    opt_cfg = dict(opt_cfg)
    name = opt_cfg.pop("name")
    lr = opt_cfg.pop("lr", opt_cfg.pop("learning_rate", 1e-3))
    # torch->optax kwarg translation
    if "betas" in opt_cfg:
        b1, b2 = opt_cfg.pop("betas")
        opt_cfg["b1"], opt_cfg["b2"] = b1, b2
    wd = opt_cfg.pop("weight_decay", None)

    sched_spec = cfg.get("lr_scheduler")
    if isinstance(sched_spec, dict) and "scheduler" in sched_spec:
        sched_spec = sched_spec["scheduler"]
    lr_or_schedule = build_schedule(lr, sched_spec) if sched_spec else lr

    builder = OPTIMIZERS.get(name)
    kwargs = dict(opt_cfg)
    if wd is not None and name in ("adamw", "lamb", "lion", "sgd"):
        kwargs["weight_decay"] = wd
    import inspect
    accepted = set(inspect.signature(builder).parameters)
    kwargs = {k: v for k, v in kwargs.items() if k in accepted}
    tx = builder(lr_or_schedule, **kwargs)
    if wd is not None and "weight_decay" not in kwargs and wd:
        tx = optax.chain(optax.add_decayed_weights(wd), tx)

    clip = cfg.get("grad_clip_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    # {"freeze": {"match": "lambda_a|lambda_e", "after_steps": 2500}}
    # (appended last: must mask final updates, not pre-optimizer grads)
    frz = cfg.get("freeze")
    if frz:
        import re
        pat = re.compile(frz["match"])
        tx = optax.chain(
            tx, freeze_after(lambda p: bool(pat.search(p)),
                             int(frz["after_steps"])))
    return tx
