"""Optimizers + LR schedules (optax).

Rebuild of reference ``src/mon/nn/optimizer.py``: 13 registered torch
optimizers (optimizer.py:78-90) map to optax; all 21 registered
schedulers — the custom ``CosineAnnealingRestartLR``/``LR2`` (:97,:173),
``CosineAnnealingRestartCyclicLR``, ``GradualWarmupScheduler``,
``MultiStepLRRestart``, ``VibrateLR`` (:398) plus the torch surface
(:459-473: warm restarts, cyclic, one-cycle, polynomial, lambda,
multiplicative, sequential, chained, plateau...) — become closed-form
schedule functions (step -> lr), torch-executed parity in
``tests/test_optim.py``. ``reduce_lr_on_plateau`` is the one stateful
(metric-driven) entry.

``build_optimizer(config)`` mirrors the reference's declarative
``configure_optimizers`` (nn/model.py:498-615): a dict with optimizer name,
kwargs and an optional nested scheduler spec.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
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
_register_opt("lbfgs", optax.lbfgs)
_register_opt("rprop", optax.rprop)
# torch SparseAdam == Adam over dense gradients (it only differs in how
# sparse grad *tensors* are handled; XLA gradients are always dense)
_register_opt("sparse_adam", optax.adam)


def asgd(learning_rate: float, lambd: float = 1e-4, alpha: float = 0.75,
         t0: float = 1e6, weight_decay: float = 0.0):
    """Averaged SGD with torch.optim.ASGD's exact update rule.

    Per step (torch ASGD): eta_t = lr / (1 + lambd*lr*t)^alpha,
    p <- p*(1 - lambd*eta_t) - eta_t*(g + wd*p), with the Polyak-Ruppert
    tail average ``ax`` kept in state (mu_t = 1/max(1, t - t0)); read it
    via ``opt_state[0].ax`` for averaged-parameter evaluation. Not in
    optax; implemented as a custom GradientTransformation.
    """
    import typing

    class AsgdState(typing.NamedTuple):
        count: jnp.ndarray
        ax: typing.Any

    def init_fn(params):
        return AsgdState(count=jnp.zeros([], jnp.int32),
                         ax=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("asgd requires params")
        # torch updates eta/mu AFTER each step, so step k uses values
        # derived from k-1 (= pre-increment count)
        t = state.count.astype(jnp.float32)
        eta = learning_rate / (1.0 + lambd * learning_rate * t) ** alpha
        mu = 1.0 / jnp.maximum(1.0, t - t0)

        def upd(g, p):
            g = g + weight_decay * p
            return -(lambd * eta) * p - eta * g

        new_updates = jax.tree.map(upd, updates, params)
        new_p = jax.tree.map(lambda p, u: p + u, params, new_updates)
        new_ax = jax.tree.map(
            lambda a, p: jnp.where(mu < 1.0, a + mu * (p - a), p),
            state.ax, new_p)
        return new_updates, AsgdState(count=state.count + 1, ax=new_ax)

    return optax.GradientTransformation(init_fn, update_fn)


_register_opt("asgd", asgd)


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


@LR_SCHEDULERS.register(name="cosine_annealing_warm_restarts")
def cosine_annealing_warm_restarts(base_lr: float, t_0: int, t_mult: int = 1,
                                   eta_min: float = 0.0):
    """SGDR (torch CosineAnnealingWarmRestarts closed form): cosine decay
    within each cycle, cycle lengths t_0 * t_mult**n."""
    if t_mult < 1:
        raise ValueError("t_mult must be >= 1")

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(step, t_0)
            t_i = float(t_0)
        else:
            # n = floor(log_mult(step/t_0 * (mult-1) + 1))
            n = jnp.floor(jnp.log(step / t_0 * (t_mult - 1) + 1)
                          / math.log(t_mult))
            t_cur = step - t_0 * (t_mult ** n - 1) / (t_mult - 1)
            t_i = t_0 * t_mult ** n
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * t_cur / t_i))
    return schedule


@LR_SCHEDULERS.register(name="cyclic_lr")
def cyclic_lr(base_lr: float, max_lr: float, step_size_up: int = 2000,
              step_size_down: int | None = None, mode: str = "triangular",
              gamma: float = 1.0):
    """torch CyclicLR (Smith 2017): triangle between base_lr and max_lr;
    triangular2 halves the amplitude each cycle, exp_range scales it by
    gamma**step."""
    down = step_size_up if step_size_down is None else step_size_down
    total = step_size_up + down

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + step / total)
        x = 1.0 + step / total - cycle  # position in cycle, [0, 1)
        up_frac = step_size_up / total
        scale_x = jnp.where(x <= up_frac, x / up_frac,
                            (1.0 - x) / (1.0 - up_frac))
        if mode == "triangular":
            amp = 1.0
        elif mode == "triangular2":
            amp = 1.0 / (2.0 ** (cycle - 1))
        elif mode == "exp_range":
            amp = gamma ** step
        else:
            raise ValueError(f"unknown cyclic mode {mode!r}")
        return base_lr + (max_lr - base_lr) * scale_x * amp
    return schedule


@LR_SCHEDULERS.register(name="one_cycle_lr")
def one_cycle_lr(base_lr: float, total_steps: int, pct_start: float = 0.3,
                 anneal_strategy: str = "cos", div_factor: float = 25.0,
                 final_div_factor: float = 1e4):
    """torch OneCycleLR: warm up initial->max over pct_start of the run,
    then anneal max->min. ``base_lr`` plays torch's ``max_lr`` role
    (our constructors are keyed on the config's lr)."""
    initial = base_lr / div_factor
    final = initial / final_div_factor
    # pct_start*total_steps == 1 would give up_steps == 0 and a 0/0 NaN at
    # step 0 (jnp.where evaluates both branches); clamp to a tiny positive
    # so the schedule starts directly in the anneal phase instead.
    up_steps = max(float(pct_start * total_steps) - 1.0, 1e-6)
    down_steps = max(float(total_steps - 1) - up_steps, 1e-6)

    def _anneal(start, end, frac):
        if anneal_strategy == "cos":
            return end + (start - end) / 2.0 * (1 + jnp.cos(jnp.pi * frac))
        if anneal_strategy == "linear":
            return start + (end - start) * frac
        raise ValueError(f"unknown anneal_strategy {anneal_strategy!r}")

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up = _anneal(initial, base_lr, jnp.clip(step / up_steps, 0.0, 1.0))
        dn = _anneal(base_lr, final,
                     jnp.clip((step - up_steps) / down_steps, 0.0, 1.0))
        return jnp.where(step <= up_steps, up, dn)
    return schedule


@LR_SCHEDULERS.register(name="polynomial_lr")
def polynomial_lr(base_lr: float, total_iters: int = 5, power: float = 1.0):
    def schedule(step):
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / total_iters, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power
    return schedule


@LR_SCHEDULERS.register(name="lambda_lr")
def lambda_lr(base_lr: float, lr_lambda):
    """torch LambdaLR: lr = base_lr * lr_lambda(step). ``lr_lambda`` must be
    jit-traceable if the schedule is used inside jit."""
    def schedule(step):
        return base_lr * lr_lambda(step)
    return schedule


@LR_SCHEDULERS.register(name="multiplicative_lr")
def multiplicative_lr(base_lr: float, lr_lambda, total_iters: int = 10000):
    """torch MultiplicativeLR: lr(n) = base_lr * prod_{k=1..n} lr_lambda(k).

    The cumulative product over an arbitrary Python callable has no closed
    form, so factors are pretabulated to ``total_iters`` and looked up
    (clipped at the end) — jit-friendly and exact within the table.
    """
    facts = np.cumprod([1.0] + [float(lr_lambda(k))
                                for k in range(1, total_iters + 1)])
    table = jnp.asarray(base_lr * facts, jnp.float32)

    def schedule(step):
        idx = jnp.clip(jnp.asarray(step, jnp.int32), 0, total_iters)
        return jnp.take(table, idx)
    return schedule


@LR_SCHEDULERS.register(name="sequential_lr")
def sequential_lr(base_lr: float, schedulers: Sequence[dict],
                  milestones: Sequence[int]):
    """torch SequentialLR: switch between child schedules at milestones;
    each child sees steps relative to its activation point."""
    from enhax.nn.optim import build_schedule  # self-import for clarity
    if len(schedulers) != len(milestones) + 1:
        raise ValueError("need len(schedulers) == len(milestones) + 1")
    children = [build_schedule(base_lr, dict(s)) for s in schedulers]
    starts = [0] + list(milestones)
    ms = jnp.asarray(list(milestones))

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.sum(step >= ms)
        vals = jnp.stack([
            jnp.asarray(c(step - s) if callable(c) else c, jnp.float32)
            for c, s in zip(children, starts)])
        return jnp.take(vals, idx)
    return schedule


@LR_SCHEDULERS.register(name="chained_scheduler")
def chained_scheduler(base_lr: float, schedulers: Sequence[dict]):
    """torch ChainedScheduler: apply every child's multiplicative factor at
    each step — lr = base_lr * prod_i (child_i(step) / base_lr). Exact for
    the factor-style schedules chaining is used with (constant / linear /
    exponential)."""
    from enhax.nn.optim import build_schedule
    children = [build_schedule(base_lr, dict(s)) for s in schedulers]

    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for c in children:
            f = (jnp.asarray(c(step), jnp.float32) / base_lr) if callable(c) \
                else jnp.asarray(c, jnp.float32) / base_lr
            lr = lr * f
        return lr
    return schedule


@LR_SCHEDULERS.register(name="reduce_lr_on_plateau")
class ReduceLROnPlateau:
    """torch ReduceLROnPlateau: metric-driven, hence stateful host-side.

    Call ``step(metric)`` once per validation; read ``lr`` (or call the
    object with any step index) for the current value. Configured through
    ``build_optimizer``, the optimizer is wrapped in
    ``optax.inject_hyperparams`` so the learning rate lives in
    ``opt_state`` as a device value; the Trainer steps the plateau object
    on its monitor after each validation epoch and writes the new lr back
    with ``set_opt_learning_rate`` (no retrace).
    """

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0):
        if mode not in ("min", "max"):
            raise ValueError("mode must be min|max")
        if threshold_mode not in ("rel", "abs"):
            raise ValueError("threshold_mode must be rel|abs")
        self.lr = float(base_lr)
        self.mode, self.factor = mode, factor
        self.patience, self.threshold = patience, threshold
        self.threshold_mode, self.cooldown = threshold_mode, cooldown
        self.min_lr = min_lr
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, current):
        if self.mode == "min":
            thr = self.best * (1.0 - self.threshold) \
                if self.threshold_mode == "rel" else self.best - self.threshold
            return current < thr
        thr = self.best * (1.0 + self.threshold) \
            if self.threshold_mode == "rel" else self.best + self.threshold
        return current > thr

    def step(self, metric) -> float:
        current = float(metric)
        if self._is_better(current):
            self.best = current
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.lr

    def __call__(self, step=None) -> float:
        return self.lr


@LR_SCHEDULERS.register(name="cosine_annealing_restart_lr2")
def cosine_annealing_restart_lr2(base_lr: float, periods: Sequence[int],
                                 restarts: Sequence[int],
                                 restart_weights: Sequence[float] = (1,),
                                 eta_min: float = 0.0):
    """Closed form of the reference's CosineAnnealingRestartLR2
    (optimizer.py:173-216): at each restart epoch r_i the lr resets to
    restart_weights[i] * base_lr and cosine-cycles with period
    periods[i+1]; the recursive torch update telescopes to the standard
    cosine between eta_min and the restart peak. Note the reference
    shifts restart epochs by +1 internally (restarts = [v+1 ...])."""
    if len(restarts) != len(restart_weights):
        raise ValueError("restarts and restart_weights must match in length")
    shifted = [v + 1 for v in restarts]
    rs = jnp.asarray([0] + shifted)
    ws = jnp.asarray([1.0] + list(restart_weights), jnp.float32)
    ps = jnp.asarray(list(periods[:len(shifted) + 1]), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = jnp.sum(step >= rs) - 1
        last_restart = jnp.take(rs, idx)
        t_max = jnp.take(ps, idx)
        peak = jnp.take(ws, idx) * base_lr
        t = step - last_restart
        return eta_min + 0.5 * (peak - eta_min) * (
            1 + jnp.cos(jnp.pi * t / t_max))
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
    return build_optimizer_with_plateau(config)[0]


def build_optimizer_with_plateau(config: dict):
    """Like ``build_optimizer`` but returns ``(tx, plateau, monitor)``.

    When the scheduler spec is ``reduce_lr_on_plateau``, the optimizer is
    wrapped in ``optax.inject_hyperparams`` (lr becomes an
    ``opt_state.hyperparams`` device value) and the stateful plateau
    object plus its monitor key (default ``val/loss``) are returned for
    the Trainer to drive; otherwise ``(tx, None, None)``.
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

    plateau = monitor = None
    if isinstance(sched_spec, dict) and sched_spec.get("name") and \
            _is_plateau(sched_spec["name"]):
        p_cfg = {k: v for k, v in sched_spec.items()
                 if k not in ("name", "monitor")}
        plateau = ReduceLROnPlateau(lr, **p_cfg)
        monitor = sched_spec.get("monitor", "val/loss")
        lr_or_schedule = lr
    else:
        lr_or_schedule = build_schedule(lr, sched_spec) if sched_spec else lr

    builder = OPTIMIZERS.get(name)
    kwargs = dict(opt_cfg)
    if wd is not None and name in ("adamw", "lamb", "lion", "sgd"):
        kwargs["weight_decay"] = wd
    import inspect
    accepted = set(inspect.signature(builder).parameters)
    kwargs = {k: v for k, v in kwargs.items() if k in accepted}
    if plateau is not None:
        tx = optax.inject_hyperparams(builder)(
            learning_rate=lr_or_schedule, **kwargs)
    else:
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
    return tx, plateau, monitor


def _is_plateau(name: str) -> bool:
    try:
        return LR_SCHEDULERS.canonical_name(name) == "reduce_lr_on_plateau"
    except KeyError:
        return False


def set_opt_learning_rate(opt_state, lr):
    """Write ``lr`` into every ``optax.InjectHyperparamsState`` found in an
    optimizer state pytree (walks chain tuples / MultiSteps wrappers).
    Shape/dtype-preserving, so jitted steps do not retrace."""
    def walk(s):
        # both optax inject flavors (InjectHyperparamsState and the
        # stateful variant) are NamedTuples with a `hyperparams` dict
        if hasattr(s, "_fields") and "hyperparams" in s._fields \
                and isinstance(s.hyperparams, dict) \
                and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, getattr(hp["learning_rate"], "dtype", jnp.float32))
            return s._replace(hyperparams=hp)
        if hasattr(s, "_fields"):  # any NamedTuple state wrapper
            return s._replace(**{f: walk(getattr(s, f)) for f in s._fields})
        if isinstance(s, tuple):
            return tuple(walk(x) for x in s)
        return s
    return walk(opt_state)
