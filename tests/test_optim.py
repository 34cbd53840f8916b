"""Optimizer-builder tests: freeze_after transform and config wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from enhax.nn.optim import build_optimizer, freeze_after


def _params():
    return {"params": {"stage0": {"lambda_a": jnp.ones((3,)),
                                  "kernel": jnp.ones((2, 2))}}}


def test_freeze_after_masks_updates():
    tx = optax.chain(optax.sgd(1.0),
                     freeze_after(lambda p: "lambda_a" in p, after_steps=2))
    params = _params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    lam = [float(params["params"]["stage0"]["lambda_a"][0])]
    ker = [float(params["params"]["stage0"]["kernel"][0, 0])]
    for _ in range(4):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        lam.append(float(params["params"]["stage0"]["lambda_a"][0]))
        ker.append(float(params["params"]["stage0"]["kernel"][0, 0]))

    # lambda_a moves for 2 steps, then freezes; kernel keeps moving
    assert lam == [1.0, 0.0, -1.0, -1.0, -1.0]
    assert ker == [1.0, 0.0, -1.0, -2.0, -3.0]


def test_freeze_after_under_jit():
    tx = optax.chain(optax.sgd(1.0),
                     freeze_after(lambda p: "lambda_a" in p, after_steps=1))
    params = _params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def step(params, state):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(3):
        params, state = step(params, state)
    assert float(params["params"]["stage0"]["lambda_a"][0]) == 0.0
    assert float(params["params"]["stage0"]["kernel"][0, 0]) == -2.0


def test_build_optimizer_freeze_config():
    tx = build_optimizer({"optimizer": {"name": "sgd", "lr": 1.0},
                          "freeze": {"match": "lambda_", "after_steps": 0}})
    params = _params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(
        np.asarray(updates["params"]["stage0"]["lambda_a"]), 0.0)
    assert float(updates["params"]["stage0"]["kernel"][0, 0]) != 0.0


def test_freeze_truly_freezes_adam():
    """Masking must beat adam momentum: param static after the threshold."""
    tx = build_optimizer({"optimizer": {"name": "adam", "lr": 1e-2},
                          "freeze": {"match": "lambda_a", "after_steps": 1}})
    params = _params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    vals = []
    for _ in range(5):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        vals.append(float(params["params"]["stage0"]["lambda_a"][0]))
    assert vals[0] != 1.0            # moved on step 1
    assert vals[1:] == [vals[0]] * 4  # pinned afterwards despite momentum


def test_trainer_grad_clip_and_accumulation(rng):
    """Reference trainer knobs (default.py:142-143,158) via optax wraps."""
    import jax
    import jax.numpy as jnp
    import optax
    from enhax.models.base import build_model
    from enhax.train.trainer import Trainer

    m = build_model("zero_dce_re", num_channels=8)
    tr = Trainer(m, optax.sgd(1e-2), gradient_clip_val=0.1,
                 accumulate_grad_batches=2, max_epochs=1)
    batch = {"image": jnp.asarray(
        rng.uniform(0.02, 0.3, (2, 32, 32, 3)).astype(np.float32))}
    state = tr.init_state(batch)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    key = jax.random.PRNGKey(0)
    state1, metrics = tr._train_step(state, tr._place(batch), key)
    # first of two accumulation micro-steps: params unchanged
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0))
    state2, _ = tr._train_step(state1, tr._place(batch), key)
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p2), np.asarray(p0))
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_debug_knobs(rng):
    """fast_dev_run / limit batches / overfit_batches (default.py:141-159)."""
    import jax.numpy as jnp
    import optax
    from enhax.models.base import build_model
    from enhax.train.trainer import Trainer

    m = build_model("zero_dce_re", num_channels=8)

    def batches():
        for i in range(5):
            yield {"image": jnp.full((1, 32, 32, 3), 0.1 + 0.1 * i,
                                     jnp.float32)}

    tr = Trainer(m, optax.sgd(1e-3), fast_dev_run=True)
    st = tr.fit(batches, val_iter_fn=batches, resume=False)
    assert int(st.step) == 1 and tr.max_epochs == 1

    tr2 = Trainer(m, optax.sgd(1e-3), max_epochs=2, overfit_batches=2)
    st2 = tr2.fit(batches, resume=False)
    assert int(st2.step) == 4  # 2 cached batches x 2 epochs


def test_multistep_lr_restart_matches_reference_executed():
    """The closed-form schedule == the reference's stateful
    MultiStepLRRestart (optimizer.py:330-395, executed step by step)."""
    import torch

    from enhax.convert import refload
    from enhax.nn.optim import multistep_lr_restart

    if not refload.reference_available():
        import pytest as _pytest
        _pytest.skip("reference tree not present")

    mod = refload.load_first_party("nn/optimizer.py")

    base_lr = 0.2
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = mod.MultiStepLRRestart(opt, milestones=[10, 20], gamma=0.5,
                                   restarts=[15], weights=[2.0])
    ours = multistep_lr_restart(base_lr, milestones=[10, 20], gamma=0.5,
                                restarts=[15], restart_weights=[2.0])
    for step in range(0, 30):
        ref_lr = opt.param_groups[0]["lr"]
        got = float(ours(step))
        assert abs(got - ref_lr) < 1e-6, (step, got, ref_lr)  # f32 schedule vs f64 torch
        opt.step()
        sched.step()


def _torch_lrs(sched_ctor, steps, base_lr=0.1):
    """Run a torch scheduler and collect the lr before each step."""
    import torch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = sched_ctor(opt)
    out = []
    for _ in range(steps):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return out


def test_torch_scheduler_closed_forms_match_torch_executed():
    """Every torch-mapped schedule == torch's own scheduler, executed
    (reference registers these at optimizer.py:459-473)."""
    import torch.optim.lr_scheduler as tls

    from enhax.nn import optim as O

    base = 0.1
    cases = [
        (O.cosine_annealing_warm_restarts(base, t_0=10, t_mult=1, eta_min=1e-3),
         lambda o: tls.CosineAnnealingWarmRestarts(o, T_0=10, eta_min=1e-3)),
        (O.cosine_annealing_warm_restarts(base, t_0=5, t_mult=2),
         lambda o: tls.CosineAnnealingWarmRestarts(o, T_0=5, T_mult=2)),
        (O.cyclic_lr(0.01, max_lr=base, step_size_up=8),
         lambda o: tls.CyclicLR(o, base_lr=0.01, max_lr=base, step_size_up=8)),
        (O.cyclic_lr(0.01, max_lr=base, step_size_up=6, step_size_down=10,
                     mode="triangular2"),
         lambda o: tls.CyclicLR(o, base_lr=0.01, max_lr=base, step_size_up=6,
                                step_size_down=10, mode="triangular2")),
        (O.cyclic_lr(0.01, max_lr=base, step_size_up=8, mode="exp_range",
                     gamma=0.98),
         lambda o: tls.CyclicLR(o, base_lr=0.01, max_lr=base, step_size_up=8,
                                mode="exp_range", gamma=0.98)),
        (O.one_cycle_lr(base, total_steps=40),
         lambda o: tls.OneCycleLR(o, max_lr=base, total_steps=40)),
        (O.one_cycle_lr(base, total_steps=40, anneal_strategy="linear",
                        pct_start=0.25),
         lambda o: tls.OneCycleLR(o, max_lr=base, total_steps=40,
                                  anneal_strategy="linear", pct_start=0.25)),
        (O.polynomial_lr(base, total_iters=12, power=2.0),
         lambda o: tls.PolynomialLR(o, total_iters=12, power=2.0)),
        (O.lambda_lr(base, lambda s: 1.0 / (1.0 + 0.1 * s)),
         lambda o: tls.LambdaLR(o, lr_lambda=lambda s: 1.0 / (1.0 + 0.1 * s))),
        (O.multiplicative_lr(base, lambda s: 0.95, total_iters=50),
         lambda o: tls.MultiplicativeLR(o, lr_lambda=lambda s: 0.95)),
    ]
    for ours, ctor in cases:
        ref = _torch_lrs(ctor, steps=38, base_lr=base)
        for step, ref_lr in enumerate(ref):
            got = float(ours(step))
            assert abs(got - ref_lr) < 5e-6, (ours, step, got, ref_lr)


def test_one_cycle_degenerate_warmup_is_finite():
    """pct_start*total_steps == 1 used to produce 0/0 = NaN at step 0
    (ADVICE r4): the schedule must start directly in the anneal phase."""
    import numpy as np

    from enhax.nn import optim as O

    sched = O.one_cycle_lr(0.1, total_steps=10, pct_start=0.1)
    vals = [float(sched(s)) for s in range(10)]
    assert all(np.isfinite(v) for v in vals), vals
    assert vals[0] > vals[-1] > 0  # annealing from max toward final


def test_sequential_and_chained_match_torch_executed():
    import torch.optim.lr_scheduler as tls

    from enhax.nn.optim import build_schedule

    base = 0.1
    ours = build_schedule(base, {
        "name": "sequential_lr",
        "schedulers": [
            {"name": "linear_lr", "start_factor": 0.25, "end_factor": 1.0,
             "total_iters": 5},
            {"name": "exponential_lr", "gamma": 0.9},
        ],
        "milestones": [5],
    })

    def ctor(o):
        return tls.SequentialLR(
            o, [tls.LinearLR(o, start_factor=0.25, end_factor=1.0,
                             total_iters=5),
                tls.ExponentialLR(o, gamma=0.9)], milestones=[5])

    ref = _torch_lrs(ctor, steps=20, base_lr=base)
    for step, ref_lr in enumerate(ref):
        assert abs(float(ours(step)) - ref_lr) < 5e-6, (step,)

    ours_ch = build_schedule(base, {
        "name": "chained_scheduler",
        "schedulers": [
            {"name": "exponential_lr", "gamma": 0.95},
            {"name": "constant_lr"},
        ],
    })
    ref_ch = _torch_lrs(
        lambda o: tls.ChainedScheduler(
            [tls.ExponentialLR(o, gamma=0.95),
             tls.ConstantLR(o, factor=1.0, total_iters=0)]),
        steps=15, base_lr=base)
    for step, ref_lr in enumerate(ref_ch):
        assert abs(float(ours_ch(step)) - ref_lr) < 5e-6, (step,)


def test_reduce_lr_on_plateau_matches_torch_executed():
    import torch
    import torch.optim.lr_scheduler as tls

    from enhax.nn.optim import ReduceLROnPlateau

    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.89, 0.89, 0.89, 0.89, 0.89,
               0.5, 0.5, 0.5, 0.5, 0.6, 0.7]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    ref = tls.ReduceLROnPlateau(opt, mode="min", factor=0.5, patience=2)
    ours = ReduceLROnPlateau(0.1, mode="min", factor=0.5, patience=2)
    for m in metrics:
        ref.step(m)
        got = ours.step(m)
        assert abs(got - opt.param_groups[0]["lr"]) < 1e-9, (m, got)


def test_cosine_annealing_restart_lr2_matches_reference_executed():
    """Closed form == the reference's stateful CosineAnnealingRestartLR2
    (optimizer.py:173-216, executed step by step)."""
    import torch

    from enhax.convert import refload
    from enhax.nn.optim import cosine_annealing_restart_lr2

    if not refload.reference_available():
        import pytest as _pytest
        _pytest.skip("reference tree not present")

    mod = refload.load_first_party("nn/optimizer.py")

    base_lr = 0.2
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = mod.CosineAnnealingRestartLR2(
        opt, periods=[10, 8, 6], restarts=[10, 18],
        restart_weights=[0.5, 0.25], eta_min=1e-4)
    ours = cosine_annealing_restart_lr2(
        base_lr, periods=[10, 8, 6], restarts=[10, 18],
        restart_weights=[0.5, 0.25], eta_min=1e-4)
    for step in range(0, 24):
        ref_lr = opt.param_groups[0]["lr"]
        got = float(ours(step))
        assert abs(got - ref_lr) < 1e-5, (step, got, ref_lr)
        opt.step()
        sched.step()


def test_scheduler_registry_full_torch_surface():
    """Reference registers 21 scheduler names (optimizer.py:97-473); all
    resolve here."""
    import enhax  # noqa: F401
    from enhax.constants import LR_SCHEDULERS
    for name in [
        "cosine_annealing_restart_lr", "cosine_annealing_restart_lr2",
        "cosine_annealing_restart_cyclic_lr", "gradual_warmup_scheduler",
        "multistep_lr_restart", "vibrate_lr", "chained_scheduler",
        "constant_lr", "cosine_annealing_lr", "cosine_annealing_warm_restarts",
        "cyclic_lr", "exponential_lr", "lambda_lr", "linear_lr",
        "multistep_lr", "multiplicative_lr", "one_cycle_lr", "polynomial_lr",
        "reduce_lr_on_plateau", "sequential_lr", "step_lr",
    ]:
        assert name in LR_SCHEDULERS, name


def test_asgd_matches_torch_executed():
    """Custom ASGD transformation == torch.optim.ASGD, params and the
    Polyak-Ruppert average, incl. a small t0 so the tail average engages."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from enhax.nn.optim import asgd

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4,)).astype(np.float32)
    gs = [rng.normal(size=(4,)).astype(np.float32) for _ in range(12)]

    # torch
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.ASGD([p], lr=0.1, lambd=1e-2, alpha=0.75, t0=3,
                           weight_decay=1e-3)
    for g in gs:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    ax_t = opt.state[p]["ax"].numpy()

    # ours
    tx = asgd(0.1, lambd=1e-2, alpha=0.75, t0=3, weight_decay=1e-3)
    params = jnp.asarray(w0)
    st = tx.init(params)
    for g in gs:
        u, st = tx.update(jnp.asarray(g), st, params)
        params = params + u

    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.ax), ax_t, rtol=1e-5, atol=1e-6)


def test_optimizer_registry_reference_names():
    """Every optimizer name the reference registers (optimizer.py:78-90)
    resolves here (lbfgs/rprop via optax; sparse_adam == adam on dense
    XLA grads; asgd custom)."""
    import enhax  # noqa: F401
    from enhax.constants import OPTIMIZERS
    for name in ["adadelta", "adagrad", "adam", "adamax", "adamw", "asgd",
                 "lbfgs", "nadam", "radam", "rmsprop", "rprop", "sgd",
                 "sparse_adam"]:
        assert name in OPTIMIZERS, name


def test_trainer_reduce_lr_on_plateau_integration(rng, tmp_path):
    """A plateau scheduler config wires end-to-end: lr lives in opt_state
    via inject_hyperparams, and Trainer.fit drops it after `patience`
    stalled validation epochs (torch ReduceLROnPlateau semantics)."""
    import jax
    import jax.numpy as jnp
    import optax

    from enhax.models.base import build_model
    from enhax.train.trainer import Trainer

    m = build_model("zero_dce_re", num_channels=8)
    tr = Trainer(m, {"optimizer": {"name": "sgd", "lr": 1e-2},
                     "lr_scheduler": {"scheduler": {
                         "name": "reduce_lr_on_plateau", "factor": 0.5,
                         "patience": 1, "monitor": "val/loss",
                         # demand a 100% relative improvement per epoch so
                         # the run deterministically "plateaus"
                         "threshold": 1.0}}},
                 max_epochs=6, ckpt_dir=None, save_dir=str(tmp_path))
    assert tr.plateau is not None and tr.plateau_monitor == "val/loss"

    batch = {"image": jnp.asarray(
        rng.uniform(0.02, 0.3, (2, 16, 16, 3)).astype(np.float32))}
    state = tr.fit(lambda: [batch], val_iter_fn=lambda: [batch])

    lrs = [r.get("lr") for r in tr.history]
    assert all(v is not None for v in lrs)
    # val loss stalls within a few epochs at this lr -> at least one cut,
    # each cut exactly halves the lr
    assert lrs[-1] < 1e-2
    uniq = sorted(set(round(v, 10) for v in lrs), reverse=True)
    for a, b in zip(uniq, uniq[1:]):
        np.testing.assert_allclose(b, a * 0.5, rtol=1e-6)
    # the device-side hyperparam matches the host object
    def find_inject(s):
        if hasattr(s, "_fields"):
            if "hyperparams" in s._fields and isinstance(s.hyperparams, dict) \
                    and "learning_rate" in s.hyperparams:
                yield s
            for f in s._fields:
                yield from find_inject(getattr(s, f))
        elif isinstance(s, tuple):
            for x in s:
                yield from find_inject(x)

    leaves = list(find_inject(state.opt_state))
    assert leaves, "inject_hyperparams state not found"
    np.testing.assert_allclose(
        float(leaves[0].hyperparams["learning_rate"]), tr.plateau.lr,
        rtol=1e-6)
