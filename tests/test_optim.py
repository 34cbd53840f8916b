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
