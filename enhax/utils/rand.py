"""Deterministic seeding.

Rebuild of reference ``set_random_seed`` (core/utils.py:695) for the JAX
world: numpy + Python stdlib seeding plus an explicit `jax.random` key
factory (JAX PRNG state is functional; there is no global device seed).
"""

from __future__ import annotations

import random

import numpy as np

_DEFAULT_SEED = 0
_seed_state = {"seed": _DEFAULT_SEED, "counter": 0}


def set_random_seed(seed: int | None) -> int:
    """Seed host RNGs and record the base seed for `new_rng`."""
    if seed is None:
        seed = _DEFAULT_SEED
    seed = int(seed) % (2**31 - 1)
    random.seed(seed)
    np.random.seed(seed)
    _seed_state["seed"] = seed
    _seed_state["counter"] = 0
    return seed


def new_rng(salt: int = 0):
    """A fresh jax PRNG key derived from the global seed (deterministic order)."""
    import jax
    _seed_state["counter"] += 1
    return jax.random.fold_in(
        jax.random.PRNGKey(_seed_state["seed"]), _seed_state["counter"] + salt
    )
