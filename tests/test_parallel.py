"""Mesh / sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from enhax.parallel import (
    data_sharding, halo_exchange_conv_safe, make_mesh, pad_for_spatial,
    shard_datapoint, spatial_sharding,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_1d():
    mesh = make_mesh(("data",))
    assert mesh.shape == {"data": 8}


def test_make_mesh_2d():
    mesh = make_mesh(("data", "space"))
    assert mesh.shape["data"] * mesh.shape["space"] == 8


def test_shard_datapoint_and_grad_allreduce(rng):
    """Data-parallel train step: grads identical to single-device math."""
    mesh = make_mesh(("data",))
    x = jnp.asarray(rng.uniform(size=(8, 4)).astype(np.float32))
    w = jnp.asarray(rng.uniform(size=(4, 2)).astype(np.float32))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, x)
    xs = jax.device_put(x, data_sharding(mesh))
    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded), atol=1e-6)


def test_spatial_sharding_conv_consistency(rng):
    """A conv over an H-sharded image must equal the unsharded conv."""
    from flax import linen as nn
    mesh = make_mesh(("data", "space"), shape=(2, 4))
    x = jnp.asarray(rng.uniform(size=(2, 32, 16, 3)).astype(np.float32))
    conv = nn.Conv(4, (3, 3))
    params = conv.init(jax.random.PRNGKey(0), x)

    y_ref = conv.apply(params, x)
    xs = jax.device_put(x, spatial_sharding(mesh))
    y_sharded = jax.jit(conv.apply)(params, xs)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sharded), atol=1e-5)


def test_halo_exchange_conv_safe(rng):
    """Explicit halo exchange matches the global blur."""
    mesh = make_mesh(("data", "space"), shape=(1, 8))
    x = jnp.asarray(rng.uniform(size=(1, 64, 8, 1)).astype(np.float32))

    def blur3(img):  # 3-tap vertical mean, zero-padded
        p = jnp.pad(img, ((0, 0), (1, 1), (0, 0), (0, 0)))
        return (p[:, :-2] + p[:, 1:-1] + p[:, 2:]) / 3.0

    def blur3_valid(img):  # for extended input: valid in H
        return (img[:, :-2] + img[:, 1:-1] + img[:, 2:]) / 3.0

    y_ref = blur3(x)
    wrapped = halo_exchange_conv_safe(
        lambda xe: jnp.pad(blur3_valid(xe), ((0, 0), (1, 1), (0, 0), (0, 0))),
        halo=1, mesh=mesh)
    y = wrapped(jax.device_put(x, spatial_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_pad_for_spatial():
    x = jnp.zeros((1, 100, 64, 3))
    padded, h = pad_for_spatial(x, n_space=4, divisor=32)
    assert h == 100
    assert padded.shape[1] % (4 * 32) == 0
