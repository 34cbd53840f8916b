"""Mesh construction and canonical shardings.

Replaces the reference's ``nn/strategy.py`` (DDP/FSDP/XLA strategies over
NCCL/gloo, :67-131) with the JAX-native formulation:

  * ``make_mesh(("data", "space"))`` lays the local devices out as a 2D mesh;
    data parallelism shards the batch over ``data``; spatial parallelism
    shards image height over ``space`` (the restoration-domain analog of
    context parallelism, SURVEY.md §5.7).
  * gradients all-reduce automatically: a jitted step whose inputs carry
    batch-sharded NamedShardings gets psum-ed grads from XLA over ICI.
  * multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``
    and the same code runs over DCN+ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_mesh_devices(n: int | None = None):
    devs = jax.devices()
    return devs if n is None else devs[:n]


def make_mesh(axes: tuple[str, ...] = ("data",), shape: tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh over the given logical axes.

    Default: 1D data mesh over all devices. For ("data", "space") the device
    count is factored as evenly as possible unless ``shape`` is given.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            # favor data axis; take the largest divisor pair
            d = int(np.floor(np.sqrt(n)))
            while n % d:
                d -= 1
            shape = (n // d, d)
        else:
            raise ValueError("give an explicit shape for >2 mesh axes")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for NHWC arrays (replaces DistributedSampler)."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_datapoint(datapoint: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host datapoint dict onto the mesh, batch-sharded.

    Arrays whose leading dim does not divide the data-axis size are
    replicated instead (e.g. a trailing partial batch).
    """
    sh = data_sharding(mesh, axis)
    rep = replicated(mesh)
    n = mesh.shape[axis]
    out = {}
    for k, v in datapoint.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, sh if v.shape[0] % n == 0 else rep)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Named strategies (reference nn/strategy.py:67-80 registers lightning
# DDP/FSDP/XLA/SingleDevice strategies; the TPU-native analog is a named
# mesh recipe — build with STRATEGIES.build(name, devices=...)).
# ---------------------------------------------------------------------------

from enhax.constants import STRATEGIES  # noqa: E402


@STRATEGIES.register(name="single_device")
def single_device_strategy(devices=None, **_):
    """One-device mesh (lightning SingleDeviceStrategy)."""
    devs = list(devices if devices is not None else jax.devices())[:1]
    return make_mesh(("data",), devices=devs)


@STRATEGIES.register(name="ddp", aliases=["dp", "parallel", "xla", "auto"])
def ddp_strategy(devices=None, **_):
    """Pure data parallelism: 1D batch mesh; XLA psums grads over ICI —
    the replacement for DDPStrategy/XLAStrategy + NCCL process groups."""
    return make_mesh(("data",), devices=devices)


@STRATEGIES.register(name="fsdp", aliases=["deepspeed"])
def fsdp_strategy(devices=None, **_):
    """Fully-sharded data parallelism: same 1D mesh; shard params over the
    ``data`` axis with ``fsdp_shardings`` so each device holds 1/N of every
    weight and XLA inserts all-gathers at use (ZeRO-3 semantics)."""
    return make_mesh(("data",), devices=devices)


@STRATEGIES.register(name="spatial")
def spatial_strategy(devices=None, shape=None, **_):
    """2D (data, space) mesh for spatially-sharded full-res inference
    (halo-exchange conv path, enhax.parallel.spatial)."""
    return make_mesh(("data", "space"), shape=shape, devices=devices)


def fsdp_shardings(params, mesh: Mesh, axis: str = "data",
                   min_size: int = 2 ** 14):
    """Per-leaf NamedShardings sharding the largest dim of each big param
    over ``axis`` (ZeRO-3-style weight sharding for the fsdp strategy).

    Leaves smaller than ``min_size`` elements (or with no dim divisible by
    the axis size) stay replicated — the standard scheme from the scaling
    playbook: shard where it pays, replicate the rest.
    """
    n = mesh.shape[axis]

    def spec(leaf):
        if not hasattr(leaf, "shape") or leaf.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in dims:
            if leaf.shape[d] % n == 0:
                parts = [None] * leaf.ndim
                parts[d] = axis
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)
