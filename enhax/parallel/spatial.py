"""Spatial (H-axis) sharding for full-resolution frames.

The reference handles big frames with host-side tiling (Restormer
my_predict.py:157-167) and TLC. The TPU-native analog (SURVEY.md §2.9 item 3,
§5.7): shard the image height across the ``space`` mesh axis and let
convolutions exchange halos over ICI.

Two modes:
  * ``spatial_sharding`` — NamedSharding(P(None, "space")) on NHWC; with
    jitted convs XLA inserts the halo collectives automatically. This is the
    default path: zero model changes.
  * ``halo_exchange_conv_safe`` — explicit shard_map halo exchange via
    ppermute for kernels that need manual control (used by the Pallas tiled
    engine when the fused kernel cannot rely on XLA's SPMD partitioner).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh, data_axis: str = "data", space_axis: str = "space"):
    """NHWC sharding: batch over data axis, H over space axis."""
    return NamedSharding(mesh, P(data_axis, space_axis))


def pad_for_spatial(image, n_space: int, divisor: int = 32):
    """Pad H so it divides evenly across the space axis and the stride."""
    import numpy as np
    h = image.shape[-3]
    unit = n_space * divisor
    target = int(np.ceil(h / unit) * unit)
    ph = target - h
    if ph:
        pad = [(0, 0)] * (image.ndim - 3) + [(0, ph), (0, 0), (0, 0)]
        image = jnp.pad(image, pad, mode="reflect")
    return image, h


def halo_exchange(x, halo: int, axis_name: str):
    """Exchange ``halo`` rows with mesh neighbors along ``axis_name``.

    x: (N, H_local, W, C) inside shard_map. Returns x extended to
    (N, H_local + 2*halo, W, C) with neighbor rows (zero pads at ends).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = x[:, :halo]          # my top rows -> previous device's bottom halo
    bot_rows = x[:, -halo:]         # my bottom rows -> next device's top halo

    # receive from prev: its bottom rows; from next: its top rows
    from_prev = jax.lax.ppermute(bot_rows, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(top_rows, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    zero = jnp.zeros_like(from_prev)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def halo_exchange_conv_safe(apply_fn, halo: int, mesh: Mesh,
                            space_axis: str = "space", data_axis: str = "data"):
    """Wrap a per-shard function with explicit halo exchange via shard_map.

    ``apply_fn(x_extended) -> y_extended`` must be shift-invariant with
    receptive-field radius <= halo; the wrapper crops the halo back off.
    """
    def sharded(x):
        def local(xl):
            xe = halo_exchange(xl, halo, space_axis)
            ye = apply_fn(xe)
            return ye[:, halo:-halo]

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=P(data_axis, space_axis),
            out_specs=P(data_axis, space_axis),
        )(x)

    return sharded
