"""On-device probes for the conv lowerings (dwconv impl crossover).

Round-3 follow-up: the shifted-adds DWConv3x3 lowering (probed at C=32 on
NAFNet) regressed Restormer (2.31 -> 1.23 MP/s bf16) and HINet, whose
depthwise convs run at C=144..510. This probe times both impls across the
channel range at Restormer-tile-like shapes to locate the crossover that
sets DWConv3x3.SHIFT_MAX_C, and can A/B the full restormer tile forward.

Usage: python run/probe_lowering.py [dw|pw|model] [f32|bf16]
Run ONE probe per process (OOM poisoning; single-TPU-client rule).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def chain_time(fn, x, iters=12, label=""):
    loop = jax.jit(lambda v: jax.lax.fori_loop(0, iters, lambda i, a: fn(a),
                                               v))
    r = loop(x)
    float(jnp.sum(r.astype(jnp.float32)[0, 0, 0]))   # compile + hard sync
    t0 = time.perf_counter()
    r = loop(x)
    float(jnp.sum(r.astype(jnp.float32)[0, 0, 0]))
    dt = time.perf_counter() - t0
    ms = (dt * 1e3 - 29.0) / iters                   # subtract RPC floor
    print(f"{label:40s} {ms:8.2f} ms/iter", flush=True)
    return ms


def dw_shift(x, k):
    from enhax.nn.layers import dwconv3x3_shift
    return dwconv3x3_shift(x, k)


def dw_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "dw"
    dt = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") \
        else jnp.float32
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    if which == "dw":
        # restormer-tile-level shapes: chunk 16 of 256^2 tiles at level-0
        # channel counts (48/96 blocks -> qkv 144/288, GDFN 254/510), and
        # the deeper levels at their own HW
        for b, h, w, c in ((16, 256, 256, 48), (16, 256, 256, 144),
                           (16, 256, 256, 254), (16, 256, 256, 288),
                           (16, 256, 256, 510), (16, 128, 128, 288),
                           (16, 64, 64, 576), (2, 736, 1280, 32),
                           (2, 736, 1280, 64)):
            x = jnp.asarray(rng.uniform(0, 1, (b, h, w, c)), dt)
            k = jnp.asarray(rng.uniform(-1, 1, (3, 3, 1, c)), dt)
            gb = 2 * x.size * x.dtype.itemsize / 1e9
            ms_s = chain_time(lambda a: dw_shift(a, k), x,
                              label=f"dw shift {b}x{h}x{w}x{c}")
            ms_c = chain_time(lambda a: dw_conv(a, k), x,
                              label=f"dw conv  {b}x{h}x{w}x{c}")
            print(f"  -> min-traffic {gb:.2f} GB; shift "
                  f"{gb / ms_s * 1e3:.0f} GB/s, conv {gb / ms_c * 1e3:.0f} "
                  f"GB/s", flush=True)

    elif which == "pw":
        # 1x1 conv: XLA conv op vs dot, across the restormer channel range
        for b, h, w, ci, co in ((16, 256, 256, 48, 144), (16, 256, 256, 96, 510),
                                (16, 128, 128, 96, 288), (16, 64, 64, 192, 576),
                                (2, 736, 1280, 32, 64)):
            x = jnp.asarray(rng.uniform(0, 1, (b, h, w, ci)), dt)
            kc = jnp.asarray(rng.uniform(-1, 1, (1, 1, ci, co)), dt)
            kd = kc[0, 0]
            pad = jnp.zeros((b, h, w, co), dt)

            def as_conv(a):
                y = jax.lax.conv_general_dilated(
                    a, kc, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return (y + pad)[..., :ci]

            def as_dot(a):
                y = jnp.einsum("bhwi,io->bhwo", a, kd)
                return (y + pad)[..., :ci]

            chain_time(as_conv, x, label=f"pw conv {b}x{h}x{w} {ci}->{co}")
            chain_time(as_dot, x, label=f"pw dot  {b}x{h}x{w} {ci}->{co}")

    elif which == "model":
        # full restormer forward on one 16-tile chunk, per DW impl
        from enhax.models.base import build_model
        impl = os.environ.get("ENHAX_DW_IMPL", "auto")
        model = build_model("restormer")
        x = jnp.asarray(rng.uniform(0, 0.4, (16, 256, 256, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), {"image": x})
        if dt == jnp.bfloat16:
            cast = lambda a: a.astype(dt) if hasattr(a, "dtype") \
                and a.dtype == jnp.float32 else a  # noqa: E731
            v = jax.tree_util.tree_map(cast, v)
            x = x.astype(dt)
        fwd = lambda a: model.apply(v, {"image": a})["enhanced"]  # noqa: E731
        ms = chain_time(fwd, x, iters=4,
                        label=f"restormer 16x256x256 {impl} {dt.__name__}")
        mp = 16 * 256 * 256 / 1e6
        print(f"  -> {mp / ms * 1e3:.2f} MP/s (untiled-chunk upper bound)",
              flush=True)


if __name__ == "__main__":
    main()
