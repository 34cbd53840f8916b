"""Per-op probe at Restormer's REAL shapes on the live chip.

Times each op class (LayerNorm, 1x1 matmul, depthwise 3x3 in BOTH
lowerings, MDTA attention einsums) at every level's actual
(B, H, W, C, heads) for a chunk of 256^2 tiles, multiplies by per-model
op counts, and prints a sorted cost breakdown plus the measured full
forward for cross-check. This is how we find where the 13x-below-roofline
serving gap actually lives (docs/PERF.md round-4 roofline; VERDICT r4
task 5) instead of guessing.

Methodology: each op runs ITERS times inside one jitted fori_loop (the
axon relay's ~29 ms RPC floor would otherwise dominate sub-ms ops); the
input is perturbed per iteration (x * (1 + 1e-6*i)) so XLA cannot hoist
the loop-invariant op out of the loop. bf16 end to end, like the serving
row restormer_1080p_tiled256_bf16.

Usage: python run/probe_restormer_ops.py [--iters 30]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import time

import numpy as np


def main(argv):
    iters = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 30
    smoke = "--smoke" in argv  # tiny shapes: validate code paths on CPU

    import jax
    import jax.numpy as jnp

    from enhax.nn.layers import LayerNorm2d, dwconv3x3_shift

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def timed(name, fn, *args):
        """Median of 3 timings of `iters` chained applications."""

        @jax.jit
        def loop(*a):
            def body(i, acc):
                scaled = tuple(x * (1.0 + 1e-6 * i) if j == 0 else x
                               for j, x in enumerate(a))
                return acc + fn(*scaled).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        _ = float(loop(*args))  # compile + sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(loop(*args))
            ts.append((time.perf_counter() - t0) / iters)
        return float(np.median(ts))

    # (tag, B, H, W, d, heads, n_blocks) — B=15 is the serving chunk
    # (_best_chunk(180,16)=15); dec-L1/refinement run at width 2d=96.
    LEVELS = [
        ("L1_enc", 15, 256, 256, 48, 1, 4),
        ("L1_dec_ref", 15, 256, 256, 96, 1, 8),
        ("L2", 15, 128, 128, 96, 2, 12),
        ("L3", 15, 64, 64, 192, 4, 12),
        ("L4_latent", 15, 32, 32, 384, 8, 8),
    ]
    if smoke:
        iters = 2
        LEVELS = [("smoke", 2, 32, 32, 16, 2, 1)]

    rows = []
    for tag, b, h, w, d, heads, n_blocks in LEVELS:
        x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, d)), dt)
        hidden = int(d * 2.66)

        def pw(cin, cout, xx):
            wm = jnp.asarray(rng.uniform(-0.1, 0.1, (cin, cout)), dt)
            return timed("pw", lambda t: t.reshape(-1, cin) @ wm, xx)

        # LayerNorm (x2 per block)
        ln = LayerNorm2d(eps=1e-5)
        lnv = ln.init(jax.random.PRNGKey(0), x)
        t_ln = timed("ln", lambda t: ln.apply(lnv, t), x)

        # MDTA: qkv 1x1, dw@3d, attention einsums, proj 1x1
        t_qkv = pw(d, 3 * d, x)
        x3 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 3 * d)), dt)
        k3 = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 1, 3 * d)), dt)
        t_dw3d_shift = timed("dw", lambda t: dwconv3x3_shift(t, k3), x3)
        t_dw3d_conv = timed("dw", lambda t: jax.lax.conv_general_dilated(
            t, k3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3 * d), x3)

        hd = d // heads
        q = jnp.asarray(rng.uniform(-1, 1, (b, heads, hd, h * w)), dt)
        k = jnp.asarray(rng.uniform(-1, 1, (b, heads, hd, h * w)), dt)
        v = jnp.asarray(rng.uniform(-1, 1, (b, heads, hd, h * w)), dt)

        # k/v passed as ARGS, not closure constants: captured arrays get
        # embedded in the relay's remote_compile request body and 94 MB+
        # constants trip its HTTP 413 length limit
        def attn(qq, kk, vv):
            qn = qq / jnp.maximum(jnp.linalg.norm(qq, axis=-1, keepdims=True), 1e-6)
            kn = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-6)
            a = jnp.einsum("nhcp,nhdp->nhcd", qn, kn,
                           preferred_element_type=jnp.float32)
            a = jax.nn.softmax(a, axis=-1).astype(vv.dtype)
            return jnp.einsum("nhcd,nhdp->nhcp", a, vv)

        t_attn = timed("attn", attn, q, k, v)
        t_proj = pw(d, d, x)

        # layout cost the model pays around the einsums: NHWC -> (n, heads,
        # hd, HW) for q/k/v and back for out — materialized transposes
        def pack(t):
            tt = t.reshape(b, h * w, 3, heads, hd)
            q_ = tt[:, :, 0].transpose(0, 2, 3, 1)
            k_ = tt[:, :, 1].transpose(0, 2, 3, 1)
            v_ = tt[:, :, 2].transpose(0, 2, 3, 1)
            return q_ + k_ + v_

        t_pack = timed("pack", pack, x3)
        o = jnp.asarray(rng.uniform(-1, 1, (b, heads, hd, h * w)), dt)
        t_unpack = timed("unpack",
                         lambda t: t.transpose(0, 3, 1, 2).reshape(b, h, w, d), o)

        # transpose-free alternative: einsum directly in (n, p, heads, hd)
        # layout — XLA contracts p without materializing the head transpose
        qn2 = jnp.asarray(rng.uniform(-1, 1, (b, h * w, heads, hd)), dt)
        kn2 = jnp.asarray(rng.uniform(-1, 1, (b, h * w, heads, hd)), dt)
        vn2 = jnp.asarray(rng.uniform(-1, 1, (b, h * w, heads, hd)), dt)

        def attn_nofold(qq, kk, vv):
            qn = qq / jnp.maximum(jnp.linalg.norm(qq, axis=1, keepdims=True), 1e-6)
            kn = kk / jnp.maximum(jnp.linalg.norm(kk, axis=1, keepdims=True), 1e-6)
            a = jnp.einsum("nphc,nphd->nhcd", qn, kn,
                           preferred_element_type=jnp.float32)
            a = jax.nn.softmax(a, axis=-1).astype(vv.dtype)
            return jnp.einsum("nhcd,nphd->nphc", a, vv).reshape(b, h, w, d)

        t_attn_native = timed("attn_native", attn_nofold, qn2, kn2, vn2)

        # GDFN: in 1x1 (d->2*hidden), dw@2*hidden, gate, out 1x1
        t_gin = pw(d, 2 * hidden, x)
        x2h = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2 * hidden)), dt)
        k2h = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 1, 2 * hidden)), dt)
        t_dwh_shift = timed("dw", lambda t: dwconv3x3_shift(t, k2h), x2h)
        t_dwh_conv = timed("dw", lambda t: jax.lax.conv_general_dilated(
            t, k2h, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=2 * hidden), x2h)

        def gate(t):
            a_, b_ = jnp.split(t, 2, axis=-1)
            return jax.nn.gelu(a_) * b_

        t_gate = timed("gate", gate, x2h)
        xh = jnp.asarray(rng.uniform(-1, 1, (b, h, w, hidden)), dt)
        t_gout = pw(hidden, d, xh)

        per_block = {
            "ln_x2": 2 * t_ln,
            "mdta_qkv_pw": t_qkv,
            "mdta_dw3d": min(t_dw3d_shift, t_dw3d_conv),
            "mdta_attn": t_attn,
            "mdta_layout": t_pack + t_unpack,
            "mdta_proj_pw": t_proj,
            "gdfn_in_pw": t_gin,
            "gdfn_dw": min(t_dwh_shift, t_dwh_conv),
            "gdfn_gate": t_gate,
            "gdfn_out_pw": t_gout,
        }
        rows.append({
            "level": tag, "shape": [b, h, w, d], "heads": heads,
            "blocks": n_blocks,
            "dw_ab": {"dw3d_shift_ms": round(t_dw3d_shift * 1e3, 3),
                      "dw3d_conv_ms": round(t_dw3d_conv * 1e3, 3),
                      "dwh_shift_ms": round(t_dwh_shift * 1e3, 3),
                      "dwh_conv_ms": round(t_dwh_conv * 1e3, 3)},
            "attn_ab": {"attn_transposed_ms": round((t_attn + t_pack + t_unpack) * 1e3, 3),
                        "attn_native_layout_ms": round(t_attn_native * 1e3, 3)},
            "per_block_ms": {kk: round(vv * 1e3, 3)
                             for kk, vv in per_block.items()},
            "level_total_ms": round(sum(per_block.values()) * n_blocks * 1e3, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    # aggregate per op class across the model
    agg: dict[str, float] = {}
    for r in rows:
        for kk, vv in r["per_block_ms"].items():
            agg[kk] = agg.get(kk, 0.0) + vv * r["blocks"]
    total = sum(agg.values())
    print(json.dumps({"op_class_totals_ms": {
        kk: round(vv, 2) for kk, vv in
        sorted(agg.items(), key=lambda kv: -kv[1])},
        "sum_ms_per_chunk15": round(total, 2)}), flush=True)

    # cross-check: the real full forward on one chunk
    from enhax.models.base import build_model
    if smoke:
        model = build_model("restormer", dim=8, num_blocks=(1, 1, 1, 1),
                            num_refinement=1, heads=(1, 1, 2, 2))
        xin = jnp.asarray(rng.uniform(0, 0.4, (2, 64, 64, 3)), jnp.float32)
    else:
        model = build_model("restormer")
        xin = jnp.asarray(rng.uniform(0, 0.4, (15, 256, 256, 3)), jnp.float32)
    var = model.init(jax.random.PRNGKey(0), {"image": xin})
    cast = lambda a: a.astype(jnp.bfloat16) \
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
    var = jax.tree_util.tree_map(cast, var)
    xin = xin.astype(jnp.bfloat16)
    fwd = jax.jit(lambda vv, t: model.apply(vv, {"image": t})["enhanced"])
    _ = np.asarray(fwd(var, xin)).sum()
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(fwd(var, xin)).sum()
    t_full = (time.perf_counter() - t0) / 3
    print(json.dumps({"full_fwd_chunk15_ms": round(t_full * 1e3, 2),
                      "sum_of_parts_ms": round(total, 2),
                      "mp_per_s_equiv": round(15 * 65536 / 1e6 / t_full, 2)}),
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
