"""Roofline calculator: XLA cost analysis -> MXU/HBM ceilings for a step.

Computes FLOPs and bytes-accessed for a model's jitted train step (or
forward) via ``compiled.cost_analysis()`` and derives the two ceilings on
one v5e chip. NOTE: bytes-accessed reflects the *lowering backend's* fusion
decisions — run under the TPU/axon backend for the authoritative number
(CPU-lowered HLO fuses differently and overstates traffic ~2.5x for
nafnet); the CPU run still settles the bound-ness question since AI is
backend-stable:

    t_mxu = flops / peak_flops        (MXU ceiling)
    t_hbm = bytes / hbm_bw            (bandwidth ceiling)

The binding ceiling gives the max achievable MFU for the op mix:
``mfu_ceiling = t_mxu / max(t_mxu, t_hbm)``. Architectures dominated by
elementwise/dwconv traffic (NAFNet: AI ~= 8.9 FLOP/B for the b16 train
step) are bandwidth-bound and CANNOT reach 10% MFU on v5e — the honest
metric is roofline occupancy ``t_roofline / t_measured``, which the r5
sweep measured at 79% (f32) and ~100% (bf16) for nafnet_sidd_256_b16
(BENCH_TRAIN.json, docs/PERF.md "Round 5").

Usage:
    JAX_PLATFORMS=cpu python tools/roofline.py nafnet --train --batch 16 \
        --hw 256 -- width=32 middle_blk_num=12
    JAX_PLATFORMS=cpu python tools/roofline.py restormer --hw 256 --batch 15

Prints one JSON line per run with flops, bytes, AI, and ceilings.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e per-chip peaks (jax-ml.github.io/scaling-book numbers)
PEAKS = {"f32": 98.5e12, "bf16": 197e12}
HBM_BW = 819e9


def analyze(model_name: str, *, train: bool, batch: int, hw: int,
            kwargs: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from enhax.models.base import build_model

    model = build_model(model_name, **kwargs)
    x = jnp.zeros((batch, hw, hw, 3), jnp.float32)

    if train:
        import optax

        batch_d = {"image": x, "ref_image": x}
        var = model.init(jax.random.PRNGKey(0), {"image": x[:1]})
        tx = optax.adam(1e-3)
        opt = tx.init(var["params"])

        def loss_fn(params, b):
            out = model.module.apply({"params": params}, b["image"])
            enh = out["enhanced"] if isinstance(out, dict) else out
            return jnp.mean(jnp.abs(enh - b["ref_image"]))

        def step(params, opt_state, b):
            loss, g = jax.value_and_grad(loss_fn)(params, b)
            up, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, up), opt_state, loss

        compiled = jax.jit(step, donate_argnums=(0, 1)).lower(
            var["params"], opt, batch_d).compile()
    else:
        var = model.init(jax.random.PRNGKey(0), {"image": x[:1]})
        compiled = jax.jit(
            lambda v, t: model.apply(v, {"image": t})["enhanced"]).lower(
                var, x).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    by = float(ca.get("bytes accessed", 0.0))
    px = batch * hw * hw
    row = {"model": model_name, "mode": "train" if train else "forward",
           "batch": batch, "hw": hw, "kwargs": kwargs,
           "flops": flops, "bytes_accessed": by,
           "arithmetic_intensity": round(flops / max(by, 1.0), 2),
           "kflop_per_px": round(flops / px / 1e3, 1)}
    t_hbm = by / HBM_BW
    for name, peak in PEAKS.items():
        t_mxu = flops / peak
        # bf16 roughly halves activation traffic; report f32-bytes ceiling
        # as-is and let the caller interpret (the sweep measures both)
        row[f"t_mxu_ms_{name}"] = round(t_mxu * 1e3, 1)
        row[f"mfu_ceiling_{name}"] = round(t_mxu / max(t_mxu, t_hbm), 4)
    row["t_hbm_ms_f32bytes"] = round(t_hbm * 1e3, 1)
    row["mp_per_s_hbm_ceiling"] = round(px / 1e6 / t_hbm, 2)
    return row


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    name = argv[0]
    train = "--train" in argv
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 1
    hw = int(argv[argv.index("--hw") + 1]) if "--hw" in argv else 256
    kwargs = {}
    if "--" in argv:
        for kv in argv[argv.index("--") + 1:]:
            k, v = kv.split("=", 1)
            try:
                kwargs[k] = json.loads(v)
            except json.JSONDecodeError:
                kwargs[k] = v
    print(json.dumps(analyze(name, train=train, batch=batch, hw=hw,
                             kwargs=kwargs)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
