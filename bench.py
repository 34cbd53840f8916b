"""Headline benchmark: 1080p LLIE enhancement throughput on one chip.

Model: Zero-DCE++ (reference zero_dcepp.py:87; BASELINE.md config 2) with
a downscaled curve-estimation setting — curves estimated on a 1/4-downscaled image and
bilinearly upsampled (the Zero-DCE++ paper uses up to E=1/12 for HD) — applied
to full-resolution 1080p frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the north-star target of 100 megapixels/sec/chip
(BASELINE.json; the reference publishes no numbers of its own).

Timing notes: on the axon relay, ``jax.block_until_ready`` does not reliably
serialize device work, each run syncs via a device-side reduction fetched to
host (float(x.sum())) — this over-counts by one ~24 ms RPC round trip per
run, i.e. the printed number is *conservative*.
"""

from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_MPS = 100.0  # megapixels/sec/chip (BASELINE.json north_star)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/enhax_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from enhax.models.base import build_model

    batch, h, w = 4, 1088, 1920  # 1080p rounded to /32 (static shapes)
    model = build_model("zero_dce++_re", scale_factor=4.0)
    datapoint = {"image": jnp.asarray(
        np.random.default_rng(0).uniform(0, 0.3, (batch, h, w, 3)).astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), datapoint)

    fwd = jax.jit(lambda v, d: model.apply(v, d)["enhanced"])

    # warmup/compile + hard sync
    s = float(fwd(variables, datapoint).sum())
    assert np.isfinite(s)

    runs = 10
    t0 = time.perf_counter()
    for _ in range(runs):
        s = float(fwd(variables, datapoint).sum())  # hard host sync per run
    dt = (time.perf_counter() - t0) / runs

    megapixels = batch * h * w / 1e6
    mps = megapixels / dt
    print(json.dumps({
        "metric": "zero_dcepp_1080p_throughput",
        "value": round(mps, 2),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mps / NORTH_STAR_MPS, 3),
    }))


if __name__ == "__main__":
    main()
