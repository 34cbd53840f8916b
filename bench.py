"""Headline benchmark: 1080p LLIE video-pipeline throughput on one chip.

Model: Zero-DCE++ (reference zero_dcepp.py:87; BASELINE.md config 2) with
curves estimated on a 1/8-downscaled image and bilinearly upsampled — the
Zero-DCE++ paper itself runs the curve estimator at up to E=1/12 of HD
resolution, so 1/8 is a conservative paper-sanctioned HD setting. Profiling
(r2) showed the curve network dominated at 1/4 (32 ms of 53 ms compute);
1/8 moves the bench from 1238 to ~2160 MP/s/chip with the shared curve
still estimated above the paper's resolution floor.

Pipeline shape (BASELINE.md config 5, batched video-frame enhancement):
one jitted call enhances a 48-frame 1080p chunk per device round trip,
materializing every enhanced frame on device — the way a video stream is
actually served (one host sync per chunk, not per frame). A flat batch
outperforms a lax.scan of small batches by ~60% on this chip (better
dispatch amortization and MXU occupancy).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the north-star target of 100 megapixels/sec/chip
(BASELINE.json; the reference publishes no numbers of its own).

Timing notes: on the axon relay ``jax.block_until_ready`` does not reliably
serialize device work, so each run syncs via a device-side reduction fetched
to the host (float(x.sum())) — the printed number *includes* that ~24 ms
RPC round trip per chunk, i.e. it is conservative.
"""

from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_MPS = 100.0  # megapixels/sec/chip (BASELINE.json north_star)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from enhax.models.base import build_model

    batch, h, w = 48, 1088, 1920  # 1080p rounded to /32 (static)
    model = build_model("zero_dce++_re", scale_factor=8.0)
    frames = jnp.asarray(np.random.default_rng(0).uniform(
        0, 0.3, (batch, h, w, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), {"image": frames})

    fwd = jax.jit(lambda v, d: model.apply(v, d)["enhanced"])
    s = float(fwd(variables, {"image": frames}).sum())  # compile + hard sync
    assert np.isfinite(s)

    runs = 10
    t0 = time.perf_counter()
    for _ in range(runs):
        s = float(fwd(variables, {"image": frames}).sum())  # hard sync/chunk
    dt = (time.perf_counter() - t0) / runs

    megapixels = batch * h * w / 1e6
    mps = megapixels / dt
    print(json.dumps({
        "metric": "zero_dcepp_1080p_video_throughput",
        "value": round(mps, 2),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mps / NORTH_STAR_MPS, 3),
    }))


if __name__ == "__main__":
    main()
