"""Inference engine tests: padding, instance-mode scan, tiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhax.infer import Predictor, make_instance_infer, tiled_apply
from enhax.models.base import build_model


def test_predictor_pads_odd_sizes(rng):
    m = build_model("zero_dce_re", num_channels=8)
    pred = Predictor(m)
    dp = {"image": rng.uniform(0, 0.3, (30, 47, 3)).astype(np.float32)}
    out = pred.infer(dp)
    assert out["enhanced"].shape == (1, 30, 47, 3)  # cropped back
    assert "time" in out


def test_instance_infer_scan(rng):
    """ZSN2N-style per-image fit via scanned inner optimization."""
    m = build_model("zsn2n", num_channels=8)
    dp = {"image": jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))}
    params = m.init(jax.random.PRNGKey(0), dp)
    fit = make_instance_infer(m, steps=30, lr=1e-3)
    out = fit(params, dp, jax.random.PRNGKey(0))
    assert out["enhanced"].shape == dp["image"].shape
    assert np.isfinite(float(out["fit_loss"]))


def test_instance_fit_reduces_loss(rng):
    m = build_model("zsn2n", num_channels=16)
    clean = jnp.asarray(rng.uniform(0.3, 0.7, (1, 32, 32, 3)).astype(np.float32))
    noisy = jnp.clip(clean + 0.08 * jax.random.normal(jax.random.PRNGKey(1), clean.shape), 0, 1)
    dp = {"image": noisy}
    params = m.init(jax.random.PRNGKey(0), dp)
    loss0, _ = m.forward_loss(params, dp)
    fit = make_instance_infer(m, steps=150, lr=1e-3)
    out = fit(params, dp, jax.random.PRNGKey(0))
    assert float(out["fit_loss"]) < float(loss0)


def test_tiled_apply_identity(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 70, 90, 3)).astype(np.float32))
    out = tiled_apply(lambda t: t, x, tile=(32, 32), overlap=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_tiled_apply_matches_global_for_local_fn(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f = lambda t: jnp.clip(t * 1.5, 0, 1)  # pixel-local op
    out = tiled_apply(f, x, tile=(32, 32), overlap=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(x)), atol=1e-5)


def test_tiled_apply_uniform_matches_reference_accumulation(rng):
    """blend='uniform' == the reference's unweighted accumulate / count
    divide EXACTLY (restormer/my_predict.py:157-167), hand-computed here."""
    from enhax.infer.tiling import _tile_starts, tiled_apply_batched
    x = jnp.asarray(rng.uniform(0, 1, (1, 70, 90, 3)).astype(np.float32))
    f = lambda t: t * 0.5 + 0.1
    th = tw = 32
    overlap = 8
    out = tiled_apply(f, x, tile=(th, tw), overlap=overlap, blend="uniform")
    # reference algorithm: E[h1:h2, w1:w2] += out_patch; W += 1; E / W
    e = np.zeros_like(np.asarray(x))
    wsum = np.zeros((1, 70, 90, 1), np.float32)
    for y in _tile_starts(70, th, th - overlap):
        for xx in _tile_starts(90, tw, tw - overlap):
            patch = np.asarray(x)[:, y:y + th, xx:xx + tw]
            e[:, y:y + th, xx:xx + tw] += np.asarray(f(jnp.asarray(patch)))
            wsum[:, y:y + th, xx:xx + tw] += 1.0
    np.testing.assert_allclose(np.asarray(out), e / wsum, atol=1e-6)
    # batched path agrees with unbatched in uniform mode too
    outb = tiled_apply_batched(f, x, tile=(th, tw), overlap=overlap,
                               chunk=4, blend="uniform")
    np.testing.assert_allclose(np.asarray(outb), e / wsum, atol=1e-6)


def test_tiled_apply_both_blends_close_to_untiled(rng):
    """Both blend modes stay close to the untiled result for a local fn;
    hann (default) additionally has no seam discontinuities."""
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f = lambda t: jnp.clip(t * 1.5, 0, 1)
    for blend in ("hann", "uniform"):
        out = tiled_apply(f, x, tile=(32, 32), overlap=16, blend=blend)
        np.testing.assert_allclose(np.asarray(out), np.asarray(f(x)),
                                   atol=1e-5, err_msg=blend)


def test_predictor_tile_mode(rng):
    m = build_model("zero_dce_re", num_channels=8)
    pred_full = Predictor(m)
    dp = {"image": rng.uniform(0, 0.3, (64, 64, 3)).astype(np.float32)}
    out_full = pred_full.infer(dp)
    pred_tiled = Predictor(m, variables=pred_full.variables, tile=(32, 32, 8))
    out_tiled = pred_tiled.infer(dp)
    # curve estimation is not strictly tile-local, but outputs must be close
    diff = float(jnp.mean(jnp.abs(out_full["enhanced"] - out_tiled["enhanced"])))
    assert diff < 0.05, diff


def test_bucketed_predictor_single_compile(rng):
    """Different small sizes land in one bucket -> one compiled shape."""
    from enhax.models.base import build_model
    m = build_model("zero_dce_re", num_channels=8)
    pred = Predictor(m, bucket_sizes=(64, 128))
    shapes_seen = set()
    for hw in ((30, 47), (50, 20), (64, 64)):
        out = pred.infer({"image": rng.uniform(0, 0.3, (*hw, 3)).astype(np.float32)})
        assert out["enhanced"].shape[1:3] == hw  # cropped back exactly
        shapes_seen.add(hw)
    # oversized input falls through to exact padding
    out = pred.infer({"image": rng.uniform(0, 0.3, (150, 150, 3)).astype(np.float32)})
    assert out["enhanced"].shape[1:3] == (150, 150)


def test_predictor_mesh_matches_single_device(rng):
    """Data-sharded inference over the 8-dev mesh == single-device output."""
    from enhax.parallel.mesh import make_mesh
    m = build_model("zero_dce_re", num_channels=8)
    img = rng.uniform(0, 0.5, (8, 32, 32, 3)).astype(np.float32)
    ref = Predictor(m, seed=0)({"image": img})
    mesh = make_mesh(("data",))
    out = Predictor(m, seed=0, mesh=mesh)({"image": img})
    np.testing.assert_allclose(np.asarray(out[m.out_key]),
                               np.asarray(ref[m.out_key]), atol=2e-5)


def test_predictor_mesh_partial_batch_replicates(rng):
    """Batch 3 does not divide 8 devices -> replication fallback, no crash."""
    from enhax.parallel.mesh import make_mesh
    m = build_model("zero_dce_re", num_channels=8)
    img = rng.uniform(0, 0.5, (3, 32, 32, 3)).astype(np.float32)
    out = Predictor(m, seed=0, mesh=make_mesh(("data",)))({"image": img})
    assert out[m.out_key].shape == (3, 32, 32, 3)


def test_predictor_spatial_sharding(rng):
    """(data, space) mesh splits H; conv halos handled by XLA; parity."""
    from enhax.parallel.mesh import make_mesh
    m = build_model("zero_dce_re", num_channels=8)
    img = rng.uniform(0, 0.5, (2, 64, 32, 3)).astype(np.float32)
    ref = Predictor(m, seed=0)({"image": img})
    mesh = make_mesh(("data", "space"), shape=(2, 4))
    p = Predictor(m, seed=0, mesh=mesh, spatial=True)
    out = p({"image": img})
    np.testing.assert_allclose(np.asarray(out[m.out_key]),
                               np.asarray(ref[m.out_key]), atol=2e-5)


def test_predictor_spatial_requires_space_axis():
    m = build_model("zero_dce_re", num_channels=8)
    with pytest.raises(ValueError, match="space"):
        Predictor(m, spatial=True)


def test_predictor_weight_swap_invalidates_caches(rng):
    # assigning new variables must reset device placement + instance closure
    # so the predictor doesn't silently serve stale weights (r1 ADVICE #4)
    m = build_model("zero_dce_re", num_channels=8)
    pred = Predictor(m)
    dp = {"image": rng.uniform(0, 0.3, (32, 32, 3)).astype(np.float32)}
    out1 = np.asarray(pred.infer(dp)["enhanced"])
    scaled = jax.tree.map(lambda p: p * 2.0, pred.variables)
    pred.variables = scaled
    assert pred._vars_placed is False and pred._instance_fn is None
    out2 = np.asarray(pred.infer(dp)["enhanced"])
    assert not np.allclose(out1, out2)


def test_predictor_bf16(rng):
    """bf16 inference: output close to f32, dtype restored to f32."""
    from enhax.infer import Predictor
    from enhax.models.base import build_model
    m = build_model("zero_dce_re", num_channels=8)
    img = rng.uniform(0.02, 0.4, (40, 48, 3)).astype(np.float32)
    p32 = Predictor(m)
    p16 = Predictor(m, bf16=True)
    out32 = p32({"image": img})["enhanced"]
    p16.variables = p32.variables  # same weights; setter resets bf16 cast
    out16 = p16({"image": img})["enhanced"]
    assert np.asarray(out16).dtype == np.float32
    assert np.max(np.abs(np.asarray(out16) - np.asarray(out32))) < 0.02


def test_bucket_much_larger_than_image():
    """A bucket more than 2x the image must not crash reflect padding
    (reflect what fits, edge-extend the rest — r3 review)."""
    import jax.numpy as jnp

    from enhax.infer.engine import _pad_to_bucket

    img = jnp.ones((1, 60, 60, 3), jnp.float32)
    out, unpad = _pad_to_bucket({"image": img}, (512,))
    assert out["image"].shape == (1, 512, 512, 3)
    assert unpad == (60, 60)
    assert bool(jnp.isfinite(out["image"]).all())


def test_infer_accepts_dataset_item_with_meta(rng):
    """Raw dataset items carry a 'meta' dict; infer must drop it instead of
    crashing in jnp.asarray (r3 review)."""
    import jax

    from enhax.infer import Predictor
    from enhax.models.base import build_model

    m = build_model("zero_dce_re", num_channels=8)
    pred = Predictor(m)
    item = {"image": rng.uniform(0, 0.4, (16, 16, 3)).astype(np.float32),
            "meta": {"name": "0001.png", "path": "/tmp/0001.png"},
            "caption": "a dark street"}
    out = pred.infer(item)
    assert out["enhanced"].shape == (1, 16, 16, 3)


def test_tiled_apply_frames_matches_per_frame(rng):
    """Multi-frame tile pipelining (r4 Restormer serving path) must equal
    per-frame tiled_apply for both blend modes — including the uniform
    blend that is the reference-parity contract."""
    import jax.numpy as jnp

    from enhax.infer.tiling import tiled_apply, tiled_apply_frames

    frames = jnp.asarray(rng.uniform(0, 1, (3, 40, 56, 3)).astype(np.float32))

    def fn(x):
        return x * 0.5 + x**2 * 0.1  # shape-preserving, nonlinear

    for blend in ("hann", "uniform"):
        got = tiled_apply_frames(fn, frames, tile=(16, 16), overlap=4,
                                 chunk=5, blend=blend)
        for f in range(3):
            ref = tiled_apply(fn, frames[f:f + 1], tile=(16, 16), overlap=4,
                              blend=blend)
            np.testing.assert_allclose(np.asarray(got[f]), np.asarray(ref[0]),
                                       atol=1e-5)

    # full-height strip tiles (the r5 Restormer serving grid: rectangular
    # tiles with th = H kill the vertical overlap redundancy entirely)
    got = tiled_apply_frames(fn, frames, tile=(40, 16), overlap=4, chunk=3)
    for f in range(3):
        ref = tiled_apply(fn, frames[f:f + 1], tile=(40, 16), overlap=4)
        np.testing.assert_allclose(np.asarray(got[f]), np.asarray(ref[0]),
                                   atol=1e-5)


def test_best_chunk_minimizes_tail_waste():
    """Auto-chunk (r4 VERDICT task 5): the dispatch chunk shrinks within
    [~2/3*chunk, chunk] to minimize padded tail tiles."""
    from enhax.infer.tiling import _best_chunk
    assert _best_chunk(180, 16) == 15      # 180 % 15 == 0 (was 12 pad tiles)
    assert _best_chunk(160, 16) == 16      # exact fit stays put
    assert _best_chunk(45, 8) == 8         # pad 3 at c=8; no smaller c beats it
    assert _best_chunk(44, 8) == 8         # pad 4 at c=8 beats 5/4... none lower
    assert _best_chunk(7, 8) == 7          # tiny totals collapse the pad
    assert _best_chunk(1, 1) == 1
