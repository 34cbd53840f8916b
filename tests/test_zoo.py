"""Zoo table: key resolution, guidance errors, and end-to-end zoo load."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from enhax.models.base import build_model  # noqa: E402
from enhax import zoo  # noqa: E402


def test_zoo_keys_listed():
    assert "sice" in zoo.zoo_keys("zero_dce_re")
    assert zoo.zoo_keys("nonexistent_model") == []


def test_missing_file_raises_with_guidance(monkeypatch, tmp_path):
    monkeypatch.setenv("ENHAX_ZOO_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="download from"):
        zoo.resolve_zoo("zero_dce_re", "sice")
    with pytest.raises(KeyError, match="available"):
        zoo.resolve_zoo("zero_dce_re", "nope")


def test_zoo_load_end_to_end(monkeypatch, tmp_path):
    """Drop a synthetic checkpoint at the expected zoo path and load it
    through build_model + load_zoo_weights (converter + name map)."""
    monkeypatch.setenv("ENHAX_ZOO_DIR", str(tmp_path))
    torch.manual_seed(0)
    sd = {}
    chans = [(3, 32), (32, 32), (32, 32), (32, 32), (64, 32), (64, 32), (64, 24)]
    for i, (cin, cout) in enumerate(chans, start=1):
        sd[f"e_conv{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.02
        sd[f"e_conv{i}.bias"] = torch.zeros(cout)
    path = tmp_path / "zero_dce_re"
    path.mkdir(parents=True)
    torch.save(sd, str(path / "zero_dce_sice.pth"))

    model = build_model("zero_dce_re")
    params = zoo.load_zoo_weights(model, "sice", strict=True)
    import jax
    x = {"image": np.random.default_rng(0).uniform(0, 0.3, (1, 32, 32, 3)).astype(np.float32)}
    out = model.apply(params, x)
    assert np.isfinite(np.asarray(out["enhanced"])).all()


def test_predict_cli_weights_zoo_scheme(monkeypatch, tmp_path):
    from enhax.cli.predict import _load_weights
    monkeypatch.setenv("ENHAX_ZOO_DIR", str(tmp_path))
    model = build_model("zero_dce_re")
    with pytest.raises(FileNotFoundError):
        _load_weights(model, "zoo:sice")


def test_build_zoo_model_applies_entry_kwargs():
    """zoo entries with architecture overrides (nafnet sidd_width64,
    gopro_width32) must build the matching architecture — previously
    build_kwargs was never consumed and width-64 checkpoints landed on the
    default width-32 model (r3 review)."""
    from enhax.zoo import build_zoo_model

    m = build_zoo_model("nafnet", "sidd_width64")
    assert m.module.width == 64
    m2 = build_zoo_model("nafnet", "gopro_width32")
    assert tuple(m2.module.enc_blk_nums) == (1, 1, 1, 28)
    # explicit overrides beat the entry's
    m3 = build_zoo_model("nafnet", "sidd_width64", width=16)
    assert m3.module.width == 16


def test_zoo_url_download_and_cache(monkeypatch, tmp_path):
    """The URL->cache->convert flow (reference nn/model.py:145-165,381-426):
    a fetchable entry URL is downloaded into $ENHAX_ZOO_DIR on first
    resolve (file:// here — same urllib path as https), served from cache
    afterwards (source deleted to prove it), and loads end to end."""
    monkeypatch.setenv("ENHAX_ZOO_DIR", str(tmp_path / "cache"))
    torch.manual_seed(0)
    sd = {}
    chans = [(3, 32), (32, 32), (32, 32), (32, 32), (64, 32), (64, 32), (64, 24)]
    for i, (cin, cout) in enumerate(chans, start=1):
        sd[f"e_conv{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.02
        sd[f"e_conv{i}.bias"] = torch.zeros(cout)
    src = tmp_path / "release" / "Epoch99.pth"
    src.parent.mkdir(parents=True)
    torch.save(sd, str(src))

    entry = zoo.ZooEntry("zero_dce_sice.pth", url=src.as_uri(),
                         name_map=zoo.ZOO["zero_dce_re"]["sice"].name_map)
    monkeypatch.setitem(zoo.ZOO["zero_dce_re"], "sice", entry)

    path, got = zoo.resolve_zoo("zero_dce_re", "sice")
    assert path.is_file() and path == (
        tmp_path / "cache" / "zero_dce_re" / "zero_dce_sice.pth")
    src.unlink()  # second resolve must hit the cache, not the URL
    path2, _ = zoo.resolve_zoo("zero_dce_re", "sice")
    assert path2 == path

    model = build_model("zero_dce_re")
    params = zoo.load_zoo_weights(model, "sice", strict=True)
    x = {"image": np.random.default_rng(0).uniform(
        0, 0.3, (1, 32, 32, 3)).astype(np.float32)}
    out = model.apply(params, x)
    assert np.isfinite(np.asarray(out["enhanced"])).all()


def test_zoo_download_failure_guidance(monkeypatch, tmp_path):
    """A fetchable-but-dead URL degrades to the placement-guidance error."""
    monkeypatch.setenv("ENHAX_ZOO_DIR", str(tmp_path))
    entry = zoo.ZooEntry("zero_dce_sice.pth",
                         url=(tmp_path / "missing.pth").as_uri())
    monkeypatch.setitem(zoo.ZOO["zero_dce_re"], "sice", entry)
    with pytest.raises(FileNotFoundError, match="download .* failed|place the file"):
        zoo.resolve_zoo("zero_dce_re", "sice")
    assert not (tmp_path / "zero_dce_re" / "zero_dce_sice.pth.part").exists()
