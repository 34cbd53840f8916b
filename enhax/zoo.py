"""Pretrained-weight zoo: model-name -> checkpoint-key -> file + converter.

Rebuild of the reference's per-model ``zoo`` dicts and resolution logic
(nn/model.py:145-165 zoo-key -> path, :381-426 load + partial intersection).
Resolution order (``resolve_zoo``): cache hit under the local zoo directory
(``$ENHAX_ZOO_DIR``, default ``~/zoo``) -> download via
``download_weights_from_url`` when the entry's URL is fetchable
(http/https/file) -> placement guidance otherwise. Load with
``weights="zoo:<key>"`` (predict CLI) or ``load_zoo_weights(model, key)``.

Each entry: file name, source URL (downloaded when fetchable; the GitHub
release pages recorded here are landing pages, kept as provenance for
no-egress deployments where users drop files in manually), the converter
name-map, and build kwargs that make the enhax architecture match that
checkpoint's hyperparameters.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from enhax.convert import mappings as _maps


def zoo_dir() -> Path:
    return Path(os.environ.get("ENHAX_ZOO_DIR", os.path.expanduser("~/zoo")))


@dataclass
class ZooEntry:
    file: str
    url: str = ""                       # provenance only; never downloaded
    name_map: Callable | None = None    # () -> dict for convert_state_dict
    build_kwargs: dict = field(default_factory=dict)
    note: str = ""


ZOO: dict[str, dict[str, ZooEntry]] = {
    "zero_dce_re": {
        "sice": ZooEntry("zero_dce_sice.pth",
                         "github.com/Li-Chongyi/Zero-DCE (Epoch99.pth)",
                         _maps.zero_dce_name_map),
    },
    "zero_dce++_re": {
        "sice": ZooEntry("zero_dcepp_sice.pth",
                         "github.com/Li-Chongyi/Zero-DCE_extension",
                         _maps.zero_dcepp_name_map),
    },
    "hinet_re": {
        "sidd": ZooEntry("hinet_sidd_1x0.pth", "github.com/megvii-model/HINet",
                         _maps.hinet_name_map),
        "gopro": ZooEntry("hinet_gopro.pth", "github.com/megvii-model/HINet",
                          _maps.hinet_name_map),
        "rain13k": ZooEntry("hinet_rain13k.pth", "github.com/megvii-model/HINet",
                            _maps.hinet_name_map),
    },
    "nafnet": {
        "sidd_width32": ZooEntry(
            "nafnet_sidd_width32.pth", "github.com/megvii-research/NAFNet",
            _maps.nafnet_name_map),
        "sidd_width64": ZooEntry(
            "nafnet_sidd_width64.pth", "github.com/megvii-research/NAFNet",
            _maps.nafnet_name_map,
            {"width": 64}),
        "gopro_width32": ZooEntry(
            "nafnet_gopro_width32.pth", "github.com/megvii-research/NAFNet",
            _maps.nafnet_name_map,
            {"enc_blk_nums": (1, 1, 1, 28), "middle_blk_num": 1,
             "dec_blk_nums": (1, 1, 1, 1)}),
    },
    "uformer_b": {
        "sidd": ZooEntry("uformer_b_sidd.pth",
                         "github.com/ZhendongWang6/Uformer (Uformer_B.pth)",
                         _maps.uformer_name_map),
        "gopro": ZooEntry("uformer_b_gopro.pth",
                          "github.com/ZhendongWang6/Uformer (Uformer_B.pth)",
                          _maps.uformer_name_map),
    },
    "restormer": {
        "deraining": ZooEntry("restormer_deraining.pth",
                              "github.com/swz30/Restormer",
                              _maps.restormer_name_map),
        "denoising_sigma25": ZooEntry("restormer_gaussian_color_sigma25.pth",
                                      "github.com/swz30/Restormer",
                                      _maps.restormer_name_map),
        "motion_deblurring": ZooEntry("restormer_motion_deblurring.pth",
                                      "github.com/swz30/Restormer",
                                      _maps.restormer_name_map),
    },
    "retinexformer": {
        "lol_v1": ZooEntry("retinexformer_lol_v1.pth",
                           "github.com/caiyuanhao1998/Retinexformer",
                           _maps.retinexformer_name_map),
        "lol_v2_real": ZooEntry("retinexformer_lol_v2_real.pth",
                                "github.com/caiyuanhao1998/Retinexformer",
                                _maps.retinexformer_name_map),
        "fivek": ZooEntry("retinexformer_fivek.pth",
                          "github.com/caiyuanhao1998/Retinexformer",
                          _maps.retinexformer_name_map),
    },
    "mprnet": {
        "gopro": ZooEntry("mprnet_deblurring.pth",
                          "github.com/swz30/MPRNet (model_deblurring.pth, "
                          "{'state_dict': ...} layout)",
                          _maps.mprnet_name_map),
    },
    "llflow": {
        "lol_v1": ZooEntry("llflow_lol_v1.pth",
                           "github.com/wyf0912/LLFlow (LOL checkpoint; raw "
                           "module-name state dict)",
                           _maps.llflow_name_map),
    },
    "sci": {
        "easy": ZooEntry("sci_easy.pt", "github.com/vis-opt-group/SCI",
                         _maps.sci_name_map),
        "medium": ZooEntry("sci_medium.pt", "github.com/vis-opt-group/SCI",
                           _maps.sci_name_map),
        "difficult": ZooEntry("sci_difficult.pt", "github.com/vis-opt-group/SCI",
                              _maps.sci_name_map),
    },
    "ruas": {
        "lol": ZooEntry("ruas_lol.pt", "github.com/KarelZhang/RUAS",
                        _maps.ruas_name_map,
                        note="merge enhance.pt + denoise.pt state dicts"),
        "mit": ZooEntry("ruas_mit.pt", "github.com/KarelZhang/RUAS",
                        _maps.ruas_name_map),
    },
    "uretinexnet": {
        "lol_v1": ZooEntry(
            "uretinexnet_lol_v1.pth", "github.com/AndersonYong/URetinex-Net",
            _maps.uretinexnet_name_map,
            note="merge the three released ckpts under decom./model_r./"
                 "model_l./adjust. prefixes"),
    },
    "enlightengan": {
        "default": ZooEntry("enlightengan.pth",
                            "github.com/VITA-Group/EnlightenGAN",
                            None),
    },
    "pairlie": {
        "default": ZooEntry("pairlie.pth", "github.com/zhenqifu/PairLIE",
                            _maps.pairlie_name_map),
    },
    "snr": {
        "lol_v1": ZooEntry("snr_lolv1.pth",
                           "github.com/dvlab-research/SNR-Aware-Low-Light-Enhance",
                           _maps.snr_name_map),
    },
    "yolov8n": {"coco": ZooEntry("yolov8n.state_dict.pth",
                                 "github.com/ultralytics (export state_dict)",
                                 _maps.yolov8_name_map)},
    "yolov8s": {"coco": ZooEntry("yolov8s.state_dict.pth",
                                 "github.com/ultralytics", _maps.yolov8_name_map)},
    "yolov8m": {"coco": ZooEntry("yolov8m.state_dict.pth",
                                 "github.com/ultralytics", _maps.yolov8_name_map)},
}


def zoo_keys(model_name: str) -> list[str]:
    return sorted(ZOO.get(model_name, {}))


def download_weights_from_url(url: str, path, overwrite: bool = False) -> Path:
    """Download weights from ``url`` to ``path`` (reference
    ``download_weights_from_url``, nn/model.py:145-165): skip when cached,
    atomic .part rename, parent dirs created. Supports any urllib scheme —
    https:// in egress-enabled deployments, file:// in tests."""
    import shutil
    import urllib.request

    path = Path(path)
    if path.is_file() and not overwrite:
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".part")
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as fh:
        shutil.copyfileobj(resp, fh)
    tmp.replace(path)
    return path


def _fetchable(url: str) -> bool:
    return isinstance(url, str) and url.split("://", 1)[0] in (
        "http", "https", "file") and "://" in url


def resolve_zoo(model_name: str, key: str) -> tuple[Path, ZooEntry]:
    """Zoo key -> (local path, entry): cache hit under $ENHAX_ZOO_DIR, else
    download when the entry carries a fetchable URL (the reference's
    zoo-key -> download_weights_from_url flow, nn/model.py:381-426), else
    raise with placement guidance (no-egress deployments)."""
    entry = zoo_entry(model_name, key)
    path = zoo_dir() / model_name / entry.file
    if not path.is_file():
        if _fetchable(entry.url):
            try:
                download_weights_from_url(entry.url, path)
            except Exception as e:
                raise FileNotFoundError(
                    f"zoo checkpoint not cached at {path} and the download "
                    f"from {entry.url} failed ({e}); place the file there "
                    f"manually (set ENHAX_ZOO_DIR to relocate the zoo)"
                ) from e
        else:
            raise FileNotFoundError(
                f"zoo checkpoint not found: {path}\n"
                f"download from {entry.url} and place it there "
                f"(set ENHAX_ZOO_DIR to relocate the zoo)")
    return path, entry


def load_zoo_weights(model, key: str, image_size: int = 64, strict: bool = False):
    """Resolve + convert a zoo checkpoint into params for an enhax Model."""
    from enhax.convert.torch_weights import load_torch_checkpoint
    path, entry = resolve_zoo(model.name, key)
    name_map = entry.name_map() if entry.name_map else None
    return load_torch_checkpoint(model, path, name_map=name_map,
                                 image_size=image_size, strict=strict)


def zoo_entry(model_name: str, key: str) -> ZooEntry:
    """Look up a zoo entry WITHOUT requiring the checkpoint file (for
    building the matching architecture before loading)."""
    entries = ZOO.get(model_name)
    if not entries:
        raise KeyError(f"model {model_name!r} has no zoo entries")
    entry = entries.get(key)
    if entry is None:
        raise KeyError(f"unknown zoo key {key!r} for {model_name!r}; "
                       f"available: {sorted(entries)}")
    return entry


def build_zoo_model(model_name: str, key: str, **overrides):
    """Build ``model_name`` with the zoo entry's architecture overrides
    (e.g. nafnet ``sidd_width64`` -> width=64) so the checkpoint lands on
    matching shapes instead of silently leaving mismatched leaves at
    random init. Explicit ``overrides`` beat the entry's."""
    from enhax.models.base import build_model
    entry = zoo_entry(model_name, key)
    kwargs = dict(entry.build_kwargs)
    kwargs.update(overrides)
    return build_model(model_name, **kwargs)
