"""Prediction CLI.

Rebuild of reference ``project/runml/predict.py`` (:23 predict, :132 args):
source dispatch via parse_io_worker (dataset name | folder | image | video),
batched Predictor, result writing, optional benchmark (efficiency score).

Usage:
    python -m enhax.cli.predict --model zero_dce_re --data ./images \
        --save-dir out [--weights ckpt.npz] [--imgsz 512] [--benchmark]
"""

from __future__ import annotations

import argparse

import numpy as np

from enhax.config.defaults import default_save_dir
from enhax.constants import MODELS
from enhax.utils.console import console, new_progress
from enhax.utils.rand import set_random_seed


def parse_predict_args(argv=None) -> dict:
    p = argparse.ArgumentParser("enhax-predict")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model", type=str, required=False)
    p.add_argument("--data", type=str, required=False,
                   help="dataset name | image/folder path | video path")
    p.add_argument("--root", type=str, default=None)
    p.add_argument("--save-dir", type=str, default=None)
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--resize", action="store_true")
    p.add_argument("--tile", type=int, default=None, help="tile size for tiled inference")
    p.add_argument("--tile-overlap", type=int, default=32)
    p.add_argument("--tile-blend", choices=["hann", "uniform"], default="hann",
                   help="hann = seam-free; uniform = reference-exact "
                        "unweighted accumulation (my_predict.py:157-167)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--buckets", type=int, nargs="*", default=None,
                   help="shape buckets, e.g. --buckets 256 512 1024 (pads up; bounds recompiles)")
    p.add_argument("--devices", type=int, default=0,
                   help="shard inference over N devices (0 = single device)")
    p.add_argument("--spatial", action="store_true",
                   help="with --devices: also split image height over a "
                        "'space' mesh axis (large-image inference)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 inference (params + activations; outputs "
                        "cast back to float32). Within 1 uint8 LSB of the "
                        "f32 path on the TPU bench at half the HBM traffic")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--save-image", action="store_true", default=True)
    p.add_argument("--no-save-image", dest="save_image", action="store_false")
    p.add_argument("--save-debug", action="store_true")
    p.add_argument("--use-data-dir", action="store_true",
                   help="resolve a relative --data under $DATA_DIR "
                        "(reference parse_args.py:213)")
    p.add_argument("--use-fullpath", action="store_true",
                   help="preserve the source's subdirectory structure under "
                        "save-dir (reference predict.py:98-111)")
    p.add_argument("--verbose", action="store_true")
    return vars(p.parse_args(argv))


def predict(args: dict):
    import jax

    from enhax.data.io_worker import parse_io_worker
    from enhax.infer import Predictor
    from enhax.ops.io import write_image

    set_random_seed(args.get("seed", 0))
    # --config resolution (reference predict.py accepts the same config
    # files as train; flags beat config values — parse_args.py:152-174)
    cfg = {}
    if args.get("config"):
        from enhax.utils.config import load_config, parse_config_file
        path = parse_config_file(args["config"],
                                 search_dirs=["configs", "."])
        if path is None:
            raise SystemExit(f"config not found: {args['config']}")
        cfg = load_config(path)
    model_name = args.get("model") or cfg.get("model")
    data = args.get("data") or cfg.get("data")
    if not model_name or not data:
        raise SystemExit("--model and --data are required")
    if args.get("use_data_dir"):
        from enhax.constants import DATA_DIR
        from enhax.utils.pathlib import Path as _Path
        if not _Path(data).exists() and not _Path(data).is_absolute():
            data = str(DATA_DIR / data)
    model_cfg = args.get("model_cfg") or cfg.get("model_cfg") or {}

    weights = args.get("weights")
    if isinstance(weights, str) and weights.startswith("zoo:"):
        # build with the entry's architecture overrides (nafnet
        # sidd_width64 -> width=64, ...) so the checkpoint fits
        from enhax.zoo import build_zoo_model
        model = build_zoo_model(model_name, weights[4:])
    else:
        model = MODELS.build(model_name, **model_cfg)
    variables = None
    if weights:
        variables = _load_weights(model, weights)

    tile = None
    if args.get("tile"):
        tile = (args["tile"], args["tile"], args.get("tile_overlap", 32))
    mesh = None
    if args.get("spatial") and not args.get("devices"):
        raise SystemExit("--spatial requires --devices N")
    if args.get("devices"):
        from enhax.parallel.mesh import make_mesh
        import jax
        n = min(int(args["devices"]), len(jax.devices()))
        axes = ("data", "space") if args.get("spatial") else ("data",)
        mesh = make_mesh(axes, devices=jax.devices()[:n])
    pred = Predictor(model, variables=variables,
                     image_size=(args["imgsz"], args["imgsz"]) if args.get("imgsz") else None,
                     resize=bool(args.get("resize")), tile=tile,
                     tile_blend=args.get("tile_blend", "hann"),
                     bucket_sizes=tuple(args["buckets"]) if args.get("buckets") else None,
                     mesh=mesh, spatial=bool(args.get("spatial") and mesh),
                     bf16=bool(args.get("bf16")))

    save_dir = args.get("save_dir") or default_save_dir(
        "predict", model.arch, model.name, str(data).replace("/", "_"))
    from enhax.utils.pathlib import Path
    save_dir = Path(save_dir)

    if args.get("benchmark"):
        from enhax.nn.metrics import compute_efficiency_score
        dp = {k: np.zeros((1, 512, 512, 3 if k == "image" else 1), np.float32)
              for k in model.required_inputs}
        pred._ensure_variables(dp)
        flops, params, avg_t = compute_efficiency_score(
            lambda v, d: model.apply(v, d)[model.out_key], pred.variables, dp)
        console.print(f"[bench] FLOPs(G)={flops:.3f} Params(M)={params:.4f} "
                      f"t(s/img)={avg_t:.5f}")

    source, writer = parse_io_worker(data, dst=save_dir / "video.mp4",
                                     root=args.get("root"))
    times = []
    n = 0
    with new_progress() as progress:
        task = progress.add_task("predict", total=len(source))
        for item in source:
            dp = {k: v for k, v in item.items() if k != "meta" and v is not None}
            outputs = pred.infer(dp)
            times.append(outputs.get("time", 0.0))
            enhanced = np.asarray(outputs[model.out_key][0])
            meta = item.get("meta", {})
            name = meta.get("name", f"{n:06d}.png")
            if args.get("use_fullpath") and meta.get("path"):
                # preserve the source's subdirectory structure under
                # save_dir (reference predict.py:98-103 rel_path layout)
                try:
                    rel = Path(meta["path"]).relative_to(Path(data).absolute())
                    name = str(rel.parent / f"{rel.stem}.png")
                except ValueError:
                    pass  # source outside the data root: flat name
            if writer is not None:
                writer.write(enhanced)
            elif args.get("save_image", True):
                write_image(save_dir / name, enhanced)
            if args.get("save_debug"):
                for k, v in outputs.items():
                    if k != model.out_key and hasattr(v, "ndim") and getattr(v, "ndim", 0) == 4 \
                            and v.shape[-1] in (1, 3):
                        write_image(save_dir / "debug" / f"{Path(name).stem}_{k}.png",
                                    np.asarray(v[0]))
            n += 1
            progress.advance(task)
    if writer is not None:
        writer.close()
    if times:
        console.print(f"[predict] {n} items -> {save_dir}; "
                      f"avg time {np.mean(times[1:] if len(times) > 1 else times):.4f}s")
    return save_dir


def _load_weights(model, path):
    """Load .npz (flat pytree), torch checkpoint, or ``zoo:<key>``."""
    from enhax.utils.pathlib import Path
    if isinstance(path, str) and path.startswith("zoo:"):
        from enhax.zoo import load_zoo_weights
        return load_zoo_weights(model, path[4:])
    p = Path(path)
    if p.is_dir():
        # enhax trainer checkpoint (orbax dir, e.g. run/.../ckpt/best).
        # Prefer the EMA shadow for inference — BasicSR's "net_g_ema is
        # used only for testing" (reference
        # restormer/basicsr/models/image_restoration_model.py:86-88)
        import orbax.checkpoint as ocp
        restored = ocp.PyTreeCheckpointer().restore(p.absolute())
        if isinstance(restored, dict) and "params" in restored:
            ema = restored.get("ema")
            return ema if ema else restored["params"]
        return restored
    if p.suffix == ".npz":
        import jax
        import numpy as np
        from enhax.train.checkpoints import load_params_npz
        # template from a dummy init at small size
        dp = {k: np.zeros((1, 64, 64, 3 if k == "image" else 1), np.float32)
              for k in model.required_inputs}
        template = model.init(jax.random.PRNGKey(0), dp)
        return load_params_npz(p, template)
    if p.suffix in (".pt", ".pth", ".ckpt"):
        from enhax.convert.torch_weights import load_torch_checkpoint
        return load_torch_checkpoint(model, p)
    raise ValueError(f"unsupported weights format: {p.suffix}")


def main(argv=None):
    predict(parse_predict_args(argv))


if __name__ == "__main__":
    main()
