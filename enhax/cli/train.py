"""Training CLI.

Rebuild of reference ``project/runml/train.py`` (:25 train, :95 arg parsing):
resolve config (.py module or flags), build datamodule + model from the
registries, auto-resume from the newest checkpoint, fit.

Usage:
    python -m enhax.cli.train --model zero_dce_re --data lol_v1 \
        --root /data --epochs 50 --batch-size 8 [--config cfg.py]
"""

from __future__ import annotations

import argparse

from enhax.config.defaults import (
    DEFAULT_DATAMODULE, DEFAULT_OPTIMIZER, DEFAULT_TRAINER, default_save_dir,
)
from enhax.constants import DATAMODULES, MODELS
from enhax.utils.config import load_config, merge_configs, parse_config_file
from enhax.utils.console import console
from enhax.utils.rand import set_random_seed


def parse_train_args(argv=None) -> dict:
    """Flags mirror reference config/parse_args.py:49-68."""
    p = argparse.ArgumentParser("enhax-train")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--arch", type=str, default=None)
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--root", type=str, default=None, help="dataset root dir")
    p.add_argument("--project", type=str, default=None)
    p.add_argument("--fullname", type=str, default=None)
    p.add_argument("--save-dir", type=str, default=None)
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--strategy", type=str, default=None,
                   help="ddp | fsdp | single_device | spatial "
                        "(reference --strategy, train.py:35)")
    p.add_argument("--precision", type=str, default=None,
                   help="bf16-mixed | bf16 | 32 (reference Lightning "
                        "precision, config/default.py:151)")
    p.add_argument("--bf16", action="store_true",
                   help="shorthand for --precision bf16-mixed")
    p.add_argument("--devices", type=int, default=None,
                   help="number of devices in the data mesh")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--verbose", action="store_true")
    args = vars(p.parse_args(argv))

    cfg = {}
    cfg_path = parse_config_file(args.pop("config"), search_dirs=["config", "."]) \
        if args.get("config") else None
    if cfg_path:
        cfg = load_config(cfg_path)
    # flags beat config (reference train.py:113-131)
    merged = merge_configs(cfg, {k: v for k, v in args.items() if v is not None})
    return merged


def train(args: dict):
    set_random_seed(args.get("seed", 0))

    model_name = args.get("model") or args.get("model_name")
    data_name = args.get("data") or args.get("data_name")
    if not model_name or not data_name:
        raise SystemExit("--model and --data are required (or given via --config)")

    model_cfg = dict(args.get("model_cfg") or args.get("model_kwargs") or {})
    model = MODELS.build(model_name, **model_cfg)

    dm_cfg = merge_configs(DEFAULT_DATAMODULE, args.get("data_cfg") or {})
    if args.get("batch_size"):
        dm_cfg["batch_size"] = args["batch_size"]
    dm = DATAMODULES.build(data_name, root=args.get("root"), **dm_cfg)
    dm.setup()
    dm.summarize()

    if args.get("image_size"):
        from enhax.data.transforms import Compose, RandomCrop
        size = args["image_size"]
        dm.transform = Compose([RandomCrop(size)])
        for ds in (dm.train,):
            if ds is not None:
                ds.transform = dm.transform

    opt_cfg = merge_configs(DEFAULT_OPTIMIZER, args.get("optimizer_cfg") or {})
    if args.get("lr"):
        opt_cfg["optimizer"]["lr"] = args["lr"]

    save_dir = args.get("save_dir") or default_save_dir(
        "train", model.arch, model.name, data_name)
    tr_cfg = merge_configs(DEFAULT_TRAINER, args.get("trainer_cfg") or {})
    if args.get("epochs"):
        tr_cfg["max_epochs"] = args["epochs"]
    if args.get("steps"):
        tr_cfg["max_steps"] = args["steps"]
    if args.get("strategy"):
        tr_cfg["strategy"] = args["strategy"]
    if args.get("bf16"):
        tr_cfg["precision"] = "bf16-mixed"
    elif args.get("precision"):
        tr_cfg["precision"] = args["precision"]

    mesh = None
    if args.get("devices"):
        import jax
        from enhax.parallel.mesh import make_mesh
        mesh = make_mesh(("data",), devices=jax.devices()[: args["devices"]])

    hooks = []
    if args.get("progressive"):
        from enhax.train.hooks import ProgressiveTrainingHook
        p = args["progressive"]
        hooks.append(ProgressiveTrainingHook(dm, p["milestones"], p["sizes"],
                                             p["batch_sizes"]))
    # declarative callbacks (reference train.py:53 CALLBACKS.build_instances):
    # trainer_cfg["callbacks"] = ["timer", {"name": "early_stopping", ...}]
    for cb in tr_cfg.get("callbacks") or []:
        from enhax.constants import CALLBACKS
        if isinstance(cb, str):
            cb = {"name": cb}
        hooks.append(CALLBACKS.build(config=dict(cb)))

    from enhax.train import Trainer
    trainer = Trainer(
        model, opt_cfg,
        max_epochs=tr_cfg["max_epochs"], max_steps=tr_cfg.get("max_steps"),
        mesh=mesh, strategy=tr_cfg.get("strategy"),
        ckpt_dir=str(save_dir) + "/ckpt", monitor=tr_cfg["monitor"],
        log_every_n_steps=tr_cfg["log_every_n_steps"], save_dir=save_dir,
        seed=tr_cfg["seed"], hooks=hooks,
        remat=bool(tr_cfg.get("remat", False)),
        gradient_clip_val=tr_cfg.get("gradient_clip_val"),
        gradient_clip_algorithm=tr_cfg.get("gradient_clip_algorithm", "norm"),
        accumulate_grad_batches=int(tr_cfg.get("accumulate_grad_batches", 1) or 1),
        limit_train_batches=tr_cfg.get("limit_train_batches"),
        limit_val_batches=tr_cfg.get("limit_val_batches"),
        overfit_batches=int(tr_cfg.get("overfit_batches", 0) or 0),
        fast_dev_run=bool(tr_cfg.get("fast_dev_run", False)),
        precision=tr_cfg.get("precision"),
        ema_decay=tr_cfg.get("ema_decay"),
    )
    console.print(f"[train] {model.name} on {data_name} -> {save_dir}")
    val_fn = dm.val_loader if dm.val is not None else None
    state = trainer.fit(dm.train_loader, val_fn)
    console.print(f"[train] done at step {int(state.step)}")
    return state


def main(argv=None):
    train(parse_train_args(argv))


if __name__ == "__main__":
    main()
