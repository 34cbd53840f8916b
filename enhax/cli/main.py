"""Interactive CLI wizard.

Rebuild of reference ``project/runml/main.py`` (:255-444): prompt task ->
mode -> arch -> model -> config -> weights -> data -> save-name -> device
-> per-mode flags (epochs/steps for train+instance; imgsz/resize/benchmark/
save-image/save-debug for predict+instance) -> exist-ok -> verbosity,
listing options from the registries, then dispatch to the train/predict/
metric/plot entry points (in-process — the reference's subprocess +
torch.distributed.launch indirection is not needed; the mesh handles
devices).

Usage: python -m enhax.cli.main   (or with flags to skip prompts)
"""

from __future__ import annotations

import argparse

from enhax.constants import DATAMODULES, MODELS, RunMode, Task
from enhax.utils.console import console, print_table


def _choose(prompt: str, options: list[str], default: str | None = None,
            input_fn=input, free_text: bool = False) -> str:
    """Numbered menu (reference parse_menu_string): index, name, or free
    text (when allowed); empty accepts the default."""
    if not options and not free_text:
        raise SystemExit(f"no options for {prompt}")
    if options:
        console.print(f"\n[bold]{prompt}[/bold]")
        for i, o in enumerate(options):
            mark = "*" if o == default else " "
            console.print(f"  {i:3d}{mark} {o}")
    while True:
        raw = input_fn(f"{prompt} [{default if default is not None else (options[0] if options else '')}]: ").strip()
        if raw == "":
            return default if default is not None else (options[0] if options else "")
        if raw.isdigit() and options and int(raw) < len(options):
            return options[int(raw)]
        if raw in options or free_text:
            return raw
        console.print("[red]invalid choice[/red]")


def _yesno(prompt: str, default: bool, input_fn=input) -> bool:
    raw = input_fn(f"{prompt} [{'yes' if default else 'no'}]: ").strip().lower()
    if raw == "":
        return default
    return raw in ("y", "yes", "true", "1")


def _list_configs_for(model: str) -> list[str]:
    """Shipped config stems whose name starts with the model's stem
    (reference list_configs, core/utils.py:92-138)."""
    from enhax.utils.pathlib import Path
    stem = model.replace("++", "pp").replace("-", "_")
    cfg_dir = Path(__file__).parents[2] / "configs"
    if not cfg_dir.is_dir():
        return []
    outs = []
    for f in sorted(cfg_dir.glob("*.py")):
        name = f.stem
        if name.startswith(stem) or name.startswith(model):
            outs.append(str(f))
    return outs


def _list_weights_for(model: str) -> list[str]:
    """Candidate weights: zoo keys for the model + trainer checkpoint dirs
    under run/train (reference list_weights_files, core/utils.py)."""
    from enhax.utils.pathlib import Path
    outs = []
    try:
        from enhax.zoo import ZOO
        for variant in sorted(ZOO.get(model, {})):
            outs.append(f"zoo:{variant}")
    except Exception:  # noqa: BLE001 — zoo table optional
        pass
    run_dir = Path("run/train")
    if run_dir.is_dir():
        outs += [str(p) for p in sorted(run_dir.glob(f"**/{model}*/ckpt/*"))
                 if p.is_dir()]
    return outs


def _list_devices() -> list[str]:
    import jax
    try:
        devs = [f"{d.platform}:{d.id}" for d in jax.devices()]
    except Exception:  # noqa: BLE001 — backend init failure
        devs = []
    return ["auto", *devs, "cpu"]


def run_wizard(input_fn=input, defaults: dict | None = None):
    """Full prompt chain (reference main.py:255-444). ``input_fn`` is
    injectable so tests can drive the wizard with scripted answers."""
    d = defaults or {}
    tasks = sorted(t.value for t in Task)
    task = _choose("Task", tasks, default=d.get("task", "llie"),
                   input_fn=input_fn)
    mode = _choose("Mode", [m.value for m in RunMode],
                   default=d.get("mode", "predict"), input_fn=input_fn)

    # Architecture -> model (reference prompts both; arch narrows the list)
    task_models = MODELS.models_for_task(Task.from_value(task)) \
        or sorted(MODELS.keys())
    arch_of = {m: a for a in MODELS.archs for m in MODELS.models_for_arch(a)}
    archs = sorted({arch_of[m] for m in task_models if m in arch_of})
    arch = _choose("Architecture", archs or ["-"],
                   default=d.get("arch"), input_fn=input_fn) if archs else None
    models = [m for m in task_models if not arch or arch_of.get(m) == arch] \
        or task_models
    model = _choose("Model", models, default=d.get("model"), input_fn=input_fn)

    # Config (optional; shipped recipes for the model)
    config = _choose("Config (empty = none)", _list_configs_for(model),
                     default=d.get("config", ""), input_fn=input_fn,
                     free_text=True) or None

    # Weights (optional: zoo key, ckpt dir, .npz/.pt path)
    weights = _choose("Weights (empty = none)", _list_weights_for(model),
                      default=d.get("weights", ""), input_fn=input_fn,
                      free_text=True) or None

    # Save name + dir (reference "fullname"/save_dir prompts)
    from enhax.utils.pathlib import Path
    fullname = Path(config).stem if config else model
    fullname = input_fn(f"Save name [{fullname}]: ").strip() or fullname
    save_dir = input_fn("Save dir [auto]: ").strip() or d.get("save_dir")

    # Device (reference prompts cuda:0/auto; here: jax devices)
    device = _choose("Device", _list_devices(), default=d.get("device", "auto"),
                     input_fn=input_fn, free_text=True)
    if device not in ("auto", ""):
        # "cpu" / "tpu:0" -> pin the platform before backend init
        import jax
        try:
            jax.config.update("jax_platforms", device.split(":")[0])
        except Exception:  # noqa: BLE001 — backend already initialized
            console.print(f"[wizard] backend already up; device {device!r} "
                          "request ignored")

    common = {"config": config, "weights": weights, "save_dir": save_dir,
              "fullname": fullname}

    if mode == "train":
        data = _choose("Data", sorted(DATAMODULES.keys()),
                       default=d.get("data"), input_fn=input_fn)
        root = input_fn("Dataset root dir: ").strip() or None
        epochs = input_fn("Epochs [100]: ").strip() or "100"
        steps = input_fn("Steps [none]: ").strip() or None
        exist_ok = _yesno("Exist OK?", True, input_fn)
        verbose = _yesno("Verbosity?", True, input_fn)
        from enhax.cli.train import train
        return train({**common, "model": model, "data": data, "root": root,
                      "epochs": int(epochs),
                      "steps": int(steps) if steps else None,
                      "exist_ok": exist_ok, "verbose": verbose})
    if mode in ("predict", "instance"):
        # instance mode routes through the same predict pipeline; the model
        # overrides infer() for per-image optimization (reference
        # main.py:18,417-441 — mode "instance" dispatches run_predict)
        data = _choose("Data (dataset name | folder | image | video)",
                       sorted(DATAMODULES.keys()), default=d.get("data"),
                       input_fn=input_fn, free_text=True)
        imgsz = input_fn("Image size [native]: ").strip() or None
        resize = _yesno("Resize?", bool(imgsz), input_fn)
        benchmark = _yesno("Benchmark?", False, input_fn)
        save_image = _yesno("Save image?", True, input_fn)
        save_debug = _yesno("Save debug?", False, input_fn)
        use_data_dir = _yesno("Data dir?", False, input_fn)
        use_fullpath = _yesno("Fullpath?", False, input_fn)
        verbose = _yesno("Verbosity?", True, input_fn)
        from enhax.cli.predict import predict
        return predict({**common, "model": model, "data": data,
                        "imgsz": int(imgsz) if imgsz else None,
                        "resize": resize, "benchmark": benchmark,
                        "save_image": save_image, "save_debug": save_debug,
                        "use_data_dir": use_data_dir,
                        "use_fullpath": use_fullpath,
                        "verbose": verbose})
    if mode == "metric":
        inp = input_fn("Result dir: ").strip()
        tgt = input_fn("GT dir (empty for NR metrics): ").strip() or None
        from enhax.cli.metric import measure_metric
        return measure_metric({"input": inp, "target": tgt,
                               "metric": ["psnr", "ssim"] if tgt
                               else ["brightness"]})
    if mode == "plot":
        inp = input_fn("Input dir: ").strip()
        res = input_fn("Result dirs (space-separated): ").strip().split()
        tgt = input_fn("GT dir (optional): ").strip() or None
        save = input_fn("Save dir: ").strip()
        from enhax.cli.plot import plot
        return plot({"input": inp, "results": res, "target": tgt,
                     "save_dir": save})
    raise SystemExit(f"unknown mode {mode!r}")


def list_registry():
    rows = [{"arch": a, "models": ", ".join(MODELS.models_for_arch(a))}
            for a in MODELS.archs]
    print_table(rows, title=f"{len(MODELS)} models / {len(MODELS.archs)} archs")
    console.print(f"datasets: {len(DATAMODULES)} registered")


def main(argv=None):
    p = argparse.ArgumentParser("enhax")
    p.add_argument("command", nargs="?", default="wizard",
                   choices=["wizard", "train", "predict", "metric", "plot", "list"])
    args, rest = p.parse_known_args(argv)
    if args.command == "wizard":
        run_wizard()
    elif args.command == "list":
        list_registry()
    elif args.command == "train":
        from enhax.cli.train import main as m
        m(rest)
    elif args.command == "predict":
        from enhax.cli.predict import main as m
        m(rest)
    elif args.command == "metric":
        from enhax.cli.metric import main as m
        m(rest)
    elif args.command == "plot":
        from enhax.cli.plot import main as m
        m(rest)


if __name__ == "__main__":
    main()
