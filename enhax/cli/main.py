"""Interactive CLI wizard.

Rebuild of reference ``project/runml/main.py`` (:255-444): prompt task ->
mode -> arch -> model -> data -> flags, listing options from the registries,
then dispatch to the train/predict/metric/plot entry points (in-process —
the reference's subprocess + torch.distributed.launch indirection is not
needed; the mesh handles devices).

Usage: python -m enhax.cli.main   (or with flags to skip prompts)
"""

from __future__ import annotations

import argparse
import sys

from enhax.constants import DATAMODULES, MODELS, RunMode, Task
from enhax.utils.console import console, print_table


def _choose(prompt: str, options: list[str], default: str | None = None) -> str:
    if not options:
        raise SystemExit(f"no options for {prompt}")
    console.print(f"\n[bold]{prompt}[/bold]")
    for i, o in enumerate(options):
        mark = "*" if o == default else " "
        console.print(f"  {i:3d}{mark} {o}")
    while True:
        raw = input(f"{prompt} [{default or options[0]}]: ").strip()
        if raw == "":
            return default or options[0]
        if raw.isdigit() and int(raw) < len(options):
            return options[int(raw)]
        if raw in options:
            return raw
        console.print("[red]invalid choice[/red]")


def run_wizard():
    tasks = sorted(t.value for t in Task)
    task = _choose("Task", tasks, default="llie")
    mode = _choose("Mode", [m.value for m in RunMode], default="predict")

    models_for_task = MODELS.models_for_task(Task.from_value(task)) or sorted(MODELS.keys())
    model = _choose("Model", models_for_task)

    if mode == "train":
        data = _choose("Data", sorted(DATAMODULES.keys()))
        root = input("Dataset root dir: ").strip() or None
        epochs = input("Epochs [100]: ").strip() or "100"
        from enhax.cli.train import train
        train({"model": model, "data": data, "root": root, "epochs": int(epochs)})
    elif mode in ("predict", "instance"):
        data = input("Data (dataset name | folder | image | video): ").strip()
        save = input("Save dir [auto]: ").strip() or None
        from enhax.cli.predict import predict
        predict({"model": model, "data": data, "save_dir": save})
    elif mode == "metric":
        inp = input("Result dir: ").strip()
        tgt = input("GT dir (empty for NR metrics): ").strip() or None
        from enhax.cli.metric import measure_metric
        measure_metric({"input": inp, "target": tgt,
                        "metric": ["psnr", "ssim"] if tgt else ["brightness"]})
    elif mode == "plot":
        inp = input("Input dir: ").strip()
        res = input("Result dirs (space-separated): ").strip().split()
        tgt = input("GT dir (optional): ").strip() or None
        save = input("Save dir: ").strip()
        from enhax.cli.plot import plot
        plot({"input": inp, "results": res, "target": tgt, "save_dir": save})


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
