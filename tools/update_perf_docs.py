#!/usr/bin/env python
"""Regenerate the measured-benchmark block in README.md from the committed
perf artifacts (BENCH_ALL.json / BENCH_TRAIN.json).

Called by run/r5_bench_sweep.sh right after a successful sweep so the
fresh numbers and the prose tables land in ONE commit (VERDICT r4 task 1:
perf docs must never drift from the artifact of record). Idempotent: only
the text between the BENCH_AUTO markers is rewritten.
"""
from __future__ import annotations

import json
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BEGIN = "<!-- BENCH_AUTO_BEGIN -->"
END = "<!-- BENCH_AUTO_END -->"


def _rows(path: Path):
    if not path.is_file():
        return []
    data = json.loads(path.read_text())
    return data if isinstance(data, list) else []


def _artifact_stamp(path: Path) -> str:
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%h %cI", "--", str(path)],
            cwd=REPO, capture_output=True, text=True, timeout=30)
        committed = out.stdout.strip()
    except Exception:
        committed = ""
    return committed or "uncommitted"


def render() -> str:
    lines = [BEGIN, "", "### Measured artifact tables (auto-generated)", ""]
    bench_all = _rows(REPO / "BENCH_ALL.json")
    if bench_all:
        lines += [f"`BENCH_ALL.json` ({_artifact_stamp(REPO / 'BENCH_ALL.json')}):",
                  "", "| config | MP/s/chip | vs 100 MP/s north star |",
                  "|---|---|---|"]
        for r in bench_all:
            if r.get("error"):
                lines.append(f"| {r['metric']} | error | {r['error']} |")
            else:
                lines.append(f"| {r['metric']} | {r['value']} | "
                             f"{r.get('vs_baseline', '')} |")
        lines.append("")
    bench_train = _rows(REPO / "BENCH_TRAIN.json")
    if bench_train:
        lines += [f"`BENCH_TRAIN.json` ({_artifact_stamp(REPO / 'BENCH_TRAIN.json')}):",
                  "", "| config | train MP/s | ms/step | MFU |", "|---|---|---|---|"]
        for r in bench_train:
            if r.get("error"):
                lines.append(f"| {r['metric']} | error | | {r['error']} |")
            else:
                mfu = r.get("mfu_bf16", r.get("mfu_f32"))
                lines.append(f"| {r['metric']} | {r['value']} | "
                             f"{r.get('ms_per_step', '')} | "
                             f"{'' if mfu is None else mfu} |")
        lines.append("")
    if not bench_all and not bench_train:
        lines += ["*No artifacts present.*", ""]
    lines.append(END)
    return "\n".join(lines)


def main() -> int:
    readme = REPO / "README.md"
    text = readme.read_text()
    if BEGIN not in text or END not in text:
        raise SystemExit("BENCH_AUTO markers missing from README.md")
    head, rest = text.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    readme.write_text(head + render() + tail)
    print("README.md benchmark block regenerated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
