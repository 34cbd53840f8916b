"""Rich console singletons + table/dict printers.

Rebuild of the reference's ``core/rich.py:110-352`` (singleton consoles,
progress with speed columns, print_dict/print_table). GPU-memory columns are
replaced by a host-RAM column (TPU HBM is not host-poll-able the way pynvml
is; per-step device stats come from jax.profiler instead).
"""

from __future__ import annotations

from typing import Any, Iterable

from rich.console import Console
from rich.progress import (
    BarColumn, MofNCompleteColumn, Progress, SpinnerColumn, TextColumn,
    TimeElapsedColumn, TimeRemainingColumn,
)
from rich.table import Table

console = Console(soft_wrap=False)
error_console = Console(stderr=True, style="bold red", soft_wrap=False)


def new_progress(transient: bool = False) -> Progress:
    """Progress bar with the reference's column set (core/rich.py:178-240)."""
    return Progress(
        SpinnerColumn(),
        TextColumn("[progress.description]{task.description}"),
        BarColumn(),
        MofNCompleteColumn(),
        TextColumn("[progress.percentage]{task.percentage:>3.0f}%"),
        TimeElapsedColumn(),
        TimeRemainingColumn(),
        console=console,
        transient=transient,
    )


def print_dict(d: dict, title: str = "") -> None:
    """Pretty-print a (nested) dict as a two-column table (core/rich.py:320)."""
    table = Table(title=title or None, show_header=False)
    table.add_column("key", style="cyan")
    table.add_column("value")
    for k, v in d.items():
        table.add_row(str(k), repr(v) if not isinstance(v, str) else v)
    console.print(table)


def print_table(rows: Iterable[dict[str, Any]], title: str = "") -> None:
    """Print a list of dicts as a table (core/rich.py:340)."""
    rows = list(rows)
    if not rows:
        return
    table = Table(title=title or None)
    for col in rows[0]:
        table.add_column(str(col))
    for r in rows:
        table.add_row(*[str(v) for v in r.values()])
    console.print(table)
