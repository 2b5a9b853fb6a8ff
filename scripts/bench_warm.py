#!/usr/bin/env python3
"""Prime the persistent compile cache for every bench phase, then verify
the default driver-window bench completes green.

The driver runs ``python bench.py`` cold under a hard wall-clock window;
XLA compiles dominate that wall on a cold ``.jax_cache`` (round-4 bench
died mid-phase-2 with a fully measured read result unsaved). This script
is the builder-side warmer:

  1. runs the FULL bench once with a large wall budget
     (``HOCR_BENCH_BUDGET=3600``) — every phase subprocess compiles its
     programs and writes them to ``.jax_cache``, and every phase's live
     result lands in ``BENCH_DETAIL.json`` with provenance;
  2. (``--check``) immediately re-runs ``python bench.py`` at the
     DEFAULT budget and asserts it exits 0 with a non-null headline
     value — i.e. exactly what the driver will observe, but warm.

Run it on the bench chip before handing a round to the driver::

    python scripts/bench_warm.py --check

Both wall times print at the end; README's "Benchmark" section records
the measured cold/warm numbers for this host.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent


def run_bench(budget_s: float, label: str, *, driver_mode: bool = False,
              window_s: float = 600.0) -> tuple[int, float, dict | None]:
    """Run bench.py; with ``driver_mode`` replicate the DRIVER's exact
    observation: combined stdout+stderr under a hard ``timeout`` window,
    then parse the LAST non-empty line as JSON (round-4 failed precisely
    this parse — rc=0 with the headline mid-stream, chatter last)."""
    env = dict(os.environ, HOCR_BENCH_BUDGET=str(budget_s))
    start = time.monotonic()
    if driver_mode:
        proc = subprocess.run(
            ["timeout", str(int(window_s)), sys.executable,
             str(REPO / "bench.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        wall = time.monotonic() - start
        lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
        parsed = None
        if lines:
            try:
                parsed = json.loads(lines[-1])
            except json.JSONDecodeError:
                pass
        print(f"[bench_warm] {label}: rc={proc.returncode} wall={wall:.0f}s "
              f"last-line-parse={'ok' if parsed else 'FAILED'} "
              f"value={parsed and parsed.get('value')}", flush=True)
        return proc.returncode, wall, parsed
    proc = subprocess.run([sys.executable, str(REPO / "bench.py")],
                          env=env, stdout=subprocess.PIPE)
    wall = time.monotonic() - start
    parsed = None
    for line in proc.stdout.decode().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                pass
    print(f"[bench_warm] {label}: rc={proc.returncode} wall={wall:.0f}s "
          f"value={parsed and parsed.get('value')}", flush=True)
    return proc.returncode, wall, parsed


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--budget", type=float, default=3600.0,
                        help="wall budget for the priming run (s)")
    parser.add_argument("--check", action="store_true",
                        help="after priming, re-run at the default budget "
                             "and require a green headline")
    args = parser.parse_args()

    rc, warm_wall, _ = run_bench(args.budget, "prime (all phases)")
    if rc != 0:
        raise SystemExit(f"priming run failed rc={rc}")

    detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
    for name, status in detail.get("phase_status", {}).items():
        print(f"[bench_warm]   phase {name}: {status}")

    if args.check:
        rc, check_wall, parsed = run_bench(
            float(os.environ.get("HOCR_BENCH_BUDGET", "520")),
            "driver-window check", driver_mode=True)
        if rc != 0 or not parsed or parsed.get("value") is None \
                or parsed.get("metric") != "ocr_pages_per_sec_per_chip":
            raise SystemExit(
                f"driver-window check FAILED: rc={rc} parsed={parsed}")
        print(f"[bench_warm] OK: warm driver-window bench fits "
              f"({check_wall:.0f}s), combined-stream LAST line parses, "
              f"headline value={parsed['value']}")


if __name__ == "__main__":
    main()
