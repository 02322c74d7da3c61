#!/usr/bin/env python
"""One-command 3x-amplified full-registry oracle sweep (VERDICT r8 item 4).

Round 8's methodological result: a structure-preserving 3x amplification
of sf0.1 is the largest corpus where the DuckDB oracle is still
tractable for all 236 queries, and sweeping the FULL registry there
caught two real shipped bugs (q114 multiplicity collapse, q09
tie-arbitrary arg_max) that no driver-SF check could see — ties and key
multiplicity appear with corpus size. This wraps the whole ritual in one
command so it stays a standing per-round gate, not heroics:

    python tools/x3_sweep.py [--reuse] [--queries a,b,c]

  1. regenerates ``.scale/x3`` from /root/testdata/sf0.1 via
     tools/scale_rehearsal.amplify (``--reuse`` skips when it exists —
     amplification is deterministic, so reuse is safe unless testdata
     or the amplifier changed);
  2. runs the strict driver replica (tools/driver_check.py — vanilla
     session, dtype-strict canon) over the full registry against it;
  3. writes ``.scale/x3_sweep_last.json`` and prints the one-line
     summary BASELINE.md records each round.

Takes ~35 min for the full registry. DRIVER_CHECK_MEMORY defaults to
8g here (3x sf0.1 needs more than the 1g driver default; the x10 corpus
needs 48g, but x10 is bench-only — the oracle is intractable there).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

X3 = os.path.join(REPO, ".scale", "x3")


def regenerate() -> None:
    from klio_spark.session import get_spark
    from tools.scale_rehearsal import amplify

    spark = get_spark(app_name="x3-amplify")
    amplify(spark, "/root/testdata/sf0.1", X3, 3)
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--reuse",
        action="store_true",
        help="skip amplification when .scale/x3 already exists",
    )
    ap.add_argument(
        "--queries",
        default="",
        help="comma list to restrict the sweep (default: full registry)",
    )
    args = ap.parse_args()

    if not (args.reuse and os.path.isdir(X3)):
        print("amplifying sf0.1 -> .scale/x3 ...", file=sys.stderr)
        regenerate()

    env = dict(os.environ)
    env.setdefault("DRIVER_CHECK_MEMORY", "8g")
    cmd = [sys.executable, os.path.join(REPO, "tools", "driver_check.py"), X3]
    cmd += [q for q in args.queries.split(",") if q]
    # ADVICE r9: a stale result file from an EARLIER run would silently
    # populate checked/failures if driver_check dies before writing
    # (plausible OOM at 3x) — remove it first so a missing file is
    # recorded as results=None, never misattributed.
    try:
        os.remove("/tmp/driver_check_last.json")
    except FileNotFoundError:
        pass
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, env=env, cwd=REPO)
    wall = round(time.perf_counter() - t0, 1)

    results = None
    try:
        results = json.load(open("/tmp/driver_check_last.json"))
    except Exception:
        pass
    if results is None:
        record = {
            "corpus": ".scale/x3",
            "checked": 0,
            "failures": None,
            "results_missing": True,
            "wall_sec": wall,
            "exit": proc.returncode,
        }
        with open(os.path.join(REPO, ".scale", "x3_sweep_last.json"), "w") as f:
            json.dump(record, f, indent=1)
        print(
            f"x3 sweep FAIL: driver_check wrote no result file "
            f"(exit {proc.returncode}, {wall}s)"
        )
        return proc.returncode or 1
    n = len(results)
    bad = sorted(
        # "ok"/"rows_only" carry the ROW COUNT — 0 rows hash-matching on
        # both engines is green, so membership, not truthiness
        k
        for k, v in results.items()
        if "ok" not in v and "rows_only" not in v
    )
    record = {
        "corpus": ".scale/x3",
        "checked": n,
        "failures": bad,
        "wall_sec": wall,
        "exit": proc.returncode,
    }
    with open(os.path.join(REPO, ".scale", "x3_sweep_last.json"), "w") as f:
        json.dump(record, f, indent=1)
    status = "CLEAN" if not bad and proc.returncode == 0 else "FAIL"
    print(
        f"x3 sweep {status}: {n - len(bad)}/{n} hash-or-rows green "
        f"in {wall}s; failures: {bad or 'none'}"
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
