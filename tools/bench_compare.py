#!/usr/bin/env python
"""Compare two bench.py JSON outputs per query and flag regressions.

Totals on a shared host move ±15% with neighbor load, so the round
record (BASELINE.md) says to compare per-query ratios — this does that
mechanically:

    python tools/bench_compare.py BENCH_r01.json BENCH_r02.json
    python tools/bench_compare.py old.json new.json --threshold 1.5

Prints added/removed queries, the worst regressions above the ratio
threshold (new/old, default 1.3), and the best improvements. Exit code 1
if any regression beats the threshold AND the aggregate (sum over the
shared-query subset) also regressed past half the threshold — one noisy
query on a quiet total is noise; a slow query that moves the subtotal is
a regression.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()

    def load(path):
        with open(path) as f:
            d = json.load(f)
        # the round driver's BENCH_r{N}.json wraps bench.py's line under
        # "parsed"; accept either shape
        return d if "queries" in d else d["parsed"]

    old = load(args.old)
    new = load(args.new)
    oq = {k: v for k, v in old["queries"].items() if v > 0}
    nq = {k: v for k, v in new["queries"].items() if v > 0}

    # host normalization (round-5 ledger): when both records carry the
    # frozen-control ratio vs the pinned round-4 reference host, divide
    # the new side's times by the RELATIVE host factor so per-query
    # ratios compare code, not neighbor load. Records without controls
    # (r1-r4) compare raw, as before.
    host = None
    if old.get("control_ratio") and new.get("control_ratio"):
        host = new["control_ratio"] / old["control_ratio"]
        print(
            f"host factor new/old = {host:.3f} "
            f"(controls {old['control_ratio']} -> {new['control_ratio']}); "
            "ratios below are host-normalized"
        )
        nq = {k: v / host for k, v in nq.items()}

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    shared = sorted(set(oq) & set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if not shared:
        print("no shared queries")
        return 0

    ratios = [(nq[k] / oq[k], k) for k in shared]
    regressions = sorted(
        (r for r in ratios if r[0] >= args.threshold), reverse=True
    )
    improvements = sorted(r for r in ratios if r[0] <= 1 / args.threshold)

    osub = sum(oq[k] for k in shared)
    nsub = sum(nq[k] for k in shared)
    agg = nsub / osub
    print(
        f"shared subset: {len(shared)} queries, "
        f"{osub:.1f}s -> {nsub:.1f}s (x{agg:.2f})"
    )
    for r, k in regressions[:10]:
        print(f"  regression x{r:.2f}  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s")
    for r, k in improvements[:10]:
        print(f"  improvement x{r:.2f}  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s")

    gate = bool(regressions) and agg >= 1 + (args.threshold - 1) / 2
    if gate:
        print("FAIL: per-query regressions moved the aggregate")
        return 1
    print("ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
