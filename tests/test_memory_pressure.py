"""Spill proof under a starved heap (VERDICT r4 item 8).

The dedup stack's OOM-safety arguments (wide LSH buckets stream through
a spillable sort-merge self-join; caches are MEMORY_AND_DISK; simhash
candidates never buffer a bucket in one task) are plan-level; this test
makes them empirical: a SUBPROCESS JVM with a 2 GiB heap (1/64th of the
dev box) must complete the stack at 10× amplified data with the same
pair counts as the unconstrained run. Slow + requires .scale/x10
(python tools/scale_rehearsal.py --factor 10) — marker-gated so CI
without the amplified corpus skips, mirroring the kafka marker.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
X10 = os.path.join(REPO, ".scale", "x10")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.isdir(X10), reason="amplified corpus not built"
)
def test_dedup_stack_completes_under_2g_heap():
    env = dict(os.environ, SPARK_DRIVER_MEM="2g", SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "memory_pressure.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True
    assert rec["heap"] == "2g"
    # the forced all-wide split (bucket_cap=2) is lossless under pressure
    assert (
        rec["minhash_default_cap"]["rows"]
        == rec["minhash_cap2_all_wide"]["rows"]
        > 0
    )
