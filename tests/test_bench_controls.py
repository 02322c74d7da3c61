"""bench.py's host-normalization controls are FROZEN — their names,
pinned reference seconds, and plan shapes.

control_ratio = median(measured/ref over these five queries) is the
HOST factor every round-over-round bench comparison divides by. That
only measures the host if the control code itself never changes: an
optimization to a control would read as the host "speeding up" and
silently skew every normalized number. Nothing structural prevented
that — this test does. Touching a control query (or its plan shape via
a shared helper) fails here loudly; the correct response is to revert,
or to consciously re-pin BOTH the reference seconds and the
fingerprints in the same commit and say so in the bench ledger.
"""

import hashlib
import os
import re

import pytest

from klio_spark import plans
from klio_spark.queries import all_queries

# The five controls and their round-5 reference seconds (BENCH_r05.json,
# the round-6+ normalization base per BASELINE.md). Must match
# bench._CONTROLS exactly.
_FROZEN_CONTROLS = {
    "q01_pricing_summary": 0.738,
    "q07_median_percentile": 1.264,
    "q13_cogroup_counts": 0.376,
    "q23_top_items_global": 0.223,
    "q50_events_hourly": 0.265,
}

# Normalized physical-plan fingerprints at the default test SF
# (sf0.001). Regenerate ONLY on a conscious re-pin:
#   python -c "from tests.test_bench_controls import _regen; _regen()"
_FROZEN_PLAN_FP = {
    "q01_pricing_summary": "0c3124f5ef57937f4e627f97b1de5adf",
    "q07_median_percentile": "affc0ed3010ae559b77f16950dab1349",
    "q13_cogroup_counts": "bb6c6077f330a5e749d774ce8e52b346",
    "q23_top_items_global": "8d9115de5ad70a31bbe58bb87c756479",
    "q50_events_hourly": "3eb40269e6e003fd5377dc695ead3cfe",
}

_DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _plan_fingerprint(df) -> str:
    """Operator tree with the run-varying noise stripped: expression
    ids, node numbers, plan ids, absolute paths, and size/statistics
    annotations. What survives is the plan SHAPE — operators, join
    strategies, exchange placement, pushed filters."""
    tree = plans.plan_str(df, "formatted").split("\n\n")[0]
    tree = re.sub(r"#\d+L?", "#x", tree)
    tree = re.sub(r"\(\d+\)", "(n)", tree)
    tree = re.sub(r"plan_id=\d+", "plan_id=x", tree)
    tree = re.sub(r"\[plan id: \d+\]", "[plan id: x]", tree)
    tree = re.sub(r"/[^\s,\]\)]*testdata[^\s,\]\)]*", "PATH", tree)
    tree = re.sub(r"Statistics\([^)]*\)", "Statistics(x)", tree)
    return hashlib.md5(tree.encode()).hexdigest()


def test_control_names_and_refs_pinned():
    import bench

    assert bench._CONTROLS == _FROZEN_CONTROLS, (
        "bench._CONTROLS changed — controls are FROZEN; revert, or "
        "consciously re-pin both sides (bench.py and this test) in one "
        "commit and record the re-pin in BASELINE.md"
    )


def test_controls_exist_in_registry():
    names = set(all_queries())
    missing = set(_FROZEN_CONTROLS) - names
    assert not missing, f"control queries missing from registry: {missing}"


def test_control_plan_shapes_pinned(spark, sf_dir):
    if sf_dir != _DEFAULT_SF_DIR:
        pytest.skip("plan fingerprints pinned at the default test SF")
    # persisted plans from earlier tests substitute InMemoryRelation
    # into identical subtrees (see tests/test_plans.py) — clear first
    spark.catalog.clearCache()
    specs = all_queries()
    got = {
        name: _plan_fingerprint(specs[name].fn(spark, sf_dir))
        for name in _FROZEN_CONTROLS
    }
    assert got == _FROZEN_PLAN_FP, (
        "a control query's plan shape changed — controls are FROZEN "
        "(their times normalize every bench comparison); revert the "
        "change or consciously re-pin refs + fingerprints together\n"
        f"got: {got}"
    )


def _regen():  # pragma: no cover — conscious re-pin helper
    from klio_spark.session import get_spark

    spark = get_spark("control-pin-regen")
    spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    specs = all_queries()
    for name in _FROZEN_CONTROLS:
        fp = _plan_fingerprint(specs[name].fn(spark, _DEFAULT_SF_DIR))
        print(f'    "{name}": "{fp}",')


def test_schema_memo_is_metadata_only_and_cleared_for_controls(spark, sf_dir):
    """Round-11 adds a per-process schema memo to queries.load() (one
    parquet-footer inference per table, ~60-90 ms saved per later
    load). Two invariants: (1) the memo changes neither the schema nor
    the analyzed semantics of a load — a memoized read must equal a
    fresh inference exactly; (2) bench.py must clear the memo before
    every CONTROL rep, because the frozen reference seconds include
    the inference cost and a memo-assisted control would deflate
    control_ratio (a code-made 'host speedup')."""
    from klio_spark.queries import _SCHEMA_MEMO, load

    _SCHEMA_MEMO.clear()
    (a,) = load(spark, sf_dir, "lineitem")   # infers + memoizes
    assert (sf_dir, "lineitem") in _SCHEMA_MEMO
    (b,) = load(spark, sf_dir, "lineitem")   # memoized path
    assert a.schema == b.schema
    assert a.schema == spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "bench.py")).read()
    assert "_SCHEMA_MEMO.clear()" in src, (
        "bench.py no longer clears the schema memo for control reps — "
        "control_ratio would measure the memo, not the host"
    )
