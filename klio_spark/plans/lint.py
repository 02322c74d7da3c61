"""Plan linter: flag the plan shapes that sink 1000-executor runs.

The plan-property tests (tests/test_plans.py) lock known-good plans; the
linter is the other direction — a generic scan over ANY query's physical
plan for the anti-patterns that are invisible at sf0.01 and fatal at
100 TB:

  * ``cartesian_product`` (error) — a CartesianProduct node multiplies
    partitions; n² rows the moment both sides are real tables.
  * ``rdd_roundtrip`` (error) — ``Scan ExistingRDD`` means the plan fell
    out of Tungsten (df.rdd / createDataFrame-from-rdd): serialization
    wall + no codegen, pushdown, or AQE above that point.
  * ``python_row_udf`` (warn) — BatchEvalPython is a row-at-a-time
    Python UDF: pickled per row, ~10-100× slower than an Arrow-batched
    ``pandas_udf`` (which shows as ArrowEvalPython and is not flagged).
  * ``global_sort`` (info) — a global Sort materializes a total order
    across the cluster (range exchange + full sort); top-k wants
    TakeOrderedAndProject / WindowGroupLimit instead.
  * ``broadcast_nested_loop`` (info) — fine when the broadcast side is a
    scalar/tiny frame (that's how COUNT(*) rides along); fatal when it
    isn't. Flagged so a human confirms the side is bounded.
  * ``many_shuffles`` (info) — exchange count above the threshold;
    usually a sign a partitioning could be reused.

Used three ways: `lint(df)` in code/tests, `assert_lints_clean(df)` to
gate a query, and `klio job plan --config ...` to lint a configured
job's pipeline before deploying it.
"""

from __future__ import annotations

import dataclasses
import re

from pyspark.sql import DataFrame

from klio_spark.plans import num_shuffles, plan_str

SEVERITIES = ("error", "warn", "info")


@dataclasses.dataclass
class Finding:
    rule: str
    severity: str
    message: str

    def __str__(self) -> str:  # `klio job plan` output line
        return f"[{self.severity}] {self.rule}: {self.message}"


def lint(df: DataFrame, *, max_shuffles: int = 8) -> list[Finding]:
    s = plan_str(df)
    out: list[Finding] = []

    if "CartesianProduct" in s:
        out.append(
            Finding(
                "cartesian_product",
                "error",
                "CartesianProduct joins every partition pair — n² rows on "
                "real tables. Add an equi-key, band the range condition, "
                "or broadcast the small side.",
            )
        )
    if re.search(r"Scan ExistingRDD", s):
        out.append(
            Finding(
                "rdd_roundtrip",
                "error",
                "plan contains an RDD scan (df.rdd round-trip): no codegen, "
                "pushdown, or AQE above this point. Stay in the DataFrame "
                "API (mapInPandas replaces most rdd.mapPartitions uses). "
                "NOTE: localCheckpoint lineage truncation in iterative "
                "algorithms prints the same node — allow-list it where "
                "the truncation is the point.",
            )
        )
    if "BatchEvalPython" in s:
        out.append(
            Finding(
                "python_row_udf",
                "warn",
                "row-at-a-time Python UDF (BatchEvalPython): pickled per "
                "row. Use pandas_udf / mapInPandas (ArrowEvalPython) — "
                "10-100× faster on the same logic.",
            )
        )
    # formatted explain describes each operator in its own block; a Sort
    # block's `Arguments: [keys], <global>, 0` line carries global=true
    # for a total-order sort (window/SMJ sorts are global=false)
    for block in s.split("\n\n"):
        if re.match(r"\(\d+\) Sort\b", block) and re.search(
            r"Arguments: \[[^\n]*\], true, \d+", block
        ):
            out.append(
                Finding(
                    "global_sort",
                    "info",
                    "global Sort (range exchange + total order). If a "
                    "bounded prefix is enough, sortWithinPartitions, "
                    "limit (TakeOrderedAndProject), or a windowed top-k "
                    "avoid the full sort.",
                )
            )
            break
    if "BroadcastNestedLoopJoin" in s:
        out.append(
            Finding(
                "broadcast_nested_loop",
                "info",
                "BroadcastNestedLoopJoin: correct for scalar/tiny "
                "broadcast sides (count/config frames); confirm the "
                "broadcast side is bounded at production scale.",
            )
        )
    n = num_shuffles(df)
    if n > max_shuffles:
        out.append(
            Finding(
                "many_shuffles",
                "info",
                f"{n} exchanges (threshold {max_shuffles}): check whether "
                "a partitioning can be reused across stages (same key), "
                "or aggregations can be combined.",
            )
        )
    return out


def assert_lints_clean(
    df: DataFrame, *, allow: tuple[str, ...] = (), level: str = "warn"
) -> None:
    """Raise AssertionError if the plan has findings at `level` or worse
    (error > warn > info), excluding rules named in `allow`."""
    bad_levels = SEVERITIES[: SEVERITIES.index(level) + 1]
    bad = [
        f
        for f in lint(df)
        if f.severity in bad_levels and f.rule not in allow
    ]
    if bad:
        raise AssertionError(
            "plan lint failed:\n" + "\n".join(str(f) for f in bad)
        )
