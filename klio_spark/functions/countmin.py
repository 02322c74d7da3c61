"""Count-min sketch tables — additive frequency sketches, persisted.

Completes the persisted-sketch family (sketch_table.py: HLL distinct,
KLL quantiles, theta set ops; bloom.py: membership) with FREQUENCY:
a depth x width counter grid answering "how often did key k occur"
within the classic (eps, delta) overestimate bound, from a table of
depth*width rows instead of the fact table.

Reference parity: klio jobs count message traffic with Beam metrics
counters (reference core/src/klio_core/metrics — exact, per-name);
a count-min table is the scale form: bounded memory for UNBOUNDED key
domains (user ids, URLs, shingles), mergeable across partitions/days.

Engine-portable by construction: row hashes are md5-derived (same
bytes in Spark and DuckDB — see dedup.md5_token_hash), counters are
integer sums, estimation is MIN over depth exact integers. The DuckDB
oracle replays the identical math, so registry checks are hash-exact.

100 TB design:
  * build is ONE map-side-combinable aggregation: each fact row expands
    to `depth` (row, bucket) pairs; partial aggregation collapses them
    to at most depth*width rows per task BEFORE the shuffle, so the
    exchange moves O(depth*width) per task regardless of fact size;
  * the sketch is ADDITIVE: daily sketches merge by summing counters
    (one groupBy over depth*width-row tables) — the same
    compute-once/roll-up-forever shape as the HLL/KLL tables, and the
    natural incremental-refresh story for streaming (foreachBatch adds
    the batch's counter deltas);
  * probes join against the tiny counter table — broadcast, no fact
    rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from klio_spark.functions.dedup import md5_token_hash


def _bucket(key: F.Column, row: int, width: int) -> F.Column:
    """Row-`row`'s bucket for `key`: md5-based 60-bit hash, mod width.

    The salt string 'cm{row}:' makes the depth rows pairwise-independent
    in practice (distinct md5 streams); pmod keeps the result in
    [0, width) for any sign.
    """
    return F.pmod(
        md5_token_hash(F.concat(F.lit(f"cm{row}:"), key.cast("string"))),
        F.lit(width),
    )


def cm_bucket_sql(key_expr: str, row: int, width: int) -> str:
    """The DuckDB twin of :func:`_bucket` — identical bytes hashed,
    identical arithmetic — for building hash-exact oracles."""
    return (
        f"((CAST('0x' || substr(md5('cm{row}:' || CAST({key_expr} AS VARCHAR)), 1, 15) "
        f"AS BIGINT) % {width}) + {width}) % {width}"
    )


def build_countmin(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Aggregate `df[key_col]` into a count-min counter table.

    Returns (cm_row int, cm_bucket bigint, cm_count bigint), at most
    depth*width rows. One fact-table pass; the explode-by-depth happens
    inside the same stage as the partial aggregation, so the shuffle
    carries counter partials, not fact rows.
    """
    key = F.col(key_col)
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("cm_row"),
                _bucket(key, r, width).alias("cm_bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy("rb.cm_row", "rb.cm_bucket")
        .agg(F.count(F.lit(1)).alias("cm_count"))
    )


def merge_countmin(*sketches: DataFrame) -> DataFrame:
    """Sum counter tables cell-wise — the additivity that makes daily /
    per-batch sketches roll up without fact rescans."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("cm_row", "cm_bucket").agg(
        F.sum("cm_count").alias("cm_count")
    )


def cm_estimate(
    counters: DataFrame, probes: DataFrame, key_col: str, depth: int, width: int
) -> DataFrame:
    """Point-frequency estimates for `probes[key_col]`.

    est = MIN over rows of counter[row][h_row(key)] — the classic CM
    upper-bound estimate (never undercounts; overcounts by at most
    eps*N with prob 1-delta, eps=e/width, delta=e^-depth).

    The probe side re-derives each row's bucket and joins the counter
    table (broadcast — depth*width rows) on (row, bucket); missing
    cells count 0 (possible only when the build saw no key in that
    bucket). One tiny join, zero fact access.
    """
    key = F.col(key_col)
    rb = probes.select(
        key.alias(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cm_row"),
                        _bucket(key, r, width).alias("cm_bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.cm_row", "rb.cm_bucket")
    return (
        rb.join(F.broadcast(counters), ["cm_row", "cm_bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cm_count", F.lit(0))).alias("cm_est"))
    )


def cm_filter_heavy(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """EXACT heavy-key counts via a count-min pre-filter — the two-pass
    pattern that replaces a full groupBy over an unbounded key domain.

    Pass 1 builds the counter grid (one map-side-combinable aggregation,
    shuffle = counter partials). Pass 2 re-scans the fact table and
    drops every row whose key's estimate is below ``threshold`` BEFORE
    any per-key shuffle: the estimate is computed with ``depth``
    broadcast joins against the tiny grid (map-side, no fact exchange),
    so only candidate rows — true heavy keys plus collision false
    positives — reach the exact groupBy. CM never undercounts, so a key
    with true count >= threshold always survives the filter: the final
    HAVING on the exact count makes the result EXACTLY equal to the
    full groupBy's, which is what the q175 oracle asserts.

    At 100 TB this is the difference between shuffling 1e12 rows by a
    1e11-cardinality key and shuffling only the heavy slice; the grid
    width tunes the false-positive volume (eps = e/width of total
    count leaks past the filter per row in expectation).
    """
    key = F.col(key_col)
    filtered = df.filter(key.isNotNull())
    counters = build_countmin(filtered, key_col, depth=depth, width=width)
    out = filtered
    for r in range(depth):
        cr = (
            counters.filter(F.col("cm_row") == r)
            .select(
                F.col("cm_bucket").alias(f"_b{r}"),
                F.col("cm_count").alias(f"_c{r}"),
            )
        )
        out = out.withColumn(f"_b{r}", _bucket(key, r, width)).join(
            F.broadcast(cr), f"_b{r}", "left"
        )
    est = F.least(*[F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(depth)])
    cand = out.filter(est >= F.lit(threshold)).select(key_col)
    return (
        cand.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
