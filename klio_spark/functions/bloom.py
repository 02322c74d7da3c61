"""Broadcast Bloom-filter semi-join reduction — the reusable-blocklist
form of Spark's runtime row-level filtering.

Spark injects its own bloom runtime filters for some join shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but the injected
filter is rebuilt per query and only fires when the optimizer's
heuristics allow.  This module makes the lever explicit and REUSABLE: the
bitmap is an ordinary DataFrame of ``(word: int, bits: long)`` rows —
``m_bits/64`` rows, i.e. a fixed 128 KiB at m=2^20 regardless of how many
keys went in — so a contamination blocklist or benchmark-fingerprint set
can be built once, written as parquet, and applied map-side to every
pipeline that needs it.

Scale shape (the whole point):

* ``bloom_bitmap`` — one shuffle over the (small) build side only; the
  probe side is untouched.
* ``bloom_prefilter`` — k broadcast hash joins against the bitmap table,
  all map-side: the 100 TB probe side is filtered WITHOUT a single
  shuffle of its rows.  No false negatives; false-positive rate
  ~(1-e^{-kn/m})^k.
* ``bloom_semi_join`` — prefilter, then an exact semi-join over the few
  survivors kills the false positives.  The final result is EXACTLY the
  plain semi-join (that is what the DuckDB oracle checks); the bloom
  stage only decides how many probe rows reach the verify shuffle.

All three functions work unchanged on a STREAMING probe side: the
bitmap/build inputs are static, so the prefilter's broadcast joins and
the verify semi-join are ordinary stream-static joins — a blocklist
quarantine needs no stateful operator and never shuffles the stream
(tests/test_streaming.py).

Reference parity: klio has no relational layer — this is a north-star
extension (SURVEY §2.9); the mechanism mirrors the published
BloomFilterJoin / runtime-filter designs in Spark itself.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def bloom_bitmap(
    build: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Bloom bitmap over ``build[key_col]`` as ``(word, bits)`` rows.

    Bit position ``j`` for a key is ``pmod(xxhash64(key, j), m_bits)``;
    word ``pos >> 6`` holds bit ``pos % 64``.  The groupBy shuffles at
    most ``m_bits/64`` words — the output size is independent of the
    number of build keys, which is what makes the bitmap broadcastable
    when the key set itself is not.
    """
    pos = build.select(
        F.col(key_col).alias("_k"),
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("_j"),
    ).select(F.pmod(F.xxhash64("_k", "_j"), F.lit(m_bits)).alias("_pos"))
    return pos.groupBy(F.shiftright(F.col("_pos"), 6).alias("word")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(_pos % 64 as int))")).alias("bits")
    )


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``probe`` whose key might be in the filter.

    No false negatives.  Executes as k broadcast hash joins against the
    (word, bits) table — every one map-side, so the probe side reaches
    this filter and leaves it without being shuffled.  A word absent
    from the bitmap table means no bit in that word was ever set, i.e.
    a definite miss (the left join's null branch).
    """
    out = probe
    for j in range(k):
        out = out.withColumn(
            f"_pos{j}", F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits))
        )
    for j in range(k):
        bm = bitmap.select(
            F.col("word").alias(f"_w{j}"), F.col("bits").alias(f"_b{j}")
        )
        out = out.join(
            F.broadcast(bm), F.shiftright(F.col(f"_pos{j}"), 6) == F.col(f"_w{j}"), "left"
        )
    hits = [
        F.coalesce(
            F.col(f"_b{j}").bitwiseAND(
                F.expr(f"shiftleft(1L, cast(_pos{j} % 64 as int))")
            )
            != 0,
            F.lit(False),
        )
        for j in range(k)
    ]
    keep = functools.reduce(lambda a, b: a & b, hits)
    drop = [c for j in range(k) for c in (f"_pos{j}", f"_w{j}", f"_b{j}")]
    return out.filter(keep).drop(*drop)


def bloom_semi_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact ``probe LEFT SEMI JOIN build`` with a bloom prefilter.

    Result rows are exactly the plain semi-join's (bloom false positives
    are removed by the verify join); only the amount of data shuffled
    into the verify join changes.  The verify join is left to the
    optimizer: with a small build side it broadcasts, with a big one it
    shuffles the (already heavily reduced) survivor set.
    """
    keys = build.select(F.col(build_key).alias("_bloom_bk")).distinct()
    # xxhash64 is TYPE-sensitive where the verify equi-join would coerce
    # (string '5' vs bigint 5, decimal vs bigint): hashing mismatched key
    # types would silently drop true matches at the prefilter. Align the
    # probe key to the build key's type before any bit is probed.
    build_t = dict(keys.dtypes)["_bloom_bk"]
    probe_t = dict(probe.dtypes)[probe_key]
    if probe_t != build_t:
        probe = probe.withColumn(probe_key, F.col(probe_key).cast(build_t))
    bitmap = bloom_bitmap(keys, "_bloom_bk", m_bits, k)
    pre = bloom_prefilter(probe, probe_key, bitmap, m_bits, k)
    return pre.join(
        keys, F.col(probe_key) == F.col("_bloom_bk"), "left_semi"
    )
