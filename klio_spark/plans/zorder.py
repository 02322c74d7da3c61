"""Z-order (Morton) clustering — multi-dimensional data layout.

Single-column sort gives perfect min/max pruning on ONE predicate
column and none on the others. Interleaving the bits of two (or more)
key columns into one Morton code and range-partitioning on it gives
every interleaved column LOCALITY: each output file covers a small
hyper-rectangle of the key space, so file-level min/max zone maps
(see queries/maintenance.py q159) prune scans on ANY of the columns.
This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built
here from plain Spark primitives.

100 TB design: the z-key is a pure per-row expression (no shuffle to
compute); the layout write is ONE repartitionByRange on the z-key —
the same single exchange a plain sort-write costs — and range
boundaries come from Spark's reservoir sampling of the key, so skew
in the raw keys does not skew file sizes.

Engine-portable by construction: the bit interleave is an unrolled
integer expression (div/mod/multiply) over rank-bucketed inputs, so a
DuckDB oracle can replay it bit-for-bit (see queries q164).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_expr(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low `bits` bits of x (even positions) and y (odd):
    the 2-D Morton code, as one unrolled integer expression.

    Inputs must already be in [0, 2^bits) — use :func:`quantize` for
    arbitrary-ranged keys. Unrolled div/mod arithmetic (not shiftleft)
    so the DuckDB oracle is the same expression with `//`.
    """
    terms = []
    for i in range(bits):
        terms.append(((x.cast("long") / 2**i).cast("long") % 2) * (4**i))
        terms.append(((y.cast("long") / 2**i).cast("long") % 2) * (2 * 4**i))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`morton_expr` — identical arithmetic."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_expr}) // {2**i} % 2) * {4**i}")
        terms.append(f"(({y_expr}) // {2**i} % 2) * {2 * 4**i}")
    return "(" + " + ".join(terms) + ")"


def quantize(c: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Map a value in [lo, hi] to an integer cell in [0, 2^bits):
    equal-width quantization, clamped. lo/hi may be literals or
    (broadcast) per-row bounds columns."""
    cells = 2**bits
    pos = (c.cast("double") - lo) / F.when(hi > lo, hi - lo).otherwise(
        F.lit(1.0)
    )
    cell = F.floor(pos * cells).cast("long")
    return F.least(F.greatest(cell, F.lit(0)), F.lit(cells - 1))


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_files: int = 32,
) -> None:
    """Write `df` clustered by the (x_col, y_col) Morton code.

    Keys are modulo-folded into the bit range (cheap, rank-free; for
    real-valued keys quantize() first). One range exchange; each output
    file covers a compact z-range, i.e. a small rectangle in (x, y) —
    the property tests/test_layout.py asserts via per-file min/max
    spans vs an unclustered write.
    """
    z = morton_expr(
        F.pmod(F.col(x_col), F.lit(2**bits)),
        F.pmod(F.col(y_col), F.lit(2**bits)),
        bits,
    )
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
