"""functions/linalg.py: quantized Gram + integer power iteration.

Differential referees: numpy (exact replication of the quantized-int
pipeline, and float eigh for direction agreement). The cross-engine
(DuckDB) exactness of the same kernels is q170/q171's oracle check.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from klio_spark.functions.linalg import (
    GRAM_SCALE,
    VEC_SCALE,
    _tdiv,
    power_iteration,
    quantized_gram,
    top_eigvec_df,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _np_quant(emb_rows):
    x = np.stack(
        [np.asarray(r, dtype=np.float64) for r in emb_rows if r is not None]
    )
    return np.floor(x * GRAM_SCALE).astype(object)  # exact python ints


def test_quantized_gram_matches_numpy(emb):
    rows = quantized_gram(emb, "embedding").collect()
    got = {(r.i, r.j): r.g for r in rows}
    q = _np_quant([r.embedding for r in emb.collect()])
    d = q.shape[1]
    assert len(got) == d * (d + 1) // 2
    # exact integer check on a deterministic subset of cells (full
    # d^2 python-loop check is slow for no extra coverage)
    for i, j in [(0, 0), (0, 1), (3, 17), (31, 31), (17, 63), (63, 63)]:
        want = int(sum(int(a) * int(b) for a, b in zip(q[:, i], q[:, j])))
        assert got[(i, j)] == want, (i, j)


def test_gram_partials_are_corpus_size_independent(emb):
    """The exchange after mapInPandas carries d(d+1)/2 rows per batch —
    repartitioning the input changes partial count, never the result."""
    one = quantized_gram(emb.coalesce(1), "embedding").collect()
    many = quantized_gram(emb.repartition(7), "embedding").collect()
    assert {(r.i, r.j, r.g) for r in one} == {(r.i, r.j, r.g) for r in many}


def test_tdiv_truncates_toward_zero():
    assert _tdiv(-7, 2) == -3
    assert _tdiv(7, -2) == -3
    assert _tdiv(-7, -2) == 3
    assert _tdiv(7, 2) == 3
    big = 1234567890123456789012345677
    assert _tdiv(-big, 1000) == -(big // 1000)


def test_power_iteration_agrees_with_numpy_eigh(emb):
    """With enough rounds the integer iteration converges to the float
    top eigenvector of the same quantized Gram. The corpus eigengap is
    small (l2/l1 ~ 0.984 at sf0.01), so rounds must beat gap^k and the
    Rayleigh quotient — robust to near-ties — is asserted alongside the
    direction cosine."""
    rows = quantized_gram(emb, "embedding").collect()
    v = np.array(power_iteration(rows, 64, iters=300), dtype=np.float64)
    g = np.zeros((64, 64))
    for r in rows:
        g[r.i][r.j] = g[r.j][r.i] = float(r.g)
    evals, evecs = np.linalg.eigh(g)
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.99, cos
    rayleigh = (v @ g @ v) / (v @ v)
    assert rayleigh >= 0.999 * evals[-1], (rayleigh, evals[-1])
    assert np.abs(v).max() <= VEC_SCALE


def test_top_eigvec_df_deterministic_and_signed(emb):
    a = top_eigvec_df(emb, dim=64, iters=8).collect()
    b = top_eigvec_df(emb, dim=64, iters=8).collect()
    assert sorted((r.component, r.eigvec_q) for r in a) == sorted(
        (r.component, r.eigvec_q) for r in b
    )
    vals = [r.eigvec_q for r in sorted(a, key=lambda r: r.component)]
    pivot = max(range(64), key=lambda i: (abs(vals[i]), -i))
    assert vals[pivot] >= 0


def test_bfs_khop_on_path_graph(spark):
    """q169's kernel on a handcrafted graph: a 0-1-2-3-4 path (each edge
    co-purchased twice so it survives the weight-2 threshold) with seed
    node 0 (0 % 100 == 0) must yield hops 0,1,2,3 and not reach node 4."""
    from klio_spark.queries import all_queries
    import tempfile, os

    _REGISTRY = all_queries()

    rows = []
    ok = 0
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 4)]:
        for _ in range(2):  # weight 2
            rows += [(ok, u), (ok, v)]
            ok += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "lineitem.parquet"))
        got = {
            (r.partkey, r.hops)
            for r in _REGISTRY["q169_bfs_khop"].fn(spark, td).collect()
        }
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3)}
