"""connected_components: min-label propagation fixpoint (functions/graph.py)."""

from pyspark.sql import functions as F

from klio_spark.functions.graph import connected_components


def _comp_map(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r.id: r.comp for r in connected_components(df).collect()}


def test_two_components(spark):
    got = _comp_map(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_chain_needs_multiple_rounds(spark):
    # a path graph: min label must walk the whole chain
    chain = [(i, i + 1) for i in range(10, 1, -1)]
    got = _comp_map(spark, chain)
    assert set(got.values()) == {2}


def test_cycle_and_self_loop(spark):
    got = _comp_map(spark, [(1, 2), (2, 3), (3, 1), (4, 4)])
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4


def test_no_driver_data_transfer(spark):
    # the labels stay distributed; only scalar sums hit the driver —
    # result is a DataFrame we can keep composing
    df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = connected_components(df)
    assert out.filter(F.col("comp") == 1).count() == 2


def test_string_node_ids(spark):
    # non-numeric ids: lexicographic min labels, hash-sum fixpoint path
    got = _comp_map(spark, [("b", "c"), ("a", "b"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
