"""connected_components: min-label propagation fixpoint (functions/graph.py)."""

from pyspark.sql import functions as F

from klio_spark.functions.graph import connected_components


def _comp_map(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r.id: r.comp for r in connected_components(df, **kw).collect()}


def test_two_components(spark):
    got = _comp_map(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_chain_needs_multiple_rounds(spark):
    # a path graph: min label must walk the whole chain — forced onto the
    # distributed fixpoint, the behavior this test is named for
    chain = [(i, i + 1) for i in range(10, 1, -1)]
    got = _comp_map(spark, chain, driver_threshold=0)
    assert set(got.values()) == {2}


def test_cycle_and_self_loop(spark):
    for thr in (0, 1_000_000):  # both execution paths
        got = _comp_map(spark, [(1, 2), (2, 3), (3, 1), (4, 4)], driver_threshold=thr)
        assert got[1] == got[2] == got[3] == 1
        assert got[4] == 4


def test_no_driver_data_transfer(spark):
    # on the distributed path the labels stay distributed; only scalar
    # sums hit the driver — result is a DataFrame we can keep composing
    df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = connected_components(df, driver_threshold=0)
    assert out.filter(F.col("comp") == 1).count() == 2


def test_string_node_ids(spark):
    # non-numeric ids: lexicographic min labels; distributed path takes
    # the hash-sum fixpoint test, driver path a plain dict union-find
    for thr in (0, 1_000_000):
        got = _comp_map(
            spark, [("b", "c"), ("a", "b"), ("x", "y")], driver_threshold=thr
        )
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_random_graphs_match_union_find(spark):
    """Differential: min-label propagation vs a pure-Python union-find on
    random edge lists (fixed seeds — each case is a full Spark fixpoint)."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # expected component label = min member id, only for nodes in edges
        touched = {v for e in edges for v in e}
        roots = {v: find(v) for v in touched}
        min_per_root = {}
        for v, r in roots.items():
            min_per_root[r] = min(min_per_root.get(r, v), v)
        expected = {v: min_per_root[roots[v]] for v in touched}

        # BOTH execution paths must agree with the reference union-find:
        # the default (driver-side for graphs this small) and the forced
        # distributed fixpoint (driver_threshold=0 — the 100 TB path)
        assert _comp_map(spark, edges) == expected, f"seed {seed}"
        assert (
            _comp_map(spark, edges, driver_threshold=0) == expected
        ), f"seed {seed} (distributed path)"


def test_q160_triangle_count_matches_bruteforce(spark, tmp_path):
    """q160's oriented wedge-join triangle count vs a brute-force python
    referee over seeded random basket graphs — covers shapes the fixed
    corpus lacks (hub nodes, degree ties, singleton baskets)."""
    import itertools
    import random

    import pandas as pd

    from klio_spark.queries import all_queries

    for seed in (3, 17):
        rng = random.Random(seed)
        rows = []
        for ok in range(40):
            basket = rng.sample(range(1, 15), rng.randrange(1, 6))
            # a hub part in most baskets stresses the degree orientation
            if rng.randrange(3):
                basket.append(99)
            for pk in basket:
                rows.append({"l_orderkey": ok, "l_partkey": pk})
        d = tmp_path / f"g{seed}"
        d.mkdir()
        pd.DataFrame(rows).to_parquet(d / "lineitem.parquet", index=False)

        got = all_queries()["q160_triangle_count"].fn(spark, str(d)).collect()[0]

        # brute force: distinct undirected edges, then closed triples
        baskets = {}
        for r in rows:
            baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
        edges = set()
        for parts in baskets.values():
            for a, b in itertools.combinations(sorted(parts), 2):
                edges.add((a, b))
        nodes = sorted({n for e in edges for n in e})
        tri = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in edges and (b, c) in edges and (a, c) in edges
        )
        assert got.n_triangles == tri, (seed, got, tri)
        assert got.n_edges == len(edges)
        assert got.n_wedges >= tri  # every triangle came from a wedge
