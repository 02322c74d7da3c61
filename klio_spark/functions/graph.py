"""Distributed connected components — the clustering step of near-dup
deduplication (pairs → duplicate groups → one representative per group).

At 100 TB the near-dup stage emits an edge list (id_a, id_b) that can be
billions of rows; grouping those edges into components is an iterative
min-label-propagation fixpoint, the standard Spark formulation (the
"hash-to-min" scheme of Rastogi et al. '13, also what GraphFrames'
connectedComponents does under the hood):

  * every node starts labeled with itself;
  * each round, a node's label becomes the min of its own and its
    neighbors' labels (one shuffle: edges ⋈ labels, groupBy node, min);
  * converged when no label changes — O(component diameter) rounds, and
    near-dup components are shallow (dup clusters are near-cliques), so
    3-5 rounds in practice.

Each round localCheckpoints its label table, truncating lineage (the
loop would otherwise build an O(rounds)-deep plan). Checkpoint blocks
from earlier rounds are reclaimed by the ContextCleaner once the Python
references drop (Dataset.unpersist does not touch localCheckpoint
storage), so transient peak storage can briefly exceed the 2 live label
tables of (id, component) longs until the cleaner runs — bounded by
O(rounds) small tables, not by data growth. Driver involvement is ONE
count() per round for the convergence check — a scalar, not data; the
label tables never leave the executors.

Small graphs short-circuit to a driver-side union-find (the broadcast
decision, applied to iteration): below ``driver_threshold`` edges the
fixpoint's per-round scheduling cost dwarfs the actual work by orders
of magnitude, so the edge list — already deduplicated and counted —
collects (bounded, ≤ ~16 MB) and a path-compressed union-find labels it
in microseconds. The distributed fixpoint remains the default beyond
the threshold and is what every differential test forces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Edge list → (id, component) with component = min node id reachable.

    Only nodes that appear in an edge are returned (isolated nodes are
    their own singleton components by definition; callers that want them
    can union the complement). The result is materialized (persisted)
    before return so the iteration scaffolding can be torn down.

    Adaptive execution, the same decision AQE makes for broadcast joins:
    once the (deduplicated, symmetric) edge list is materialized and
    counted, a small graph — ≤ ``driver_threshold`` directed edges, ~16
    MB of id pairs for long ids (size the threshold down for wide
    string ids: the gate counts rows, not bytes) — is solved by a
    driver-side union-find in
    microseconds instead of paying O(diameter) Spark jobs of fixpoint
    scaffolding (each round is 3 joins + a checkpoint + a scalar
    collect; on a 4k-edge graph that is seconds of pure scheduling for
    microseconds of work). Beyond the threshold the distributed
    min-label-propagation fixpoint runs, whose shuffles and state are
    bounded per round — the 100 TB path. Set ``driver_threshold=0`` to
    force the distributed path (the differential tests do).
    """
    # symmetric neighbor view: both directions of every edge. One explode,
    # not a self-union — a union's two branches would each execute the
    # upstream edge plan (for near-dup edges that's the whole candidate
    # self-join) before the persist below ever materializes. Edges with a
    # NULL endpoint (outer-join debris upstream) are dropped outright:
    # "connected to null" has no component semantics, and the two
    # execution paths must agree on the input set.
    sym = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("id"), F.col(dst).alias("nbr")),
                    F.struct(F.col(dst).alias("id"), F.col(src).alias("nbr")),
                )
            ).alias("_e")
        )
        .select("_e.id", "_e.nbr")
        .distinct()
        .persist()
    )

    n_sym = sym.count()  # materializes the persist either way
    if n_sym <= driver_threshold:
        spark = edges.sparkSession
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in sym.collect():  # bounded by driver_threshold rows
            a, b = row[0], row[1]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # attach the larger root under the smaller so the root
                # IS the component's min member (the fixpoint's label)
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(v, find(v)) for v in parent]
        sym.unpersist()
        id_field = sym.schema["id"]
        schema = (
            f"id {id_field.dataType.simpleString()}, "
            f"comp {id_field.dataType.simpleString()}"
        )
        # the label table is driver-local and tiny (≤ driver_threshold
        # nodes), but a bare createDataFrame(list) parallelizes it into
        # defaultParallelism PICKLED slices — every consumer re-executes
        # the scan as N Python-worker round-trips (profiled on q185:
        # ~10 s cumulative runT warm, ~70 s cold pool, ~0 JVM cpuT, per
        # consumer). Ship it as ONE Arrow batch when the session speaks
        # Arrow (JVM-only scan), and collapse to one partition either
        # way — consumers broadcast this table, its parallelism is moot.
        if out and (
            spark.conf.get(
                "spark.sql.execution.arrow.pyspark.enabled", "false"
            ).lower()
            == "true"
        ):
            import pandas as pd

            result = spark.createDataFrame(
                pd.DataFrame(out, columns=["id", "comp"]), schema=schema
            )
        else:
            result = spark.createDataFrame(out, schema=schema)
        return result.coalesce(1)

    numeric_ids = dict(edges.dtypes)[src] in (
        "tinyint", "smallint", "int", "bigint", "decimal(38,0)"
    )

    def _sum(df):
        if numeric_ids:
            # decimal sum: node-id sums can pass int64 range on huge corpora
            return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
        # non-numeric ids: fixpoint-test on sum(xxhash64(id, comp)) — any
        # label change moves the sum except with ~2^-64 hash-sum collision
        # odds (the same tolerance the dedup operators' 8-byte shingle
        # hashes accept); an extra no-op round costs one join, never
        # correctness, since propagation is idempotent at the fixpoint
        return df.agg(
            F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)"))
        ).collect()[0][0]

    # round 0 fused into initialization: comp = min(id, min neighbor) is
    # one groupBy over sym — a full propagation round without the
    # edges⋈labels join the loop rounds pay
    labels = (
        sym.groupBy("id")
        .agg(F.least(F.col("id"), F.min("nbr")).alias("comp"))
        .localCheckpoint(eager=False)
    )
    prev_sum = _sum(labels)  # materializes the checkpoint too

    for _ in range(max_iter):
        # candidate label per node: min over neighbors' current labels
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "nbr"), "nbr")
            .groupBy("id")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            # checkpoint BEFORE the self-join below: `stepped` feeds both
            # sides of it, and without materialization the propagation
            # join would physically execute twice per round
            .localCheckpoint(eager=False)
        )
        # pointer-jump shortcut (path compression): also adopt the label
        # OF my label this round. Plain propagation needs O(diameter)
        # rounds — a 1000-link chain is 1000 Spark jobs — while
        # shortcutting compounds label hops multiplicatively, giving the
        # classic O(log diameter) bound. One extra (id, comp)⋈(id, comp)
        # join of two-long rows per round buys an order of magnitude
        # fewer rounds on chain-shaped components. Labels still only
        # ever decrease, so the scalar-sum fixpoint test is unchanged.
        new_labels = (
            stepped.join(
                stepped.select(
                    F.col("id").alias("_lid"), F.col("comp").alias("_lcomp")
                ),
                F.col("comp") == F.col("_lid"),
                "left",
            )
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("_lcomp"), F.col("comp"))
                ).alias("comp"),
            )
            # truncate lineage each round (else the plan deepens per round
            # and a cache eviction triggers a recompute cascade); lazy, so
            # the convergence agg below materializes checkpoint + sum in
            # ONE job per round
            .localCheckpoint(eager=False)
        )
        # labels only ever decrease under min-propagation, so the fixpoint
        # test is one scalar: sum(comp) unchanged ⟺ no label changed.
        # (One agg per round instead of a full old⋈new change-count join.)
        new_sum = _sum(new_labels)
        # dropping the Python reference is what frees the previous
        # round's checkpoint blocks (via ContextCleaner); unpersist()
        # would be a no-op on a localCheckpoint'ed frame
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels
