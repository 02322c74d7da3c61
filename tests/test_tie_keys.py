"""Tie-key gate (VERDICT r8 item 3): every order-dependent pick in the
registry must have a provably-total order key or an explicit entry here.

Round 8's 3x-amplified sweep caught two shipped bugs of exactly this
class — q09's tie-arbitrary ``max_by`` and q114's multiplicity-collapsing
``distinct()`` — both invisible at driver scale factors and guaranteed
at 100 TB row counts. klio_spark.plans.tie_lint AST-walks the query and
streaming modules for ``row_number``/``ntile``/``max_by``/``min_by``/
ordered ``first``/``last`` AND bare aggregate-side ``first``/``last``
(Python) and ``ROW_NUMBER``/``NTILE``/``ARG_MAX``/``ARG_MIN`` (oracle
SQL) sites — named-window OVER clauses resolve for every construct. A site auto-passes when its
order key references a corpus-unique row id; everything else needs an
ALLOWED entry below stating WHY ties are impossible or harmless. An
unlisted site fails this test, so a new query cannot reintroduce the
class silently; a stale entry also fails, so the list can't rot.

Three recurring justification shapes, named once here:

  * UNIQUE-IN-PARTITION: the final order key is the partition's grouping
    identity (one row per key after a groupBy / posexplode / pair
    construction), so ties are structurally impossible.
  * VALUE-EQUALS-KEY: the expression picked IS the order key (or a
    function of only the tied columns), so any choice among tied rows
    yields the same output value.
  * ALIASED-ROW-ID: the tiebreaker is a renamed corpus-unique row id
    (e.g. ``tid``/``pid`` = event_id) that the lint's textual check
    cannot see through.
"""

from __future__ import annotations

import collections
import glob
import os

import duckdb
import pytest

from klio_spark.plans import tie_lint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

UNIQUE_IN_PARTITION = "unique-in-partition"
VALUE_EQUALS_KEY = "value-equals-key"
ALIASED_ROW_ID = "aliased-row-id"

# site_key -> justification. Keep these honest: each names the tiebreaker
# column and why it is total (or why ties cannot change the output).
ALLOWED: dict[str, str] = {
    # --- ANN / retrieval family: every ranking orders by (score DESC,
    #     neighbor_id) and the candidate table has one row per
    #     (query_id, neighbor_id) by construction (a distinct-keyed
    #     cross-score or an exploded top-k list) -> neighbor_id is
    #     UNIQUE-IN-PARTITION.
    "klio_spark/queries/vector_ops.py::argmax::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id, one row per (query, neighbor) in the scored table",
    "klio_spark/queries/vector_ops.py::rn::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id, one row per (query, neighbor) in the scored table",
    "klio_spark/queries/vector_ops.py::q70_ann_bruteforce_topk::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    "klio_spark/queries/vector_ops.py::q157_int8_ann_topk::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    "klio_spark/queries/vector_ops.py::q157_int8_ann_topk::sql_row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    "klio_spark/queries/vector_ops.py::q194_mmr_diverse_topk::sql_row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id at every greedy MMR round",
    "klio_spark/queries/vector_ops.py::q197_filtered_ann_topk::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    "klio_spark/queries/vector_ops.py::q204_mrl_prefix_recall::sql_row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id, per prefix length",
    "klio_spark/queries/vector_ops.py::q221_rrf_fusion::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id in both rankers and the fused list",
    "klio_spark/queries/vector_ops.py::q221_rrf_fusion::sql_row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id in both rankers and the fused list",
    "klio_spark/queries/vector_ops.py::q226_hard_negative_mining::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    "klio_spark/queries/vector_ops.py::q226_hard_negative_mining::sql_row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    "klio_spark/queries/vector_ops.py::q227_retrieval_metrics::row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    "klio_spark/queries/vector_ops.py::q227_retrieval_metrics::sql_row_number": UNIQUE_IN_PARTITION
    + ": neighbor_id within query_id",
    # --- token / term rankings: the ranked table is grouped by the
    #     tiebreaker itself.
    "klio_spark/queries/curation.py::q97_tfidf_top_terms::row_number": UNIQUE_IN_PARTITION
    + ": tok within source (c is GROUP BY source, tok)",
    "klio_spark/queries/curation.py::q97_tfidf_top_terms::sql_row_number": UNIQUE_IN_PARTITION
    + ": tok within source (c is GROUP BY source, tok)",
    "klio_spark/queries/training.py::q89_heavy_hitters::row_number": UNIQUE_IN_PARTITION
    + ": tok within source (counts are GROUP BY source, tok)",
    "klio_spark/queries/training.py::q89_heavy_hitters::sql_row_number": UNIQUE_IN_PARTITION
    + ": tok within source (counts are GROUP BY source, tok)",
    "klio_spark/queries/textops.py::q173_bpe_merge_scores::row_number": UNIQUE_IN_PARTITION
    + ": pair string, aggregated GROUP BY pair",
    "klio_spark/queries/textops.py::q173_bpe_merge_scores::sql_row_number": UNIQUE_IN_PARTITION
    + ": pair string, aggregated GROUP BY pair",
    "klio_spark/queries/textops.py::q190_lexical_gini::row_number": UNIQUE_IN_PARTITION
    + ": w (word) within source (fr is GROUP BY source, w)",
    "klio_spark/queries/textops.py::q190_lexical_gini::sql_row_number": UNIQUE_IN_PARTITION
    + ": w (word) within source (fr is GROUP BY source, w)",
    "klio_spark/queries/textops.py::q206_char_coverage::row_number": UNIQUE_IN_PARTITION
    + ": c (character) within lang (counts are GROUP BY lang, c)",
    "klio_spark/queries/textops.py::q206_char_coverage::sql_row_number": UNIQUE_IN_PARTITION
    + ": c (character) within lang (counts are GROUP BY lang, c)",
    # --- graph rankings: node ids are the grouping identity.
    "klio_spark/queries/advanced.py::q152_pagerank::sql_row_number": UNIQUE_IN_PARTITION
    + ": node, one score row per node after the final iteration",
    "klio_spark/queries/textops.py::q189_textrank_keywords::sql_row_number": UNIQUE_IN_PARTITION
    + ": node, one score row per node after the final iteration",
    "klio_spark/queries/advanced.py::q214_common_neighbors::row_number": UNIQUE_IN_PARTITION
    + ": nb within center, adjacency has one row per (center, nb)",
    "klio_spark/queries/advanced.py::q214_common_neighbors::sql_row_number": UNIQUE_IN_PARTITION
    + ": nb within center, adjacency has one row per (center, nb)",
    # --- pair/segment/source rankings grouped by the tiebreaker.
    "klio_spark/queries/behavior.py::q125_copurchase_pairs::sql_row_number": UNIQUE_IN_PARTITION
    + ": (part_a, part_b), counts are GROUP BY the pair",
    "klio_spark/queries/behavior.py::q231_bootstrap_ci::row_number": UNIQUE_IN_PARTITION
    + ": b (bootstrap replicate index), one diff row per b",
    "klio_spark/queries/behavior.py::q247_ab_significance::first": VALUE_EQUALS_KEY
    + ": F.first('c_custkey') inside groupBy('c_custkey') — the picked "
    "value IS the grouping key, identical on every row of the group",
    "klio_spark/queries/behavior.py::q231_bootstrap_ci::sql_row_number": UNIQUE_IN_PARTITION
    + ": b (bootstrap replicate index), one diff row per b",
    "klio_spark/queries/dataqual.py::q143_skew_profile::sql_row_number": UNIQUE_IN_PARTITION
    + ": user_id, counts are GROUP BY user_id",
    "klio_spark/queries/dataqual.py::q233_neyman_allocation::row_number": UNIQUE_IN_PARTITION
    + ": c_mktsegment, quotas are GROUP BY segment",
    "klio_spark/queries/dataqual.py::q233_neyman_allocation::sql_row_number": UNIQUE_IN_PARTITION
    + ": c_mktsegment, quotas are GROUP BY segment",
    "klio_spark/queries/training.py::q195_mixture_temperature::row_number": UNIQUE_IN_PARTITION
    + ": source, weights are GROUP BY source",
    "klio_spark/queries/training.py::q195_mixture_temperature::sql_row_number": UNIQUE_IN_PARTITION
    + ": source, weights are GROUP BY source",
    "klio_spark/queries/extra.py::q252_lorenz_deciles::row_number": UNIQUE_IN_PARTITION
    + ": l_suppkey, revenue is GROUP BY supplier",
    "klio_spark/queries/extra.py::q252_lorenz_deciles::sql_row_number": UNIQUE_IN_PARTITION
    + ": l_suppkey, revenue is GROUP BY supplier",
    "klio_spark/queries/textops.py::q136_substring_dedup::row_number": UNIQUE_IN_PARTITION
    + ": pos within doc_id, kg posexplodes one row per position",
    # --- q09: THE round-8 bug, now carrying its fix's argument.
    "klio_spark/queries/scalars2.py::q09_arg_min_max::max_by": "composite "
    "bigint key (exact cents * 1e10 + o_orderkey): o_orderkey is corpus-"
    "unique so the key is total; bound documented in the query doc",
    "klio_spark/queries/scalars2.py::q09_arg_min_max::min_by": "composite "
    "bigint key (epoch-day * 1e10 + o_orderkey): o_orderkey is corpus-"
    "unique so the key is total",
    # --- VALUE-EQUALS-KEY: the pick copies (a function of) the tied
    #     column itself, so any tied row yields the same value.
    "klio_spark/queries/advanced.py::q15_asof_join::last": VALUE_EQUALS_KEY
    + ": the filled value IS ts, the order key — tied click ts fill the "
    "same ts either way; _is_err sequences clicks before errors at "
    "equal ts",
    "klio_spark/queries/sketches.py::_mg_pivot_cte::sql_row_number": VALUE_EQUALS_KEY
    + ": the pivot picks the (k+1)-th largest count c, ordering by c — "
    "tied counts at the boundary pick the same c",
    "klio_spark/queries/behavior.py::q217_theil_sen_trend::row_number": VALUE_EQUALS_KEY
    + ": the median pick copies only slope, the leading order key; "
    "(xi, xj) is also unique per event_type (one series row per x, "
    "pairs are i.x < j.x)",
    "klio_spark/queries/behavior.py::q217_theil_sen_trend::sql_row_number": VALUE_EQUALS_KEY
    + ": same as the Spark side — slope is the picked value, (xi, xj) "
    "unique per event_type",
    # --- ordered fills whose order key embeds a per-partition version
    #     or aliased row id.
    "klio_spark/queries/behavior.py::q176_pit_scd2_join::last": "order "
    "(t, _tag, version): version rows (tag 0) are totally ordered by "
    "version (a per-user row_number); tag-1 click rows contribute NULL "
    "to the ignorenulls fill, so ties among clicks cannot change any "
    "output row",
    "klio_spark/queries/behavior.py::last_touch_attribution::last": ALIASED_ROW_ID
    + ": monolithic path orders by (s, event_id); segmented path's "
    "carry fold orders by seg, unique per (user, seg) after the "
    "groupBy, and the per-segment pick is max of a (s, event_id, ...) "
    "struct — composite with the row id",
    "klio_spark/queries/behavior.py::q202_attribution_position_based::row_number": ALIASED_ROW_ID
    + ": (st, tid) where tid aliases the touch's event_id (corpus-"
    "unique)",
    "klio_spark/queries/behavior.py::q202_attribution_position_based::sql_row_number": ALIASED_ROW_ID
    + ": (st, tid) where tid aliases the touch's event_id (corpus-"
    "unique)",
    # --- round-9 wave ---
    "klio_spark/queries/dataqual.py::q257_bh_fdr::row_number": UNIQUE_IN_PARTITION
    + ": source, the p-value table is GROUP BY source (one test per "
    "source); (p_r6, source) is total",
    "klio_spark/queries/dataqual.py::q257_bh_fdr::sql_row_number": UNIQUE_IN_PARTITION
    + ": source, the p-value table is GROUP BY source (one test per "
    "source); (p_r6, source) is total",
    "klio_spark/queries/textops.py::q255_suffix_span_dedup::row_number": UNIQUE_IN_PARTITION
    + ": pa within (id_a, id_b, diag) — one 8-gram per position, one "
    "diagonal per (pa, pb), so the pair join emits each (pa, diag) "
    "once",
    "klio_spark/queries/textops.py::q255_suffix_span_dedup::sql_row_number": UNIQUE_IN_PARTITION
    + ": pa within (id_a, id_b, diag) — one 8-gram per position, one "
    "diagonal per (pa, pb), so the pair join emits each (pa, diag) "
    "once",
}


def _scan_all():
    files = sorted(glob.glob(os.path.join(REPO, "klio_spark/queries/*.py")))
    files.append(os.path.join(REPO, "klio_spark/streaming/__init__.py"))
    sites = []
    for f in files:
        sites += tie_lint.scan_file(f, os.path.relpath(f, REPO))
    return sites


def test_unique_id_columns_really_are_unique():
    """The lint's auto-pass rests on these ids being corpus-unique —
    re-assert it against the actual parquet so a regenerated corpus
    can't silently invalidate the gate (the r8 lesson: composite
    business keys like (l_orderkey, l_linenumber) are NOT unique)."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    table_of = {
        "event_id": "events",
        "doc_id": "documents",
        "vec_id": "embeddings",
        "o_orderkey": "orders",
        "c_custkey": "customer",
        "p_partkey": "part",
        "s_suppkey": "supplier",
        "n_nationkey": "nation",
        "r_regionkey": "region",
    }
    assert set(table_of) == set(tie_lint.UNIQUE_IDS)
    con = duckdb.connect()
    for col, tbl in table_of.items():
        path = os.path.join(sf, f"{tbl}.parquet")
        n, d = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {col}) FROM '{path}'"
        ).fetchone()
        assert n == d, f"{col} is no longer unique in {tbl} ({n} vs {d})"


def test_every_tie_sensitive_site_is_total_or_allowed():
    sites = _scan_all()
    assert len(sites) > 50, "detector regressed — found almost nothing"
    unsafe = [s for s in sites if not s.total]
    missing = collections.defaultdict(list)
    for s in unsafe:
        k = tie_lint.site_key(s)
        if k not in ALLOWED:
            missing[k].append(f"{s.file}:{s.line} key=({s.key_text[:80]})")
    assert not missing, (
        "tie-sensitive sites without a totality argument — either add a "
        "unique-id tiebreaker to the ORDER BY (preferred) or an ALLOWED "
        f"entry stating why ties are impossible/harmless:\n"
        + "\n".join(f"  {k}: {v}" for k, v in missing.items())
    )


def test_allow_list_has_no_stale_entries():
    live = {tie_lint.site_key(s) for s in _scan_all() if not s.total}
    stale = set(ALLOWED) - live
    assert not stale, (
        "ALLOWED entries no longer matching any source site (site was "
        f"fixed or renamed — delete the entry): {sorted(stale)}"
    )


def test_detector_catches_a_planted_tie_bug(tmp_path):
    """End-to-end on the detector itself: the EXACT q09-shaped bug
    (max_by on a bare value column) and a bare row_number must both
    come back non-total; adding a unique-id tiebreaker flips them."""
    bad = tmp_path / "bad.py"
    bad.write_text(
        "def q(df):\n"
        "    import pyspark.sql.functions as F\n"
        "    from pyspark.sql import Window\n"
        "    w = Window.partitionBy('k').orderBy('price')\n"
        "    return df.agg(F.max_by('x', F.col('price'))), "
        "df.select(F.row_number().over(w))\n"
    )
    sites = tie_lint.scan_file(str(bad), "bad.py")
    kinds = {s.kind: s.total for s in sites}
    assert kinds == {"max_by": False, "row_number": False}

    good = tmp_path / "good.py"
    good.write_text(
        "def q(df):\n"
        "    import pyspark.sql.functions as F\n"
        "    from pyspark.sql import Window\n"
        "    w = Window.partitionBy('k').orderBy('price', 'event_id')\n"
        "    return df.select(F.row_number().over(w))\n"
    )
    (site,) = tie_lint.scan_file(str(good), "good.py")
    assert site.total


def test_sql_named_window_is_resolved(tmp_path):
    p = tmp_path / "sqlmod.py"
    p.write_text(
        'Q = """\n'
        "SELECT ROW_NUMBER() OVER w AS v FROM t\n"
        "WINDOW w AS (PARTITION BY k ORDER BY ts, event_id)\n"
        '"""\n'
    )
    (site,) = tie_lint.scan_file(str(p), "sqlmod.py")
    assert site.kind == "sql_row_number" and site.total


def test_sql_named_window_resolves_for_all_kinds(tmp_path):
    """ADVICE r9: NTILE over a named WINDOW clause must resolve the
    definition the same way ROW_NUMBER does — a unique-id key in the
    clause auto-passes; a tie-prone key stays flagged."""
    p = tmp_path / "sqlmod2.py"
    p.write_text(
        'Q = """\n'
        "SELECT NTILE(4) OVER w AS b FROM t\n"
        "WINDOW w AS (ORDER BY score, doc_id)\n"
        '"""\n'
        'Q2 = """\n'
        "SELECT NTILE(4) OVER w AS b FROM t\n"
        "WINDOW w AS (ORDER BY score)\n"
        '"""\n'
    )
    sites = tie_lint.scan_file(str(p), "sqlmod2.py")
    assert [s.total for s in sites if s.kind == "sql_ntile"] == [True, False]


def test_sql_inline_window_trailing_context_cannot_false_pass(tmp_path):
    """ADVICE r9 (converse): a unique id appearing INCIDENTALLY after
    an inline OVER(...) spec must not satisfy the totality check."""
    p = tmp_path / "sqlmod3.py"
    p.write_text(
        'Q = """\n'
        "SELECT ROW_NUMBER() OVER (ORDER BY score) AS r, doc_id\n"
        "FROM t JOIN d USING (doc_id)\n"
        '"""\n'
    )
    (site,) = tie_lint.scan_file(str(p), "sqlmod3.py")
    assert site.kind == "sql_row_number" and not site.total


def test_bare_aggregate_first_last_is_flagged(tmp_path):
    """ADVICE r9: a bare F.first(col) inside .agg(...) (no .over) is a
    partition-arbitrary pick — it must surface as a never-total site,
    while the same call chained through .over(w) reports exactly once
    (as the windowed site, not twice)."""
    p = tmp_path / "aggmod.py"
    p.write_text(
        "def q(df):\n"
        "    import pyspark.sql.functions as F\n"
        "    from pyspark.sql import Window\n"
        "    w = Window.partitionBy('k').orderBy('ts', 'event_id')\n"
        "    a = df.groupBy('k').agg(F.first('v').alias('x'))\n"
        "    b = df.select(F.last('v', ignorenulls=True).over(w))\n"
        "    c = df.first()\n"
        "    return a, b, c\n"
    )
    sites = tie_lint.scan_file(str(p), "aggmod.py")
    kinds = sorted((s.kind, s.total) for s in sites)
    assert kinds == [("first", False), ("last", True)]
