"""Shared DuckDB oracle SQL fragments.

Registers nothing (safe to import from any query module without
perturbing registry order). The exact 3-gram shingler rule lives HERE
and only here — q65/q66/q106/q129 (textops), the clustering oracles
q85/q133 (training), and q87's source-carrying variant all verify
against this one definition via :func:`shingle_cte`, so a shingler-rule
change can never silently desynchronize one verifier from another.
"""


def shingle_cte(extra_cols: str = "") -> str:
    """The per-doc distinct 3-gram shingle CTE (``sh``).

    ``extra_cols`` passes additional grouping columns through (e.g.
    ``", source"``). The GREATEST(len-2, 1) clause is the short-doc
    rule: a doc with <3 tokens contributes its (padded) single shingle
    rather than vanishing — including the EMPTY doc, whose single
    shingle is '' (two empty docs are identical content and must pair
    at jaccard 1; Spark's shingler does this naturally, but DuckDB's
    array_to_string returns NULL for an empty list, hence the COALESCE).
    """
    return f"""sh AS (
      SELECT doc_id{extra_cols},
             list_distinct([COALESCE(array_to_string(toks[i:i+2], ' '), '')
                            FOR i IN range(1, GREATEST(len(toks) - 2, 1) + 1)]) AS shingles
      FROM (SELECT doc_id{extra_cols},
                   list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
            FROM documents)
    )"""


# the shingler + all-pairs intersection counts — the exact-Jaccard pair
# machinery every near-dup oracle builds on
SHINGLE_PAIRS_CTE = f"""{shingle_cte()},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             LEN(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS inter,
             LEN(a.shingles) AS na, LEN(b.shingles) AS nb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )"""
