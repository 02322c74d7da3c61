"""SQL-callable text analysis — the `spark.sql` face of functions/text.py.

Registers the text operators as SQL-defined functions (Spark 4 `CREATE
TEMPORARY FUNCTION ... RETURN <expr>`), so a user who lives in
`spark.sql` / JDBC gets the same analysis surface the DataFrame API
exposes:

    >>> register_sql(spark)
    >>> spark.sql("SELECT quality_score(text) q FROM docs WHERE lang_id(text)='en'")

The bodies are pure SQL expressions — they inline into the calling
query's plan and run in whole-stage codegen exactly like the Column
versions (SQL UDFs are macros, not black boxes: filters over them still
push down).  Word lists and regex patterns are interpolated from the
SAME constants text.py uses, so the two surfaces cannot drift on data;
the expression shapes are locked to the Column versions by the
differential test in tests/test_text_functions.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from klio_spark.functions.text import (
    BPE_PATTERN,
    EN_STOPWORDS,
    LANG_MARKERS,
    PII_PATTERNS,
)


def _lit(pattern: str) -> str:
    """Render a Python string as a Spark SQL string literal."""
    return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(_lit(w) for w in words)


_TOKS = r"filter(split({src}, '\\s+'), _t -> _t <> '')"


def _sql_functions() -> dict[str, tuple[str, str, str]]:
    """name -> (params, return type, body expression)."""
    toks = _TOKS.format(src="t")
    ltoks = _TOKS.format(src="lower(t)")

    pairs = ", ".join(
        f"struct(size(filter({ltoks}, _t -> _t IN ({_in_list(words)}))) AS score, "
        f"{_lit(lang)} AS lang)"
        for lang, words in sorted(LANG_MARKERS.items())
    )
    lang_id = (
        f"CASE WHEN array_max(array({pairs})).score > 0 "
        f"THEN array_max(array({pairs})).lang ELSE 'en' END"
    )

    stop = f"size(filter({ltoks}, _t -> _t IN ({_in_list(EN_STOPWORDS)})))"
    punct = r"size(regexp_extract_all(t, '[^\\w\\s]', 0))"
    digit = "size(regexp_extract_all(t, '[0-9]', 0))"
    avg_len = (
        f"CASE WHEN size({toks}) > 0 THEN "
        f"aggregate({toks}, 0.0D, (_a, _t) -> _a + length(_t)) / size({toks}) "
        f"ELSE 0.0D END"
    )
    quality = (
        "greatest(0.0D, least(1.0D, 0.5D "
        f"+ 0.5D * (CASE WHEN size({toks}) > 0 THEN {stop} / size({toks}) ELSE 0.0D END) "
        f"- 0.5D * (CASE WHEN length(t) > 0 THEN {punct} / length(t) ELSE 0.0D END) "
        f"- 0.5D * (CASE WHEN length(t) > 0 THEN {digit} / length(t) ELSE 0.0D END) "
        f"- (CASE WHEN ({avg_len}) < 2.0D OR ({avg_len}) > 12.0D THEN 0.25D ELSE 0.0D END)))"
    )

    norm_toks = _TOKS.format(src=r"lower(regexp_replace(t, '[^\\w\\s]', ' '))")
    fingerprint = f"md5(concat_ws(' ', array_sort(array_distinct({norm_toks}))))"

    redact = "t"
    for _, pat, repl in PII_PATTERNS:
        redact = f"regexp_replace({redact}, {_lit(pat)}, {_lit(repl)})"

    fns = {
        "token_count": ("t STRING", "INT", r"size(regexp_extract_all(t, '\\S+', 0))"),
        "bpe_token_count": (
            "t STRING",
            "INT",
            f"size(regexp_extract_all(t, {_lit(BPE_PATTERN)}, 0))",
        ),
        "lang_id": ("t STRING", "STRING", lang_id),
        "quality_score": ("t STRING", "DOUBLE", quality),
        "fingerprint": ("t STRING", "STRING", fingerprint),
        "redact_pii": ("t STRING", "STRING", redact),
    }
    for name, pat, _ in PII_PATTERNS:
        fns[f"pii_count_{name}"] = (
            "t STRING",
            "INT",
            f"size(regexp_extract_all(t, {_lit(pat)}, 0))",
        )
    return fns


def register_sql(spark: SparkSession) -> list[str]:
    """Register every text operator as a temporary SQL function on this
    session; returns the registered names."""
    names = []
    for name, (params, rtype, body) in _sql_functions().items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {rtype} RETURN {body}"
        )
        names.append(name)
    return names
