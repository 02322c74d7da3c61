"""Text-analysis operators for LLM-data pipelines — pure Spark expressions.

Language-ID, quality scoring, token counting, and document fingerprinting,
all as Catalyst expressions (no Python in the hot path) so they run inside
whole-stage codegen over 100 TB of documents. Each has an exact ANSI-SQL
twin in klio_spark.queries for the DuckDB differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword heuristic. The score is
# deterministic token membership, so the operator is exactly reproducible in
# any SQL engine (the oracle requirement) — swap in real profiles for prod.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "value"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "et", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

EN_STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty tokens removed)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """#non-whitespace runs — the whitespace tokenizer's length."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), 0))


# BPE-ish pre-tokenizer classes (GPT-2-style split, simplified to RE2-safe
# classes so the identical pattern runs in Spark's codegen AND the DuckDB
# oracle): letter runs, digit runs, single non-space-non-alnum marks.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE pre-token count — the letters/digits/punctuation
    split every byte-pair tokenizer applies before merges. Counts the
    units a real tokenizer would start from (so it upper-bounds and
    tracks token counts far better than whitespace splitting on
    punctuation-heavy or code text); runs in whole-stage codegen."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


def _member_count(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of marker-token hits ('en' on ties/zero).

    Deterministic tie-break: higher score wins; on ties the
    lexicographically greatest language code (struct comparison order of
    array_max) — replicated as a CASE chain in the SQL oracle.
    """
    toks = tokens(F.lower(text))
    pairs = F.array(
        *[
            F.struct(
                _member_count(toks, words).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("en"))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features (length / punctuation / stopword ratios).

    Returns named expressions; callers select the ones they need so unused
    features are pruned by Catalyst.
    """
    toks = tokens(text)
    n_chars = F.length(text)
    n_toks = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    n_digit = F.size(F.regexp_extract_all(text, F.lit(r"[0-9]"), 0))
    n_stop = _member_count(tokens(F.lower(text)), EN_STOPWORDS)
    avg_tok_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
        / n_toks,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "avg_token_len": avg_tok_len,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0),
        "digit_ratio": F.when(n_chars > 0, n_digit / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_toks > 0, n_stop / n_toks).otherwise(0.0),
    }


def quality_score(text: Column) -> Column:
    """Scalar [0,1] quality score: stopword presence up, digits/punct down,
    degenerate token lengths down. Heuristic shaped after C4/Gopher-style
    rules; weights are arbitrary but fixed (oracle-reproducible)."""
    f = quality_features(text)
    raw = (
        F.lit(0.5)
        + 0.5 * f["stopword_ratio"]
        - 0.5 * f["punct_ratio"]
        - 0.5 * f["digit_ratio"]
        - F.when(
            (f["avg_token_len"] < 2.0) | (f["avg_token_len"] > 12.0), 0.25
        ).otherwise(0.0)
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    lowercase token set (word-level MinHash degenerate case; near-free and
    catches shuffled/duplicated-content copies exact dedup misses)."""
    norm = F.array_sort(
        F.array_distinct(tokens(F.lower(F.regexp_replace(text, r"[^\w\s]", " "))))
    )
    return F.md5(F.concat_ws(" ", norm))


# PII patterns, applied in this order (email before phone so a digit run
# inside a local-part is consumed as email first; SSN before phone so
# ddd-dd-dddd is not half-eaten by the phone pattern). Every pattern is
# RE2-safe — identical semantics under Java regex (Spark codegen) and
# RE2 (the DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence count per PII class (leftmost non-overlapping matches —
    the count regexp_replace would substitute). Pure codegen."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its class tag (<EMAIL>, <IP>, <SSN>,
    <PHONE>), in PII_PATTERNS order. The scrub every training-data
    pipeline runs before text leaves quarantine; all JVM-side regexp —
    no Python, no shuffle, runs inside whole-stage codegen."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
