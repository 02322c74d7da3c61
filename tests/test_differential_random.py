"""Randomized cross-engine differential tests.

The driver gate compares every declared query against its DuckDB oracle
on the FIXED synthetic corpus; these tests re-run that comparison on
randomly generated corpora that deliberately include the shapes the
fixed corpus lacks — empty documents, exact duplicates, single tokens,
unicode, token runs (documents); timestamp ties, out-of-order ids,
NULL timestamps, pre-anchor dates (events); zero vectors, duplicate
vectors, near-threshold perturbations (embeddings) — using the same
strict canon as tools/driver_check.py. A pass here means the oracle
twin captures the operator's semantics, not just its behavior on one
dataset. First run caught 9 real cross-engine hazards (empty-doc
array_to_string NULLs, NULL sort-order divergence, DuckDB integer-//
truncation, Spark's backward sequence()).
"""

import importlib.util
import os
import random

import duckdb
import pandas as pd
import pytest

from klio_spark.queries import all_queries

_spec = importlib.util.spec_from_file_location(
    "driver_check",
    os.path.join(os.path.dirname(__file__), "..", "tools", "driver_check.py"),
)
_dc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_dc)
canon_frame = _dc.canon_frame

WORDS = [
    "the", "a", "of", "value", "data", "system", "random", "und", "der",
    "la", "que", "alpha", "beta", "gamma", "Wörter", "naïve", "x1", "42",
]


def _random_corpus(seed: int, n_docs: int = 60) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    texts = []
    for i in range(n_docs):
        kind = rng.randrange(12)
        if kind == 0:
            text = ""  # empty doc
        elif kind == 1:
            text = rng.choice(WORDS)  # single token
        elif kind == 2 and texts:
            text = rng.choice(texts)  # exact duplicate of an earlier doc
        elif kind == 3:
            text = " ".join([rng.choice(WORDS)] * rng.randrange(5, 30))  # runs
        elif kind == 4:
            text = None  # NULL text
        elif kind == 5:
            # multi-line doc — the shape the fixed tables lack (no
            # newlines at any SF), exercising q210's line filter: proper
            # sentences, fragments, unterminated lines, EMPTY lines, and
            # quote/question terminators, in random order
            def _line(r=rng):
                style = r.randrange(5)
                ws = " ".join(r.choice(WORDS) for _ in range(r.randrange(3, 9)))
                if style == 0:
                    return ws + "."
                if style == 1:
                    return r.choice(WORDS)  # short fragment, dropped
                if style == 2:
                    return ws  # no terminal punctuation, dropped
                if style == 3:
                    return ""  # blank line
                return ws + r.choice(['?', '!', '"'])

            text = "\n".join(_line() for _ in range(rng.randrange(2, 7)))
        else:
            text = " ".join(
                rng.choice(WORDS) for _ in range(rng.randrange(3, 40))
            )
        if text is not None:
            texts.append(text)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": rng.choice(["en", "de", "es"]),
                "source": rng.choice(["web", "book", "code"]),
                # NULL text carries NULL n_chars (not a 0 coercion) —
                # the metadata shape that uncovers cross-engine NULL
                # sort-order divergence in median/rank queries (the
                # class q180's explicit NULL filter exists for)
                "n_chars": len(text) if text is not None else None,
            }
        )
    pdf = pd.DataFrame(rows)
    # nullable Int64 keeps the parquet column int64-with-nulls; plain
    # None would coerce the whole column to float64 and change the
    # SCHEMA under every consumer (a pandas artifact, not a data shape)
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    return pdf


# documents-only queries whose semantics the random corpus stresses
QUERIES = [
    "q60_token_stats",
    "q61_quality_features",
    "q62_lang_id",
    "q63_fingerprint",
    "q64_exact_dedup",
    "q65_ngram_jaccard_pairs",
    "q67_simhash_dedup",
    "q158_compaction_plan",
    "q132_simhash_portable",
    "q136_substring_dedup",
    "q137_span_corruption",
    "q138_vocab_coverage",
    "q141_bigram_lm_score",
    "q144_inverted_index_topk",
    "q150_length_outliers",
    "q151_shingle_containment",
    "q153_weighted_sample",
    "q156_token_entropy",
    # round-4 wave: normalization (NULL/unicode text), BPE pair scoring
    # (empty/single-char tokens), phrase adjacency (absent terms ->
    # must be empty on BOTH engines), MAD medians (EVEN group counts —
    # the interpolation-divergence class the order-statistic definition
    # exists to avoid)
    "q173_bpe_merge_scores",
    "q174_text_normalize",
    "q178_phrase_search",
    "q180_mad_outliers",
    # round-5: vocabulary growth (unicode lowercasing parity, empty/NULL
    # docs contribute no tokens, duplicate docs add no new vocabulary)
    "q182_vocab_growth",
    # round-5: shingle novelty (exact-duplicate docs contribute zero
    # novel shingles; NULL/empty docs share the '' shingle — first one
    # claims it; short-doc single-shingle rule)
    "q183_shingle_novelty",
    # round-5: source overlap (sources sharing only the '' shingle via
    # empty/NULL docs still pair; a-z source tie-break ordering)
    "q184_source_overlap_matrix",
    # round-5: cluster-safe split (exact-duplicate clusters must land
    # whole; straddling_pairs hash-proven 0 on adversarial dup corpora)
    "q185_cluster_safe_split",
    # round-5: iterative BPE (unicode char splitting 'Wörter'/'naïve',
    # single-char words contribute no pairs, digit-heavy tokens)
    "q186_bpe_train_rounds",
    # round-5: PMI collocations (token-run docs inflate n_ab; pmi ties
    # at the top-20 boundary break on word order both engines)
    "q187_pmi_collocations",
    # round-5: winnowing (exact-dup docs share ALL fingerprints;
    # token-run docs collapse to one gram hash; sub-3-token docs absent)
    "q188_winnowing_pairs",
    # round-5: TextRank (self-loop runs drop; single-token docs add no
    # edges; integer walk must be bit-identical on skewed word graphs)
    "q189_textrank_keywords",
    # round-5: Gini (count ties across the rank permutation must yield
    # the same sum; token-run docs spike concentration)
    "q190_lexical_gini",
    # round-6: temperature mixture (sqrt-of-int IEEE parity; sources
    # whose token mass ties must apportion the leftover identically)
    "q195_mixture_temperature",
    # round-6: distributed exact NTILE (dense n_tokens ties — empty and
    # single-token docs pile onto the same histogram cells, so the
    # prefix+row_number rank must replay the oracle's naive global sort)
    "q196_curriculum_phases",
    # round-6: k-anonymity (NULL n_chars is its own bucket — the engines
    # reach bucket -1 by different floor/truncate routes; random NULLs
    # and tiny groups stress both)
    "q200_k_anonymity",
    # round-7: BPE encode (duplicate docs double word weights without
    # changing the merge list; empty/single-char words encode to 0/1
    # tokens; n_tokens ties at the top-20 boundary break on doc_id)
    "q203_bpe_encode",
    # round-7: DSIR selection — this corpus has NO src0 docs, so the
    # EMPTY-target degradation (pure rarity score 1e6//(cnt_b)) must
    # agree; duplicate docs tie scores exactly at the top-20 boundary
    "q205_dsir_selection",
    # round-7: char coverage (count ties across the rank permutation;
    # the 99.9% boundary must land on the same rank both engines)
    "q206_char_coverage",
    # round-7: budget mixture (sources built from a TINY shared pool ->
    # dense ttr ties broken by source name; NULL/empty docs keep their
    # source in the table at src_tokens=0; boundary source takes the
    # exact remainder)
    "q207_budget_mixture",
    # round-7: repeat-epoch allocation (empty/NULL-doc sources hold a
    # zero-token row through all 4 epochs; boundary epoch takes the
    # exact remainder; the shift-not-multiply eff_tokens path)
    "q209_repeat_epochs",
    # round-7: line filter (multi-line docs with blank lines, fragments,
    # unterminated lines; empty survivor set must hash NULL on both
    # engines; reassembly is proven byte-exact via md5)
    "q210_line_filter",
    # round-7: fertility (NULL docs drop from all sums; a lang whose
    # docs are all empty hits the zero-token NULL guard on both
    # engines; decimal/HUGEINT ppm parity)
    "q211_tokenizer_fertility",
    # round-7: script mix (word corpus is latin+digit only, so the
    # detector must stay all-zero-mixed here; the unicode corpus below
    # is where the real mixtures live)
    "q216_script_mix",
    # round-7: padding waste (duplicate docs make dense length ties —
    # the histogram-prefix rank must replay the oracle's naive global
    # ROW_NUMBER exactly; sparse doc_ids make short arrival batches)
    "q219_padding_waste",
    # round-7: calibration ECE (NULL n_chars -> conf 0 in bin 0; the
    # synthetic label hash must bit-agree; sparse bins stress the
    # integer per-bin floors)
    "q222_calibration_ece",
    # round-7: ranking AUC (dense conf_ppm ties from duplicate lengths
    # — the histogram tie term pos_v*neg_v must replay the textbook
    # tie-averaged rank sum exactly; NULL n_chars pile onto conf 0)
    "q223_ranking_auc",
    # round-7: Cohen's kappa (the two raters' hash draws must bit-agree;
    # NULL n_chars force a=0 and a near-certain b=0 — the marginal-
    # product pe path on a skewed 2x2 table)
    "q224_cohen_kappa",
    # round-7: distinct-n diversity (duplicate docs depress distinct-2
    # without changing totals; sub-2-token docs contribute unigrams but
    # no bigrams -> the left-join NULL path; empty docs vanish from
    # both engines identically)
    "q225_distinct_ngrams",
    # round-7: PR sweep (random corpora leave MOST bins empty — the
    # threshold-spine left join must emit all 10 operating points with
    # identical cumulative sums; NULL n_chars pile predictions on t=0)
    "q229_pr_threshold_sweep",
    # round-7: quantile normalization (duplicate lengths make dense
    # score ties -> the mid-rank cross-multiplied comparisons must pick
    # identical global values; NULL n_chars pile a fat atom at conf 0;
    # NULL sources form their own group via the groupBy key)
    "q232_quantile_normalize",
    # round-7: vocab richness (tiny shared word pool -> almost no
    # singletons, n2-heavy histograms; token-run docs make degenerate
    # one-type sources; the n2=0 Chao1 correction path on both engines)
    "q234_vocab_richness",
    # round-7: dedup ROI (exact duplicates populate the size>=2 log2
    # buckets; NULL n_chars inside a cluster exercise the sum-max NULL
    # arithmetic identically; all-unique corpora collapse to bucket 0)
    "q235_dedup_roi",
    # round-7: truncation loss (random docs are all far below 512
    # tokens -> every limit row must read zero losses with identical
    # NULL-vs-0 ppm handling; token-run docs stress the counter)
    "q236_truncation_loss",
    # round-7: lang confusion (NULL-text docs must score all-zero and
    # default to 'en' on both engines; NULL declared langs are their
    # own matrix row; marker-free random words exercise the tie chain)
    "q237_lang_confusion",
    # round-7: mixture ESS (empty/NULL-text sources carry w=0 through
    # the quadratic sums; near-equal source masses push ESS/n toward
    # 1e6 — the floors must agree exactly at that boundary)
    "q238_mixture_ess",
    # round-7: Spearman (duplicate docs create massive rank TIES — the
    # midrank histogram must replay textbook tie-averaged ranks exactly;
    # NULL n_chars put a=0 atoms against nonzero token counts; length
    # and tokens are near-perfectly monotone so rho presses against 1
    # where float error would show first)
    "q239_spearman_rank_corr",
    # round-7: syndication (duplicate texts land in different random
    # sources -> nonzero cross-source cells, unlike the fixed corpus;
    # the distinct-before-join must collapse same-source repeats)
    "q245_syndication_matrix",
    # round-9: stratified min-sample (tiny random strata force the
    # minimum floor: n_kept = n_total when n < 15; md5-rank ties break
    # on doc_id)
    "q254_stratified_min_sample",
    # round-9: shared-span pairs (duplicate texts share FULL diagonals;
    # NULL/short docs contribute no 8-grams; the 2..8 frequency cap
    # drops the most-repeated boilerplate on both engines identically)
    "q255_suffix_span_dedup",
    # round-9: BH-FDR (NULL n_chars rows count as not-long on both
    # engines; 3 sources -> tiny m stresses the k/m thresholds; a
    # source with every doc long drives a degenerate-z NULL p)
    "q257_bh_fdr",
    # round-9: Fleiss kappa (negative doc_ids exercise the mod-2^31
    # pre-reduce sign convention on both engines)
    "q261_fleiss_kappa",
    # round-10: PII audit (NEGATIVE doc_ids drive negative-remainder
    # marker arithmetic — lpad of negative mods and % sign parity —
    # and the md5 checksum catches ANY redaction byte divergence)
    "q264_pii_audit",
    # round-10: packing planner (empty/NULL docs drop; single-token
    # docs land in fit_class 512; oversize docs only exist if a random
    # doc tops 512 tokens — either way both engines agree)
    "q265_packing_planner",
    # round-10: trigram LM (docs with <3 tokens drop; duplicate texts
    # double trigram counts without new types; NULL text contributes
    # nothing; the shared-form P_JM must floor identically)
    "q266_trigram_lm",
    # round-10: edit-distance verify (duplicate texts give lev=0 pairs
    # at sim 10000; near-dup mutations land mid-range; the 2..8 cap
    # must drop the most-repeated 8-grams identically)
    "q267_edit_distance_verify",
    # round-10: JS divergence (single-source corpora give JSD ~ 0 with
    # remainder ~ 0; tiny sources press the absent-token remainder
    # against the per-token floor error)
    "q270_js_divergence",
    # round-10: secret scan (random word salad must count ZERO in all
    # classes except injected markers; the charset-diversity screen
    # must agree on every >= 20-char token)
    "q271_secret_scan",
]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    out = []
    for seed in (11, 42):
        d = tmp_path_factory.mktemp(f"rnd{seed}")
        pdf = _random_corpus(seed)
        pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
        out.append(str(d))
    return out


@pytest.mark.parametrize("qname", QUERIES)
def test_random_corpus_matches_oracle(spark, corpora, qname):
    spec = all_queries()[qname]
    for sf_dir in corpora:
        got = canon_frame(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = canon_frame(con.execute(spec.sql).df())
        assert got == want, f"{qname} diverged on {sf_dir}"


def _random_events(
    seed: int, n: int = 400, base: int = 1_700_000_000_000_000
) -> pd.DataFrame:
    """Events with the adversarial shapes the fixed table lacks: exact
    timestamp TIES within a user (stresses deterministic window
    tie-breaks), out-of-order ids, a few NULL timestamps, and a skewed
    type mix. ``base`` is the corpus's epoch-micros anchor: the
    pre-epoch corpus anchors 6 days BEFORE 1970 so timestamps straddle
    epoch 0 — the regime where truncate-toward-zero `div` and the
    oracle's floor `//` disagree unless every epoch bucketing uses the
    year-1-shift floor-division convention (queries/behavior.py _SECS).
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # rare NULL user_id: stresses NULLS FIRST/LAST divergence at
        # top-k tie boundaries (q142/q143) and NULL group keys
        user = rng.randrange(12) if rng.randrange(40) else None
        if rng.randrange(50) == 0:
            ts = None
        else:
            # sub-second micros: whole-second timestamps would mask
            # truncate-vs-floor divergence in epoch-second bucketing
            ts = (
                base
                + rng.randrange(0, 14 * 24 * 3600) * 1_000_000
                + rng.randrange(1_000_000)
            )
            if rng.randrange(5) == 0 and rows:
                prev = rows[rng.randrange(len(rows))]
                ts = prev["_us"] if prev["_us"] is not None else ts  # tie
        etype = rng.choice(
            # signup/error joined the mix in round 9 (q258 Kaplan-Meier
            # needs signups, q260 nearest-join needs errors); the tests
            # are differential, so the corpus shift is safe by design
            ["view"] * 5 + ["click"] * 3
            + ["purchase", "refund", "signup", "error"]
        )
        # 'refund' value is ALWAYS NULL: an all-NULL SUM group probes the
        # coalesce-vs-NULL merge semantics (q147); other types go NULL
        # occasionally too
        value = (
            None
            if etype == "refund" or rng.randrange(60) == 0
            else round(rng.uniform(0, 100), 2)
        )
        rows.append(
            {
                "event_id": n - i,  # ids descend: storage order != time
                "_us": ts,
                "user_id": user,
                "event_type": etype,
                "value": value,
                "props": '{"k": %d}' % rng.randrange(5),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf.pop("_us"), unit="us")
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    return pdf


EVENT_QUERIES = [
    "q50_events_hourly",
    "q51_sessionization",
    "q52_events_json_props",
    "q53_tumbling_window_batch",
    # slow-marked (VERDICT r10 item 1): the randomized corpora make
    # q57's per-gap explode + the DuckDB recursive spine take ~3-5 min
    # — 9% of the whole suite for one param. q57 keeps driver-oracle
    # coverage (driver_check / the rotation window) in the default path.
    pytest.param("q57_gap_fill", marks=pytest.mark.slow),
    "q108_event_funnel",
    "q109_retention_cohorts",
    "q110_activity_runs",
    "q113_keep_latest",
    "q119_growth_accounting",
    "q120_sliding_window_counts",
    "q122_anomalous_hours",
    "q124_funnel_windowed",
    "q126_bounce_rate",
    "q139_psi_drift",
    "q142_time_decay_score",
    "q143_skew_profile",
    "q130_interval_join_batch",
    "q162_ks_drift",
    "q163_cusum_changepoint",
    "q145_scd2_intervals",
    "q146_rolling_distinct_hll",
    "q147_incremental_rollup",
    "q148_transition_matrix",
    "q149_dau_mau",
    "q154_time_weighted_avg",
    "q155_winsorize",
    # round-4 wave: PIT join (NULL values inside versions, ts ties),
    # EWMA lags (NULL value/ts skips, tie ordering), count-min build +
    # merge and the CM-filtered exact screen (NULL keys, sub-threshold
    # corpora -> empty on BOTH engines)
    "q176_pit_scd2_join",
    "q179_ewma_features",
    "q165_countmin_freq",
    "q166_countmin_merge",
    "q175_cm_filtered_heavy_keys",
    # round-5: batch Misra-Gries fold (NULL keys dropped identically;
    # skewed key counts force the pivot-subtract step; small corpora
    # leave some shard×chunk combinations empty — the fold and the
    # unrolled oracle CTEs must agree on every absent-chunk branch)
    "q181_misra_gries_heavy_hitters",
    # round-5: journey mining (ts ties within a user resolve by
    # event_id on both engines; top-20 boundary lexicographic breaks)
    "q191_event_paths",
    # round-5: life table (users with no 'view' drop; purchase-before-
    # view censors; day-boundary crossings must count identically —
    # sub-second timestamps straddling midnight probe datediff parity)
    "q193_conversion_lifetable",
    # round-6: interval union coverage (running-MAX islands; the dense
    # same-microsecond tie corpora are exactly its hazard — ROWS-frame
    # tie order must be pinned by event_id on both engines)
    "q198_interval_coverage",
    # round-6: last-touch attribution (LAST_VALUE IGNORE NULLS over the
    # pinned ROWS frame; purchase/touch same-microsecond ties, all-NULL
    # refund values, users with no prior touch -> 'direct')
    "q199_attribution_last_touch",
    # round-6: U-shaped multi-touch attribution (banded join vs the
    # oracle's naive non-equi join — pre-epoch anchors stress the
    # bucket floor-division; same-second tie rule at the join predicate;
    # largest-remainder bp splits must sum to 10000 per purchase)
    "q202_attribution_position_based",
    # round-7: lag autocorrelation (exact integer moments on the dense
    # spine; single-hour corpora leave zero lag pairs -> NULL r on both
    # engines; constant series hit the zero-variance guard; the DST /
    # far-future flavors stress the hour spine the same way q57 does)
    "q213_lag_autocorr",
    # round-7: Theil-Sen trend (pairwise-slope median on the day spine;
    # slope TIES are pervasive on flat random series, pinned by
    # (slope, xi, xj); single-day corpora emit NULL ts_slope)
    "q217_theil_sen_trend",
    # round-7: recency mix (far-future/pre-epoch anchors push every
    # other row onto the 89-day clamp floor; NULL ts drop; datediff
    # day-boundary semantics must agree across DST and pre-epoch dates)
    "q230_recency_weighted_mix",
    # round-7: burstiness (dense timestamp TIES make zero-gaps — the
    # (s, event_id) LAG order must break them identically; pre-epoch
    # corpora exercise the year-1-shift seconds; single-event users
    # contribute no gaps on either engine)
    "q241_burstiness",
    # round-7: churn labels (a far-future row drags the cutoff past the
    # whole corpus -> everyone churns; pre-epoch seconds; users whose
    # first event is inside the holdout drop via the n_before>0 gate)
    "q242_churn_labels",
    # round-7: seasonality (pre-epoch corpora are WHY the week-aligned
    # positive shift exists — trunc div vs floor // would split dow/hod
    # on negative seconds; DST-boundary corpora pin the UTC bucketing)
    "q243_seasonality_profile",
    # round-7: duplicate delivery (exact-microsecond TIES are gap 0 —
    # the strongest dup signal; NULL props must group null-safely as a
    # payload key; out-of-order ids break (us, event_id) ties)
    "q244_duplicate_delivery",
    # round-7: peak concurrency (timestamp TIES put starts and ends on
    # the same instant — the (t, delta, id) order must close-before-
    # open identically; pre-epoch day clamps exercise the shifted
    # floor; rank ties for the peak pick the earliest second)
    "q246_peak_concurrency",
    # round-7: cohort LTV (pre-epoch weeks via the aligned shift; NULL
    # value coalesces to 0 cents; a far-future row forms its own
    # cohort; negative event values floor toward -inf identically)
    "q248_cohort_ltv",
    # round-9: Mann-Whitney (tie groups are the WHOLE point — repeated
    # two-decimal values collide in cents; all-NULL refund values drop;
    # one-arm-empty corpora NULL the z on both engines)
    "q256_mann_whitney",
    # round-9: Kaplan-Meier (ties between event and censor at the same
    # day exercise the deaths-before-censors convention; users with no
    # signup vanish; pre-epoch anchors stress the div-vs-floor shift)
    "q258_kaplan_meier",
    # round-9: exact rolling distinct (pre-epoch days; NULL ts/user
    # filtered; duplicate (user, day) pairs must collapse BEFORE the
    # 7-day explode or counts inflate)
    "q259_rolling_exact_distinct",
    # round-9: nearest-tolerance join (identical-microsecond corpora
    # put clicks AT error timestamps -> delta 0 through the backward
    # frame; equidistant flanks tie to the earlier click on both
    # engines)
    "q260_asof_nearest_tolerance",
    # round-9: group-wise OLS (pre-epoch hours go NEGATIVE -> the
    # year-1 shift keeps div == floor; constant-y refund groups drop
    # to NULL slope via the degenerate guard... refund is all-NULL
    # value so it vanishes entirely; ties in x stress sxx exactness)
    "q262_groupwise_ols",
    # round-9: Page-Hinkley (timestamp ties order by event_id; negative
    # cents swing the running mean below zero — the FLOOR of the IEEE
    # division must agree on negatives, which the double-div form does)
    "q263_page_hinkley",
    # round-10: CUPED (pre-epoch anchors push the 14-day cutoff below
    # zero; users with no purchases give x = y = 0 — if EVERY user
    # does, the min=max guard must fall back identically; NULL users
    # and timestamps drop)
    "q268_cuped_adjustment",
    # round-10: chi-square cells (pre-epoch dow via the week-aligned
    # shift; rare types make 1-count cells where (O-E)^2/E is largest
    # relative to the 1e-9 floor; NULL ts/type filtered)
    "q269_chi_square_drift",
]


def _pathological_events(seed: int, flavor: str, n: int = 400) -> pd.DataFrame:
    """Round-6 adversarial timestamp corpora — the shapes _random_events
    only brushes (VERDICT r5 item 5):

    flavor='ties': DENSE timestamp collisions — per-user clusters of
    5-20 events at the IDENTICAL microsecond (every window tie-break
    must resolve by the documented secondary key on both engines), plus
    same-millisecond runs differing only in sub-ms micros (stresses any
    ms-truncation bucketing into fake ties).

    flavor='boundary': epochs where civil-time assumptions break —
    events packed around the 2026 US spring-forward (02:00→03:00 local,
    ~10:00 UTC), the fall-back repeated hour, the EU transition, and
    far-future rows in 2250 (epoch seconds > 2^33, still inside
    pandas datetime64[ns] range). Both engines bucket in UTC by
    session convention; any accidental local-time dependence in hour/
    day/week bucketing or datediff diverges exactly here.
    """
    rng = random.Random(seed)
    rows = []

    def emit(i, ts, user):
        etype = rng.choice(
            # signup/error joined the mix in round 9 (q258 Kaplan-Meier
            # needs signups, q260 nearest-join needs errors); the tests
            # are differential, so the corpus shift is safe by design
            ["view"] * 5 + ["click"] * 3
            + ["purchase", "refund", "signup", "error"]
        )
        value = (
            None
            if etype == "refund" or rng.randrange(60) == 0
            else round(rng.uniform(0, 100), 2)
        )
        rows.append(
            {
                "event_id": n - i,  # ids descend: storage order != time
                "_us": ts,
                "user_id": user,
                "event_type": etype,
                "value": value,
                "props": '{"k": %d}' % rng.randrange(5),
            }
        )

    base = 1_700_000_000_000_000
    if flavor == "ties":
        i = 0
        while i < n:
            user = rng.randrange(8) if rng.randrange(30) else None
            anchor = base + rng.randrange(0, 14 * 24 * 3600) * 1_000_000
            cluster = rng.randrange(5, 21)
            mode = rng.randrange(3)
            for j in range(min(cluster, n - i)):
                if mode == 0:
                    ts = anchor  # exact-microsecond tie
                elif mode == 1:
                    ts = anchor + j  # same-ms, distinct micros
                else:
                    ts = anchor + j * 1000  # same-second, distinct ms
                if rng.randrange(50) == 0:
                    ts = None
                emit(i, ts, user)
                i += 1
    else:
        # UTC instants of the 2026 civil-time edges + a far-future band
        anchors = [
            1_772_953_200_000_000,  # 2026-03-08 07:00 UTC (US spring fwd)
            1_793_512_800_000_000,  # 2026-11-01 06:00 UTC (US fall back)
            1_774_746_000_000_000,  # 2026-03-29 01:00 UTC (EU spring fwd)
            8_835_868_800_000_000,  # 2249-12-31 — far-future rows
        ]
        for i in range(n):
            user = rng.randrange(8) if rng.randrange(30) else None
            if rng.randrange(50) == 0:
                ts = None
            else:
                a = rng.choice(anchors)
                # pack within ±2h so day/hour buckets straddle the edge,
                # sub-second micros so truncate-vs-floor stays probed
                ts = (
                    a
                    + rng.randrange(-7200, 7200) * 1_000_000
                    + rng.randrange(1_000_000)
                )
            emit(i, ts, user)
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf.pop("_us"), unit="us")
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    return pdf


@pytest.fixture(scope="module")
def event_corpora(tmp_path_factory):
    out = []
    pre_epoch = -6 * 24 * 3600 * 1_000_000  # 1969-12-26, straddles 0
    for seed, base in ((5, 1_700_000_000_000_000),
                       (99, 1_700_000_000_000_000),
                       (7, pre_epoch)):
        d = tmp_path_factory.mktemp(f"ev{seed}")
        _random_events(seed, base=base).to_parquet(
            os.path.join(d, "events.parquet"), index=False
        )
        out.append(str(d))
    # round-6 pathological-timestamp corpora: every event query must be
    # hash-exact under dense ties and under DST/far-future boundaries
    for seed, flavor in ((13, "ties"), (17, "boundary")):
        d = tmp_path_factory.mktemp(f"ev{flavor}{seed}")
        _pathological_events(seed, flavor).to_parquet(
            os.path.join(d, "events.parquet"), index=False
        )
        out.append(str(d))
    return out


@pytest.mark.parametrize("qname", EVENT_QUERIES)
def test_random_events_match_oracle(spark, event_corpora, qname):
    spec = all_queries()[qname]
    for sf_dir in event_corpora:
        got = canon_frame(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'"
        )
        want = canon_frame(con.execute(spec.sql).df())
        assert got == want, f"{qname} diverged on {sf_dir}"


def _random_embeddings(seed: int, n: int = 80, dim: int = 16) -> pd.DataFrame:
    """Embeddings with a zero vector (cosine is engine-divergent below
    every registered threshold: Spark scores it 0, DuckDB -1 — both
    excluded), exact duplicates (cosine exactly 1.0), and near-duplicate
    perturbations around the 0.35 pair threshold."""
    rng = random.Random(seed)
    rows = []
    vecs = []
    for i in range(n):
        kind = rng.randrange(10)
        if i == 0:
            v = [0.0] * dim  # zero vector
        elif kind == 0 and vecs:
            v = list(rng.choice(vecs))  # exact duplicate
        elif kind == 1 and vecs:
            v = [x + rng.uniform(-0.01, 0.01) for x in rng.choice(vecs)]
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        vecs.append(v)
        rows.append(
            {
                "vec_id": i,
                "label": rng.choice(["a", "b", "c"]),
                "embedding": [float(x) for x in v],
            }
        )
    return pd.DataFrame(rows)


EMB_QUERIES = [
    "q72_embedding_near_dups",
    "q73_vector_norms_by_label",
    "q75_embedding_centroids",
    "q78_embedding_quantize",
    "q134_semantic_dedup",
    # label-type agnosticism: the random corpus uses STRING labels where
    # the driver corpus uses ints — q140's argmax accumulator must adapt
    "q140_kmeans_assign",
    "q157_int8_ann_topk",
    # full-scan ANN arms must tolerate the zero QUERY vector (all-tie
    # cosines -> neighbor_id order on both engines); pruned arms
    # (q71/q74) are deliberately absent — a zero query ties with the
    # whole corpus, so any bucket/list pruning legitimately returns a
    # different (equally-scored) top-k than the global referee
    "q70_ann_bruteforce_topk",
    # round-5: MMR greedy chain on quantized int dots (zero query vec
    # -> all-zero sims, pure neighbor_id order; duplicate vectors give
    # maximal diversity penalties that must tie-break identically)
    "q194_mmr_diverse_topk",
    # round-4 wave: Gram on dim-16 vectors incl. the zero vector and
    # exact duplicates; Lloyd on string-labeled, zero-vector corpora
    "q170_gram_matrix",
    "q171_power_iteration",
    "q172_lloyd_kmeans",
    # round-5: IVF-PQ at the exactness dial (oracle = brute force) over
    # a corpus with a zero vector, exact duplicates, and near-duplicate
    # cosine ties — probes the executor-side ADC gather + re-rank
    # tie-breaks after the query-collect removal
    "q168_ivfpq_topk",
    # round-6: filtered ANN (string labels again; the zero query vector
    # ties with its whole label stripe -> neighbor-id order)
    "q197_filtered_ann_topk",
    # round-7: MRL prefix recall on a dim-16 corpus — the 32-prefix
    # exceeds the vector length, so Spark's slice truncation and
    # DuckDB's NULL-skipping sum must converge on the same 16-dim dot;
    # zero/duplicate vectors force rank ties at the top-10 boundary
    "q204_mrl_prefix_recall",
    # round-7: diagonal Frechet (string labels; duplicate vectors give
    # zero-variance dims -> the GREATEST(0, var) clamp and sqrt(0) must
    # agree; the zero vector shifts one label's means only)
    "q212_embedding_frechet",
    # round-7: MaxSim late interaction (STRING min-label query entity;
    # dim-16 vectors hit the unequal-length common-prefix dot; the zero
    # vector zeroes one query slot's maxes; duplicate vectors tie MAX)
    "q220_maxsim_late_interaction",
    # round-7: RRF fusion (dim-16 corpus -> the 16-prefix arm EQUALS the
    # full arm, so every fused rank is a tie-heavy 2/(60+r) path; the
    # zero query vector ties all dots -> pure neighbor_id ranking; exact
    # duplicates force identical rrf_scores broken on neighbor_id)
    "q221_rrf_fusion",
    # round-7: hard negatives (string labels; the zero query vector ties
    # every negative at dot 0; duplicate vectors across labels create
    # negatives with margin 0; a query whose label covers no candidate
    # -> NULL best_pos -> NULL margins on both engines)
    "q226_hard_negative_mining",
    # round-7: retrieval metrics (string labels; zero/duplicate vectors
    # force dot ties at the @10 boundary -> identical integer DCG sums;
    # sparse labels exercise the min(n_rel,10) IDCG truncation and the
    # clamped element_at on both engines)
    "q227_retrieval_metrics",
    # round-7: split leakage (exact-duplicate vectors form guaranteed
    # near-dup pairs whose hash-split tags must agree bitwise; the zero
    # vector's cosine-0 guard keeps it out of the pair set identically;
    # the leaked-member CASE picks the test end deterministically)
    "q240_split_leakage",
]


@pytest.fixture(scope="module")
def emb_corpora(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = []
    for seed in (3, 77):
        d = tmp_path_factory.mktemp(f"emb{seed}")
        pdf = _random_embeddings(seed)
        # list<float> column, matching the driver-generated schema
        tbl = pa.table(
            {
                "vec_id": pa.array(pdf.vec_id, pa.int64()),
                "label": pa.array(pdf.label, pa.string()),
                "embedding": pa.array(
                    pdf.embedding.tolist(), pa.list_(pa.float32())
                ),
            }
        )
        pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        out.append(str(d))
    return out


@pytest.mark.parametrize("qname", EMB_QUERIES)
def test_random_embeddings_match_oracle(spark, emb_corpora, qname):
    spec = all_queries()[qname]
    for sf_dir in emb_corpora:
        got = canon_frame(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet'"
        )
        want = canon_frame(con.execute(spec.sql).df())
        assert got == want, f"{qname} diverged on {sf_dir}"


def _random_lineitem(seed: int, n_orders: int = 120) -> pd.DataFrame:
    """Lineitem with the shapes the fixed table lacks: NULL dimension
    values (a REAL NULL l_returnflag must stay distinguishable from a
    grouping-sets 'ALL' line — the grouping_id's whole job), NULL
    shipdates, single-item baskets (no co-purchase edges), repeated
    (order, part) rows, and price ties."""
    rng = random.Random(seed)
    rows = []
    for ok in range(n_orders):
        n_items = rng.choice([1, 1, 2, 2, 3, 4, 6])
        for ln in range(1, n_items + 1):
            ship = (
                None
                if rng.randrange(15) == 0
                else pd.Timestamp("2023-01-01")
                + pd.Timedelta(days=rng.randrange(0, 500))
            )
            rows.append(
                {
                    "l_orderkey": ok,
                    "l_partkey": rng.randrange(30),  # dense: graph forms
                    "l_suppkey": rng.randrange(10),
                    "l_linenumber": ln,
                    "l_quantity": float(rng.randrange(1, 10)),
                    "l_extendedprice": rng.choice(
                        # 0.005 floors to 0 cents: Benford's first-digit
                        # domain excludes it (q228's c >= 1 guard — an
                        # unguarded element_at(arr, 0) raises in Spark
                        # while DuckDB list[0] NULLs, ADVICE r7); other
                        # price floors must quantize it identically
                        [10.0, 10.0, 0.005, round(rng.uniform(1, 500), 2)]
                    ),
                    "l_discount": round(rng.uniform(0, 0.1), 2),
                    "l_tax": 0.05,
                    "l_returnflag": rng.choice(["A", "N", "R", None]),
                    "l_linestatus": rng.choice(["O", "F", None]),
                    "l_shipdate": ship,
                }
            )
    # duplicate (l_orderkey, l_linenumber) rows with DIFFERENT partkey/
    # shipdate — the driver's real testdata contains this shape, and it
    # broke q114's banded pair join (a distinct() on the composite
    # orderkey*16+linenumber id collapsed genuine row multiplicity the
    # naive oracle counts; caught by the 3x-amplified strict sweep).
    # Keep them joining the SAME part as an existing row so the banded
    # self-join actually pairs through a duplicated id.
    dups = []
    for r in rows[:: max(1, len(rows) // 12)]:
        d = dict(r)
        d["l_partkey"] = (r["l_partkey"] + 1) % 30
        d["l_extendedprice"] = round(rng.uniform(1, 500), 2)
        dups.append(d)
    rows.extend(dups)
    pdf = pd.DataFrame(rows)
    pdf["l_linenumber"] = pdf["l_linenumber"].astype("int32")
    # micros, not pandas-default nanos: Spark reads TIMESTAMP(NANOS)
    # parquet only under the nanosAsLong legacy flag (the fixed corpus
    # is micros; match it)
    pdf["l_shipdate"] = pdf["l_shipdate"].astype("datetime64[us]")
    return pdf


LINEITEM_QUERIES = [
    # NULL dims: a real NULL l_returnflag row must not merge with the
    # rollup 'ALL' line — gid keeps them apart on both engines
    "q177_grouping_sets",
    # single-item baskets (edge-free parts), dense repeat co-purchases
    "q169_bfs_khop",
    "q160_triangle_count",
    # price ties in the non-equi pair spread
    "q14_nonequi_self_join",
    "q128_weighted_median",
    # round-8: banded interval pair join — duplicated (orderkey,
    # linenumber) ids must keep their row multiplicity (the owning-
    # bucket rule; a distinct()-based bucket dedup collapsed them)
    "q114_interval_overlap_join",
    # round-5: association rules (single-item baskets form no pairs;
    # sub-support pairs drop on both engines; lift ties at the top-20
    # boundary break lexicographically)
    "q192_association_rules",
    # round-7: Benford audit (price ties concentrate one digit — the
    # ppm floors and the 9-row TVD window must agree on a skewed
    # histogram; sub-10 prices exercise the single-digit cents path)
    "q228_benford_audit",
    # round-7: revenue waterfall (the per-line FLOOR of price*discount
    # is where summing-then-discounting would diverge — dense 10.0
    # price ties and 2-decimal discounts pin the row-wise identity)
    "q249_revenue_waterfall",
    # round-7: basket dispersion (single-item-heavy baskets push the
    # index below 1e6; the one-expression integer variance must agree
    # on tiny n where (n-1) denominators bite)
    "q250_basket_dispersion",
    # round-7: HHI (10 dense suppliers -> shares near the uniform
    # floor; the floor-then-square convention must quantize identically)
    "q251_supplier_hhi",
    # round-7: Lorenz deciles (10 suppliers over 10 deciles -> one per
    # bucket, revenue TIES at the rank boundary pinned by suppkey; the
    # cumulative decimal floor-div must agree at every step)
    "q252_lorenz_deciles",
]


@pytest.fixture(scope="module")
def lineitem_corpora(tmp_path_factory):
    out = []
    for seed in (3, 77):
        d = tmp_path_factory.mktemp(f"li{seed}")
        _random_lineitem(seed).to_parquet(
            os.path.join(d, "lineitem.parquet"), index=False
        )
        out.append(str(d))
    return out


@pytest.mark.parametrize("qname", LINEITEM_QUERIES)
def test_random_lineitem_matches_oracle(spark, lineitem_corpora, qname):
    spec = all_queries()[qname]
    for sf_dir in lineitem_corpora:
        got = canon_frame(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"'{sf_dir}/lineitem.parquet'"
        )
        want = canon_frame(con.execute(spec.sql).df())
        assert got == want, f"{qname} diverged on {sf_dir}"


def _random_basket(seed: int, n_orders: int = 300) -> pd.DataFrame:
    """Random basket corpus — the modality the suites lacked until
    round 6 (basket/graph queries fuzzed only on the fixed corpus):
    singleton orders, duplicate (order, part) lines (quantity
    re-ordered on a second line — DISTINCT semantics must collapse
    them), one deliberately hot ~40-part basket, a hot part present in
    ~10% of orders (a hot graph node), sparse part ids with gaps, and
    same-day ship-date ties."""
    rng = random.Random(seed)
    rows = []
    ln = 0
    hot_part = 7
    base_day = 1_500_000_000  # epoch seconds anchor
    for ok in range(1, n_orders + 1):
        if ok == 50:
            basket = rng.sample(range(1, 400), 40)  # the hot basket
        else:
            k = rng.choice([1, 1, 2, 2, 3, 3, 4, 5])
            basket = [rng.randrange(1, 400) for _ in range(k)]
        if rng.randrange(10) == 0:
            basket.append(hot_part)
        for p in basket:
            ln += 1
            rows.append(
                {
                    "l_orderkey": ok,
                    "l_partkey": p,
                    "l_suppkey": rng.randrange(1, 20),
                    "l_linenumber": ln % 16,
                    "l_quantity": float(rng.randrange(1, 50)),
                    "l_extendedprice": round(rng.uniform(10, 5000), 2),
                    "l_discount": round(rng.uniform(0, 0.1), 2),
                    "l_tax": round(rng.uniform(0, 0.08), 2),
                    "l_returnflag": rng.choice(["A", "N", "R"]),
                    "l_linestatus": rng.choice(["O", "F"]),
                    "_ship_s": base_day
                    + rng.randrange(0, 365) * 86400
                    + rng.randrange(3) * 3600,  # day ties
                }
            )
            if rng.randrange(12) == 0:  # duplicate (order, part) line
                dup = dict(rows[-1])
                ln += 1
                dup["l_linenumber"] = ln % 16
                dup["l_quantity"] = float(rng.randrange(1, 50))
                rows.append(dup)
    pdf = pd.DataFrame(rows)
    pdf["l_shipdate"] = pd.to_datetime(pdf.pop("_ship_s"), unit="s")
    return pdf


# lineitem-based basket/graph/interval queries: DISTINCT collapse of
# duplicate lines, the hot basket's clique, the hot part's degree, and
# integer tie-breaks at top-k boundaries must agree across engines
BASKET_QUERIES = [
    "q114_interval_overlap_join",
    "q125_copurchase_pairs",
    "q152_pagerank",
    "q160_triangle_count",
    "q169_bfs_khop",
    "q192_association_rules",
    "q201_apriori_triples",
    # round-7: common-neighbor link prediction (the 480-part hot basket
    # makes one center's adjacency dense — the top-32 truncation and
    # its (w desc, nb) tie rule must pick identical neighbor sets on
    # both engines; weight ties are pervasive on random baskets)
    "q214_common_neighbors",
    # round-7: k-core peel (the relative k = mean-degree+1 must compute
    # identically; rounds that peel to an EMPTY graph still emit rows
    # with zero counts on both engines)
    "q215_k_core",
]


@pytest.fixture(scope="module")
def basket_corpora(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    out = []
    for seed in (21, 77):
        d = tmp_path_factory.mktemp(f"bk{seed}")
        # micros, not pandas' default nanos: the session-wide
        # nanosAsLong flag would turn a TIMESTAMP(NANOS) l_shipdate
        # into a BIGINT on the Spark side only
        pa_pq.write_table(
            pa.Table.from_pandas(_random_basket(seed)),
            os.path.join(d, "lineitem.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        out.append(str(d))
    return out


@pytest.mark.parametrize("qname", BASKET_QUERIES)
def test_random_basket_matches_oracle(spark, basket_corpora, qname):
    spec = all_queries()[qname]
    for sf_dir in basket_corpora:
        got = canon_frame(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"'{sf_dir}/lineitem.parquet'"
        )
        want = canon_frame(con.execute(spec.sql).df())
        assert got == want, f"{qname} diverged on {sf_dir}"


# ---- round 7: unicode-pathology corpus (VERDICT r6 item 5) ----------
#
# The standard random corpus has accented words but no combining marks,
# zero-width/control characters, or astral-plane codepoints. Probed
# divergence surface (recorded in BASELINE.md round 7): JVM lower()
# implements Unicode FULL + CONTEXTUAL case mapping while DuckDB's
# utf8proc lower() is SIMPLE codepoint-wise — they disagree on exactly
# TWO inputs: U+0130 İ (JVM: 'i'+U+0307, growing the string; DuckDB:
# 'i') and capital Σ (JVM: contextual final-sigma ς at word end;
# DuckDB: σ always). EVERYTHING else agrees: NFC vs NFD (neither
# engine normalizes — composed and decomposed 'café' are distinct
# words with different lengths on BOTH sides), combining marks,
# zero-width space/joiner, control chars, astral-plane emoji / math
# letters / CJK-extension codepoints, NBSP (not \\s in Java OR RE2),
# ligatures (ﬁ lowers to itself, ǅ→ǆ), ẞ→ß, and split('') iterates
# CODEPOINTS (never bytes or surrogate halves) on both engines. The
# corpus therefore includes every agreeing pathology and EXCLUDES the
# two divergent characters; test_unicode_lower_contract pins that
# boundary so an engine upgrade that moves it fails loudly.

UNICODE_WORDS = [
    # NFC/NFD twins — distinct words, distinct lengths, both engines
    "café", "café", "über", "über",
    # leading combining marks / bare marks
    "́abc", "́́",
    # zero-width space / joiner inside a word (not whitespace in
    # either engine's \\s)
    "ab​cd", "a‍b",
    # astral plane: emoji, mathematical alphanumerics, CJK ext B
    "\U0001F600\U0001F680", "\U0001D54F\U0001D54E", "\U00020000\U00020001",
    # NBSP joins — one token on both engines
    "a b",
    # control characters inside tokens
    "x\x01y", "z\x7f",
    # ligatures and titlecase digraphs
    "ﬁle", "ǅungla",
    # case-mapped but NON-contextual scripts: German, Cyrillic, Greek
    # lowercase (capital Σ excluded — the contextual divergence)
    "straße", "ẞHEAVY", "Привет",
    "σοφος", "ÅNGSTRÖM",
    # Turkish lowercase dotless ı (İ excluded — the full-map divergence)
    "ıstanbul", "DaTa", "THE", "42",
]


def _random_unicode_corpus(seed: int, n_docs: int = 50) -> pd.DataFrame:
    rng = random.Random(seed)
    rows, texts = [], []
    for i in range(n_docs):
        kind = rng.randrange(10)
        if kind == 0:
            text = ""
        elif kind == 1:
            text = rng.choice(UNICODE_WORDS)  # single pathological token
        elif kind == 2 and texts:
            text = rng.choice(texts)  # exact duplicate
        elif kind == 3:
            text = None
        elif kind == 4:
            # token runs of one pathological word
            text = " ".join([rng.choice(UNICODE_WORDS)] * rng.randrange(4, 20))
        else:
            text = " ".join(
                rng.choice(UNICODE_WORDS) for _ in range(rng.randrange(3, 30))
            )
        if text is not None:
            texts.append(text)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": rng.choice(["en", "de", "el"]),
                "source": rng.choice(["web", "book"]),
                "n_chars": len(text) if text is not None else None,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    return pdf


# the text family over documents — tokenization, casefolding, character
# splitting, hashing, shingling, and BPE all touch the raw codepoints
UNICODE_QUERIES = [
    "q60_token_stats",
    "q61_quality_features",
    "q62_lang_id",
    "q63_fingerprint",
    "q64_exact_dedup",
    "q156_token_entropy",
    "q174_text_normalize",
    "q182_vocab_growth",
    "q183_shingle_novelty",
    "q184_source_overlap_matrix",
    "q186_bpe_train_rounds",
    "q187_pmi_collocations",
    "q188_winnowing_pairs",
    "q189_textrank_keywords",
    "q190_lexical_gini",
    "q203_bpe_encode",
    # char coverage IS a codepoint-split op — astral/combining/zero-
    # width chars are first-class alphabet entries on both engines
    "q206_char_coverage",
    # round-7: fertility splits by ASCII regexp classes, so every
    # non-ASCII codepoint (astral, combining, ZWSP) must count as ONE
    # punctuation-class pre-token on both engines; LENGTH must agree
    # on codepoints (never surrogate halves)
    "q211_tokenizer_fertility",
    # round-7: script mix on REAL mixed-script docs — Cyrillic/Greek/
    # CJK/astral mixtures; literal-range classes must count identical
    # codepoint sets in Java regex and RE2
    "q216_script_mix",
    # round-7: distinct-n (whitespace tokens carrying astral/combining/
    # zero-width codepoints must compare equal as DISTINCT keys on both
    # engines — grapheme-vs-codepoint equality never enters, but the
    # lower() parity and the ' '-joined bigram key must bit-agree)
    "q225_distinct_ngrams",
    # round-10: PII audit on unicode text — \\b and \\d must stay
    # ASCII-classed in BOTH Java regex (no UNICODE_CHARACTER_CLASS)
    # and RE2; markers adjacent to astral/combining codepoints must
    # match identically, and the md5 checksum of the redacted unicode
    # bytes is the strictest possible referee
    "q264_pii_audit",
    # round-10: secret scan on unicode text — the charset-diversity
    # screen splits by CODEPOINT on both engines (never surrogate
    # halves), so astral-bearing long tokens count identical distinct
    # sets
    "q271_secret_scan",
]


@pytest.fixture(scope="module")
def unicode_corpora(tmp_path_factory):
    out = []
    for seed in (13, 99):
        d = tmp_path_factory.mktemp(f"uni{seed}")
        _random_unicode_corpus(seed).to_parquet(
            os.path.join(d, "documents.parquet"), index=False
        )
        out.append(str(d))
    return out


@pytest.mark.parametrize("qname", UNICODE_QUERIES)
def test_random_unicode_matches_oracle(spark, unicode_corpora, qname):
    spec = all_queries()[qname]
    for sf_dir in unicode_corpora:
        got = canon_frame(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = canon_frame(con.execute(spec.sql).df())
        assert got == want, f"{qname} diverged on {sf_dir}"


def test_unicode_lower_contract(spark):
    """Pins the casefolding divergence boundary: every UNICODE_WORDS
    entry lowercases IDENTICALLY on both engines, and the two excluded
    characters are genuinely divergent (JVM full/contextual mapping vs
    utf8proc simple mapping) — so the corpus's exclusion list is
    exactly the real divergence set, no wider."""
    from pyspark.sql import functions as F

    included = UNICODE_WORDS
    divergent = ["İstanbul", "ΣΟΦΟΣ"]
    df = spark.createDataFrame(
        [(w,) for w in included + divergent], "w string"
    )
    s = {r.w: r.lo for r in df.select("w", F.lower("w").alias("lo")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(w VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?)", [(w,) for w in included + divergent]
    )
    d = dict(con.execute("SELECT w, lower(w) FROM t").fetchall())
    for w in included:
        assert s[w] == d[w], (w, s[w], d[w])
    for w in divergent:
        assert s[w] != d[w], f"divergence healed — corpus may include {w!r}"
    # the exact documented shapes
    assert s["İstanbul"] == "i̇stanbul"
    assert d["İstanbul"] == "istanbul"
    assert s["ΣΟΦΟΣ"].endswith("ς")
    assert d["ΣΟΦΟΣ"].endswith("σ")


# ---- round 7: random customer/orders corpus (q231/q233/q117) --------


def _random_customer_orders(seed: int, n_cust: int = 80):
    """Customer + orders with the shapes the fixed tables lack: NULL
    and NEGATIVE account balances, an entire ZERO-VARIANCE segment
    (every balance identical -> Neyman weight exactly 0), balance ties,
    customers with no orders, ORPHAN orders (custkey matching no
    customer -> the left join drops them from per-customer spend), and
    totalprice values at the floor(x*100) representation boundary."""
    rng = random.Random(seed)
    cust, orders = [], []
    segs = ["AUTO", "BUILD", "FLAT", "ZERO"]
    for k in range(n_cust):
        seg = rng.choice(segs)
        if seg == "ZERO":
            bal = 777.77  # zero-variance stratum
        else:
            r = rng.randrange(10)
            bal = (
                None
                if r == 0
                else (-round(rng.uniform(0, 999.99), 2) if r == 1
                      else round(rng.uniform(0, 9999.99), 2))
            )
        cust.append(
            {
                "c_custkey": k,
                "c_name": f"cust{k}",
                "c_nationkey": rng.randrange(5),
                "c_acctbal": bal,
                "c_mktsegment": seg,
            }
        )
        for _ in range(rng.choice([0, 0, 1, 1, 2, 3])):
            orders.append(k)
    rows = []
    for i, ck in enumerate(orders):
        if rng.randrange(12) == 0:
            ck = n_cust + rng.randrange(10)  # orphan order
        rows.append(
            {
                "o_orderkey": i,
                "o_custkey": ck,
                "o_orderstatus": rng.choice(["O", "F", "P"]),
                # include prices like 19.99 and x.005 boundary shapes
                "o_totalprice": rng.choice(
                    [19.99, 0.07, round(rng.uniform(1, 99999), 2)]
                ),
                "o_orderdate": pd.Timestamp("2024-01-01")
                + pd.Timedelta(days=rng.randrange(365)),
                "o_orderpriority": "1-URGENT",
            }
        )
    c = pd.DataFrame(cust)
    c["c_acctbal"] = c["c_acctbal"].astype("float64")
    c["c_nationkey"] = c["c_nationkey"].astype("int32")
    o = pd.DataFrame(rows)
    o["o_orderdate"] = o["o_orderdate"].astype("datetime64[us]")
    return c, o


CUSTOMER_QUERIES = [
    # q117: arms by custkey parity; orphan orders drop via the left
    # join; customers with zero orders count as non-converted
    "q117_ab_experiment",
    # q231: NULL/zero-weight replicates cannot occur here (both parity
    # arms populated), but boundary prices stress the exact-cents sums
    # and the deterministic Poisson draws must bit-agree per (k, b)
    "q231_bootstrap_ci",
    # q233: NULL balances filtered; the ZERO segment's variance is
    # exactly 0 -> nsd_floor 0 -> zero Neyman share but nonzero
    # proportional share; negative balances square positively
    "q233_neyman_allocation",
    # q247: random order fan-out can leave an arm all-converted or
    # all-unconverted -> the pooled-z degenerate guard must NULL on
    # both engines; the Wilson literals must bit-agree
    "q247_ab_significance",
    # round-8: arg_max/arg_min — the repeated 19.99/0.07 prices tie
    # WITHIN a customer, so a bare arg_max(orderkey, price) is engine-
    # arbitrary (caught by the 3x-amplified sweep); the composite
    # (cents, orderkey) key must pin the winner identically
    "q09_arg_min_max",
    # round-9: distinct-count view maintenance (orphan orders drop via
    # the inner join; a customer whose ONLY order has orderkey%17=0
    # must leave the distinct count — the non-abelian step; zero-order
    # customers never enter the support table)
    "q253_incremental_distinct_view",
]


@pytest.fixture(scope="module")
def customer_corpora(tmp_path_factory):
    out = []
    for seed in (21, 63):
        d = tmp_path_factory.mktemp(f"cust{seed}")
        c, o = _random_customer_orders(seed)
        c.to_parquet(os.path.join(d, "customer.parquet"), index=False)
        o.to_parquet(os.path.join(d, "orders.parquet"), index=False)
        out.append(str(d))
    return out


@pytest.mark.parametrize("qname", CUSTOMER_QUERIES)
def test_random_customer_matches_oracle(spark, customer_corpora, qname):
    spec = all_queries()[qname]
    for sf_dir in customer_corpora:
        got = canon_frame(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        for t in ("customer", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        want = canon_frame(con.execute(spec.sql).df())
        assert got == want, f"{qname} diverged on {sf_dir}"
