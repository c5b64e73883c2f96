"""Declared query inventory (SURVEY.md §2.3 Q01–Q30 + §2.7 extensions).

Each query is registered with:
- a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` written
  DataFrame-first (Catalyst plans the physical execution), and
- an equivalent ANSI-SQL ``oracle`` string DuckDB runs on the same parquet
  tables (driver correctness gate), or ``None`` for ops whose semantics are
  not SQL-expressible (driver then records a rows-only check).

Column names/aliases are kept identical between the Spark result and the
oracle; computed integers are cast to BIGINT on both sides and unstable
float aggregates are rounded identically, because the driver hash-compares
values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the inventory."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# The external correctness driver checks the FIRST 50 registered queries
# (insertion order of this dict).  Order therefore encodes evidence need,
# not theme: queries that have never / only stale-ly received a driver row
# come right after the core, and the clip falls on queries that are already
# driver-green in multiple rounds (listed in ``_CLIP_LAST``).
# Round-7 rotation: the 35-query cohort whose newest driver row is r4
# (two rounds stale after being clipped in r5 AND r6 — including q57/q58,
# twice-deferred) takes the window, followed by q72/q73 (newest row r5)
# and q82/q83 (single-green r6, need a second row).  New round-7 queries
# register outside both lists and land at the head automatically.
#
# ROUND-8 ROTATION PLAN (the standing rule: no query's newest driver row
# older than two rounds): after r7 the 48 r5+r6-green queries in
# _CLIP_LAST below will have r6 as their newest row — in r8 they MUST
# take the window, and q95/q96 (registered late in r7, never
# driver-attested, parked in _CLIP_LAST to keep the committed r7 window
# intact) take the two spare slots: 48 + 2 = exactly 50.
#
# ROUND-9 PLAN: candidates are q97/q98/q99 (never driver-attested —
# highest priority), the 11 r7 additions q84–q94 and the 39-query r7
# evidence cohort (newest row r7, two rounds stale by r9) — 53 for 50
# slots. With 103 queries and a 50-slot window, "no older than two
# rounds" can no longer hold for every query (103 > 2x50); the overflow
# rule is: clip the entries with the DEEPEST multi-round green history
# (the r4-cohort core-SQL trio q03/q05/q06 has r4+r7 rows plus judge
# selfchecks every round) and list them explicitly at rotation time so
# the deferral is visible, never implicit.
_EVIDENCE_FIRST = [
    # newest driver row r4 — 35 queries, the whole stale cohort:
    "q03_group_aggregate",
    "q05_tpch_q1",
    "q06_inner_join",
    "q07_broadcast_join",
    "q08_outer_join",
    "q09_semi_anti_join",
    "q10_cross_theta_join",
    "q11_tpch_q3",
    "q12d_unpivot",
    "q13_window_rank",
    "q14_window_analytic",
    "q15_topk_per_group",
    "q16_global_topk",
    "q26_distinct_percentiles",
    "q26b_approx_aggregates",
    "q28_insert_delta",
    "q29_rebuild",
    "q30_streaming_load_dedup",
    "q41_multimodal_features",
    "q43_asof_join",
    "q44_tumbling_window",
    "q45_sliding_window",
    "q46_salted_aggregate",
    "q47_salted_join",
    "q48_ngram_jaccard_neardup",
    "q49_ann_ivf",
    "q50_dedup_clusters",
    "q51_contamination",
    "q52_stratified_sample",
    "q53_boilerplate_ngrams",
    "q54_sequence_packing",
    "q55_sessionization",
    "q56_pii_redaction",
    "q57_quality_repetition",
    "q58_doc_top_word",
    # newest driver row r5 (clipped r6 by the q82/q83 additions):
    "q72_snapshot_diff",
    "q73_pmi_collocations",
    # single-green (first rows r6) — second consecutive row:
    "q82_incremental_neardup",
    "q83_hashed_ngram_classifier",
]

# Explicitly demoted to the tail (absorb the driver's >50 clip): every
# entry is r5+r6 double-green on the driver (48 queries).
_CLIP_LAST = [
    "q01_scan_projection",
    "q02_filter_predicates",
    "q04_global_aggregate",
    "q12_rollup",
    "q12b_cube",
    "q12c_pivot",
    "q17_set_ops",
    "q18_subqueries",
    "q19_case_coalesce_cast",
    "q20_string_functions",
    "q21_datetime_functions",
    "q22_math_functions",
    "q23_array_functions",
    "q24_map_functions",
    "q25_json_functions",
    "q27_distinct",
    "q31_dedup_exact",
    "q32_minhash_signatures",
    "q33_minhash_lsh_pairs",
    "q34_simhash",
    "q35_cosine_topk",
    "q36_ann_lsh_bucketed",
    "q37_language_id",
    "q38_token_stats",
    "q39_quality_score",
    "q40_fingerprint",
    "q42_embedding_neardup",
    "q59_source_overlap",
    "q60_bm25_retrieval",
    "q61_dedup_best_of_cluster",
    "q62_domain_caps",
    "q63_char_entropy",
    "q64_doc_chunking",
    "q65_corpus_report",
    "q66_interval_join",
    "q67_incremental_dedup",
    "q68_embedding_clusters",
    "q69_ngram_novelty",
    "q70_length_histogram",
    "q71_language_label_audit",
    "q74_duplicate_spans",
    "q75_lm_perplexity",
    "q76_url_canonical_dedup",
    "q77_semantic_dedup",
    "q78_span_coverage",
    "q79_winnowing_fingerprints",
    "q80_curation_verdicts",
    "q81_zipf_fit",
    # new post-r7-window (no driver row yet; first row r8, see plan above):
    "q95_bpe_merges",
    "q96_semantic_decontamination",
    # later post-window additions: first driver rows r8/r9 as slots allow
    # (the r8 window is full at 48 clip-cohort + q95/q96; these follow in
    # the r9 rotation with the q84-q94 single-green cohort)
    "q97_host_pagerank",
    "q98_dsir_importance",
    "q99_snapshot_drift",
    "q100_salient_terms",
    "q101_semantic_neardup_history",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills QUERIES), then order
    the inventory by evidence need (see ``_EVIDENCE_FIRST`` / ``_CLIP_LAST``)."""
    from bricolage_spark.queries import relational  # noqa: F401  (q01–q30)
    from bricolage_spark.queries import patterns  # noqa: F401  (q44–q47, q55)
    from bricolage_spark.queries import llm_ops  # noqa: F401  (q31–q43, q48–q67)

    clip = set(_CLIP_LAST)
    evidence = set(_EVIDENCE_FIRST)
    head = {n: s for n, s in QUERIES.items() if n not in clip and n not in evidence}
    ordered = dict(head)
    for name in _EVIDENCE_FIRST:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        if name not in _CLIP_LAST:
            ordered.setdefault(name, spec)
    for name in _CLIP_LAST:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    QUERIES.clear()
    QUERIES.update(ordered)
    return QUERIES
