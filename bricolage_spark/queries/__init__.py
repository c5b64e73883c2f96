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
#
# ROUND-14 ROTATION (driver window = first 50), executing the committed
# ROUND-14 PLAN verbatim.  Must-attest (18):
#   - q113 (registered r13 AFTER that round's rotation was committed,
#     pinned post-window there so it could not displace a committed row —
#     it has NEVER had a driver row and goes first), and q114 (registered
#     THIS round, before this rotation was committed, so it takes the
#     other never-attested slot: the n_flip2 pair-probe oracle the r13
#     verdict asked for);
#   - the 16 rows round 13 explicitly clipped (newest driver row r11,
#     two missed rounds by r14): q18-q25 q27 q31-q35 q44 q45.
# The remaining 32 slots rotate the r12-attested cohort (50 rows, newest
# row r12; CORRECTNESS_r12 50/50 green): candidates = 18 + 50 = 68 for 50
# slots -> clip 18.  Applied overflow rule, unchanged: never/oldest-
# attested first, clip the DEEPEST multi-round green histories and list
# them explicitly.  Depth audit (script over all 13 CORRECTNESS files):
#   - depth-2 (r10,r12): q108 q109 q110 — in-window;
#   - depth-3 (r8,r10,r12): q95-q103 — in-window;
#   - depth-5: q26b q43 q74-q81 — in-window;
#   - depth-6: fifteen rows for ten slots.  Clipped five: q26 q41 (the
#     two whose green spans reach back to ROUND 1 — the longest
#     cumulative histories in the tier) and q61 q67 q70 (this round's
#     metamorphic corpus fuzzer adds a NEW independent randomized
#     verification surface over exactly their operators — dedup
#     idempotence for q67, best-of-cluster order-invariance for q61,
#     length-stat permutation invariance for q70 — so losing one driver
#     round costs them the least external signal).  In-window ten:
#     q59 q60 q62 q63 q64 q65 q66 q68 q69 q71;
#   - depth-7 (the deepest histories in the cohort): q01 q02 q04 q07
#     q12 q12b q12c q15 q16 q17 q28 q29 q30 — all thirteen clipped.
#   EXPLICITLY CLIPPED this round (68 - 50 = 18): the five depth-6 rows
#   above + the thirteen depth-7 rows, listed FIRST in _CLIP_LAST
#   (shallowest first) so any window widening re-admits them before the
#   freshly-r13-attested cohort.
#
# ROUND-15 PLAN: must-attest = the 18 clipped above (newest row r12, two
# missed rounds by r15); then rotate the r13-attested cohort (the 50 rows
# now at the head of _CLIP_LAST's tail section, newest row r13) into the
# remaining 32 slots, same explicit-clip discipline on the overflow 18.
_EVIDENCE_FIRST = [
    # never driver-attested (see rotation note):
    "q113_ann_multiprobe",
    "q114_ann_multiprobe_pairs",
    # the round-13 explicit clip — newest driver row r11:
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
    "q44_tumbling_window",
    "q45_sliding_window",
    # r12-attested cohort, depth-2 histories:
    "q108_epoch_plan",
    "q109_classifier_calibration",
    "q110_span_registry_probe",
    # depth-3:
    "q95_bpe_merges",
    "q96_semantic_decontamination",
    "q97_host_pagerank",
    "q98_dsir_importance",
    "q99_snapshot_drift",
    "q100_salient_terms",
    "q101_semantic_neardup_history",
    "q102_bpe_encode",
    "q103_span_removal",
    # depth-5:
    "q26b_approx_aggregates",
    "q43_asof_join",
    "q74_duplicate_spans",
    "q75_lm_perplexity",
    "q76_url_canonical_dedup",
    "q77_semantic_dedup",
    "q78_span_coverage",
    "q79_winnowing_fingerprints",
    "q80_curation_verdicts",
    "q81_zipf_fit",
    # depth-6 survivors (see tie-break note):
    "q59_source_overlap",
    "q60_bm25_retrieval",
    "q62_domain_caps",
    "q63_char_entropy",
    "q64_doc_chunking",
    "q65_corpus_report",
    "q66_interval_join",
    "q68_embedding_clusters",
    "q69_ngram_novelty",
    "q71_language_label_audit",
]

# Explicitly demoted to the tail (absorb the driver's >50 clip).
_CLIP_LAST = [
    # the ROUND-14 EXPLICIT CLIP (see rotation note above), shallowest
    # first for re-admission priority: five depth-6 rows...
    "q26_distinct_percentiles",
    "q41_multimodal_features",
    "q61_dedup_best_of_cluster",
    "q67_incremental_dedup",
    "q70_length_histogram",
    # ...then the thirteen depth-7 rows:
    "q01_scan_projection",
    "q02_filter_predicates",
    "q04_global_aggregate",
    "q07_broadcast_join",
    "q12_rollup",
    "q12b_cube",
    "q12c_pivot",
    "q15_topk_per_group",
    "q16_global_topk",
    "q17_set_ops",
    "q28_insert_delta",
    "q29_rebuild",
    "q30_streaming_load_dedup",
    # the round-13 attested cohort — newest driver row r13, the
    # freshest rows in the inventory (CORRECTNESS_r13: 50/50 green):
    "q36_ann_lsh_bucketed",
    "q37_language_id",
    "q38_token_stats",
    "q39_quality_score",
    "q40_fingerprint",
    "q42_embedding_neardup",
    "q03_group_aggregate",
    "q05_tpch_q1",
    "q06_inner_join",
    "q08_outer_join",
    "q09_semi_anti_join",
    "q10_cross_theta_join",
    "q11_tpch_q3",
    "q12d_unpivot",
    "q13_window_rank",
    "q14_window_analytic",
    "q111_unimax_plan",
    "q112_lsh_banding_audit",
    "q104_tokenizer_fertility",
    "q105_span_contamination",
    "q106_eval_split",
    "q107_split_leakage",
    "q84_temperature_mixture",
    "q85_ann_recall",
    "q86_sentence_dedup",
    "q87_code_detection",
    "q88_oov_rate",
    "q89_shard_assignment",
    "q90_decontamination_apply",
    "q91_embedding_hygiene",
    "q92_boilerplate_removal",
    "q93_cluster_size_histogram",
    "q94_dedup_audit",
    "q50_dedup_clusters",
    "q51_contamination",
    "q52_stratified_sample",
    "q53_boilerplate_ngrams",
    "q54_sequence_packing",
    "q56_pii_redaction",
    "q57_quality_repetition",
    "q58_doc_top_word",
    "q82_incremental_neardup",
    "q83_hashed_ngram_classifier",
    "q48_ngram_jaccard_neardup",
    "q49_ann_ivf",
    "q55_sessionization",
    "q72_snapshot_diff",
    "q73_pmi_collocations",
    "q46_salted_aggregate",
    "q47_salted_join",
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
