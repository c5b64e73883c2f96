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
# ROUND-13 ROTATION (driver window = first 50), executing the committed
# ROUND-13 PLAN verbatim.  Must-attest (16) = the 16 rows round 12
# explicitly clipped (newest driver row r10, two rounds stale by r13);
# gen_query_index --check confirms no post-window registrations happened
# in r12, so the remaining 34 slots rotate in the r11-attested cohort
# (newest row r11): candidates = 16 + 50 = 66 rows for 50 slots ->
# clip 16.  Applied overflow rule, unchanged: never/oldest-attested
# first, clip the DEEPEST multi-round green history and list it
# explicitly.
#   In the window (50):
#   - q36-q40 q42 q03 q05 q06 q08 q09 q10 q11 q12d q13 q14 (16) — the
#     round-12 explicit clip, per the standing promise (listed FIRST);
#   - q111 q112 (2) — single driver row (r11);
#   - q104-q107 (4) — two rows (r9, r11);
#   - q84-q94 (11) — three rows (r7, r9, r11);
#   - q50-q54 q56-q58 q82 q83 (10) — four rows each;
#   - q48 q49 q55 q72 q73 (5) — five rows each;
#   - q46 q47 (2) — six rows each; the depth-6 tier holds FIVE rows
#     (q27 q44-q47) for two slots, and the tie breaks the same way the
#     r12 q07 tie did: round 13 is the skew-stress round (zipfian
#     salted-vs-unsalted octaves on operators/skew.py), so the two
#     skew-toolkit rows are the principled depth-6 survivors.
#   EXPLICITLY CLIPPED this round (66 - 50 = 16): q18-q25 q31-q35
#   (driver-green in SEVEN rounds each — the deepest histories in the
#   cohort) and q27 q44 q45 (six rounds each; q46/q47, equal depth,
#   stay in-window as above).  Listed FIRST in _CLIP_LAST so any
#   window widening re-admits them before the freshly-r12-attested
#   cohort.
#
# ROUND-14 PLAN: must-attest = the 16 clipped above (newest row r11,
# two rounds stale by r14) + the r13 post-window registrations (q113,
# registered AFTER the round-13 rotation was committed and therefore
# pinned to the tail so it cannot displace a committed window row —
# it has never had a driver row and goes first in r14); then
# rotate the r12-attested cohort (q01 q02 q04 q07 q12 q12b q12c
# q15-q17 q26 q26b q28-q30 q41 q43 q59-q71 q74-q81 q95-q103
# q108-q110 — newest row r12) ahead of this round's 50 fresh rows,
# same explicit-clip discipline on whatever exceeds the window.
_EVIDENCE_FIRST = [
    # the round-12 explicit clip — newest driver row r10 (listed FIRST):
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
    # single driver row (r11):
    "q111_unimax_plan",
    "q112_lsh_banding_audit",
    # two rows (r9, r11):
    "q104_tokenizer_fertility",
    "q105_span_contamination",
    "q106_eval_split",
    "q107_split_leakage",
    # three rows (r7, r9, r11):
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
    # four rows each:
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
    # five rows each:
    "q48_ngram_jaccard_neardup",
    "q49_ann_ivf",
    "q55_sessionization",
    "q72_snapshot_diff",
    "q73_pmi_collocations",
    # the depth-6 tie survivors (skew-stress round; see note above):
    "q46_salted_aggregate",
    "q47_salted_join",
]

# Explicitly demoted to the tail (absorb the driver's >50 clip).
_CLIP_LAST = [
    # the ROUND-13 EXPLICIT CLIP (see rotation note above): deepest
    # driver-green histories in the rotated cohort (q18-q25/q31-q35
    # seven rounds each; q27/q44/q45 six rounds each), re-admitted
    # first if the window ever widens:
    "q18_subqueries",
    "q19_case_coalesce_cast",
    "q20_string_functions",
    "q21_datetime_functions",
    "q22_math_functions",
    "q23_array_functions",
    "q24_map_functions",
    "q25_json_functions",
    "q31_dedup_exact",
    "q32_minhash_signatures",
    "q33_minhash_lsh_pairs",
    "q34_simhash",
    "q35_cosine_topk",
    "q27_distinct",
    "q44_tumbling_window",
    "q45_sliding_window",
    # the round-12 attested cohort — newest driver row r12, the
    # freshest rows in the inventory (CORRECTNESS_r12: 50/50 green):
    "q01_scan_projection",
    "q02_filter_predicates",
    "q04_global_aggregate",
    "q12_rollup",
    "q12b_cube",
    "q12c_pivot",
    "q15_topk_per_group",
    "q16_global_topk",
    "q17_set_ops",
    "q26_distinct_percentiles",
    "q26b_approx_aggregates",
    "q28_insert_delta",
    "q29_rebuild",
    "q30_streaming_load_dedup",
    "q41_multimodal_features",
    "q43_asof_join",
    "q108_epoch_plan",
    "q109_classifier_calibration",
    "q110_span_registry_probe",
    "q95_bpe_merges",
    "q96_semantic_decontamination",
    "q97_host_pagerank",
    "q98_dsir_importance",
    "q99_snapshot_drift",
    "q100_salient_terms",
    "q101_semantic_neardup_history",
    "q102_bpe_encode",
    "q103_span_removal",
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
    "q07_broadcast_join",
    # registered in r13 AFTER the rotation above was committed and
    # driver-verified: pinned post-window (a new name in neither list
    # would land in ``head`` = the FRONT of the window and displace a
    # committed row).  Never driver-attested -> first must-attest slot
    # in the ROUND-14 PLAN:
    "q113_ann_multiprobe",
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
