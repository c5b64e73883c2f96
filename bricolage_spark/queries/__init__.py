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
# ROUND-15 ROTATION (driver window = first 50), executing the committed
# ROUND-15 PLAN verbatim.  Must-attest (18) = the round-14 explicit clip
# (newest driver row r12, two missed rounds by r15): q26 q41 q61 q67 q70
# q01 q02 q04 q07 q12 q12b q12c q15 q16 q17 q28 q29 q30.
# The remaining 32 slots rotate the r13-attested cohort (50 rows, newest
# row r13; CORRECTNESS_r13 50/50 green): candidates = 18 + 50 = 68 for 50
# slots -> clip 18.  Applied overflow rule, unchanged: never/oldest-
# attested first, clip the DEEPEST multi-round green histories and list
# them explicitly.  Depth audit (script over all 14 CORRECTNESS files,
# green = rows+schema+hash match, no err):
#   - depth-2 (r11,r13): q111 q112 — in-window;
#   - depth-3 (r9,r11,r13): q104-q107 — in-window;
#   - depth-4 (r7..r13): q84-q94 (eleven rows) — in-window;
#   - depth-5: q50-q54 q56-q58 q82 q83 (ten rows) — in-window;
#   - depth-6: q48 q49 q55 q72 q73 (five rows) — in-window;
#   (running total 32 — the tiers partition EXACTLY, no tie-break
#   needed this round)
#   - depth-7 (r1..r13): q03 q05 q06 q08 q09 q10 q11 q12d q13 q14
#     q46 q47 — all twelve clipped;
#   - depth-8 (the deepest histories in the inventory): q36-q40 q42 —
#     all six clipped.
#   EXPLICITLY CLIPPED this round (68 - 50 = 18): the twelve depth-7
#   rows + the six depth-8 rows, listed FIRST in _CLIP_LAST (shallowest
#   first) so any window widening re-admits them before the freshly-
#   r14-attested cohort.
#
# ROUND-16 PLAN: must-attest = the 18 clipped above (newest row r13, two
# missed rounds by r16); then rotate the r14-attested cohort (the 50 rows
# now at the head of _CLIP_LAST's tail section, newest row r14) into the
# remaining 32 slots, same explicit-clip discipline on the overflow 18.
_EVIDENCE_FIRST = [
    # the round-14 explicit clip — newest driver row r12, shallowest
    # (then-depth-6) first:
    "q26_distinct_percentiles",
    "q41_multimodal_features",
    "q61_dedup_best_of_cluster",
    "q67_incremental_dedup",
    "q70_length_histogram",
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
    # r13-attested cohort, depth-2 histories:
    "q111_unimax_plan",
    "q112_lsh_banding_audit",
    # depth-3:
    "q104_tokenizer_fertility",
    "q105_span_contamination",
    "q106_eval_split",
    "q107_split_leakage",
    # depth-4:
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
    # depth-5:
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
    # depth-6:
    "q48_ngram_jaccard_neardup",
    "q49_ann_ivf",
    "q55_sessionization",
    "q72_snapshot_diff",
    "q73_pmi_collocations",
]

# Explicitly demoted to the tail (absorb the driver's >50 clip).
_CLIP_LAST = [
    # the ROUND-15 EXPLICIT CLIP (see rotation note above), shallowest
    # first for re-admission priority: twelve depth-7 rows...
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
    "q46_salted_aggregate",
    "q47_salted_join",
    # ...then the six depth-8 rows:
    "q36_ann_lsh_bucketed",
    "q37_language_id",
    "q38_token_stats",
    "q39_quality_score",
    "q40_fingerprint",
    "q42_embedding_neardup",
    # the round-14 attested cohort — newest driver row r14, the
    # freshest rows in the inventory (CORRECTNESS_r14: 50/50 green),
    # in their r14 window order:
    "q113_ann_multiprobe",
    "q114_ann_multiprobe_pairs",
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
