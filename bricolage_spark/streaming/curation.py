"""Streaming ingest curation: the LLM-data quality pipeline applied at
the micro-batch boundary instead of as a batch pass.

Composition over Structured Streaming (readStream → transformations →
writeStream), reusing the batch operators unchanged where they are
row-local (repetition filter, PII redaction, content digest) and the
watermark-bounded streaming primitives where state is involved
(``dropDuplicatesWithinWatermark`` on the digest):

    files → quality filter → redact → digest dedup → curated sink

This is the shape a 100 TB ingest runs: row-local filters execute inside
the scan of each micro-batch (zero state), and the only stateful operator
— first-seen dedup — bounds its state by the watermark horizon, so a
hot-looping crawler re-sending the same document is absorbed without
unbounded state growth. The same pipeline object works on a batch
DataFrame (the filters are engine-agnostic Catalyst expressions and the
dedup falls back to ``dropDuplicates``), which is how the test oracles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bricolage_spark.exception import JobFailure
from bricolage_spark.operators.dedup import normalize_text
from bricolage_spark.operators.textual import (
    entropy_filter,
    redact_pii,
    repetition_filter,
)
from bricolage_spark.streaming.windows import dedup_within_watermark


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    classifier_threshold: float | None = 0.5,
    dsir_ratio: DataFrame | None = None,
    dsir_min_weight: float = 0.0,
    bpe_merges: list[tuple[str, str]] | None = None,
    eval_split: bool = False,
    split_seed: int = 424242,
    split_val_pct: int = 5,
    split_test_pct: int = 5,
) -> DataFrame:
    """Quality-filter, classify, redact, and first-seen-dedup a document
    stream.

    Works on streaming and batch DataFrames alike. Output schema: the
    input columns (with ``text_col`` redacted) plus ``content_digest``.
    Dedup keys on the digest of the normalized REDACTED text, so two
    spam blasts differing only in the scrubbed email address collapse to
    one kept document. All quality gates — repetition, char entropy, and
    the hashed-ngram quality classifier (q83's keep verdict; disable
    with ``classifier_threshold=None``), and optionally DSIR targeted
    selection (pass a fitted ``dsir_ratio`` table, q98's batch
    artifact — it collapses to an array-literal predicate, the
    streaming serve form) — are row-local Catalyst predicates fused
    into the micro-batch scan: zero streaming state beyond the
    watermark-bounded dedup. The classifier and DSIR gates score the
    PRE-redaction text (redaction replaces PII with fixed tags that
    would perturb the gram distribution). ``bpe_merges`` (a q95-induced
    merge table, q102's batch artifact) additionally annotates each
    kept doc with its real BPE token count ``n_tokens`` — the same
    offline-fitted-metadata-as-expression discipline as the DSIR gate.
    """
    from bricolage_spark.operators.textual import (
        dsir_keep_expr,
        hashed_ngram_keep,
    )

    curated = entropy_filter(repetition_filter(docs, text_col), text_col)
    if classifier_threshold is not None:
        curated = curated.where(
            hashed_ngram_keep(text_col, classifier_threshold)
        )
    if dsir_ratio is not None:
        curated = curated.where(
            dsir_keep_expr(dsir_ratio, text_col, dsir_min_weight)
        )
    curated = curated.withColumn(
        text_col, redact_pii(F.col(text_col))
    ).withColumn("content_digest", F.md5(normalize_text(F.col(text_col))))
    if bpe_merges is not None:
        # real token accounting on the stream (q102's serve form): the
        # induced merge table — tokenizer metadata fitted offline, like
        # the DSIR ratio above — unrolls to a row-local replace chain,
        # so the count is one more fused expression, zero stream state.
        # Counted on the PUBLISHED (post-redaction) text: packing
        # budgets downstream bin what is actually written.
        from bricolage_spark.operators.textual import (
            bpe_apply_merges,
            bpe_symbol_count,
            bpe_symbol_string,
        )

        curated = curated.withColumn(
            "n_tokens",
            bpe_symbol_count(
                bpe_apply_merges(bpe_symbol_string(F.col(text_col)), bpe_merges)
            ),
        )
    if eval_split:
        # q106's content-keyed train/val/test assignment fused into the
        # same micro-batch scan (row-local hash arithmetic, zero state):
        # keyed on the PUBLISHED (post-redaction) text, so a re-crawl of
        # the same document always lands in the same bucket the batch
        # eval-split job class assigns it.
        from bricolage_spark.operators.curation import assign_eval_split

        curated = assign_eval_split(
            curated,
            text_col,
            seed=split_seed,
            val_pct=split_val_pct,
            test_pct=split_test_pct,
        )
    return dedup_within_watermark(
        curated, ["content_digest"], ts_col=ts_col, watermark=watermark
    )


def curate_batch_against_history(
    batch: DataFrame,
    engine,
    registry_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    snapshot: str | None = None,
) -> DataFrame:
    """The cross-snapshot near-dedup stage (q82) at the micro-batch
    boundary — the body of a ``foreachBatch`` sink.

    Stream-side joins can't express "no band of this doc appears in the
    registry" (a non-equi aggregate condition), and the registry append
    must be transactional with the batch — so this is deliberately a
    BATCH function over each micro-batch, the standard foreachBatch
    merge pattern:

        def sink(batch_df, epoch_id):
            kept = curate_batch_against_history(batch_df, engine, "band_registry")
            engine.save_table(kept, "curated_corpus", mode="append")

    Probes the persisted band registry with one left-semi join of
    ~40-byte band rows (history bodies never rescanned), drops batch
    docs that near-duplicate ANY prior snapshot, and appends the
    survivors' bands to the registry. Run ``registry-compact``
    periodically to keep the registry one-row-per-key.

    Idempotency: with a ``snapshot`` label the stage is safely
    re-runnable (a resumed jobnet, a replayed epoch) — the probe
    EXCLUDES rows labeled with the current snapshot (a re-run must not
    see its own bands as "history" and drop the whole batch), and the
    registry write is insert-delta style: old-minus-this-snapshot plus
    the new bands, staged and swapped, so replays never double-append.
    Without a label the registry is append-only and a replay
    double-appends (harmless for verdicts — probes test existence —
    but ``registry-compact`` is then the cleanup).
    """
    from bricolage_spark.operators import dedup as D

    shingles = D.word_shingles(batch, id_col, text_col, k=3)
    sigs = D.minhash_signatures(shingles, id_col, num_hashes=16)
    bands = D.band_buckets(sigs, id_col, bands=8, rows_per_band=2)
    keep_ids = probe_and_update_registry(
        bands, engine, registry_table, id_col, snapshot=snapshot
    )
    # drop the flagged dups rather than keep the survivors: a doc that
    # produced NO bands (NULL/empty text) has nothing to judge and
    # passes through — the same only-judge-what-has-a-signature
    # contract as the semantic stage, and uniform across the
    # empty-registry and probe paths
    dup_ids = bands.select(id_col).distinct().join(
        keep_ids, id_col, "left_anti"
    )
    return batch.join(dup_ids, id_col, "left_anti")


def span_registry_prior(engine, registry_table: str, n_buckets: int = 0):
    """The span-anchor registry's rows, or None before the first
    snapshot — read through ``engine.bucketed_table`` when the registry
    lives bucketed CLUSTERED BY (ahash) (``n_buckets`` > 0), so probe
    joins scan co-located buckets (SCALE.md "Span-anchor registry").

    Returning None means "no history yet" and makes the caller SEED a
    fresh registry — so a layout-config flip (``registry-buckets``
    toggled between 0 and N on an existing deployment) must NOT fall
    through to None: the other layout's registry exists, and silently
    seeding would abandon all accumulated span-dedup history (the old
    layout's files would sit orphaned on disk with every prior span
    re-admitted). Both flip directions raise with the one-time
    migration instead.
    """
    if n_buckets:
        if not engine.bucketed_table_exists(registry_table):
            if engine.table_exists(registry_table):
                raise JobFailure(
                    f"span registry {registry_table} exists as a PLAIN "
                    f"table but registry-buckets={n_buckets} requests a "
                    "bucketed layout — probing against nothing would "
                    "abandon all span-dedup history. Migrate once by "
                    "running registry-compact with key-columns: ahash "
                    f"and buckets: {n_buckets} (it rewrites the plain "
                    "rows bucketed and retires the plain table), then "
                    "re-run."
                )
            return None
        return engine.bucketed_table(registry_table, "ahash", n_buckets)
    if engine.bucketed_table_exists(registry_table):
        # whether or not a plain table also exists: once a bucketed
        # layout exists it is canonical (a plain twin is a
        # mid-migration leftover holding a STALE subset — reading it
        # silently would lose every post-migration append)
        raise JobFailure(
            f"span registry {registry_table} exists as a BUCKETED "
            "table but registry-buckets=0 requests a plain layout — "
            "probing a stale or absent plain copy would abandon "
            "span-dedup history. Either restore registry-buckets to "
            "the written count, or migrate once: save the bucketed "
            "rows as a plain table and remove the bucketed directory."
        )
    if not engine.table_exists(registry_table):
        return None
    return engine.table(registry_table)


def update_span_registry(
    engine,
    registry_table: str,
    new_rows: DataFrame,
    *,
    snapshot: str | None = None,
    n_buckets: int = 0,
    prior: DataFrame | None = None,
) -> None:
    """The span-anchor registry's write policy, shared by the
    ``span-registry`` job class and ``span_scrub_batch_against_history``
    (foreachBatch): APPEND-ONLY, never the band registries' insert-delta
    rewrite — this registry is CORPUS-scale (rows ~ distinct history
    k-grams), so a labeled rewrite would be O(history) per snapshot.
    Labeled replays double-append harmlessly (probes test key
    existence; the probe already excluded the current snapshot's rows)
    and ``registry-compact`` collapses duplicates on its own cadence.
    The one rewrite is the one-time schema alignment when a first
    labeled run meets an unlabeled registry (mixed parquet footers
    otherwise). ``new_rows``: DataFrame[ahash] of the PUBLISHED text.
    """
    labeled = snapshot is not None or (
        prior is not None and "snapshot" in prior.columns
    )
    if labeled:
        new_rows = new_rows.withColumn(
            "snapshot",
            F.lit(str(snapshot))
            if snapshot is not None
            else F.lit(None).cast("string"),
        )
    if prior is not None and labeled and "snapshot" not in prior.columns:
        aligned = prior.withColumn(
            "snapshot", F.lit(None).cast("string")
        ).unionByName(new_rows)
        if n_buckets:
            engine.save_table_bucketed(aligned, registry_table, "ahash", n_buckets)
        else:
            engine.save_table(aligned, registry_table, mode="overwrite")
    elif n_buckets:
        engine.save_table_bucketed(
            new_rows,
            registry_table,
            "ahash",
            n_buckets,
            mode="append" if prior is not None else "overwrite",
        )
    else:
        engine.save_table(
            new_rows,
            registry_table,
            mode="append" if prior is not None else "overwrite",
        )


def span_scrub_batch_against_history(
    batch: DataFrame,
    engine,
    registry_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    snapshot: str | None = None,
    anchor_len: int = 8,
    min_span: int = 12,
    registry_buckets: int = 0,
) -> DataFrame:
    """Cross-snapshot SPAN dedup (q110) at the micro-batch boundary —
    the foreachBatch body completing the registry family's streaming
    column (q82 lexical: ``curate_batch_against_history``; spans here):

        def sink(batch_df, epoch_id):
            kept = span_scrub_batch_against_history(batch_df, engine, "span_registry")
            engine.save_table(kept, "curated_corpus", mode="append")

    Scrubs from the batch every >= ``min_span``-token word span that
    verbatim-duplicates ingested history (one semi-join of 16-byte
    digests against the registry, per-doc gaps-and-islands — history
    text never rescanned), then appends the SCRUBBED batch's anchor
    digests. The scrubbed batch is materialized (``localCheckpoint``,
    micro-batch-bounded) before the registry write so the returned
    frame and the appended anchors describe the same bytes regardless
    of when the sink executes it. Registry discipline (append-only,
    labeled-replay-stable, bucketed layout): ``update_span_registry``.
    """
    from bricolage_spark.operators import dedup as D

    prior = span_registry_prior(engine, registry_table, registry_buckets)
    probe_rows = prior
    if prior is not None and snapshot is not None and "snapshot" in prior.columns:
        probe_rows = prior.where(
            ~F.col("snapshot").eqNullSafe(F.lit(str(snapshot)))
        )
    if probe_rows is not None:
        anchors = D.positional_anchor_keys(batch, id_col, text_col, k=anchor_len)
        spans = D.span_registry_probe(
            anchors,
            probe_rows.select("ahash"),
            id_col,
            anchor_len=anchor_len,
            min_span=min_span,
        ).select(
            F.col(id_col).alias("doc_b"),
            F.col("span_start").alias("b_start"),
            "span_len",
        )
        scrubbed = (
            D.apply_span_scrub(batch, spans, id_col, text_col)
            .select(*batch.columns)
            .localCheckpoint(eager=True)
        )
    else:
        scrubbed = batch.localCheckpoint(eager=True)
    new_rows = (
        D.positional_anchor_keys(scrubbed, id_col, text_col, k=anchor_len)
        .select("ahash")
        .distinct()
    )
    update_span_registry(
        engine,
        registry_table,
        new_rows,
        snapshot=snapshot,
        n_buckets=registry_buckets,
        prior=prior,
    )
    return scrubbed


def probe_and_update_registry(
    bands: DataFrame,
    engine,
    registry_table: str,
    id_col: str,
    snapshot: str | None = None,
) -> DataFrame:
    """The registry half of cross-snapshot near-dedup, generic over the
    band family: probe a (id, band_id, band_hash) banding table against
    the accumulated registry, append the SURVIVORS' bands, return the
    surviving ids (materialized — id-only rows, O(batch)).

    Works identically for lexical MinHash bands (``dedup.band_buckets``,
    the q82/foreachBatch path above) and SRP embedding bands
    (``similarity.srp_band_buckets``, the q101 semantic path): the
    registry write carries the same snapshot discipline in both —
    labeled runs rewrite insert-delta style (old-minus-this-snapshot
    plus new, replay-idempotent), NULL-labeled and pre-label history
    stays probe-visible and survives rewrites (null-safe exclusion,
    schema alignment both directions).
    """
    have_registry = engine.table_exists(registry_table)
    prior = engine.table(registry_table) if have_registry else None
    if prior is not None and snapshot is not None and "snapshot" not in prior.columns:
        # registry written before labels existed: align the schema (NULL
        # = unknown snapshot) and take the insert-delta rewrite below —
        # appending label-bearing files into an unlabeled table would
        # leave mixed parquet schemas, and whether the snapshot column
        # exists would then depend on which file's footer a reader picks
        prior = prior.withColumn("snapshot", F.lit(None).cast("string"))
    if prior is not None and snapshot is not None and "snapshot" in prior.columns:
        # null-safe exclusion: only the CURRENT snapshot's rows leave
        # the probe/rewrite; NULL-labeled history (pre-label appends)
        # must stay probe-visible and survive the rewrite — a plain !=
        # evaluates NULL for them, silently erasing that history (the
        # same 3-valued-logic rule insert_delta enforces)
        prior = prior.where(~F.col("snapshot").eqNullSafe(F.lit(str(snapshot))))

    from bricolage_spark.operators import dedup as D

    if prior is not None:
        flags = D.incremental_neardup_flags(
            bands, prior.select("band_id", "band_hash"), id_col
        )
        # materialize NOW (id-only rows, O(batch)): the registry write
        # below swaps the files `prior` reads, so a verdict evaluated
        # lazily after it would scan the replaced registry
        keep_ids = (
            flags.where(~F.col("hist_neardup"))
            .select(id_col)
            .localCheckpoint(eager=True)
        )
    else:
        keep_ids = bands.select(id_col).distinct().localCheckpoint(eager=True)

    new_bands = bands.join(keep_ids, id_col, "left_semi").select(
        "band_id", "band_hash"
    )
    if snapshot is not None:
        new_bands = new_bands.withColumn("snapshot", F.lit(str(snapshot)))
    elif prior is not None and "snapshot" in prior.columns:
        # unlabeled run against a labeled registry: align the appended
        # schema (NULL snapshot) for the same mixed-footer reason
        new_bands = new_bands.withColumn("snapshot", F.lit(None).cast("string"))
    if prior is not None and snapshot is not None and "snapshot" in prior.columns:
        engine.save_table(
            prior.unionByName(new_bands), registry_table, mode="overwrite"
        )
    else:
        engine.save_table(
            new_bands,
            registry_table,
            mode="append" if have_registry else "overwrite",
        )
    return keep_ids
