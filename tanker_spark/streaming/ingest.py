"""Stream → managed-table ingest: land a Structured Stream through the
engine's natural-key upsert.

``foreachBatch`` hands each micro-batch to ``View.write`` on the
driver, so a stream gets the full write pipeline — FK resolution,
key/unique guards, ACL-write legs, partition-pruned versioned snapshot
commit — with effectively-once delivery: the checkpoint makes batch
replay at-least-once, and the natural-key merge makes replays
idempotent (same keys upsert to the same rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def upsert_sink(stream_df, view_name, fields, cfg, checkpoint_dir,
                available_now=True):
    """Start a streaming query that upserts every micro-batch into the
    managed table behind ``View(view_name, fields)``. Returns the
    StreamingQuery (caller awaits/stops)."""
    from .. import View, connect

    def _write_batch(batch_df, _batch_id):
        if not batch_df.isEmpty():
            with connect(cfg):
                View(view_name, fields).write(batch_df)

    return (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )


def neardup_filter_sink(stream_df, out_path, sig_path, checkpoint_dir,
                        text_col="text", id_col="doc_id", threshold=0.5,
                        num_hashes=16, bands=4, shingle_n=3, seed=42,
                        available_now=True):
    """Streaming near-duplicate gate: each micro-batch is MinHash-matched
    against the persisted signature corpus (``sig_path``, the side table
    :func:`operators.dedup.minhash_incremental` reads); docs whose
    estimated jaccard vs the corpus — or vs an earlier doc in the same
    batch — clears ``threshold`` are dropped, survivors land in
    ``out_path`` and their signatures are appended so later batches
    (and later streams) see them.

    Delivery: the checkpoint makes batch replay at-least-once; output
    stays exactly-once because each batch overwrites its own
    deterministic ``batch=N`` subdirectory AND the matcher excludes the
    batch's own ids from the corpus side (``exclude_batch_ids`` —
    without it a replayed batch's corpus twin could masquerade as an
    intra-batch pair and drop the keeper). Replayed signature appends
    duplicate side-table rows, bounded by the replay count — compact
    with ``dedup.compact_side_table`` offline.

    Scale: per batch cost is O(batch signatures + matching buckets);
    the historical corpus is only ever touched through its signature
    side table (~1000× smaller than the text).
    """
    from ..operators.dedup import (minhash_append_signatures,
                                   minhash_incremental, release_caches)

    def _filter_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        from .. import fsio

        # the "side table exists yet?" bootstrap gate rides fsio (and
        # resolves a versioned root to its live tree): a driver-side
        # os.path.exists is False FOREVER on a remote sig_path, so
        # every batch would take the bootstrap branch and silently
        # admit all cross-batch near-duplicates (r10 audit)
        _sess = batch_df.sparkSession
        if fsio.exists(_sess, fsio.resolve(_sess, sig_path)):
            pairs = minhash_incremental(
                batch_df, sig_path, text_col, id_col, num_hashes,
                bands, shingle_n, threshold, seed,
                exclude_batch_ids=True,
            )
            # vs-corpus pairs (id_b outside the batch): drop id_a, the
            # batch doc. Intra-batch pairs (id_a < id_b, both in batch):
            # keep the earlier doc, drop id_b.
            bids = batch_df.select(
                F.col(id_col).alias("id_b")
            ).distinct()
            drop_intra = pairs.join(bids, "id_b", "left_semi").select(
                F.col("id_b").alias(id_col)
            )
            drop_corpus = pairs.join(bids, "id_b", "left_anti").select(
                F.col("id_a").alias(id_col)
            )
            dup_ids = drop_intra.unionAll(drop_corpus).distinct()
            keep = batch_df.join(dup_ids, id_col, "left_anti")
        else:
            keep = batch_df
        bdir = "%s/batch=%d" % (out_path, batch_id)
        keep.write.mode("overwrite").parquet(bdir)
        # append signatures from the JUST-WRITTEN parquet: re-running
        # `keep`'s lineage would execute the whole corpus band-join a
        # second time per batch; the materialized output is the cheap
        # source
        written = batch_df.sparkSession.read.parquet(bdir)
        minhash_append_signatures(
            written, sig_path, text_col, id_col, num_hashes, shingle_n,
            seed,
        )
        batch_df.unpersist()
        release_caches()  # drop this batch's eager signature cache

    return (
        stream_df.writeStream.foreachBatch(_filter_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )


def decontaminate_sink(stream_df, out_path, bloom_path, checkpoint_dir,
                       text_col="text", id_col="doc_id",
                       max_containment=0.5, available_now=True):
    """Streaming decontamination gate: each micro-batch is screened
    against the persisted train-corpus Bloom filter
    (:func:`operators.text.build_contamination_filter`) and only docs
    whose shingle containment stays ≤ ``max_containment`` land in
    ``out_path`` — the ingest-time twin of the batch
    :func:`operators.text.containment_ratio_indexed` screen.

    Delivery: at-least-once replay from the checkpoint, exactly-once
    output via the deterministic ``batch=N`` subdirectory overwrite
    (same contract as :func:`neardup_filter_sink`). Unlike the MinHash
    gate the filter artifact is READ-ONLY — replays are trivially
    idempotent and batches never interact.

    Scale: the one-row bitmap broadcasts once per batch; the screen is
    whole-stage-codegen shingle hashing + bit tests — no shuffle
    beyond the per-doc containment aggregate, and the training corpus
    is never read."""
    from ..operators.text import containment_ratio_indexed

    def _filter_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        ratios = containment_ratio_indexed(
            batch_df, bloom_path, text_col, id_col
        )
        clean = ratios.filter(
            F.col("containment") <= float(max_containment)
        ).select(id_col)
        keep = batch_df.join(clean, id_col, "left_semi")
        keep.write.mode("overwrite").parquet(
            "%s/batch=%d" % (out_path, batch_id)
        )

    return (
        stream_df.writeStream.foreachBatch(_filter_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )


def semantic_filter_sink(stream_df, out_path, index_path, checkpoint_dir,
                         vec_col="embedding", id_col="vec_id",
                         threshold=0.95, multiprobe=1, dim=64,
                         n_planes=8, seed=42, quantize=False,
                         available_now=True):
    """Streaming SEMANTIC near-duplicate gate: each micro-batch of
    embedded rows is matched against the persisted ANN index at
    ``index_path`` (:func:`operators.similarity.embedding_incremental`);
    rows whose cosine vs the indexed corpus — or vs an earlier row in
    the same batch — clears ``threshold`` are dropped, survivors land
    in ``out_path`` and are appended to the index so later batches
    (and later streams) see them. The embedding-space twin of
    :func:`neardup_filter_sink`, for pipelines that deduplicate on
    meaning (SemDeDup-style) rather than tokens.

    Delivery: at-least-once batch replay from the checkpoint;
    exactly-once OUTPUT via the deterministic ``batch=N`` overwrite
    plus ``exclude_batch_ids=True`` on the index match (a replayed
    batch must not be killed by its own appended twin). Replayed index
    appends duplicate rows, bounded by the replay count — they change
    no verdict (a dup of a dup still matches) and compact away on the
    next :func:`operators.similarity.build_ann_index` rebuild.

    Scale: per batch cost is O(batch ball buckets) index partitions
    read + one intra-batch banded-LSH pass over the batch itself; the
    historical corpus is only ever touched through its bucket-pruned
    index partitions."""

    from ..operators import dedup as _dedup
    from ..operators import similarity as _sim

    def _filter_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        # intra-batch near-dups first (keep the lowest id), so two
        # same-batch twins can't both survive into the index. The
        # sink's n_planes threads through (r8 ADVICE fix: defaulting
        # to the library's auto n_planes made intra-batch and
        # cross-batch recall silently diverge for the same threshold);
        # multiprobe radius r maps to 1+r bands — each band is an
        # independent chance to collide, the banded analog of probing
        # r extra Hamming-ball buckets
        intra = _dedup.embedding_dedup_pairs(
            batch_df, vec_col=vec_col, id_col=id_col, dim=dim,
            threshold=threshold, seed=seed, n_planes=n_planes,
            n_bands=1 + multiprobe,
        ).select(F.col("id_b").alias(id_col)).distinct()
        # persist the post-intra-dedup frame: the index-match branch
        # evaluates it FOUR times (Hamming-ball bucket-set collect,
        # exclude-batch-ids anti join, cogroup GEMM, final write), and
        # without the pin each action re-runs the whole intra-batch
        # LSH pass — measured at the 10M soak as the difference
        # between ~25 min/batch and ~4 min/batch (r8 soak finding)
        keep = batch_df.join(intra, id_col, "left_anti").persist()
        # "index exists yet?" rides fsio + pointer resolution — a
        # driver-side os.path.exists is False FOREVER on a remote
        # index_path, so every batch would rebuild the index from its
        # own rows and silently admit all cross-batch near-duplicates
        # (r10 audit; same class as the neardup gate above)
        from .. import fsio
        _sess = batch_df.sparkSession
        if fsio.exists(_sess, fsio.resolve(_sess, index_path).rstrip("/")
                       + "/" + _sim.ANN_META):
            # score="gemm" pinned: the sink's batches are corpus-scale
            # (foreachBatch micro-batches of an ingest stream), so
            # "auto"'s index count — a full pruned-index scan per
            # batch just to pick the path — always lands on gemm
            # anyway (r8 soak finding)
            pairs = _sim.embedding_incremental(
                keep, index_path, threshold=threshold,
                multiprobe=multiprobe, exclude_batch_ids=True,
                score="gemm",
            )
            dup_ids = pairs.select(
                F.col("id_a").alias(id_col)
            ).distinct()
            out = keep.join(dup_ids, id_col, "left_anti")
            bdir = "%s/batch=%d" % (out_path, batch_id)
            out.write.mode("overwrite").parquet(bdir)
            written = batch_df.sparkSession.read.parquet(bdir)
            _sim.ann_index_append(
                written.select(id_col, vec_col), index_path
            )
        else:
            bdir = "%s/batch=%d" % (out_path, batch_id)
            keep.write.mode("overwrite").parquet(bdir)
            written = batch_df.sparkSession.read.parquet(bdir)
            _sim.build_ann_index(
                written.select(id_col, vec_col), index_path,
                method="lsh", vec_col=vec_col, id_col=id_col, dim=dim,
                n_planes=n_planes, seed=seed, quantize=quantize,
            )
        keep.unpersist()
        batch_df.unpersist()
        _dedup.release_caches()

    return (
        stream_df.writeStream.foreachBatch(_filter_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )


def text_index_sink(stream_df, index_path, checkpoint_dir,
                    text_col="text", id_col="doc_id",
                    available_now=True):
    """Streaming BM25 index maintenance: the ingest-time twin of
    :func:`operators.search.text_index_append` — arriving documents
    become searchable as soon as their micro-batch commits, and the
    landed corpus is never re-tokenized.

    Delivery: exactly-once on BOTH artifacts without any merge step —
    each batch's postings land under their own deterministic
    ``batch=N`` directory (hive-partitioned inside by the same
    term-hash prefix as the batch index, so probes still prune ~99% of
    the postings regardless of how many batches accumulated), and its
    one-row (n_docs, dl_sum, dl_n) stats land under
    ``_bm25_meta/batch=N`` (``search.META_SUBDIR``). A replay
    overwrites its own directories, so
    counts never double — the merge the append path does at write
    time happens at PROBE time instead, as a sum over the tiny
    per-batch stats rows (``search.bm25_topk_stream_indexed``).
    df_t needs no state on either layout: probes count it from the
    matching postings.

    Scale: per batch = tokenize batch + one (doc, term) aggregate;
    probe = stats sum (|batches| rows) + prefix-pruned postings read —
    same probe shape as the batch index, one extra tiny aggregate."""
    from pyspark.sql import Observation

    from ..operators.search import (META_SUBDIR, POSTINGS_SUBDIR, _PFX,
                                    _obs_stats, _pfx_repartition,
                                    _postings, term_prefix)

    def _index_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        # the per-batch stats ride the postings write as observed
        # metrics — one tokenize pass per batch, no persist needed for
        # a second stats pass (guide §1.2); the meta row is built
        # JVM-side like search._write_meta's
        obs = Observation()
        toks = _postings(batch_df, text_col, id_col, obs=obs)
        postings = (
            toks.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.first("dl").alias("dl"))
            .withColumn(_PFX, term_prefix(F.col("term")))
            # one file per prefix per batch, not tasks × prefixes; the
            # explicit-count repartition form is never AQE-coalesced
            # to one serial task (see search._pfx_repartition)
            .transform(_pfx_repartition)
        )
        postings.write.mode("overwrite").partitionBy(_PFX).parquet(
            "%s/%s/batch=%d" % (index_path, POSTINGS_SUBDIR, batch_id)
        )
        stats = _obs_stats(obs, batch_df, text_col)
        n_docs, dl_sum, dl_n = (stats["n_docs"], stats["dl_sum"],
                                stats["dl_n"])
        avgdl = float(dl_sum) / dl_n if dl_n else None
        spark = batch_df.sparkSession
        spark.range(1).select(
            F.lit(int(n_docs)).cast("long").alias("n_docs"),
            F.lit(avgdl).cast("double").alias("avgdl"),
            F.lit(None if dl_sum is None else float(dl_sum))
            .cast("double").alias("dl_sum"),
            F.lit(int(dl_n)).cast("long").alias("dl_n"),
        ).coalesce(1).write.mode("overwrite").parquet(
            "%s/%s/batch=%d" % (index_path, META_SUBDIR, batch_id)
        )

    return (
        stream_df.writeStream.foreachBatch(_index_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )


def line_filter_sink(stream_df, out_path, freq_path, checkpoint_dir,
                     text_col="text", id_col="doc_id", sep="\n",
                     min_docs=2, available_now=True):
    """Streaming boilerplate-LINE gate: the ingest-time twin of
    :func:`operators.dedup.line_dedup`. Each micro-batch contributes
    its per-line distinct-doc counts to a persisted frequency side
    table, then rewrites its documents with every line whose
    ACCUMULATED count (history + this batch) has reached ``min_docs``
    removed — nav bars and license headers stop landing in the corpus
    as soon as enough distinct docs have carried them.

    Ingest-time semantics, stated plainly: a line that crosses the
    threshold at batch N is scrubbed from batch N onward; docs already
    written by earlier batches keep it (re-run the batch
    ``line_dedup`` over the landed corpus for the full retroactive
    form). This is the strongest guarantee a single forward pass can
    give.

    Delivery: exactly-once on BOTH artifacts — each batch's frequency
    contribution lands in its own deterministic ``batch=N`` directory
    under ``freq_path`` (a replay overwrites the same rows, so counts
    never double), and the rewritten docs overwrite
    ``out_path/batch=N``. The aggregated frequency view is a sum over
    batch directories, keyed by the same 128-bit two-seed line hash as
    the batch operator.

    Scale: per batch = one explode + one (line-hash) count + the
    history sum (hash-keyed, map-side partials over the side table) +
    the doc-keyed rebuild; the landed corpus is never re-read."""

    from ..operators.dedup import (_line_counts, _line_explode,
                                   _line_rebuild)

    def _filter_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        lines = _line_explode(batch_df, text_col, id_col, sep)
        contrib = _line_counts(lines)
        contrib.write.mode("overwrite").parquet(
            "%s/batch=%d" % (freq_path, batch_id)
        )
        total = (
            spark.read.parquet(freq_path)
            .groupBy("__lh1", "__lh2")
            .agg(F.sum("__df").alias("__df"))
        )
        dup = total.filter(F.col("__df") >= int(min_docs)).select(
            "__lh1", "__lh2"
        )
        rebuilt = _line_rebuild(lines, dup, sep, text_col, id_col)
        keep = batch_df.drop(text_col).join(rebuilt.drop(
            "n_lines", "n_removed"), id_col)
        keep.write.mode("overwrite").parquet(
            "%s/batch=%d" % (out_path, batch_id)
        )

    return (
        stream_df.writeStream.foreachBatch(_filter_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )
