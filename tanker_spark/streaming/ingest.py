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
        import os
        if os.path.exists(sig_path):
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
