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
