"""Exactly-once-style streaming sink via ``foreachBatch`` (SURVEY.md §2.9 /
driver guide: "for exactly-once sinks: foreachBatch").

The built-in file sink is append-only; ``foreachBatch`` hands each
micro-batch to arbitrary batch-writer logic. Idempotence here comes from
writing every epoch to its own directory keyed by batch id (re-processing a
batch after a failure overwrites the same epoch path instead of duplicating
rows) — the standard pattern when the target isn't a transactional table
format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_stream_idempotent(
    stream_df: DataFrame, out_dir: str, query_name: str = "idempotent_sink"
):
    """Start a streaming query writing each micro-batch to
    ``out_dir/epoch=<batch_id>/`` with overwrite semantics."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"epoch={batch_id}")
            )
        )

    # complete mode: every epoch directory is a full, self-consistent snapshot
    # of the aggregate — replaying an epoch is a pure overwrite.
    return (
        stream_df.writeStream.outputMode("complete")
        .queryName(query_name)
        .foreachBatch(write_batch)
        .start()
    )
