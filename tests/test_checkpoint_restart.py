"""Stateful streaming recovery: per-key state must survive a query restart
from its checkpoint (the operational property that lets a 100 TB continuous
pipeline resume after failure without recounting history)."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark_retention_pipeline_spark.streaming.stateful import running_user_totals
from pyspark_retention_pipeline_spark.streaming.windows import event_stream_from_dir


def _run_until_drained(stream_df, ckpt: str):
    collected: list[dict] = []

    def sink(batch_df, _batch_id: int) -> None:
        collected.extend(r.asDict() for r in batch_df.collect())

    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return collected


def test_state_survives_restart(spark, sf_dir, tmp_path):
    table = pq.read_table(f"{sf_dir}/events.parquet")
    half = table.num_rows // 2
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # Phase 1: first half of the events arrives; the query builds state.
    pq.write_table(table.slice(0, half), src / "part1.parquet")
    stream = running_user_totals(event_stream_from_dir(spark, str(src)))
    phase1 = _run_until_drained(stream, ckpt)
    assert phase1, "phase 1 produced no updates"
    p1_totals = {r["user_id"]: r["total_events"] for r in phase1}

    # Phase 2: more events land; a NEW query restarts from the checkpoint.
    pq.write_table(table.slice(half), src / "part2.parquet")
    stream2 = running_user_totals(event_stream_from_dir(spark, str(src)))
    phase2 = _run_until_drained(stream2, ckpt)
    assert phase2, "restart produced no updates"
    p2_totals = {r["user_id"]: r["total_events"] for r in phase2}

    # Ground truth: full-table per-user counts.
    full = table.to_pandas().groupby("user_id").size().to_dict()

    # Every user updated in phase 2 must report the FULL running total —
    # proof the phase-1 state was restored, not recounted from zero.
    for user, total in p2_totals.items():
        assert total == full[user], (user, total, full[user])
        if user in p1_totals:
            assert total >= p1_totals[user]
