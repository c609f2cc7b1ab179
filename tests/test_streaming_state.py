"""Stateful streaming sessionization vs the batch window formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from datamatcher_spark.streaming.events import read_events_stream, run_to_table
from datamatcher_spark.streaming.sessionize import sessionize_stream


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    src = tmp_path / "events_in"
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.withColumn("props", F.col("props").cast("string")).repartition(
        3
    ).write.parquet(str(src))

    stream = read_events_stream(spark, str(src))
    out = tmp_path / "sessions_out"
    run_to_table(
        sessionize_stream(stream, idle_timeout=False), str(out), str(tmp_path / "ck")
    )
    got = spark.read.parquet(str(out))

    # batch oracle: same gap rule via windows
    w = F.window  # noqa: F841
    from pyspark.sql import Window

    win = Window.partitionBy("user_id").orderBy("ts")
    secs = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = secs - F.lag(secs).over(win)
    batch = (
        events.withColumn("new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("seq", F.sum("new_s").over(win) - 1)
        .groupBy("user_id", "seq")
        .agg(F.count("*").alias("n_events"))
    )

    # with availableNow all data arrives in micro-batches in order of file
    # listing per key; closed sessions must be a subset of batch sessions
    # with identical event counts, and the per-user TOTAL event count must
    # match exactly (open + closed)
    totals = got.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    # the open session row duplicates events of its own closed predecessors?
    # no: n_events is per-session; sum over distinct (user, session_seq)
    per_session = got.groupBy("user_id", "session_seq").agg(
        F.max("n_events").alias("n_events")
    )
    stream_total = per_session.agg(F.sum("n_events")).collect()[0][0]
    assert stream_total == events.count()

    joined = per_session.join(
        batch,
        (per_session.user_id == batch.user_id)
        & (per_session.session_seq == batch.seq),
    ).filter(per_session.n_events != batch.n_events)
    assert joined.count() == 0

    # every user present, session_seq contiguous from 0
    assert got.select("user_id").distinct().count() == events.select(
        "user_id"
    ).distinct().count()
