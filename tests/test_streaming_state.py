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


class _FakeState:
    """Minimal GroupState stand-in for driving the timeout branch."""

    def __init__(self, value, timed_out):
        self._value = value
        self.hasTimedOut = timed_out
        self.exists = value is not None
        self.updated = None
        self.removed = False
        self.timeout_set = False

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = True


def test_timeout_close_keeps_sequence_counter():
    """Round-1 advisory: on idle timeout the handler must NOT reset
    session_seq to 0 (that would reuse (user_id, session_seq) identities
    of sessions already emitted as closed). It re-seeds a placeholder at
    seq+1 and keeps a timeout armed so the placeholder is reaped later."""
    import pandas as pd

    from datamatcher_spark.streaming.sessionize import _sessionize_group

    state = _FakeState((4, 7, 1_000_000, 2_000_000), timed_out=True)
    out = list(_sessionize_group((42,), iter([]), state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row.session_seq == 4 and row.n_events == 7 and bool(row.closed)
    assert row.session_start == pd.Timestamp(1_000_000, unit="us")
    assert state.updated == (5, 0, 0, 0)      # seq advanced, empty placeholder
    assert state.timeout_set and not state.removed


def test_timeout_on_empty_placeholder_reaps_state():
    from datamatcher_spark.streaming.sessionize import _sessionize_group

    state = _FakeState((5, 0, 0, 0), timed_out=True)
    out = list(_sessionize_group((42,), iter([]), state))
    assert out == []
    assert state.removed and state.updated is None


def test_resumed_state_continues_sequence():
    """An event arriving after a timeout-close must open session seq+1."""
    import pandas as pd

    from datamatcher_spark.streaming.sessionize import _sessionize_group

    state = _FakeState((5, 0, 0, 0), timed_out=False)
    batch = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01 10:00:00")]})
    out = pd.concat(list(_sessionize_group((42,), iter([batch]), state)))
    open_row = out[~out.closed].iloc[0]
    assert open_row.session_seq == 5 and open_row.n_events == 1
    assert state.updated[0] == 5 and state.updated[1] == 1
