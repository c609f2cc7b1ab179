"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin lives in the catalog (`events_sessionize`, lag +
cumulative-sum windows); this is the streaming form the prompt's
training-pipeline story needs: per-user session state survives across
micro-batches, sessions close when the inactivity gap exceeds the
timeout, and closed sessions are emitted exactly once. State per key is
O(1) (running aggregate of the open session), so state size is bounded
by the number of concurrently active users — the standard web-scale
sessionization shape.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_seq int, n_events long, "
    "session_start timestamp, session_end timestamp, closed boolean"
)
STATE_SCHEMA = (
    "session_seq int, n_events long, start_us long, end_us long"
)

GAP_SECONDS = 1800


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:  # pragma: no cover - executor side
    """Fold this key's micro-batch rows into the open-session state,
    emitting every session that closes. Rows are processed in event-time
    order; the open session is carried in state between batches."""
    (user_id,) = key
    if state.hasTimedOut:
        seq, n, start_us, end_us = state.get
        if n == 0:
            # empty placeholder left by a previous timeout close and the
            # user never came back — now it is safe to drop the state
            state.remove()
            return
        # close the idle session but KEEP the sequence counter: removing
        # state here would restart session_seq at 0 on the user's next
        # event, re-using (user_id, session_seq) identities of sessions
        # already emitted as closed (round-1 advisory). Re-seed an empty
        # placeholder at seq+1; if the user stays away, the next timeout
        # removes it (state stays bounded by recently-active users).
        state.update((seq + 1, 0, 0, 0))
        try:
            state.setTimeoutDuration(GAP_SECONDS * 1000)
        except Exception:  # NoTimeout mode
            pass
        yield pd.DataFrame(
            [dict(user_id=user_id, session_seq=seq, n_events=n,
                  session_start=pd.Timestamp(start_us, unit="us"),
                  session_end=pd.Timestamp(end_us, unit="us"), closed=True)]
        )
        return

    ts_all = pd.concat([b["ts"] for b in batches]).sort_values()
    us = (ts_all.astype("int64") // 1000).to_numpy()  # ns → µs

    if state.exists:
        seq, n, start_us, end_us = state.get
    else:
        seq, n, start_us, end_us = 0, 0, None, None

    out = []
    for t in us:
        if n and t - end_us > GAP_SECONDS * 1_000_000:
            out.append(
                dict(user_id=user_id, session_seq=seq, n_events=n,
                     session_start=pd.Timestamp(start_us, unit="us"),
                     session_end=pd.Timestamp(end_us, unit="us"), closed=True)
            )
            seq, n, start_us = seq + 1, 0, None
        if n == 0:
            start_us = int(t)
        n += 1
        end_us = int(t)

    state.update((seq, n, start_us, end_us))
    try:
        state.setTimeoutDuration(GAP_SECONDS * 1000)
    except Exception:  # NoTimeout mode (drain-style availableNow runs)
        pass
    # also emit the still-open session (closed=False) so downstream sees
    # live progress; exactly-once closure is signalled by the flag
    out.append(
        dict(user_id=user_id, session_seq=seq, n_events=n,
             session_start=pd.Timestamp(start_us, unit="us"),
             session_end=pd.Timestamp(end_us, unit="us"), closed=False)
    )
    yield pd.DataFrame(out)


def sessionize_stream(events: DataFrame, *, idle_timeout: bool = True) -> DataFrame:
    """events stream → per-user sessions with explicit keyed state.

    ``idle_timeout=True`` (continuous production streams): idle users'
    open sessions are force-closed after the gap via a processing-time
    timeout. Set False for drain-style ``availableNow`` runs —
    ProcessingTimeTimeout keeps an availableNow query alive, re-firing
    micro-batches until every pending timeout expires (observed: hundreds
    of empty batches), because the trigger must not lose timed-out state.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
