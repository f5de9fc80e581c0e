"""Streaming funnel: the stateful online twin of
``operators/events.funnel_reach`` (same qualifying semantics), via
``applyInPandasWithState`` — SURVEY §2.6's extension path for
semantics Spark's built-in streaming operators can't express.

Semantics: per user, step 0's time is the earliest step-0 event; step
i's time is the earliest step-i event at or after the user's step i-1
time. A step's time is emitted exactly once, when it becomes FINAL —
no event allowed by the watermark could still change it.

Why finality is decidable: progression times only ever DECREASE as
more events arrive (more step-0 events can only lower t0; a lower
threshold can only lower the first-at-or-after answer). An arriving
event carries ``ts >= watermark`` — enforced explicitly at ingest in
``fn`` (``applyInPandasWithState`` does not auto-drop late rows, so
the operator drops them itself, mirroring ``retention_stream``) — so
once
the watermark passes t_{i-1} (already final) and t_i, no admissible
event can lower either — t_i is final.

Why state is BOUNDED (the r4-verdict concern that shaped the batch
operator's rewrite, applied online): a pending step-i event with
``ts < watermark`` can only become qualifying if the step i-1 time
drops to at most that ts; but step i-1's time can only drop via a new
event, whose ts is at least the watermark. So candidates BELOW the
watermark can never newly qualify and are pruned every invocation —
per-user state is O(events inside the lateness horizon), the same
contract as the streaming sessionizer, and a bot spamming one step
type for a year holds only the last horizon's worth of its events.

Verified against the batch operator (hash-anchored to a DuckDB oracle)
by tests/test_streaming.py parity tests, including out-of-order
delivery across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swanlake_spark.streaming.ingest import _duration_ms


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: float | None = None,
) -> DataFrame:
    """Append-mode stream of finalized funnel steps:
    ``(user_id, step_index, step, step_ts)`` — one row per user per
    step, emitted when the step's time is final (see module
    docstring). ``step_index`` is 1-based, matching the batch
    ``funnel()`` output.

    ``within_s`` bounds later steps to the conversion window after the
    user's step-0 time (the batch operator's semantics). The window's
    deadline moves only when t0 moves — and t0 only decreases — so
    emission still happens strictly at prefix-finality: by the time
    step i can finalize, t0 (hence the deadline) is already final."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from swanlake_spark.pyship import ship_package

    if not steps:
        raise ValueError("funnel needs at least one step")
    ship_package(events.sparkSession)
    horizon_ms = _duration_ms(watermark)
    depth = len(steps)
    # an event type may serve several steps (repeated-step funnels)
    step_idx = {s: [i for i, t in enumerate(steps) if t == s] for s in steps}

    out_schema = (
        "user_id long, step_index int, step string, step_ts timestamp"
    )
    # finals: ms times of the finalized step prefix; cand_*: pending
    # candidate events (step, ts ms), watermark-pruned
    state_schema = "finals array<long>, cand_step array<int>, cand_ts array<long>"

    within_ms = None if within_s is None else int(within_s * 1000)

    def _progress(finals, cands):
        """Current progression times under everything known: the final
        prefix, extended greedily from pending candidates (bounded by
        the conversion window when one is configured)."""
        T = list(finals)
        by_step = {}
        for s, t in cands:
            by_step.setdefault(s, []).append(t)
        for i in range(len(finals), depth):
            theta = T[i - 1] if i else None
            deadline = (
                T[0] + within_ms
                if within_ms is not None and i > 0
                else None
            )
            opts = [
                t for t in by_step.get(i, [])
                if (theta is None or t >= theta)
                and (deadline is None or t <= deadline)
            ]
            if not opts:
                break
            T.append(min(opts))
        return T

    def _emit(user_id, rows):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "step_index": [i + 1 for i, _ in rows],
                "step": [steps[i] for i, _ in rows],
                "step_ts": [pd.Timestamp(t, unit="ms") for _, t in rows],
            }
        )

    def _advance(state, finals, cands, wm):
        """Finalize every step the watermark has sealed, prune dead
        candidates, store or drop state. Returns emitted rows."""
        T = _progress(finals, cands)
        emitted = []
        while len(finals) < len(T) and T[len(finals)] <= wm:
            i = len(finals)
            finals.append(T[i])
            emitted.append((i, T[i]))
        # prune: finalized steps need no candidates; pending steps keep
        # only candidates the watermark still allows to qualify
        cands = [
            (s, t) for s, t in cands if s >= len(finals) and t >= wm
        ]
        if len(finals) == depth and not cands:
            state.remove()
        elif not cands and (len(finals) >= len(T)):
            # nothing pending and nothing can finalize without new
            # events: keep only the final prefix, wake at the horizon
            # to garbage-collect if the user never returns
            if finals:
                state.update((finals, [], []))
                state.setTimeoutTimestamp(wm + horizon_ms)
            else:
                state.remove()
        else:
            state.update((finals, [s for s, _ in cands], [t for _, t in cands]))
            # wake when the next pending finalization can seal: the
            # earliest not-yet-final progression time, else the horizon
            nxt = T[len(finals)] if len(finals) < len(T) else wm + horizon_ms
            state.setTimeoutTimestamp(max(nxt, wm + 1))
        return emitted

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        finals, cands = [], []
        if state.exists:
            f, cs, ct = state.get
            finals = list(f)
            cands = list(zip(cs, ct))
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            rows = _advance(state, finals, cands, wm)
            if rows:
                yield _emit(user_id, rows)
            return
        for pdf in pdf_iter:
            ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).tolist()
            types = pdf[type_col].tolist()
            for t, ty in zip(ts_ms, types):
                # applyInPandasWithState does NOT auto-drop late rows;
                # enforce the documented drop-late contract here (the
                # finality proof assumes arriving ts >= watermark — a
                # below-watermark event admitted into cands could alter
                # an about-to-finalize step in this same invocation)
                if t < wm:
                    continue
                for i in step_idx.get(ty, ()):
                    cands.append((i, t))
        rows = _advance(state, finals, cands, wm)
        if rows:
            yield _emit(user_id, rows)

    filtered = events.filter(F.col(type_col).isin(list(steps)))
    return (
        filtered.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
