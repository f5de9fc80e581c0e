"""Streaming cohort retention: the stateful online twin of
``operators/events.retention`` (same cohort/offset semantics).

Emits one ``(user_id, cohort, offset, period)`` row per (user,
activity period), append-mode, exactly when the row is FINAL:

- a user's COHORT (first-activity period) can only move EARLIER as
  late events arrive, and an event moving it must carry a timestamp
  before the current cohort's period start — impossible once the
  watermark passes that start. So rows are held until the cohort is
  watermark-final, then emitted with the settled offset;
- a (user, period) pair itself never changes (activity is presence),
  so each emits at most once; the duplicate-suppression set keeps only
  periods whose END the watermark hasn't passed (an event in an older
  period would be watermark-dropped), and the pre-final holding pen is
  bounded by the lateness horizon (cohort not yet final means every
  observed period lies within one horizon of the cohort start).

Per-user state is therefore O(periods inside the lateness horizon) —
the same bounded-state contract as the streaming sessionizer and
funnel. Downstream ``groupBy(cohort, offset).count()`` reproduces the
batch operator's counts because emissions are unique per
(user, period); the parity test asserts exactly that.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swanlake_spark.streaming.ingest import _duration_ms

_DAY_MS = 86_400_000


def _period_start_ms(ts_ms: int, period: str) -> int:
    """UTC period start for a ms timestamp — same truncation as
    Spark's ``date_trunc`` under the engine's UTC session."""
    if period == "day":
        return (ts_ms // _DAY_MS) * _DAY_MS
    if period == "week":
        day = ts_ms // _DAY_MS
        # epoch day 0 = Thursday; Monday-aligned ISO weeks start at
        # epoch day -3 (1969-12-29), matching date_trunc('week')
        return ((day + 3) // 7 * 7 - 3) * _DAY_MS
    if period == "month":
        d = _dt.datetime.utcfromtimestamp(ts_ms / 1000.0)
        return int(
            _dt.datetime(d.year, d.month, 1, tzinfo=_dt.timezone.utc)
            .timestamp() * 1000
        )
    raise ValueError(f"unsupported period: {period}")


def _offset(cohort_ms: int, p_ms: int, period: str) -> int:
    if period == "day":
        return (p_ms - cohort_ms) // _DAY_MS
    if period == "week":
        return (p_ms - cohort_ms) // (7 * _DAY_MS)
    a = _dt.datetime.utcfromtimestamp(cohort_ms / 1000.0)
    b = _dt.datetime.utcfromtimestamp(p_ms / 1000.0)
    return (b.year - a.year) * 12 + (b.month - a.month)


def _period_end_ms(p_ms: int, period: str) -> int:
    if period == "day":
        return p_ms + _DAY_MS
    if period == "week":
        return p_ms + 7 * _DAY_MS
    d = _dt.datetime.utcfromtimestamp(p_ms / 1000.0)
    y, m = (d.year + 1, 1) if d.month == 12 else (d.year, d.month + 1)
    return int(
        _dt.datetime(y, m, 1, tzinfo=_dt.timezone.utc).timestamp() * 1000
    )


def retention_stream(
    events: DataFrame,
    period: str = "week",
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Append-mode stream of finalized per-user retention rows (see
    module docstring). ``groupBy(cohort, offset).count()`` over the
    sink equals the batch ``retention`` counts once all data is in."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from swanlake_spark.pyship import ship_package

    ship_package(events.sparkSession)
    horizon_ms = _duration_ms(watermark)
    out_schema = (
        "user_id long, cohort timestamp, offset int, period timestamp"
    )
    # cohort: candidate first-activity period (-1 = none yet);
    # emitted: period starts already emitted (dup suppression, pruned
    # once the watermark passes their end); pending: observed periods
    # awaiting cohort finality
    state_schema = (
        "cohort long, emitted array<long>, pending array<long>"
    )

    def _emit(user_id, cohort, periods):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(periods),
                "cohort": [pd.Timestamp(cohort, unit="ms")] * len(periods),
                "offset": [_offset(cohort, p, period) for p in periods],
                "period": [pd.Timestamp(p, unit="ms") for p in periods],
            }
        )

    def _advance(state, cohort, emitted, pending, wm):
        """Emit what the watermark has settled; prune; store/drop."""
        out = []
        if cohort >= 0 and wm >= cohort:
            # cohort final: flush every pending period not yet emitted
            for p in sorted(set(pending)):
                if p not in emitted:
                    out.append(p)
                    emitted.append(p)
            pending = []
        emitted = [
            p for p in emitted if _period_end_ms(p, period) > wm
        ]
        if cohort < 0 and not pending and not emitted:
            state.remove()
            return out, cohort
        state.update((cohort, sorted(emitted), sorted(set(pending))))
        # wake when the cohort can finalize, else at the horizon (to
        # prune the dup-suppression set of a gone-quiet user)
        nxt = cohort if (cohort >= 0 and pending) else wm + horizon_ms
        state.setTimeoutTimestamp(max(nxt, wm + 1))
        return out, cohort

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        cohort, emitted, pending = -1, [], []
        if state.exists:
            c, em, pe = state.get
            cohort, emitted, pending = int(c), list(em), list(pe)
        if state.hasTimedOut:
            out, c = _advance(
                state, cohort, emitted, pending,
                state.getCurrentWatermarkMs(),
            )
            if out:
                yield _emit(user_id, c, out)
            return
        wm_now = state.getCurrentWatermarkMs()
        for pdf in pdf_iter:
            for t in (pdf[ts_col].astype("int64") // 1_000_000).tolist():
                p = _period_start_ms(int(t), period)
                # flatMapGroupsWithState does NOT auto-drop late rows
                # (only aggregations do); an event in a period the
                # watermark has fully passed is dropped here — its
                # dup-suppression entry may already be pruned, and
                # re-emitting would double-count. Same contract a
                # watermarked aggregation applies.
                if _period_end_ms(p, period) <= wm_now:
                    continue
                if cohort < 0 or p < cohort:
                    cohort = p
                if p not in emitted:
                    pending.append(p)
        out, c = _advance(
            state, cohort, emitted, pending, state.getCurrentWatermarkMs()
        )
        if out:
            yield _emit(user_id, c, out)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
