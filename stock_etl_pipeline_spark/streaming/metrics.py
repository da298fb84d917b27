"""Watermark-lateness observability for streams: the reference's freshness
gate (dags/utils/validators.py:254-309), re-expressed for Structured
Streaming (ROADMAP item: surface dropped-late-row counts in-stream).

Three pieces, batch-cost-free by construction:

- :func:`observe_freshness` attaches ``df.observe(...)`` metrics (row count,
  min/max event time) that Spark computes INLINE with each micro-batch — an
  accumulator piggybacked on the existing plan, not an extra pass over the
  data. This matters at scale: the reference's freshness check is a separate
  full-table ``max(date)`` scan per run; here freshness is a by-product of
  the batch that just ran.
- :func:`freshness_report` folds a query's progress history (each
  micro-batch's ``StreamingQueryProgress``) into the reference's uniform
  ``(passed, {passed, errors, warnings, metrics})`` contract: dropped-late
  rows come from the state store's ``numRowsDroppedByWatermark`` counters,
  staleness from the observed max event time vs the frozen ``as_of`` clock.
- :class:`LatenessListener` streams the same fold incrementally via
  ``StreamingQueryListener`` for long-running jobs (no polling of
  ``recentProgress``, which is a bounded ring buffer and forgets old
  batches).

Scale notes: every number here is already maintained by the streaming
runtime per micro-batch; aggregating it is driver-side arithmetic over
progress JSON. State-store metrics shard with the state store itself, so the
counters are exact regardless of parallelism.

Measured Spark semantics worth knowing (pinned by
tests/test_streaming_metrics.py):

- Watermark dropping is BEST-EFFORT ("may or may not process late data").
  The late-event filter uses the watermark in effect before the batch that
  advanced it (one-batch lag), so a late batch arriving immediately after
  the advancing batch can pass through, form already-expired windows, and be
  emitted at once. Only once the watermark has settled do late rows hit the
  filter and increment ``numRowsDroppedByWatermark``.
- ``dropDuplicatesWithinWatermark`` never drops late rows — it only bounds
  dedup state; a late non-duplicate passes through.
Consequence: ``rows_dropped_late`` is a lower bound on lateness; the
observed ``min_event_ts`` vs ``watermark`` gap in the same report is the
complementary detection signal for late arrivals the engine chose to accept.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..quality import QualityReport

OBSERVATION_NAME = "freshness"


def observe_freshness(
    df: DataFrame, *, ts_col: str = "ts", name: str = OBSERVATION_NAME
) -> DataFrame:
    """Attach per-micro-batch observed metrics: row count and min/max event
    time. Computed inline with the batch (observe = named accumulator node in
    the same plan — no second pass, no extra shuffle)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts_col).alias("min_event_ts"),
        F.max(ts_col).alias("max_event_ts"),
    )


def _progress_dict(progress) -> dict:
    """Normalize a StreamingQueryProgress (object, json string, or dict)."""
    if isinstance(progress, dict):
        return progress
    if isinstance(progress, str):
        return json.loads(progress)
    return json.loads(progress.json)


def _parse_ts(s: str | None) -> datetime | None:
    if not s:
        return None
    return datetime.fromisoformat(s.replace("Z", "+00:00")).replace(tzinfo=None)


@dataclass
class _Fold:
    """Running totals across micro-batches."""

    n_batches: int = 0
    n_rows: int = 0
    rows_dropped_late: int = 0
    max_event_ts: datetime | None = None
    min_event_ts: datetime | None = None
    watermark: datetime | None = None

    def add(self, progress, observation: str = OBSERVATION_NAME) -> None:
        p = _progress_dict(progress)
        self.n_batches += 1
        obs = (p.get("observedMetrics") or {}).get(observation)
        if obs is not None and hasattr(obs, "asDict"):  # pyspark Row
            obs = obs.asDict()
        if obs:
            self.n_rows += int(obs.get("n_rows") or 0)
            lo = _parse_ts(obs.get("min_event_ts"))
            hi = _parse_ts(obs.get("max_event_ts"))
            if lo is not None and (self.min_event_ts is None or lo < self.min_event_ts):
                self.min_event_ts = lo
            if hi is not None and (self.max_event_ts is None or hi > self.max_event_ts):
                self.max_event_ts = hi
        for op in p.get("stateOperators") or []:
            self.rows_dropped_late += int(op.get("numRowsDroppedByWatermark") or 0)
        wm = _parse_ts((p.get("eventTime") or {}).get("watermark"))
        if wm is not None and (self.watermark is None or wm > self.watermark):
            self.watermark = wm


def freshness_report(
    progresses,
    *,
    observation: str = OBSERVATION_NAME,
    as_of: str | datetime | None = None,
    max_behind_s: float | None = None,
    max_dropped_late: int = 0,
) -> tuple[bool, dict]:
    """Fold progress history into the reference's freshness-gate contract.

    Errors (gate fails) when the newest observed event time lags ``as_of`` by
    more than ``max_behind_s`` — the streaming twin of the reference's
    ``max(date) >= now - max_age_days`` hard gate — or when no rows were ever
    observed (the reference fails on empty input, validators.py:86-89).
    Dropped-late rows beyond ``max_dropped_late`` warn: data arrived, but
    outside the watermark horizon, i.e. the horizon is too tight for the
    source's actual lateness distribution.
    """
    fold = _Fold()
    for p in progresses:
        fold.add(p, observation)
    report = QualityReport()
    report.metrics = {
        "n_batches": fold.n_batches,
        "n_rows": fold.n_rows,
        "rows_dropped_late": fold.rows_dropped_late,
        "max_event_ts": fold.max_event_ts.isoformat() if fold.max_event_ts else None,
        "min_event_ts": fold.min_event_ts.isoformat() if fold.min_event_ts else None,
        "watermark": fold.watermark.isoformat() if fold.watermark else None,
    }
    if fold.n_rows == 0:
        report.error("no rows observed by the stream")
    if as_of is not None and fold.max_event_ts is not None:
        ref = _parse_ts(as_of) if isinstance(as_of, str) else as_of
        behind = (ref - fold.max_event_ts).total_seconds()
        report.metrics["seconds_behind"] = behind
        if max_behind_s is not None and behind > max_behind_s:
            report.error(
                f"stream is {behind:.0f}s behind as_of "
                f"(threshold {max_behind_s:.0f}s)"
            )
    if fold.rows_dropped_late > max_dropped_late:
        report.warn(
            f"{fold.rows_dropped_late} rows dropped past the watermark "
            f"(threshold {max_dropped_late}) — widen the lateness horizon?"
        )
    return report.as_tuple()


def lateness_listener(observation: str = OBSERVATION_NAME):
    """StreamingQueryListener folding lateness metrics incrementally.

    Register with ``spark.streams.addListener(listener)``; read
    ``listener.progresses`` / pass them to :func:`freshness_report` at any
    point. Survives arbitrarily long runs — the listener keeps the FOLD, not
    the history, unlike ``recentProgress`` (a bounded ring buffer). Built by
    a factory so importing this module never touches the streaming runtime.
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _LatenessListener(StreamingQueryListener):
        def __init__(self) -> None:
            self.fold = _Fold()

        def onQueryStarted(self, event) -> None:
            pass

        def onQueryProgress(self, event) -> None:
            self.fold.add(event.progress, observation)

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            pass

        def report(self, **kwargs) -> tuple[bool, dict]:
            # Serialize the fold into one synthetic progress dict and run it
            # through the public fold → single source of truth for
            # thresholds/contract.
            f = self.fold
            synthetic = {
                "observedMetrics": {
                    observation: {
                        "n_rows": f.n_rows,
                        "min_event_ts": f.min_event_ts.isoformat() if f.min_event_ts else None,
                        "max_event_ts": f.max_event_ts.isoformat() if f.max_event_ts else None,
                    }
                },
                "stateOperators": [
                    {"numRowsDroppedByWatermark": f.rows_dropped_late}
                ],
                "eventTime": {
                    "watermark": f.watermark.isoformat() if f.watermark else None
                },
            }
            passed, rep = freshness_report(
                [synthetic], observation=observation, **kwargs
            )
            rep["metrics"]["n_batches"] = f.n_batches
            return passed, rep

    return _LatenessListener()
