"""Streaming observability (SURVEY.md §2B D11 — the monitoring.metrics /
alerts config the reference declares but never implements).

A StreamingQueryListener collects per-batch progress (rows, duration,
state size) into a driver-side buffer; `alerts_for` applies the
reference's declared alert shape ("alert when a run fails / processes
zero records", config/config.json:64-68) to the collected metrics.
Listener callbacks run on the driver's listener bus — O(1) per batch,
nothing touches the executors, so it costs the same at 100 TB as at
100 rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    duration_ms: int | None
    state_rows: int | None


@dataclass
class StreamMetrics(StreamingQueryListener):
    """Collects progress events; attach via spark.streams.addListener."""

    batches: list[BatchMetric] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = None
        if p.stateOperators:
            state_rows = sum(s.numRowsTotal for s in p.stateOperators)
        self.batches.append(
            BatchMetric(
                query_name=p.name or "",
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=(p.durationMs or {}).get("triggerExecution"),
                state_rows=state_rows,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append(str(event.id))
        if event.exception:
            self.errors.append(event.exception)

    # -- aggregate views ----------------------------------------------------

    def total_rows(self, query_name: str | None = None) -> int:
        return sum(
            b.num_input_rows
            for b in self.batches
            if query_name is None or b.query_name == query_name
        )


def alerts_for(metrics: StreamMetrics) -> list[str]:
    """The reference's declared alert policy over collected metrics:
    'alert_on_failure' and zero-record runs (setup_secrets.py:125-130)."""
    alerts = [f"failure: {e.splitlines()[0]}" for e in metrics.errors]
    if metrics.batches and metrics.total_rows() == 0:
        alerts.append("zero records processed")
    return alerts
