"""Error-continue sink semantics (SURVEY.md §7 hard-part 4).

The reference logs failed insert chunks and continues the loop
(src/postgres/postgres_operator_impl.rs:248-261) — failures vanish into
logs. Here the same resilience is explicit: a partition-wise sink that
captures per-chunk failures into accumulators and returns them as a
report, so the caller decides whether partial success is acceptable.

Execution is an ACTION (``foreachPartition``), not a counted
transformation: Spark applies accumulator updates from actions exactly
once per successful task, so the report stays correct under task retries
and speculative execution.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark import TaskContext

# cap the failure detail shipped to the driver: a total outage on a
# 100 TB job would otherwise accumulate millions of strings
MAX_FAILURE_SAMPLES = 100


@dataclass
class WriteReport:
    """Outcome of a resilient write: counts + a bounded failure sample."""

    rows_attempted: int
    rows_written: int
    failure_count: int
    failures: list[str]  # first MAX_FAILURE_SAMPLES, with partition/chunk context

    @property
    def ok(self) -> bool:
        return self.failure_count == 0


def resilient_foreach_sink(
    df,
    write_chunk: Callable[[list], None],
    chunk_size: int = 10_000,
) -> WriteReport:
    """Apply ``write_chunk`` to ≤chunk_size row batches per partition;
    failures are captured (with partition/chunk context) instead of failing
    the job — the reference's error-continue loop, surfaced.

    ``write_chunk`` runs on executors: it must be serializable and touch
    only executor-reachable resources (a JDBC connection opened inside it,
    a REST endpoint, ...).
    """
    sc = df.sparkSession.sparkContext
    written = sc.accumulator(0)
    attempted = sc.accumulator(0)
    n_failures = sc.accumulator(0)
    failure_samples = sc.accumulator([], _ListAccum())

    def run_partition(rows: Iterator) -> None:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        buf: list = []
        chunk_no = 0

        def flush():
            nonlocal chunk_no
            if not buf:
                return
            attempted.add(len(buf))
            try:
                write_chunk(list(buf))
                written.add(len(buf))
            except Exception as exc:  # error-continue: capture, keep going
                n_failures.add(1)
                failure_samples.add([f"partition={pid} chunk={chunk_no}: {exc!r}"])
            chunk_no += 1
            buf.clear()

        for row in rows:
            buf.append(row)
            if len(buf) >= chunk_size:
                flush()
        flush()

    df.foreachPartition(run_partition)
    samples = list(failure_samples.value)[:MAX_FAILURE_SAMPLES]
    return WriteReport(
        rows_attempted=attempted.value,
        rows_written=written.value,
        failure_count=n_failures.value,
        failures=samples,
    )


class _ListAccum:
    """AccumulatorParam for bounded list concatenation (driver-side merge
    keeps only the first MAX_FAILURE_SAMPLES entries)."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        if len(a) < MAX_FAILURE_SAMPLES:
            a.extend(b[: MAX_FAILURE_SAMPLES - len(a)])
        return a
