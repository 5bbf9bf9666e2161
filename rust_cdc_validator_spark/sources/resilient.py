"""Error-continue sink semantics (SURVEY.md §7 hard-part 4).

The reference logs failed insert chunks and continues the loop
(src/postgres/postgres_operator_impl.rs:248-261) — failures vanish into
logs. Here the same resilience is explicit: a partition-wise sink that
captures per-chunk failures into an accumulator and returns them as a
report, so the caller decides whether partial success is acceptable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass


@dataclass
class WriteReport:
    """Outcome of a resilient write: counts + captured failures."""

    rows_attempted: int
    rows_written: int
    failures: list[str]

    @property
    def ok(self) -> bool:
        return not self.failures


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
    failures = sc.accumulator([], _ListAccum())

    def run_partition(pid: int, rows: Iterator) -> Iterator:
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
                failures.add([f"partition={pid} chunk={chunk_no}: {exc!r}"])
            chunk_no += 1
            buf.clear()

        for row in rows:
            buf.append(row)
            if len(buf) >= chunk_size:
                flush()
        flush()
        return iter(())

    df.rdd.mapPartitionsWithIndex(run_partition).count()  # force execution
    return WriteReport(
        rows_attempted=attempted.value,
        rows_written=written.value,
        failures=list(failures.value),
    )


class _ListAccum:
    """AccumulatorParam for list concatenation."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a
