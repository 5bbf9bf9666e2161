"""Per-path driver-fact memo for build-once/probe-many index artifacts.

The ANN index families (MinHash/LSH/IVF/IVF-PQ) and the graph edge state
are immutable-once-built by contract: params rows, centroid matrices and
codebooks never change under a path after the build (appends add
membership/vector rows under the SAME pinned params/centroids). Yet every
probe-query EXECUTION re-ran the driver-side loads — a params ``first()``
job here, a centroids ``toPandas()`` + a fresh ``broadcast()`` there —
paying 2-4 extra Spark jobs per execution and leaking one broadcast per
run (guide §1.2: remove passes the job does not need; §5: the driver
should do almost no data work).

This memo keys on (SparkContext id, index path, fact name) so a restarted
session never sees another context's broadcast handles. BUILD functions
invalidate their path (rebuild-in-place safety); appends do not touch the
pinned facts, so they do not invalidate. The cache is in-process only —
exactly the scope of the memoized index builds the bench's warm-up
amortizes — and never holds query RESULTS, only build-pinned metadata.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}


def index_fact(spark, path: str, key: str, compute: Callable[[], Any]) -> Any:
    """Memoized driver-side fact of an immutable index under ``path``."""
    k = (spark.sparkContext.applicationId, path, key)
    if k not in _CACHE:
        _CACHE[k] = compute()
    return _CACHE[k]


def invalidate_index(path: str) -> None:
    """Drop every cached fact under ``path`` (a rebuild replaced it)."""
    for k in [k for k in _CACHE if k[1] == path]:
        del _CACHE[k]
