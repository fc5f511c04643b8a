"""User metrics: bigslice metrics.Counter ↔ Spark accumulators.

Reference: /root/reference/metrics/metrics.go:24-60 defines counters
incremented inside user funcs and aggregated across tasks into per-scope
values. Spark accumulators are the exact analog: executor-side increments,
driver-side totals, merged by the scheduler.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class Counter:
    """A named distributed counter usable inside mapInPandas/UDF bodies.

    >>> c = Counter(spark, "rows_seen")
    >>> def op(it):
    ...     for pdf in it:
    ...         c.incr(len(pdf))
    ...         yield pdf
    >>> df.mapInPandas(op, df.schema).count(); c.value
    """

    def __init__(self, spark: SparkSession, name: str) -> None:
        self.name = name
        self._acc = spark.sparkContext.accumulator(0)

    def incr(self, n: int = 1) -> None:
        self._acc.add(n)

    @property
    def value(self) -> int:
        return self._acc.value


class Scope:
    """Namespace of counters (reference metrics/scope.go)."""

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._counters: dict[str, Counter] = {}

    def counter(self, name: str) -> Counter:
        if name not in self._counters:
            self._counters[name] = Counter(self._spark, name)
        return self._counters[name]

    def snapshot(self) -> dict[str, int]:
        return {n: c.value for n, c in self._counters.items()}
