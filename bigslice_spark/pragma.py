"""Pragma: per-operator runtime directives (reference slice.go:107-200).

The reference lets a slice op declare resource needs to the scheduler:

- ``Procs(n)``   — a task of this op occupies n procs, so at most
                   ``machine_procs / n`` of its tasks run per machine;
- ``Exclusive``  — a task gets a whole machine;
- ``ExperimentalMaterialize`` — break pipelining after this op.

Spark's scheduler has no public per-*stage* CPU reservation for SQL
plans (``spark.task.cpus`` is application-wide; stage-level
ResourceProfiles attach to RDDs, not DataFrames), so the portable
mechanism here is **concurrency capping by partition count**: a stage
with k partitions runs at most k concurrent tasks, so repartitioning the
heavy op's INPUT to ``total_cores // n`` gives each running task ~n
cores' worth of CPU/memory headroom — on any master, local or cluster.
This is what Procs is for in practice (a model-scoring mapInPandas whose
Python worker uses BLAS threads or gigabytes of RAM next to cheap
scans). ``repartition`` (not ``coalesce``) on purpose: coalesce
propagates the reduced parallelism UP into the cheap upstream stage,
which is exactly wrong.

Differences from the reference, stated honestly:

- the cap is cluster-WIDE (total_cores/n concurrent tasks), while the
  reference enforces per-machine occupancy; Spark may co-schedule two
  capped tasks on one executor. For hard per-task reservation on a real
  cluster, set ``spark.task.cpus`` app-wide or use
  ``task_resource_profile`` (below) on an RDD stage.
- ``Exclusive`` caps concurrency to the number of executors (one task
  per executor *on average*; 1 in local mode, where the one JVM is the
  one machine).

``Materialize`` maps exactly: checkpoint.materialize (eager, breaks
pipelining), the same mechanism our iterative operators use.

Composition mirrors ``Pragmas`` (slice.go:122-155): max of procs,
OR of exclusive/materialize — ``Procs(4) | Exclusive`` etc.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .checkpoint import materialize as _materialize


@dataclass(frozen=True)
class Pragma:
    """A composable runtime directive. Compose with ``|``."""
    procs: int = 1
    exclusive: bool = False
    materialize: bool = False

    def __post_init__(self) -> None:
        if self.procs < 1:
            raise ValueError(f"Procs({self.procs}): need >= 1")

    def __or__(self, other: "Pragma") -> "Pragma":
        if not isinstance(other, Pragma):
            return NotImplemented
        return Pragma(procs=max(self.procs, other.procs),
                      exclusive=self.exclusive or other.exclusive,
                      materialize=self.materialize or other.materialize)


Exclusive = Pragma(exclusive=True)
Materialize = Pragma(materialize=True)


def Procs(n: int) -> Pragma:
    """A task of the annotated op needs ``n`` procs (slice.go:190-200).
    Clamped to the per-machine proc count at apply time, like the
    reference clamps to machine capacity."""
    return Pragma(procs=n)


def total_cores(spark: SparkSession) -> int:
    """Total task slots across the app — ``defaultParallelism`` (= total
    executor cores on a cluster, n for ``local[n]``)."""
    return max(1, spark.sparkContext.defaultParallelism)


def num_executors(spark: SparkSession) -> int:
    """Executor count ("machines"): 1 in local mode, else live executors
    (statusTracker lists executors incl. the driver row on some masters —
    filtered by id)."""
    master = spark.conf.get("spark.master", "local")
    if master == "local" or master.startswith("local["):
        return 1
    infos = spark.sparkContext.statusTracker().getExecutorInfos()
    n = sum(1 for e in infos if getattr(e, "executorId", "") != "driver")
    return max(1, n or len(infos) - 1)


def concurrency_cap(spark: SparkSession, pragma: Pragma) -> int | None:
    """Max concurrent tasks the pragma allows, or None for no cap."""
    if pragma.exclusive:
        return num_executors(spark)
    if pragma.procs > 1:
        cores = total_cores(spark)
        per_machine = max(1, cores // num_executors(spark))
        procs = min(pragma.procs, per_machine)  # reference clamp
        return max(1, cores // procs)
    return None


def apply_pragma(df: DataFrame, pragma: Pragma | None,
                 keys: "list[str] | None" = None) -> DataFrame:
    """Apply a pragma at this point of the plan: cap the concurrency of
    whatever runs NEXT (repartition), and/or materialize what ran BEFORE.

    ``keys``: for a grouped stage (fold/applyInPandas), pass the group
    keys so the cap rides the SAME hash exchange the groupBy needs
    (``repartition(cap, *keys)`` satisfies the grouping distribution, so
    Catalyst adds no second exchange that would undo the cap).

    Usage: ``apply_pragma(df, Procs(8)).mapInPandas(heavy_fn, schema)``
    or through the Slice fn-paths' ``pragma=`` argument."""
    if pragma is None:
        return df
    if pragma.materialize:
        df = _materialize(df)
    cap = concurrency_cap(df.sparkSession, pragma)
    if cap is not None:
        df = df.repartition(cap, *keys) if keys else df.repartition(cap)
    return df


def task_resource_profile(spark: SparkSession, cpus: int):
    """Stage-level scheduling escape hatch for RDD stages on real
    clusters (requires dynamic allocation on YARN/K8s/standalone):
    ``rdd.withResources(task_resource_profile(spark, 4))``. DataFrame
    plans cannot carry ResourceProfiles — use apply_pragma for those."""
    from pyspark.resource import ResourceProfileBuilder, TaskResourceRequests
    return (ResourceProfileBuilder()
            .require(TaskResourceRequests().cpus(cpus)).build)
