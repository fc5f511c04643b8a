"""Driver-list → DataFrame through the Arrow path — no Python workers
at action time.

``SparkSession.createDataFrame(list_of_tuples)`` backs the relation
with a PICKLED PYTHON RDD: every action that touches it — including
every broadcast-exchange build — schedules ``defaultParallelism``
PythonRDD tasks, each requiring a live Python worker process. For the
tiny driver-side relations the operators broadcast (needed-trigram
sets, centroid tables, literal/pattern lists) that is pure overhead:
measured on a loaded 32-core box, ONE 20-row broadcast build took up
to ~9s when worker spin-up degraded (three such builds run
concurrently in trigram_search), and even healthy it is a 32-task
Python round-trip inside an otherwise JVM-only plan.

``local_df`` instead converts the rows ONCE, driver-side, into Arrow
record batches that are handed straight to the JVM
(``createDataFrame(pandas)`` with Arrow enabled): actions over the
result never touch a Python worker, and the relation behaves like any
other JVM-local input. Values are bit-identical — only the transport
changes; the explicit DDL schema pins column names and types exactly
as before (pinned in tests/test_r15_optimizations.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _ddl_names(ddl: str) -> list[str]:
    """Column names of a DDL schema string, respecting nesting
    (``array<...>``, ``map<k,v>``, ``struct<...>`` commas)."""
    names: list[str] = []
    depth = 0
    field = ""
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            names.append(field.strip().split()[0].strip("`"))
            field = ""
        else:
            field += ch
    if field.strip():
        names.append(field.strip().split()[0].strip("`"))
    return names


def local_df(spark, rows, ddl: str) -> DataFrame:
    """Build a DataFrame from driver-side ``rows`` (list of tuples in
    the DDL's column order) with schema ``ddl``, Arrow-backed."""
    import pandas as pd

    cols = _ddl_names(ddl)
    pdf = pd.DataFrame.from_records(list(rows), columns=cols)
    return spark.createDataFrame(pdf, schema=ddl)
