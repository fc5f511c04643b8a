"""bigslice_spark: a PySpark-native engine with grailbio/bigslice's
query/data-processing capabilities, plus the relational and LLM-data-pipeline
surface a 100 TB training-data platform needs.

Public API mirrors the reference's combinators (SURVEY.md §2.1) lowered onto
DataFrames; see bigslice_spark.slice.Slice and bigslice_spark.session.Session.
"""

from .pragma import Exclusive, Materialize, Pragma, Procs
from .session import Session, get_spark, load_tables
from .slice import Slice

__all__ = ["Session", "Slice", "get_spark", "load_tables",
           "Pragma", "Procs", "Exclusive", "Materialize"]
__version__ = "0.1.0"
