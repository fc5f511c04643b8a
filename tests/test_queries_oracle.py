"""Runs EVERY registered query against its DuckDB oracle at the test SF —
the local mirror of the driver's CORRECTNESS gate."""

import pytest

from bigslice_spark.queries import ORACLE, QUERIES
from .oracle import assert_matches_duckdb


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLE:
        # The DRIVER's canonicalizer pandas-sort_values every column;
        # list/dict cells raise "unhashable type" there (reproduced in
        # CORRECTNESS_r12 source_protobuf), so oracled entries must
        # project complex columns to scalar leaves before returning —
        # the source_avro_complex contract (VERDICT r12 task 1 guard).
        from pyspark.sql.types import ArrayType, MapType
        bad = [f.name for f in df.schema.fields
               if isinstance(f.dataType, (ArrayType, MapType))]
        assert not bad, (
            f"{name} returns top-level complex columns {bad}; the "
            f"driver's pandas canonicalizer cannot sort them — "
            f"project to scalar leaves (size/element_at/getField)")
        assert_matches_duckdb(df, duck, ORACLE[name])
    else:
        assert df.count() >= 0  # rows-only check, like the driver


def test_readme_registry_count_current():
    """README.md's '<N>-query registry' line must track len(QUERIES) —
    it went stale twice (e58dd8c, VERDICT r10 'What's wrong')."""
    import pathlib
    import re
    text = pathlib.Path(__file__).parent.parent.joinpath(
        "README.md").read_text()
    m = re.search(r"(\d+)-query registry", text)
    assert m, "README.md lost its '<N>-query registry' line"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)}-query registry but len(QUERIES) is "
        f"{len(QUERIES)} — update README.md")
