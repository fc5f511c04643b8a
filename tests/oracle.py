"""Oracle-compare helper: mirrors the driver's protocol (FIXTURES.md) —
sort columns by name, sort rows, normalize floats, compare.

The analog of the reference's assertColumnsEqual
(/root/reference/slice_test.go:105-160) with DuckDB as the second engine.
"""

from __future__ import annotations

import math
from datetime import datetime
from typing import Any


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def assert_matches_duckdb(sdf, duck, sql: str) -> None:
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    rel = duck.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), \
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    sc, dc = canon(s_rows, s_cols), canon(d_rows, d_cols)
    assert len(sc) == len(dc), f"row count: spark={len(sc)} duck={len(dc)}"
    for i, (a, b) in enumerate(zip(sc, dc)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"
