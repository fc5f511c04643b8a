"""Phase-0 end-to-end: word count (the reference's flagship demo,
docs/index.md:88-121 ScanReader→Flatmap→Map→Reduce→scan) and TPC-H-ish Q1,
oracle-checked against DuckDB."""

import pyspark.sql.functions as F

from bigslice_spark import Slice
from .oracle import assert_matches_duckdb


def test_wordcount_slice_api(session, tables, duck, sf_dir):
    docs = session.read_parquet(f"{sf_dir}/documents.parquet")
    wc = (
        docs
        .map_(F.split(F.col("text"), r"\s+").alias("token"))
        .flatmap(F.col("token").alias("token"))
        .filter_(F.col("token") != "")
        .map_(F.col("token").alias("token"), F.lit(1).alias("n"),
              prefix=1)
        .reduce_("sum")
    )
    assert_matches_duckdb(
        wc.df, duck,
        """
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY token
        """)


def test_q1_pricing_summary(session, duck, sf_dir):
    li = session.read_parquet(f"{sf_dir}/lineitem.parquet")
    q1 = (
        li.prefixed(1)
        .map_(F.col("l_returnflag"), F.col("l_linestatus"),
              F.col("l_quantity"), F.col("l_extendedprice"),
              F.col("l_discount"), prefix=2)
        .fold(aggs={
            "sum_qty": F.round(F.sum("l_quantity"), 2),
            "sum_base_price": F.round(F.sum("l_extendedprice"), 2),
            "sum_disc_price": F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2),
            "avg_disc": F.round(F.avg("l_discount"), 6),
            "count_order": F.count(F.lit(1)),
        })
    )
    assert_matches_duckdb(
        q1.df, duck,
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """)
