"""The event-analytics surface, end to end on this engine:

  hierarchical time rollup → retention cohorts → funnel → top event
  paths → per-user percentiles + winsorization → rolling z-score
  anomalies → EWMA state → subsequence pattern search → SCD2
  history → recursive-CTE calendar gap-fill.

Every stage is one of the audited operators (the same compositions
the registry entries oracle-check); this script is the runnable tour
with one-line outputs per stage.

Run: python examples/analytics_tour.py [sf_dir]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pyspark.sql.functions as F

from bigslice_spark import Session
from bigslice_spark.session import load_tables
from bigslice_spark.operators.funnel import funnel
from bigslice_spark.operators.rank import key_percentiles, winsorize
from bigslice_spark.operators.timeseries import (retention_cohorts,
                                                 rolling_zscore,
                                                 time_rollup,
                                                 ts_pattern_search)
from bigslice_spark.operators.upsert import scd2_intervals


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sess = Session()
    spark = sess.spark
    # load_tables normalizes the ts encoding (nanos/ntz variants)
    ev = load_tables(spark, sf_dir)["events"]

    days = time_rollup(ev).filter(
        F.col("day_us").isNotNull() & F.col("hour_us").isNull())
    print(f"rollup\t{days.count()} day buckets")

    coh = retention_cohorts(ev)
    print(f"retention\t{coh.count()} cohort cells")

    fun = funnel(ev, ["view", "click", "purchase"])
    depth3 = fun.filter(F.col("depth") == 3).count()
    print(f"funnel\t{depth3} users completed all 3 steps")

    w = __import__("pyspark.sql", fromlist=["Window"]).Window \
        .partitionBy("user_id").orderBy("ts", "event_id")
    path = F.concat_ws(">", F.col("event_type"),
                       F.lead("event_type", 1).over(w),
                       F.lead("event_type", 2).over(w))
    top = (ev.select(path.alias("p"),
                     F.lead("event_type", 2).over(w).alias("ok"))
           .filter(F.col("ok").isNotNull())
           .groupBy("p").count()
           .orderBy(F.col("count").desc(), "p").limit(3).collect())
    print("paths\t" + ", ".join(f"{r['p']}x{r['count']}" for r in top))

    pct = key_percentiles(ev, "user_id", "value",
                          order_cols=["event_id"])
    print(f"percentiles\t{pct.count()} users profiled")
    wz = winsorize(ev, "user_id", "value", "event_id")
    clamped = wz.filter(F.col("value") != F.col("value_w")).count()
    print(f"winsorize\t{clamped} values clamped")

    anom = rolling_zscore(ev, "user_id", "ts", "value",
                          order_cols=["event_id"], window=20,
                          min_n=8, z_threshold=2.0)
    print(f"anomalies\t{anom.count()} flagged")

    hits = ts_pattern_search(ev, "user_id", "ts", "value",
                             [100.0 * i for i in range(1, 9)], k=3,
                             order_cols=["event_id"]).collect()
    print(f"pattern\tbest dist {hits[0]['dist']:.1f}" if hits
          else "pattern\tno window")

    hist = scd2_intervals(
        ev.select("event_id", "user_id", "ts", "value"),
        ["user_id"], "ts", order_cols=["event_id"])
    cur = hist.filter(F.col("is_current")).count()
    print(f"scd2\t{cur} current intervals")

    spine = __import__("bigslice_spark.queries",
                       fromlist=["QUERIES"]).QUERIES[
        "date_spine_gapfill"](spark, sf_dir)
    zero = spine.filter(F.col("n_events") == 0).count()
    print(f"gapfill\t{zero} zero-filled days")


if __name__ == "__main__":
    main()
