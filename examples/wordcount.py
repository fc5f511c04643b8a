"""The reference's flagship demo (docs/index.md:88-121):
ScanReader → Flatmap → Map → Reduce → scan, on the Slice API.

Run: python examples/wordcount.py [sf_dir]
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import pyspark.sql.functions as F

from bigslice_spark import Session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sess = Session()
    wc = (sess.read_parquet(f"{sf_dir}/documents.parquet")
          .map_(F.split(F.col("text"), r"\s+").alias("token"))
          .flatmap(F.col("token").alias("token"))
          .filter_(F.col("token") != "")
          .map_(F.col("token"), F.lit(1).alias("n"), prefix=1)
          .reduce_("sum")
          .top_k(10, F.desc("n"), "token"))
    for token, n in wc.collect():
        print(f"{token}\t{n}")


if __name__ == "__main__":
    main()
