"""Streaming + non-parquet source tests."""

import io
import os
import tarfile
import tempfile

import pyspark.sql.functions as F


def test_stream_tumbling_equals_batch(spark, sf_dir, tables):
    from bigslice_spark.streaming import (run_to_completion, stream_events,
                                          tumbling_counts)
    ev = stream_events(spark, sf_dir)
    got = run_to_completion(tumbling_counts(ev, "1 hour"), "t_tumble")
    batch = (tables["events"]
             .groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
             .agg(F.count(F.lit(1)).alias("n")))
    g = {(r["hr"], r["event_type"]): r["n"] for r in got.collect()}
    b = {(r["hr"], r["event_type"]): r["n"] for r in batch.collect()}
    assert g == b


def test_stream_sessions_match_batch_sessionize(spark, sf_dir):
    from bigslice_spark.queries import QUERIES
    from bigslice_spark.streaming import (run_to_completion, session_windows,
                                          stream_events)
    ev = stream_events(spark, sf_dir)
    got = run_to_completion(session_windows(ev, "30 minutes"), "t_sess")
    batch_sessions = QUERIES["sessionize"](spark, sf_dir).count()
    assert got.count() == batch_sessions


def test_stateful_user_counts(spark, sf_dir, tables):
    from bigslice_spark.streaming import (run_to_completion,
                                          stateful_user_counts,
                                          stream_events)
    ev = stream_events(spark, sf_dir)
    out = run_to_completion(stateful_user_counts(ev, threshold=10),
                            "t_stateful", output_mode="update")
    # one final row per user; totals must equal the batch counts
    got = {r["user_id"]: r["total"] for r in out.collect()}
    batch = {r["user_id"]: r["count"]
             for r in tables["events"].groupBy("user_id").count().collect()}
    assert got == batch


def test_scan_reader_lines(spark):
    from bigslice_spark.sources import scan_reader
    d = tempfile.mkdtemp(prefix="bsc_text_")
    with open(os.path.join(d, "a.txt"), "w") as f:
        f.write("alpha beta\ngamma\n\ndelta\n")
    df = scan_reader(spark, d, nshard=2)
    lines = sorted(r["line"] for r in df.collect())
    assert lines == ["", "alpha beta", "delta", "gamma"]


def test_tar_reader(spark):
    from bigslice_spark.sources import tar_reader
    d = tempfile.mkdtemp(prefix="bsc_tar_")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("x/one.txt", b"hello"), ("two.bin", b"\x00\x01")]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    with open(os.path.join(d, "arch.tar"), "wb") as f:
        f.write(buf.getvalue())
    rows = {r["name"]: (r["size"], bytes(r["body"]))
            for r in tar_reader(spark, d).collect()}
    assert rows == {"x/one.txt": (5, b"hello"), "two.bin": (2, b"\x00\x01")}
