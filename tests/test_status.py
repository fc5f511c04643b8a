"""Status/introspection surface: job-group tagging + UI toggle plumbing
(the reference's live task status display, exec/bigmachine.go:46-52)."""

from bigslice_spark.queries import QUERIES


def test_registry_queries_tag_job_group(spark, sf_dir):
    QUERIES["op_map"](spark, sf_dir)
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") \
        == "bss:op_map"
    QUERIES["op_filter"](spark, sf_dir)
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") \
        == "bss:op_filter"


def test_session_job_group_scopes_and_clears(session, spark):
    with session.job_group("my-batch", "docstring here"):
        assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") \
            == "my-batch"
        spark.range(10).count()
    assert not spark.sparkContext.getLocalProperty("spark.jobGroup.id")


def test_cancel_job_group_is_callable(session):
    session.cancel_job_group("no-such-group")  # no-op, must not raise
