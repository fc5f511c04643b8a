"""Focused equivalence tests for the r15 optimization round: every
restructured operator must produce bit-identical results to the shape
it replaced (plans change, answers don't)."""

from __future__ import annotations

from bigslice_spark.plans import explain_str


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_bucketed_self_join_empty_hot_short_circuit(spark):
    """r15: when no bucket exceeds chunk_target, the salted self-join
    short-circuits to the plain merge-pinned join — the output must be
    exactly rel ⋈_keys rel and the plan must carry NO salting
    machinery (no broadcast join, no explode)."""
    from bigslice_spark.operators.dedup import _bucketed_self_join
    rows = [(i, f"k{i % 7}") for i in range(60)]   # max bucket 9 < 16
    rel = spark.createDataFrame(rows, "id long, bk string")
    out = _bucketed_self_join(rel, ["bk"], chunk_target=16)
    got = _rows(out, ["bk", "id_a", "id_b"])
    want = _rows(
        rel.toDF("id_a", "bk").join(rel.toDF("id_b", "bk"), on="bk"),
        ["bk", "id_a", "id_b"])
    assert got == want
    plan = explain_str(out)
    assert "SortMergeJoin" in plan
    assert "__nc__" not in plan and "Generate" not in plan, plan[:1500]


def test_bucketed_self_join_hot_path_still_salts(spark):
    """r15: a genuinely hot bucket must still take the salted path
    (explode machinery present) and emit the exact pair multiset."""
    from bigslice_spark.operators.dedup import _bucketed_self_join
    rows = [(i, "hot" if i < 40 else f"k{i % 7}") for i in range(80)]
    rel = spark.createDataFrame(rows, "id long, bk string")
    out = _bucketed_self_join(rel, ["bk"], chunk_target=8)
    got = _rows(out, ["bk", "id_a", "id_b"])
    want = _rows(
        rel.toDF("id_a", "bk").join(rel.toDF("id_b", "bk"), on="bk"),
        ["bk", "id_a", "id_b"])
    assert got == want
    assert "Generate" in explain_str(out)    # the chunk explode


def test_bucketed_join_empty_hot_short_circuit(spark):
    """r15: the two-relation analog — no hot key on either side means
    the plain join, bit-identical output."""
    from bigslice_spark.operators.dedup import _bucketed_join
    left = spark.createDataFrame(
        [(i, f"k{i % 5}") for i in range(40)], "id long, bk string")
    right = spark.createDataFrame(
        [(i + 100, f"k{i % 5}") for i in range(35)],
        "id long, bk string")
    out = _bucketed_join(left, right, ["bk"], chunk_target=16)
    got = _rows(out, ["bk", "id_a", "id_b"])
    want = _rows(
        left.toDF("id_a", "bk").join(right.toDF("id_b", "bk"),
                                     on="bk"),
        ["bk", "id_a", "id_b"])
    assert got == want


def test_bucketed_join_hot_path_matches_plain(spark):
    """r15: hot key on one side — salted two-relation join still
    emits the exact pair multiset."""
    from bigslice_spark.operators.dedup import _bucketed_join
    left = spark.createDataFrame(
        [(i, "hot" if i < 30 else f"k{i % 5}") for i in range(50)],
        "id long, bk string")
    right = spark.createDataFrame(
        [(i + 100, "hot" if i < 20 else f"k{i % 5}")
         for i in range(40)], "id long, bk string")
    out = _bucketed_join(left, right, ["bk"], chunk_target=8)
    got = _rows(out, ["bk", "id_a", "id_b"])
    want = _rows(
        left.toDF("id_a", "bk").join(right.toDF("id_b", "bk"),
                                     on="bk"),
        ["bk", "id_a", "id_b"])
    assert got == want


def test_bucketed_self_join_null_bn_col_coalesces(spark):
    """ADVICE r14: a NULL bucket-size value must not silently drop
    rows — __nc__ coalesces to 1 and the pair survives."""
    from bigslice_spark.operators.dedup import _bucketed_self_join
    rel = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "b", 1)],
        "id long, bk string, bn int")
    got = _rows(_bucketed_self_join(rel, ["bk"], chunk_target=8,
                                    bn_col="bn"),
                ["bk", "id_a", "id_b"])
    want = _rows(
        rel.select("id", "bk").toDF("id_a", "bk")
        .join(rel.select("id", "bk").toDF("id_b", "bk"), on="bk"),
        ["bk", "id_a", "id_b"])
    assert got == want

def test_trigram_full_build_matches_transform_shape(spark):
    """r15: the regexp_extract_all full postings build must equal the
    transform(sequence(...)) shape it replaced — as a multiset per
    doc — on adversarial texts (newlines, unicode, repeats); texts
    shorter than a trigram yield NO postings (the old form's junk
    sub-3-char rows were latent: needed trigrams are validated
    3-char and could never match one)."""
    from pyspark.sql import functions as F

    from bigslice_spark.operators.trigram import trigram_postings
    rows = [
        (1, "abcdef"), (2, "aaaaaa"), (3, "a\nb\ncd e"),
        (4, "héllo wörld héllo"), (5, "tab\tand\rcr"),
        (6, "xyzxyzxyz"), (7, "  spaces  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(trigram_postings(docs), ["doc_id", "tri"])
    old = F.expr("transform(sequence(1, length(text) - 2),"
                 " i -> substring(text, i, 3))")
    want = _rows(
        docs.filter(F.length("text") >= 3)
        .select("doc_id",
                F.explode(F.array_distinct(old)).alias("tri")),
        ["doc_id", "tri"])
    assert got == want
    # sub-trigram and empty/NULL texts: no postings at all
    short = spark.createDataFrame(
        [(10, ""), (11, "ab"), (12, None)], "doc_id long, text string")
    assert trigram_postings(short).count() == 0


def test_write_trigram_index_clustered_one_file_per_bucket(spark,
                                                           tmp_path):
    """r15: the clustered index write produces exactly one data file
    per non-empty bucket directory, and reads back the same postings
    relation."""
    import os

    from pyspark.sql import functions as F

    from bigslice_spark.operators.trigram import (read_trigram_index,
                                                  trigram_postings,
                                                  write_trigram_index)
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text")
         for i in range(30)], "doc_id long, text string")
    d = str(tmp_path / "tri_idx")
    write_trigram_index(docs, d, nparts=8)
    for ent in os.listdir(d):
        if ent.startswith("tp="):
            data = [f for f in os.listdir(os.path.join(d, ent))
                    if f.endswith(".parquet")]
            assert len(data) == 1, (ent, data)
    got = _rows(read_trigram_index(spark, d), ["doc_id", "tri"])
    want = _rows(trigram_postings(docs), ["doc_id", "tri"])
    assert got == want
