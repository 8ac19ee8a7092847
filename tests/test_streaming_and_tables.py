"""Streaming surface + idempotent-append sink tests."""

import os

from logtemplatecrawler_spark.plans.template_pipeline import extract_templates
from logtemplatecrawler_spark.sources.fixtures import write_pages_parquet
from logtemplatecrawler_spark.sources.tables import append_unique, read_csv, write_csv
from logtemplatecrawler_spark.streaming.pages_stream import stream_templates


def test_stream_equals_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    write_pages_parquet(pages_dir, 80, seed=42, n_files=5)
    out_dir = str(tmp_path / "templates")
    ckpt = str(tmp_path / "ckpt")

    stream_templates(spark, pages_dir, out_dir, ckpt, max_files_per_trigger=2,
                     dedup_across_batches=False)

    got = sorted(
        (r["url"], r["stmt_idx"], r["raw"], r["template"])
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        (r["url"], r["stmt_idx"], r["raw"], r["template"])
        for r in extract_templates(spark.read.parquet(pages_dir), dedup=False).collect()
    )
    assert got == want


def test_stream_resume_processes_only_new_files(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    write_pages_parquet(pages_dir, 40, seed=42, n_files=4)
    out_dir = str(tmp_path / "templates")
    ckpt = str(tmp_path / "ckpt")
    stream_templates(spark, pages_dir, out_dir, ckpt, dedup_across_batches=False)
    n1 = spark.read.parquet(out_dir).count()
    # second drain with no new files → no duplicates appended
    stream_templates(spark, pages_dir, out_dir, ckpt, dedup_across_batches=False)
    assert spark.read.parquet(out_dir).count() == n1
    # drop in new files → only their rows are appended
    write_pages_parquet(pages_dir + "_more", 20, seed=7, n_files=2)
    for f in os.listdir(pages_dir + "_more"):
        os.rename(os.path.join(pages_dir + "_more", f),
                  os.path.join(pages_dir, "new-" + f))
    stream_templates(spark, pages_dir, out_dir, ckpt, dedup_across_batches=False)
    assert spark.read.parquet(out_dir).count() > n1


def test_append_unique_on_conflict_do_nothing(spark, tmp_path):
    sink = str(tmp_path / "sink")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert append_unique(df1, sink, ["k"]) == 2
    df2 = spark.createDataFrame([(2, "dup"), (3, "c")], "k int, v string")
    assert append_unique(df2, sink, ["k"]) == 1
    rows = {(r["k"], r["v"]) for r in spark.read.parquet(sink).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "csv")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    write_csv(df, path)
    back = read_csv(spark, path, "id int, name string")
    assert {(r["id"], r["name"]) for r in back.collect()} == {(1, "x"), (2, "y")}
