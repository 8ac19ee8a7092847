"""Stateful streaming operators: URL-seen dedup + per-host budget state."""

import os

from logtemplatecrawler_spark.streaming.stateful_dedup import (
    streaming_host_budget,
    streaming_seen_urls,
)


def _write_url_batch(spark, path, idx, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/b{idx}")
    # move part file up so the stream source (reading `path`) sees it
    for f in os.listdir(f"{path}/b{idx}"):
        if f.endswith(".parquet"):
            os.rename(f"{path}/b{idx}/{f}", f"{path}/batch{idx}.parquet")


def _drain(stream_df, out_dir, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_seen_urls_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    _write_url_batch(spark, src, 0, ["https://A.org/x", "https://a.org/x#frag",
                                     "https://a.org/y"])
    stream = spark.readStream.schema("url string").parquet(src)
    _drain(streaming_seen_urls(stream), out, ckpt)
    first = {r["url"] for r in spark.read.parquet(out).collect()}
    assert first == {"https://a.org/x", "https://a.org/y"}

    # second batch: one repeat (different fragment), one new — state persists
    _write_url_batch(spark, src, 1, ["https://a.org/x#other", "https://a.org/z"])
    stream = spark.readStream.schema("url string").parquet(src)
    _drain(streaming_seen_urls(stream), out, ckpt)
    all_urls = [r["url"] for r in spark.read.parquet(out).collect()]
    assert sorted(all_urls) == ["https://a.org/x", "https://a.org/y", "https://a.org/z"]


def test_streaming_host_budget_cumulative(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    _write_url_batch(spark, src, 0,
                     [f"https://h1.org/p{i}" for i in range(3)]
                     + ["https://h2.org/p0"])
    stream = spark.readStream.schema("url string").parquet(src)
    _drain(streaming_host_budget(stream, budget=4), out, ckpt)
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert len([u for u in got if "h1.org" in u]) == 3

    # next batch pushes h1 past its cumulative budget of 4
    _write_url_batch(spark, src, 1, [f"https://h1.org/q{i}" for i in range(5)])
    stream = spark.readStream.schema("url string").parquet(src)
    _drain(streaming_host_budget(stream, budget=4), out, ckpt)
    h1 = [r["url"] for r in spark.read.parquet(out).collect() if "h1.org" in r["url"]]
    assert len(h1) == 4  # 3 from batch 0 + only 1 more allowed
