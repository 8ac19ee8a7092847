"""Distributed fixture pages: generate the synthetic corpus IN Spark.

``fixtures.generate_pages`` builds rows on the driver — fine for tests,
too slow past ~10^5 pages.  Page CONTENT is already order-free (each page
derives from ``random.Random((seed << 16) ^ i)``), so generation
distributes: the driver precomputes only the cheap global assignments
(host/lang/url per id, which consume the shared RNG stream in id order),
broadcasts them, and executors synthesize page bodies in parallel via
``mapInPandas``.

Byte-identical to the driver-side generator for the same (n_pages, seed) —
asserted by tests/test_fixtures.py::test_distributed_equals_local.
"""

from __future__ import annotations

import random
from datetime import timedelta
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from logtemplatecrawler_spark.sources import fixtures as FX

PAGES_SCHEMA = FX.PAGES_DDL


def _assignments(n_pages: int, seed: int, n_hosts: int | None):
    """Replicates the first loop of generate_pages (global RNG stream)."""
    rng = random.Random(seed)
    n_hosts = n_hosts or max(8, n_pages // 20)
    urls, langs = [], []
    for i in range(n_pages):
        host = FX._zipf_host(rng, n_hosts)
        lang = rng.choices(["java", "c", "python", "csharp"],
                           weights=[60, 25, 10, 5])[0]
        top = rng.choice(FX._PRIORITY_DIRS + FX._EXCLUDE_DIRS)
        ext = {"java": "java", "c": "c", "python": "py", "csharp": "cs"}[lang]
        urls.append(f"https://{host}/{top}/File{i:05d}.{ext}")
        langs.append(lang)
    return urls, langs


def distributed_pages(spark: SparkSession, n_pages: int = 100_000, seed: int = 42,
                      n_hosts: int | None = None,
                      partitions: int | None = None,
                      methods=(1, 3), stmts=(1, 4)) -> DataFrame:
    urls, langs = _assignments(n_pages, seed, n_hosts)
    sc = spark.sparkContext
    b_urls = sc.broadcast(urls)
    b_langs = sc.broadcast(langs)
    partitions = partitions or max(32, n_pages // 2000)

    ids = spark.range(0, n_pages, numPartitions=partitions).toDF("id")

    def _gen(batches: Iterator) -> Iterator:
        import pandas as pd
        urls_, langs_ = b_urls.value, b_langs.value
        n = len(urls_)
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in pdf["id"]:
                i = int(i)
                rng_page = random.Random((seed << 16) ^ i)
                lang = langs_[i]
                n_links = rng_page.randint(0, 3)
                outlinks = [urls_[rng_page.randrange(n)] for _ in range(n_links)]
                if lang == "java":
                    framework = rng_page.choice(
                        ["slf4j", "slf4j", "log4j", "utillogger", "unknown"])
                    text = FX._java_file(rng_page, framework, f"File{i:05d}",
                                         outlinks, methods=methods, stmts=stmts)
                elif lang == "c":
                    text = FX._c_file(rng_page, outlinks,
                                      methods=methods, stmts=stmts)
                elif lang == "python":
                    text = FX._python_file(rng_page)
                else:
                    text = f"// csharp stub file {i}\nclass C{i} {{ }}\n"
                html = text.encode("latin1", errors="replace") if i % 97 == 13 \
                    else text.encode("utf-8")
                out["url"].append(urls_[i])
                out["warc_ts"].append(FX._EPOCH + timedelta(seconds=i * 37))
                out["html"].append(html)
                out["text"].append(text)
                out["lang"].append(lang)
            yield pd.DataFrame(out)

    return ids.mapInPandas(_gen, schema=PAGES_SCHEMA)


def write_distributed_pages(spark: SparkSession, path: str, n_pages: int,
                            seed: int = 42, partitions: int | None = None,
                            methods=(1, 3), stmts=(1, 4)) -> None:
    distributed_pages(spark, n_pages, seed, partitions=partitions,
                      methods=methods, stmts=stmts) \
        .write.mode("overwrite").parquet(path)
