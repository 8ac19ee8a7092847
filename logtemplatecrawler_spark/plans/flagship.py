"""Flagship query: template extraction over a pages table derived from the
driver's ``documents`` table.

The driver smoke-checks ``__spark_entry__.entry(spark)`` against
/root/testdata — which has no pages table — so the flagship derives one
deterministically (pure column expressions, no RNG) from ``documents``:
each document becomes a small Java source page whose log statement embeds
the document text; the full distributed pipeline (native detect → extract
UDF → parse+formalize UDF → dedup) then runs over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logtemplatecrawler_spark.plans.template_pipeline import extract_templates


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, …) → pages(url, warc_ts, html, text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Strip characters that would change statement boundaries, then wrap the
    # document text as the message literal of one slf4j call per page.
    safe = F.regexp_replace(F.substring("text", 1, 120), '["\\\\;{}#]', "")
    body = F.concat(
        F.lit("import org.slf4j.Logger;\n"
              "public class Doc {\n"
              "    void emit(int requestCount) {\n"
              '        log.info("'),
        safe,
        F.lit(' {} done", requestCount);\n'
              "    }\n"
              "}\n"),
    )
    return docs.select(
        F.concat(F.lit("https://synth.local/src/Doc"), F.col("doc_id"), F.lit(".java")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(body, "utf-8").alias("html"),
        body.alias("text"),
        F.lit("java").alias("lang"),
    )


def flagship_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_templates(pages_from_documents(spark, sf_dir), dedup=True)
