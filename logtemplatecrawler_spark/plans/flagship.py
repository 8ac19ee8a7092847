"""Flagship query: template extraction over a pages table derived from the
driver's ``documents`` table.

The driver smoke-checks ``__spark_entry__.entry(spark)`` against
/root/testdata — which has no pages table — so the flagship derives one
deterministically (pure column expressions, no RNG) from ``documents``.
Each document becomes TWO source pages exercising the parser's hard paths
(VERDICT r02 item 3 — r1/r2 drove only the single-literal slf4j path
through a driver-checked query):

* a Java page with three slf4j statements: a plain ``{}`` literal
  (U6/U7/U11/U12 happy path), a ``+``-concat chain (U7 segment splitting +
  the reference's trailing-space argument quirk), and a nested
  ``String.format`` with a ``%d`` printf rewrite (U8);
* a C page with a ``printf`` carrying ``%s``/``%d`` specifiers (C trigger
  table, U8 printf rewrite, U12 Path/Integer placeholder typing).  The
  function is named ``log_emit`` because the reference routes C files
  through the *java* detector (detector.py:13-16) whose unanchored
  utillogger rule needs a bare ``log`` substring to fire;
* (r4, VERDICT r03 item 3) a MIXED-FRAMEWORK java page: a
  ``java.util.logging`` import plus slf4j-style ``.info``/``.warn``-shaped
  statements, so the detector's rule VOTE is contested (utillogger 2 hits
  vs log4j 1 vs slf4j 1 — U1/U4, detector.py:28,39) and the import-rule
  framework resolves to ``utillogger``.  That routes extraction through
  the utillogger trigger and parsing through UTILLOGGER_FUNCS
  (core/parse.py:69-76): ``warning``/``severe`` are ('simple', ['str'])
  roles that survive with +-concat arguments, while the slf4j-style
  ``log.info(...)`` statement has NO utillogger role entry and is dropped
  at parse (mode 'simple') — all three behaviors driver-hashed.

The full distributed pipeline (native rlike detect → extract UDF →
parse+formalize UDF → two-window dedup) then runs over the union.  Every
output column is a pure string function of the sanitized 120-char document
prefix, so the DuckDB oracle (plans/harness._FLAGSHIP_SQL) mirrors it with
string algebra — the expected constants below are pinned against the pure-
Python core by tests/test_spark_pipeline.py::test_flagship_hard_paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logtemplatecrawler_spark.plans.template_pipeline import extract_templates


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, …) → pages(url, warc_ts, html, text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Strip characters that would change statement boundaries — and `%`,
    # which a printf-spec-bearing document prefix (e.g. "50%discount")
    # would otherwise get rewritten by the engine's printf path while the
    # SQL twin concatenates it verbatim — then embed the prefix as the
    # message literal of each derived statement.
    safe = F.regexp_replace(F.substring("text", 1, 120), '["\\\\;{}#%]', "")
    java_body = F.concat(
        F.lit("import org.slf4j.Logger;\n"
              "public class Doc {\n"
              "    void emit(int requestCount) {\n"
              '        log.info("'),
        safe,
        F.lit(' {} done", requestCount);\n'
              '        log.info("phase " + stageName + " '),
        safe,
        F.lit('");\n'
              '        log.info(String.format("'),
        safe,
        F.lit(' took %d ms", elapsedMillis));\n'
              "    }\n"
              "}\n"),
    )
    c_body = F.concat(
        F.lit("static void log_emit(int count) {\n"
              '    printf("'),
        safe,
        F.lit(' wrote %s in %d ms", path, count);\n'
              "}\n"),
    )
    util_body = F.concat(
        F.lit("import java.util.logging.Logger;\n"
              "public class Util {\n"
              "    void report(int retryCount, String userName) {\n"
              '        log.warning("'),
        safe,
        F.lit(' retry " + retryCount);\n'
              '        log.severe("'),
        safe,
        F.lit(' flagged by " + userName);\n'
              '        log.info("'),
        safe,
        F.lit(' noted");\n'
              "    }\n"
              "}\n"),
    )
    ts = F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts")

    def page(body, stem, ext, lang):
        return docs.select(
            F.concat(F.lit(f"https://synth.local/src/{stem}"), F.col("doc_id"),
                     F.lit(ext)).alias("url"),
            ts,
            F.encode(body, "utf-8").alias("html"),
            body.alias("text"),
            F.lit(lang).alias("lang"),
        )

    return (
        page(java_body, "Doc", ".java", "java")
        .unionByName(page(c_body, "Doc", ".c", "c"))
        .unionByName(page(util_body, "Util", ".java", "java"))
    )


def flagship_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_templates(pages_from_documents(spark, sf_dir), dedup=True)
