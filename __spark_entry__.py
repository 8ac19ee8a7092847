"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: the full distributed template pipeline (native rlike
              detect → Arrow extract UDF → parse+formalize UDF → window
              dedup) over a pages table derived deterministically from
              /root/testdata/sf0.001/documents.parquet.
``queries`` — one entry per implemented operator from SURVEY.md §2 plus the
              training-data ops (dedup family, ANN, text analysis,
              multimodal plumbing) and the crawl/template pipeline itself.
``oracle_sql`` — DuckDB twins for every SQL-expressible query; the template
              pipeline, simhash, and hyperplane-LSH entries are rows-only
              (custom engine logic / non-ANSI bit loops), as is
              ``crawl_template_pipeline``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from logtemplatecrawler_spark.plans.flagship import flagship_templates

    return flagship_templates(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logtemplatecrawler_spark.plans.harness import QUERIES
    from logtemplatecrawler_spark.plans.flagship import flagship_templates

    out = dict(QUERIES)
    out["crawl_template_pipeline"] = flagship_templates
    return out


def oracle_sql() -> dict[str, str]:
    from logtemplatecrawler_spark.plans.harness import ORACLES

    return dict(ORACLES)
