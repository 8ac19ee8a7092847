"""Native pyspark column expressions for the pipeline's filters/predicates.

Everything here stays JVM-side (whole-stage codegen; no Python workers):
the reference's detectors and filters are plain regex searches, so they map
to ``rlike``/``length``/``startswith`` expressions.  Each function's
pure-Python twin lives in ``logtemplatecrawler_spark.core`` (same reference
citations); parity is asserted by tests/test_spark_pipeline.py.

Regex notes: Spark ``rlike`` is Java ``Matcher.find`` — equivalent to Python
``re.search`` for these patterns (all are ASCII, no lookbehind; backreference
``(.)\\1{5,}`` is supported by java.util.regex).
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column
from pyspark.sql import functions as F

# Detector rules — logdetector/java.py:8-19 (see core/detect.py for quirks).
_JAVA_RULES = [
    "import.+log4j",
    "import.+util\\.logging",
    "import.+slf4j",
    "\\.(debug|info|warn|error|fatal)",
    "\\.severe|warning|info|config|fine|finer|finest|log",
    "\\.(debug|info|warn|error|fatal)",
]
_PY_RULES = ["import logging", "\\.log.*\\("]


def detect_hit(text: Column, lang: Column) -> Column:
    """True iff the reference detector reports 'contains logging' (U1-U3).

    java/c share the java engine (detector.py:13-16); csharp is the
    always-False stub (logdetector/csharp.py:25-26).
    """
    java_hit = reduce(or_, (text.rlike(p) for p in _JAVA_RULES))
    py_hit = reduce(or_, (text.rlike(p) for p in _PY_RULES))
    return (
        F.when(lang.isin("java", "c"), java_hit)
        .when(lang == "python", py_hit)
        .otherwise(F.lit(False))
    )


def framework(text: Column, lang: Column) -> Column:
    """Import-rule framework vote with 'unknown' fallback (U4).

    Each import rule fires at most once per file, so the reference's
    count-mode tie-break reduces to first-match-wins in definition order
    (core/detect.py:page_framework).
    """
    java_fw = (
        F.when(text.rlike("import.+log4j"), F.lit("log4j"))
        .when(text.rlike("import.+util\\.logging"), F.lit("utillogger"))
        .when(text.rlike("import.+slf4j"), F.lit("slf4j"))
        .otherwise(F.lit("unknown"))
    )
    return F.when(lang.isin("java", "c"), java_fw).otherwise(F.lit("unknown"))


def normalize_raw(raw: Column, lang: Column) -> Column:
    """C statements are whitespace-stripped before filtering/parsing and the
    stripped text is what gets stored (logparser/c.py:56-60, F7)."""
    return F.when(lang == "c", F.regexp_replace(raw, "^\\s+|\\s+$", "")).otherwise(raw)


def keep_non_preprocessor(raw: Column, lang: Column) -> Column:
    """Drop C preprocessor lines (logparser/c.py:58-59, F7)."""
    return ~((lang == "c") & raw.startswith("#"))


def prefilter_keep(raw: Column) -> Column:
    """Statement pre-filter (filtersettings.py:6-9, F6): drop too-short and
    repeated-char raws."""
    return ~raw.rlike("^.{0,5}$") & ~raw.rlike("(.)\\1{5,}")


def template_valid(parsed_template: Column) -> Column:
    """The reference's permissive OR-mask (templatefilter.py:12-21, F8).

    Provably always-true (see core/filters.py module doc) — kept as an
    auditable native expression; Catalyst folds it into the scan cheaply.
    """
    keep = F.length(parsed_template) > 14
    keep = keep | ~parsed_template.rlike("^[^a-wyzA-WYZ]+$")
    keep = keep | ~parsed_template.rlike("^\\s*(static|#include|#define|#if|#endif)")
    keep = keep | ~parsed_template.rlike("^\\s*(//|\\*)")
    return keep


def url_file(url: Column) -> Column:
    """Per-page 'file' id: url path without leading slashes
    (core/pipeline.py:url_file)."""
    return F.regexp_replace(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), "^/+", "")


def url_host(url: Column) -> Column:
    """Host component for politeness partitioning."""
    return F.parse_url(url, F.lit("HOST"))
