"""Logging-framework detection over raw source text.

Behavioral parity with the reference detectors:

* java/c rules: /root/reference/src/templatecrawler/logdetector/java.py:8-45
  (the reference routes language 'c' to the *java* detector engine —
  /root/reference/src/templatecrawler/detector.py:13-16 — so C files are only
  "detected" when they happen to match java-ish rules; replicated).
* python rules: /root/reference/src/templatecrawler/logdetector/python.py:6-22.
* csharp: stubbed to always-False in the reference
  (/root/reference/src/templatecrawler/logdetector/csharp.py:25-26); replicated.

All of these are plain regex searches, so the Spark-side twin of this module
is a set of native ``rlike`` column expressions (see
``logtemplatecrawler_spark.functions.detect_cols``) — no UDF in the hot path.
This module exists for the oracle tests and for documentation of the rules.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

# Ordered exactly as the reference iterates them:
# chain(_import_rules, _statement_rules) at logdetector/java.py:24.
# QUIRK: the utillogger statement rule is an unanchored alternation — only
# 'severe' requires the leading dot; bare 'warning'/'info'/'log' anywhere in
# the file count as a hit (logdetector/java.py:10).
JAVA_RULES = [
    ("log4j", re.compile(r"import.+log4j")),
    ("utillogger", re.compile(r"import.+util\.logging")),
    ("slf4j", re.compile(r"import.+slf4j")),
    ("log4j", re.compile(r"\.(debug|info|warn|error|fatal)")),
    ("utillogger", re.compile(r"\.severe|warning|info|config|fine|finer|finest|log")),
    ("slf4j", re.compile(r"\.(debug|info|warn|error|fatal)")),
]

# Import rules only — used for framework determination
# (logdetector/java.py:39-45; detector.py:33-39).
JAVA_IMPORT_RULES = JAVA_RULES[:3]

PYTHON_RULES = [
    re.compile(r"import logging"),
    re.compile(r"\.log.*\("),
]


def _first_mode(values: list) -> Optional[str]:
    """``max(values, key=values.count)`` — first value with the max count in
    list order, as Python's ``max`` resolves ties (logdetector/java.py:34)."""
    if not values:
        return None
    return max(values, key=values.count)


def detect_page(text: str, lang: str) -> Tuple[bool, Optional[str]]:
    """Per-file detection: does this file contain logging, and which
    framework do its rule hits vote for?

    Mirrors ``DetectorEngine.process_file`` (logdetector/java.py:21-37) for
    java/c, the python engine for python, and the csharp always-False stub.
    """
    if lang in ("java", "c"):
        hits = []
        voted = []
        for indicator, rule in JAVA_RULES:
            if rule.search(text):
                hits.append(True)
                voted.append(indicator)
        return bool(hits), _first_mode(voted)
    if lang == "python":
        return any(r.search(text) for r in PYTHON_RULES), None
    # csharp + anything else: no detection (csharp.py:25-26 stub).
    return False, None


def page_framework(text: str, lang: str) -> str:
    """Framework determination from import rules only, 'unknown' fallback.

    Mirrors ``DetectorEngine.detect_framework`` (logdetector/java.py:39-45)
    + ``LogDetector.framework`` (detector.py:33-39).  Each import rule fires
    at most once per file, so the count-mode tie-break reduces to "first
    matching import rule in definition order": log4j > utillogger > slf4j.
    """
    if lang in ("java", "c"):
        for indicator, rule in JAVA_IMPORT_RULES:
            if rule.search(text):
                return indicator
    return "unknown"
