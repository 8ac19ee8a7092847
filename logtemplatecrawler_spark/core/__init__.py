"""Pure-Python (Spark-free) implementation of the reference template pipeline.

Every module here re-implements, from a behavioral spec, one stage of
tassadarius/LogTemplateCrawler's pipeline.  File:line citations in docstrings
point at the reference (/root/reference) so parity can be audited.  Known
reference quirks/bugs are replicated on purpose and marked ``QUIRK:`` —
fidelity beats fixing (byte-identical extracted text is the contract).
"""

from logtemplatecrawler_spark.core.detect import detect_page, page_framework
from logtemplatecrawler_spark.core.extract import extract_statements
from logtemplatecrawler_spark.core.parse import parse_statement
from logtemplatecrawler_spark.core.formalize import formalize_template
from logtemplatecrawler_spark.core.pipeline import process_page

__all__ = [
    "detect_page",
    "page_framework",
    "extract_statements",
    "parse_statement",
    "formalize_template",
    "process_page",
]
