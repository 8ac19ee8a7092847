"""Encoding-fallback decode: html binary → text (U14).

Behavioral parity with the reference's 4-encoding fallback read
(/root/reference/src/templatecrawler/crawler.py:105-116): try utf-8,
latin1, latin2, cp1251 in order; None when all fail (the reference collects
such files as invalid and skips them, crawler.py:115-119).

Used when a pages table arrives with only raw ``html`` payloads; fixture
pages carry a pre-decoded ``text`` column so the pipeline normally never
pays this cost (column pruning drops html entirely).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

ENCODINGS = ("utf-8", "latin1", "latin2", "cp1251")


def decode_bytes(payload: Optional[bytes]) -> Optional[str]:
    if payload is None:
        return None
    for encoding in ENCODINGS:
        try:
            return payload.decode(encoding)
        except (UnicodeDecodeError, LookupError):
            continue
    return None


@F.pandas_udf(StringType())
def decode_html(html: pd.Series) -> pd.Series:
    return html.map(decode_bytes)
