"""Text extraction stage (SURVEY.md §2.B B2): html binary → text string.

A vectorized pandas UDF wrapping the deterministic pure extractor
(corpus.extract_text_bytes). The per-row invariant from the baseline
``input_hint`` — byte-identical extracted text per url — is pinned by
sha256 goldens in tests/test_corpus.py.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType

from ..corpus import extract_text_bytes

__all__ = ["extract_text"]


@F.pandas_udf(StringType())
def _extract(html: pd.Series) -> pd.Series:
    return html.map(lambda b: None if b is None else extract_text_bytes(bytes(b)))


def extract_text(docs: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    return docs.withColumn(out_col, _extract(F.col(html_col)))
