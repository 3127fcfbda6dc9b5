"""Streaming duplicate-line removal (C6's streaming twin).

The batch operator (``operators.dedup.remove_duplicate_lines``) keeps
each distinct line's single FIRST occurrence in global
``(doc_id, pos)`` order across the whole corpus — a corpus-global rule
that is stream-hostile as stated: "first across everything ever
ingested" needs unbounded state. The streaming variant here is the
watermark-bounded approximation (the same trade
``stream_exact_dedup_within_watermark`` makes for document dedup):

* a line's keep/drop state lives for ``ttl`` of event time past its
  canonical occurrence — duplicates arriving inside that horizon are
  suppressed, a re-crawl arriving after the state expired is treated
  as a fresh first occurrence (CC-crawl dups arrive clustered in time;
  the long tail belongs to a periodic batch pass over the sink);
* the canonical occurrence is ``min(doc_id, pos)`` within the first
  micro-batch in which the line appears. Batch picks the global min;
  a stream cannot — append-mode emission is final, so a
  smaller-``doc_id`` copy arriving in a LATER micro-batch stays
  dropped. On data that shares one micro-batch (or arrives in
  ``doc_id`` order, the ingestion order of a crawl loader) stream
  output == batch output exactly — pinned in
  tests/test_checkpoint_streaming.py.

Scale shape: state is one empty-payload marker per distinct in-horizon
line hash (8-byte key + timeout timestamp, no line text) — the same
O(distinct keys per horizon) bound as ``dropDuplicatesWithinWatermark``,
evicted every micro-batch by the event-time timeout. The shuffle key is
``line_hash``, exactly the batch twin's aggregation key. Output rows
are the surviving line OCCURRENCES ``(doc_id, pos, line_hash, line)``;
documents are rebuilt by ``rebuild_cleaned_docs`` — a batch groupBy
over the sink (reassembling whole documents inside the stream would
chain a second stateful aggregation keyed by doc_id and hold every
open document's surviving lines in the state store; at corpus scale
the sink-side rebuild is the right physical plan, and it reuses the
batch twin's own rebuild so the two paths cannot drift).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.portable import md5_long

__all__ = ["stream_kept_lines", "rebuild_cleaned_docs", "KEPT_LINE_SCHEMA"]

KEPT_LINE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
        StructField("line_hash", LongType()),
        StructField("line", StringType()),
    ]
)

# payload-free: the marker's existence IS the state; the timeout
# timestamp Spark keeps alongside it carries the TTL
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def stream_kept_lines(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    watermark: str = "10 minutes",
    ttl_minutes: int = 60,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming (doc_id, pos, line_hash, line): each distinct line's
    canonical occurrence, first-batch-wins with ``min(doc_id, pos)``
    inside that batch; later copies are dropped while the line's state
    lives (``ttl_minutes`` of event time past its canonical row's
    timestamp, enforced by the watermark-driven state timeout)."""
    ttl_ms = ttl_minutes * 60_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = None  # (doc_id, pos, line, ts_ms) with min (doc_id, pos)
        for pdf in pdfs:
            if pdf.empty:
                continue
            i = pdf.sort_values([id_col, "pos"]).index[0]
            cand = (
                int(pdf[id_col][i]),
                int(pdf["pos"][i]),
                pdf["line"][i],
                int(pdf[ts_col][i].value // 1_000_000),
            )
            if first is None or (cand[0], cand[1]) < (first[0], first[1]):
                first = cand
        if first is None:
            return
        if not state.exists:
            state.update((1,))
            # ttl past the canonical occurrence, but never at/behind the
            # current watermark (EventTimeTimeout requires a future ts)
            state.setTimeoutTimestamp(
                max(first[3] + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
            yield pd.DataFrame(
                [
                    {
                        "doc_id": first[0],
                        "pos": first[1],
                        "line_hash": key[0],
                        "line": first[2],
                    }
                ]
            )
        # state exists: every row in this batch is a duplicate — emit
        # nothing, leave the original timeout in place (the horizon runs
        # from the CANONICAL occurrence, matching the document-dedup
        # variant's "first occurrence + horizon" contract)

    lines = stream_df.select(
        F.col(id_col),
        F.col(ts_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "pos", "line"
        ),
    ).withColumn("line_hash", md5_long("line"))
    return (
        lines.withWatermark(ts_col, watermark)
        .groupBy("line_hash")
        .applyInPandasWithState(
            fn,
            outputStructType=KEPT_LINE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def rebuild_cleaned_docs(
    docs: DataFrame,
    kept: DataFrame,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_lines, n_kept, cleaned_text) from a kept-lines sink —
    the batch twin's exact output schema, built with the batch twin's
    exact rebuild expressions (array_sort over (pos, line) structs +
    concat_ws, left join against per-doc line totals) so a sink rebuild
    and ``remove_duplicate_lines`` cannot drift."""
    rebuilt = kept.groupBy(F.col("doc_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("cleaned_text"),
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), re.escape(sep))).alias("n_lines"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )
