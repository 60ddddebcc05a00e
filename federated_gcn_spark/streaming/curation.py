"""Curation-at-ingest: the documents_curated pipeline on a stream
(extension §2.10 × §2.8).

The batch curation query (plans/queries.py:documents_curated) filters by
token-length bounds and quality score, then exact-dedups keep-first. On
an unbounded stream the filters are stateless (pure codegen'd
expressions, they pipeline into the source micro-batch with zero state),
and the dedup swaps to ``dropDuplicatesWithinWatermark`` via
streaming/dedup.py — bounded fingerprint state, evicted as the watermark
advances. That makes the whole curation pass a single always-on ingest
job: score → filter → dedup → sink, with only the dedup holding state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from federated_gcn_spark.functions.text import lang_id, quality_score, token_count
from federated_gcn_spark.streaming.dedup import streaming_exact_dedup


def streaming_curation(
    docs: DataFrame,
    text_col: str = "text",
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
    min_tokens: int = 8,
    max_tokens: int = 512,
    min_quality: float = 0.5,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Filter + annotate + dedup arriving documents.

    Output keeps the input columns plus ``n_tokens``, ``quality``,
    ``pred_lang``, and the dedup fingerprint ``fp``. Works identically on
    a batch DataFrame (the dedup falls back to plain dropDuplicates), so
    the same function serves backfill and ingest.
    """
    scored = docs.withColumn(
        "n_tokens", token_count(text_col).cast("long")
    ).withColumn("quality", F.round(quality_score(text_col), 6)).withColumn(
        "pred_lang", lang_id(text_col)
    )
    kept = scored.where(
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("quality") >= min_quality)
    )
    if langs is not None:
        kept = kept.where(F.col("pred_lang").isin(list(langs)))
    return streaming_exact_dedup(
        kept, text_col=text_col, event_time_col=event_time_col, watermark=watermark
    )
