"""Streaming corpus ingest curation.

Continuous training-data ingest (a crawler drop directory, a Kafka-ish
file queue) runs the same gates as the batch curation chain; the
stateless stages — quality gate, PII scrub, fingerprinting — reuse the
EXACT batch column expressions, so a document admitted by the stream
is byte-for-byte the document the batch pipeline would have produced.
Only dedup needs state: one row per content fingerprint with
watermark-bounded expiry (`dropDuplicatesWithinWatermark`), because an
unbounded fingerprint set would OOM on an infinite stream.

Batch/stream parity is therefore exact for documents whose duplicates
arrive within the watermark; a duplicate arriving later than the
watermark re-admits (the documented trade of bounded state — the batch
dedup over the accumulated store remains the backstop, same as the
reference's daily batch pass behind its RT daemon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rainforest_spark.operators import text_analysis as TA
from rainforest_spark.streaming.rt import dedup_stream


def curate_stream(stream: DataFrame, text_col: str = "text",
                  ts_col: str = "ingest_ts",
                  min_tokens: int = 10,
                  max_dup_ngram_ratio: float = 0.3,
                  redact_pii: bool = True,
                  watermark: str = "30 minutes",
                  known_fingerprints: DataFrame | None = None) -> DataFrame:
    """Quality gate → PII scrub → fingerprint → corpus exclusion →
    watermarked dedup, as one streaming transformation (no shuffle
    before the dedup state).

    ``known_fingerprints`` (a static DataFrame with a ``fingerprint``
    column — in production the accumulated corpus store's fingerprint
    table) closes the watermark hole for ALREADY-INGESTED content: the
    in-stream dedup state expires with the watermark, but a document
    the corpus already holds is dropped by a stream-static LEFT ANTI
    join no matter when it re-arrives.  The static side re-resolves
    per micro-batch, so a corpus store updated between batches is
    picked up without restart; at scale it is a parquet table
    bucketed/sorted by fingerprint, and the anti join's stream side is
    the (small) micro-batch.
    """
    s = (stream
         .filter(TA.token_count(text_col) >= min_tokens)
         .filter(F.coalesce(TA.dup_ngram_ratio(text_col), F.lit(0.0))
                 <= max_dup_ngram_ratio))
    if redact_pii:
        s = s.withColumn(text_col, TA.pii_redact(text_col))
    s = s.withColumn("fingerprint", TA.fingerprint(text_col))
    if known_fingerprints is not None:
        s = s.join(known_fingerprints.select("fingerprint"),
                   "fingerprint", "left_anti")
    return dedup_stream(s, ["fingerprint"], ts_col=ts_col,
                        watermark=watermark)
