"""JSONL corpus IO — the interchange format LLM training corpora ship
in (one JSON document per line, usually gzip-compressed shards).

Spark's native json reader IS the right engine here (distributed,
schema-enforced, pushdown-friendly); this module pins the corpus
conventions on top:

- an explicit schema (never inferSchema over 100 TB — that is a full
  extra pass);
- PERMISSIVE parsing with a quarantine column, so one corrupt line in
  a billion does not kill the job NOR silently vanish: readers get the
  good rows plus a separate handle on the bad lines for forensics;
- shard-sized line-count output on write (maxRecordsPerFile), because
  a 100 TB corpus written as whatever-the-task-graph-produced is the
  small-file problem at its worst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The de-facto minimal corpus schema; extend per source as needed.
DOC_SCHEMA = ("doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")

_CORRUPT = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: str = DOC_SCHEMA) -> tuple[DataFrame, DataFrame]:
    """Read JSONL shards (plain or .gz — Spark decompresses by codec
    suffix) into (good_rows, quarantined_lines).

    The quarantine frame carries the raw offending line.  Spark
    disallows queries whose only referenced column is the internal
    corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — which a
    pruned ``count()`` over a corrupt-filtered frame becomes — so the
    good path reads DROPMALFORMED (no corrupt column anywhere in the
    plan) and the quarantine is its own lazy text scan with a
    ``from_json`` parse check; the second scan costs nothing until
    someone actually inspects the bad lines."""
    good = (spark.read.schema(schema)
            .option("mode", "DROPMALFORMED").json(path))
    parsed = F.from_json(
        F.col("value"), schema + f", {_CORRUPT} string",
        {"columnNameOfCorruptRecord": _CORRUPT})
    bad = (spark.read.text(path)
           .filter(parsed[_CORRUPT].isNotNull()
                   | (F.trim(F.col("value")) == ""))
           .select(F.col("value").alias("raw_line")))
    return good, bad


def write_jsonl(df: DataFrame, path: str,
                records_per_shard: int = 100_000,
                compression: str = "gzip",
                partition_by: list[str] | None = None) -> None:
    """Write shard-sized JSONL (gzip by default — the corpus-exchange
    convention).  ``records_per_shard`` bounds shard size regardless of
    the upstream task graph's partitioning."""
    w = (df.write.mode("overwrite")
         .option("compression", compression)
         .option("maxRecordsPerFile", records_per_shard))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
