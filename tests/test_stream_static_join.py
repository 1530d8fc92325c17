"""T6: slowly-updating reference data (hourly HZT) joined to the 5-min
stream — stream-static join, re-read per micro-batch."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_stream_static_hzt_join(spark, tmp_path):
    src, sink, ckpt, hzt = (str(tmp_path / d)
                            for d in ("src", "out", "ckpt", "hzt"))
    os.makedirs(src)
    os.makedirs(hzt)
    t0 = 1717200000
    pd.DataFrame({"TIMESTAMP": np.int64([t0, t0 + 300]),
                  "STATION": ["ST00", "ST00"],
                  "ZH": [30.0, 35.0]}).to_parquet(f"{src}/a.parquet",
                                                  index=False)
    # static side: hourly freezing level per station
    pd.DataFrame({"hour_ts": np.int64([t0 - t0 % 3600]),
                  "STATION": ["ST00"],
                  "ISO0": [2500.0]}).to_parquet(f"{hzt}/h.parquet",
                                                index=False)

    stream = (spark.readStream
              .schema("TIMESTAMP bigint, STATION string, ZH double")
              .parquet(src))
    static = spark.read.parquet(hzt)
    joined = (stream
              .withColumn("hour_ts", (F.col("TIMESTAMP")
                                      - F.col("TIMESTAMP") % 3600))
              .join(static, on=["hour_ts", "STATION"], how="left"))
    q = (joined.writeStream.outputMode("append").format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.read.parquet(sink).toPandas()
    assert len(out) == 2 and (out["ISO0"] == 2500.0).all()


def test_read_xls_missing_file(spark):
    # read_xls is no longer env-gated (pure-python SpreadsheetML path);
    # a missing workbook surfaces as a file error, not a gate
    from rainforest_spark.sources.readers import read_xls

    with pytest.raises(FileNotFoundError):
        read_xls(spark, "/tmp/nonexistent.xlsx")
