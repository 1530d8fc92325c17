"""Stateful prev-frame operator for the RT stream (SURVEY T4).

The reference keeps ``X_prev`` / ``qpe_prev`` across 5-min cycles and
persists them to .npy between daemon restarts (qpe/qpe.py:380-410,
680-691, 745-761).  Structured Streaming equivalent: per-pixel-block
state in ``applyInPandasWithState`` — the 2-frame mean is computed
against the stored previous frame, and the state survives restarts via
the checkpoint, replacing the hand-rolled .npy files.

Blocks (not single pixels) keep the state-store key count bounded:
640×710 pixels → ~28 blocks of 128² with one dict of arrays each.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BLOCK = 128


def with_block_key(grid: DataFrame) -> DataFrame:
    return (grid.withColumn("bx", F.floor(F.col("x_idx") / BLOCK).cast("int"))
            .withColumn("by", F.floor(F.col("y_idx") / BLOCK).cast("int")))


def two_frame_mean_stateful(grid_stream: DataFrame,
                            value_col: str = "rain_rate") -> DataFrame:
    """Streaming 2-frame mean: out = mean(value_t, value_{t-1}) per pixel.

    State per (bx, by) block = the previous frame's (x, y, value) lists.
    Output schema: TIMESTAMP, x_idx, y_idx, value, value_2frame.
    """
    out_schema = (f"TIMESTAMP bigint, x_idx int, y_idx int, "
                  f"{value_col} double, {value_col}_2frame double")
    state_schema = "xs array<int>, ys array<int>, vs array<double>, ts long"

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            xs, ys, vs, _prev_ts = state.get
            prev = {(int(x), int(y)): v for x, y, v in zip(xs, ys, vs)}
        else:
            prev = {}
        # process timesteps in order; each uses the frame before it
        out_rows = []
        for ts, frame in batch.sort_values("TIMESTAMP").groupby("TIMESTAMP"):
            cur = {}
            for _, r in frame.iterrows():
                px = (int(r["x_idx"]), int(r["y_idx"]))
                v = float(r[value_col])
                cur[px] = v
                pv = prev.get(px)
                two = v if pv is None else (v + pv) / 2.0
                out_rows.append((int(ts), px[0], px[1], v, two))
            prev = cur
        xs = [p[0] for p in prev]
        ys = [p[1] for p in prev]
        vs = [prev[p] for p in prev]
        last_ts = int(batch["TIMESTAMP"].max())
        state.update((xs, ys, vs, last_ts))
        yield pd.DataFrame(out_rows, columns=[
            "TIMESTAMP", "x_idx", "y_idx", value_col,
            f"{value_col}_2frame"])

    keyed = with_block_key(grid_stream)
    return keyed.groupBy("bx", "by").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)
