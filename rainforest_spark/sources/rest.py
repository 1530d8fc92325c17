"""DWH REST gauge retrieval (reference common/jretrievedwh.py —
SURVEY §2 S7).

The reference fetches station observations from the MeteoSwiss
jretrieve REST service and parses its pipe-delimited text wire format
(`jretrievedwh.py:417-437` ``jretrievedwh_to_pandas``).  Same
semantics here, stdlib-only (urllib): build the query from the
station / time-range / parameter selections, parse the two-header-line
pipe format, coerce numerics, map the 10000000.0 NA sentinel to NULL.

Engine split, by the reference's own design: the FETCH is a bounded
driver-side ingest (one station × time-range request at a time — the
reference's retrieval drivers loop stations and feed the 10-min
database builder), so the DataFrame entry point simply lifts the
parsed frame into Spark; the heavy lifting downstream (upsert,
aggregation) is the engine's.  Endpoint and auth come from arguments
or ``RAINFOREST_JRETRIEVE_URL`` / ``RAINFOREST_JRETRIEVE_AUTH`` — no
hardcoded service URLs.
"""

from __future__ import annotations

import os
import urllib.parse
import urllib.request

import numpy as np
import pandas as pd

#: jretrieve's missing-value sentinel (jretrievedwh.py:61)
NA_VALUE = 10000000.00


def fetch_dwh_text(base_url: str, service: str = "surface",
                   params: dict | None = None,
                   auth_header: str | None = None,
                   timeout: float = 30.0) -> bytes:
    """One GET against ``{base_url}/{service}?{params}`` → raw body."""
    url = f"{base_url.rstrip('/')}/{service}"
    if params:
        url += "?" + urllib.parse.urlencode(params)
    req = urllib.request.Request(url)
    auth = auth_header or os.environ.get("RAINFOREST_JRETRIEVE_AUTH")
    if auth:
        req.add_header("Authorization", auth)
    with urllib.request.urlopen(req, timeout=timeout) as f:
        return f.read()


def parse_dwh_body(body: bytes) -> pd.DataFrame:
    """Parse the jretrieve pipe-delimited text format
    (jretrievedwh.py:425-437): line 1 holds the column names, data
    starts at line 3, cells are '|'-separated with stray spaces;
    ``termin`` becomes ``datetime``, everything else numeric, the NA
    sentinel becomes NaN."""
    lines = body.split(b"\n")
    colnames = lines[1].decode("utf-8").split()
    rows = [ln.decode("utf-8").replace(" ", "").split("|")
            for ln in lines[3:] if ln.strip()]
    df = pd.DataFrame(rows, columns=colnames)
    df = df.rename(columns={"termin": "datetime"})
    if "datetime" in df.columns:
        df["datetime"] = pd.to_datetime(df["datetime"])
    for col in df.columns:
        if col == "datetime":
            continue
        try:
            df[col] = pd.to_numeric(df[col])
        except (ValueError, TypeError):
            pass  # id columns (e.g. stn) stay strings — the reference
            # requests one station so its frames are numeric-only
    return df.replace(NA_VALUE, np.nan)


def fetch_dwh_series(base_url: str | None = None, station: str = "",
                     time_range: tuple[str, str] | None = None,
                     variables: list[str] | None = None,
                     service: str = "surface",
                     auth_header: str | None = None) -> pd.DataFrame:
    """The ``jretrievedwh_to_pandas(['-s', 'surface', '-i',
    'nat_abbr,<sta>', '-t', 't0,t1', '-n', 'v1,v2'])`` call shape
    (retrieve_dwh_data.py:57-58) as keyword arguments."""
    base_url = base_url or os.environ.get("RAINFOREST_JRETRIEVE_URL")
    if not base_url:
        raise ValueError("no jretrieve endpoint: pass base_url or set "
                         "RAINFOREST_JRETRIEVE_URL")
    params = {}
    if station:
        params["locationIds"] = f"nat_abbr,{station}"
    if time_range:
        params["date"] = f"{time_range[0]},{time_range[1]}"
    if variables:
        params["parameterShortNames"] = ",".join(variables)
    return parse_dwh_body(fetch_dwh_text(base_url, service, params,
                                         auth_header))


def read_dwh_rest(spark, base_url: str | None = None, station: str = "",
                  time_range: tuple[str, str] | None = None,
                  variables: list[str] | None = None,
                  service: str = "surface",
                  auth_header: str | None = None):
    """Spark entry point: the fetched station series as a DataFrame,
    ready for :func:`~rainforest_spark.sources.writers.
    upsert_daily_partition` / the gauge table builder."""
    pdf = fetch_dwh_series(base_url, station, time_range, variables,
                           service, auth_header)
    return spark.createDataFrame(pdf)
