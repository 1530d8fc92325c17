"""Catalog (UT macro, RAM gate), readers, and incremental writers."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_ut_macro_rewrite():
    from rainforest_spark.catalog import parse_query

    sql = "SELECT * FROM t WHERE x >= UT('2024-06-01') AND ut(y) < 5 OR OUT(z)"
    out = parse_query(sql)
    assert "UNIX_TIMESTAMP('2024-06-01')" in out
    assert "UNIX_TIMESTAMP(y)" in out
    assert "OUT(z)" in out  # no false positive inside identifiers


def test_database_query_roundtrip(spark):
    from rainforest_spark.catalog import Database

    db = Database(spark)
    db.add_tables({"orders_t": f"{SF_DIR}/orders.parquet"})
    pdf = db.query(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders_t "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY o_orderstatus")
    assert isinstance(pdf, pd.DataFrame)  # small result → collected
    assert pdf["n"].sum() > 0
    info = db.tables["orders_t"].summary(time_col="o_orderdate")
    assert info["rows"] == spark.read.parquet(
        f"{SF_DIR}/orders.parquet").count()


def test_csv_reader(spark, tmp_path):
    from rainforest_spark.sources.readers import read_df

    p = str(tmp_path / "g.csv")
    pd.DataFrame({"STATION": ["A", "B"], "V": [1.5, 2.5]}).to_csv(p, index=False)
    df = read_df(spark, p)
    assert df.count() == 2 and df.schema["V"].dataType.typeName() == "double"


def test_anti_join_append(spark):
    from rainforest_spark.sources.writers import anti_join_append

    old = spark.createDataFrame([(1, "a"), (2, "b")], "ts int, v string")
    new = spark.createDataFrame([(2, "B"), (3, "c")], "ts int, v string")
    keep = anti_join_append(old, new, ["ts"]).orderBy("ts").collect()
    assert [(r.ts, r.v) for r in keep] == [(1, "a"), (2, "b"), (3, "c")]
    over = anti_join_append(old, new, ["ts"], overwrite=True) \
        .orderBy("ts").collect()
    assert [(r.ts, r.v) for r in over] == [(1, "a"), (2, "B"), (3, "c")]


def test_upsert_daily_partition(spark, tmp_path):
    from rainforest_spark.sources.writers import upsert_daily_partition

    path = str(tmp_path / "tbl")
    d1 = spark.createDataFrame(
        [("2024-06-01", 1, 10.0), ("2024-06-01", 2, 20.0)],
        "day string, k int, v double")
    upsert_daily_partition(spark, d1, path, ["day", "k"])
    # second write: duplicate key (overwritten day) + a new day
    d2 = spark.createDataFrame(
        [("2024-06-01", 2, 20.0), ("2024-06-01", 3, 30.0),
         ("2024-06-02", 1, 11.0)],
        "day string, k int, v double")
    upsert_daily_partition(spark, d2, path, ["day", "k"])
    out = spark.read.parquet(path)
    assert out.count() == 4  # day1 keys {1,2,3} deduped + day2 key 1
    day1 = out.filter(F.col("day") == "2024-06-01")
    assert day1.count() == 3
    assert day1.dropDuplicates(["k"]).count() == 3


def _make_xlsx(path):
    """Hand-assemble a minimal SpreadsheetML workbook (two data sheets +
    one metadata sheet) exercising shared strings and numerics."""
    import zipfile

    NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    R = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
         'relationships"')

    def sheet(rows):
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                ref = chr(65 + ci) + str(ri)
                if isinstance(val, str):
                    cells.append(f'<c r="{ref}" t="inlineStr">'
                                 f'<is><t>{val}</t></is></c>')
                else:
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        return (f'<?xml version="1.0"?><worksheet {NS}>'
                f'<sheetData>{"".join(body)}</sheetData></worksheet>')

    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml",
                   f'<?xml version="1.0"?><workbook {NS} {R}><sheets>'
                   '<sheet name="Data Hourly 1" sheetId="1" r:id="rId1"/>'
                   '<sheet name="Data Hourly 2" sheetId="2" r:id="rId2"/>'
                   '<sheet name="Legend" sheetId="3" r:id="rId3"/>'
                   '</sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<?xml version="1.0"?><Relationships xmlns="http://'
                   'schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="t" '
                   'Target="worksheets/sheet1.xml"/>'
                   '<Relationship Id="rId2" Type="t" '
                   'Target="worksheets/sheet2.xml"/>'
                   '<Relationship Id="rId3" Type="t" '
                   'Target="worksheets/sheet3.xml"/></Relationships>')
        z.writestr("xl/worksheets/sheet1.xml",
                   sheet([["STATION", "VALUE"], ["OTL", 1.5], ["PAY", 2.5]]))
        z.writestr("xl/worksheets/sheet2.xml",
                   sheet([["STATION", "VALUE"], ["GVE", 3.5]]))
        z.writestr("xl/worksheets/sheet3.xml",
                   sheet([["ignore", "me"]]))


def test_read_xlsx_pure_python(spark, tmp_path):
    from rainforest_spark.sources.readers import read_xls, read_xlsx_sheets

    p = str(tmp_path / "gauge.xlsx")
    _make_xlsx(p)
    sheets = read_xlsx_sheets(p)
    assert set(sheets) == {"Data Hourly 1", "Data Hourly 2", "Legend"}
    assert list(sheets["Data Hourly 1"].columns) == ["STATION", "VALUE"]
    assert sheets["Data Hourly 1"]["VALUE"].tolist() == [1.5, 2.5]
    # the Spark-level reader concatenates only the Data Hourly sheets
    df = read_xls(spark, p).toPandas()
    assert sorted(df["STATION"]) == ["GVE", "OTL", "PAY"]
    assert len(df) == 3


def test_read_xlsx_ragged_and_no_ref(tmp_path):
    """Data rows wider than the header keep their cells, and cells
    without an ``r`` attribute (legal SpreadsheetML) infer their
    position instead of crashing."""
    import zipfile

    from rainforest_spark.sources.readers import read_xlsx_sheets

    NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    R = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
         'relationships"')
    ws = (f'<?xml version="1.0"?><worksheet {NS}><sheetData>'
          '<row r="1"><c r="A1" t="inlineStr"><is><t>K</t></is></c></row>'
          # row 2: no r attrs anywhere → positional inference
          '<row><c><v>1</v></c><c><v>2</v></c><c><v>3</v></c></row>'
          # row 3: explicit refs, wider than the header
          '<row r="3"><c r="A3"><v>4</v></c><c r="C3"><v>5</v></c></row>'
          '</sheetData></worksheet>')
    p = str(tmp_path / "ragged.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml",
                   f'<?xml version="1.0"?><workbook {NS} {R}><sheets>'
                   '<sheet name="S" sheetId="1" r:id="rId1"/>'
                   '</sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<?xml version="1.0"?><Relationships xmlns="http://'
                   'schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="t" '
                   'Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/worksheets/sheet1.xml", ws)
    s = read_xlsx_sheets(p)["S"]
    assert list(s.columns) == ["K", "col1", "col2"]
    assert s.iloc[0].tolist() == [1.0, 2.0, 3.0]
    assert s.iloc[1]["K"] == 4.0 and s.iloc[1]["col2"] == 5.0


def test_events_ts_dual_encoding(spark, tmp_path):
    """T() normalizes both historical events.ts parquet encodings —
    TIMESTAMP(NANOS) (read nanos-as-long, exact div 1000) and
    TIMESTAMP(MICROS, NTZ) — to the same session-tz timestamps.  The
    driver has shipped both across testdata generations."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rainforest_spark.workload.common import T

    us = [1_717_200_000_123_456, 1_717_203_600_000_001]
    tbl_ns = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([u * 1000 for u in us], pa.timestamp("ns"))})
    tbl_us = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array(us, pa.timestamp("us"))})
    for name, tbl in (("ns", tbl_ns), ("us", tbl_us)):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, d / "events.parquet")
    got_ns = T(spark, str(tmp_path / "ns"), "events").toPandas()
    got_us = T(spark, str(tmp_path / "us"), "events").toPandas()
    assert str(got_ns["ts"].dtype).startswith("datetime64")
    pd.testing.assert_frame_equal(
        got_ns.sort_values("event_id", ignore_index=True),
        got_us.sort_values("event_id", ignore_index=True))


def test_jsonl_round_trip(spark, tmp_path):
    """documents -> gzip JSONL shards -> read back: content-identical,
    shard size bound respected, corrupt lines quarantined not dropped."""
    import glob
    import gzip
    import os

    from pyspark.sql import functions as F

    from rainforest_spark.sources.corpus_io import read_jsonl, write_jsonl
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out, records_per_shard=100)
    parts = glob.glob(f"{out}/*.json.gz")
    assert parts, "expected gzip shards"
    for p in parts:
        with gzip.open(p, "rt") as f:
            assert sum(1 for _ in f) <= 100

    good, bad = read_jsonl(spark, out)
    assert bad.count() == 0
    a = docs.orderBy("doc_id").collect()
    b = good.orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]

    # corrupt line: quarantined with the raw line, good rows unaffected
    broken = str(tmp_path / "broken")
    os.makedirs(broken)
    with open(f"{broken}/shard0.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write('{"doc_id": oops not json\n')
    good2, bad2 = read_jsonl(spark, broken)
    assert good2.count() == 1
    quarantined = bad2.collect()
    assert len(quarantined) == 1
    assert "oops" in quarantined[0].raw_line


def test_artifact_store_local_first(tmp_path):
    """S5/S18 artifact fallback (reference object_storage.check_file):
    local files resolve without any cloud config; a missing file with
    no fallback raises with the configuration recipe."""
    import pytest

    from rainforest_spark.sources.object_storage import ArtifactStore

    store = ArtifactStore()
    p = tmp_path / "model_meta.json"
    p.write_text("{}")
    assert store.check_file(str(p)) == str(p)
    with pytest.raises(FileNotFoundError, match="fallback is unavail"):
        store.check_file(str(tmp_path / "absent.bin"))


def test_compact_partitions(spark, tmp_path):
    """Small-file maintenance: a fragmented partition collapses to one
    file with identical content; partitions under min_files and
    partitions outside the requested sweep are untouched."""
    import glob
    import os

    from pyspark.sql import functions as F

    from rainforest_spark.sources.writers import compact_partitions

    path = str(tmp_path / "store")
    # 6 fragmented APPEND writes into day A (the ivf_append-style
    # accumulation pattern), one into day B
    for i in range(6):
        (spark.createDataFrame([(i, "A", float(i))],
                               "k long, day string, v double")
         .coalesce(1).write.mode("append").partitionBy("day")
         .parquet(path))
    (spark.createDataFrame([(99, "B", 9.9)],
                           "k long, day string, v double")
     .coalesce(1).write.mode("append").partitionBy("day")
     .parquet(path))

    def nfiles(day):
        return len([f for f in glob.glob(f"{path}/day={day}/*")
                    if not os.path.basename(f).startswith(("_", "."))])

    before = spark.read.parquet(path).orderBy("k").collect()
    assert nfiles("A") >= 4
    done = compact_partitions(spark, path, "day", min_files=4)
    assert set(done) == {"A"} and done["A"] >= 4
    assert nfiles("A") == 1                      # tiny bytes -> 1 file
    after = spark.read.parquet(path).orderBy("k").collect()
    assert [r.asDict() for r in before] == [r.asDict() for r in after]
    # idempotent: nothing left to do
    assert compact_partitions(spark, path, "day", min_files=4) == {}
    # scoped sweep only touches the requested partitions
    assert compact_partitions(spark, path, "day", min_files=1,
                              partitions=["B"]) == {"B": 1}


def test_cli_storage_gated(tmp_path, capsys):
    """storage CLI: 'check' resolves local files without cloud config;
    cloud actions error with the configuration recipe (boto3 absent)."""
    import json as _json

    from rainforest_spark.cli import main

    p = tmp_path / "artifact.bin"
    p.write_bytes(b"x")
    assert main(["storage", "check", str(p)]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["file"] == str(p)
    assert main(["storage", "list"]) == 1
    assert "not configured" in capsys.readouterr().err


def test_dwh_rest_source(spark):
    """S7 REST gauge retrieval: serve the reference's pipe-delimited
    wire format from a local stdlib server; the parsed frame gets the
    datetime rename, numeric coercion and NA-sentinel NULLs, and lifts
    into Spark."""
    import http.server
    import threading

    import numpy as np

    from rainforest_spark.sources.rest import (fetch_dwh_series,
                                               read_dwh_rest)

    body = (b"station|termin|rre150z0|tre200s0\n"
            b"stn termin rre150z0 tre200s0\n"
            b"\n"
            b"OTL | 202406011210 | 0.5 | 18.3\n"
            b"OTL | 202406011220 | 10000000.00 | 18.1\n")

    class H(http.server.BaseHTTPRequestHandler):
        seen = {}

        def do_GET(self):
            H.seen["path"] = self.path
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/api/v1"
        pdf = fetch_dwh_series(url, station="OTL",
                               time_range=("202406011200",
                                           "202406011230"),
                               variables=["rre150z0", "tre200s0"])
        assert "locationIds=nat_abbr%2COTL" in H.seen["path"]
        assert list(pdf.columns) == ["stn", "datetime", "rre150z0",
                                     "tre200s0"]
        assert str(pdf["datetime"].iloc[0]) == "2024-06-01 12:10:00"
        assert np.isnan(pdf["rre150z0"].iloc[1])   # NA sentinel
        df = read_dwh_rest(spark, url, station="OTL")
        assert df.count() == 2
        assert df.filter("rre150z0 IS NULL").count() == 1
    finally:
        srv.shutdown()


def test_dwh_rest_requires_endpoint():
    import pytest

    from rainforest_spark.sources.rest import fetch_dwh_series

    with pytest.raises(ValueError, match="RAINFOREST_JRETRIEVE_URL"):
        fetch_dwh_series(None, station="OTL")
