"""CLI train/evaluate subcommands: the remaining reference user
surface (rf training + QPE-run evaluation) end-to-end through
python -m rainforest_spark.cli."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def test_cli_train(spark, tmp_path, capsys):
    from rainforest_spark.cli import main

    rng = np.random.RandomState(31)
    n = 400
    f1 = rng.uniform(0, 10, n)
    f2 = rng.uniform(0, 5, n)
    df = pd.DataFrame({
        "TIMESTAMP": np.arange(n) * 600, "STATION": "S1",
        "f1": f1, "f2": f2,
        "target_mmh": 2.0 * f1 + 0.5 * f2 + rng.normal(0, 0.1, n)})
    inp = str(tmp_path / "ds.parquet")
    out = str(tmp_path / "model")
    spark.createDataFrame(df).write.parquet(inp)
    assert main(["train", inp, out]) == 0
    meta = json.load(open(f"{out}/model_meta.json"))
    assert set(meta["features"]) == {"f1", "f2"}
    assert meta["feature_importances"]["f1"] > \
        meta["feature_importances"]["f2"]
    assert os.path.isdir(f"{out}/rf_model")
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["train_rmse_bc"] < 2.0


def test_cli_evaluate(spark, tmp_path, capsys):
    from rainforest_spark.cli import main

    H = 600
    rows = []
    for si, slot in enumerate(range(0, 6 * H, H)):
        for model, moff in (("A", 0.0), ("B", 2.0)):
            for f in (0, 1):
                for (x, y), soff in (((1, 1), 0.0), ((2, 2), 10.0)):
                    rows.append(dict(model=model, timestep=slot,
                                     file_id=f, x_idx=x, y_idx=y,
                                     value=1.0 + si * 0.5 + moff
                                     + soff + f))
    gauge_rows = [dict(STATION=s, timestep=slot,
                       ref_mmh=1.5 + (slot // H) * 0.5
                       + (10.0 if s == "S2" else 0.0))
                  for s in ("S1", "S2") for slot in range(0, 6 * H, H)]
    # station coordinates that land on pixels (1,1) and (2,2)
    # (grid origin per grid/lookup.py X0_KM/Y0_KM)
    from rainforest_spark.grid.lookup import X0_KM, Y0_KM
    stations = pd.DataFrame({
        "Abbrev": ["S1", "S2"],
        "X": [(1 + X0_KM + 0.5) * 1000.0, (2 + X0_KM + 0.5) * 1000.0],
        "Y": [(1 + Y0_KM + 0.5) * 1000.0, (2 + Y0_KM + 0.5) * 1000.0]})

    g_p = str(tmp_path / "grids.parquet")
    ga_p = str(tmp_path / "gauge.parquet")
    st_p = str(tmp_path / "stations.parquet")
    out = str(tmp_path / "scores.parquet")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(g_p)
    spark.createDataFrame(pd.DataFrame(gauge_rows)).write.parquet(ga_p)
    stations.to_parquet(st_p, index=False)

    assert main(["evaluate", g_p, ga_p, st_p, out]) == 0
    scores = spark.read.parquet(out).toPandas()
    assert set(scores["model"]) == {"A", "B"}
    assert set(scores["agg"]) == {"10min", "60min"}
    assert "RMSE" in scores.columns and "scatter" in scores.columns
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["score_rows"] == len(scores) > 0


def test_cli_report(spark, tmp_path, capsys):
    from rainforest_spark.cli import main

    inp = "/root/testdata/sf0.01/documents.parquet"
    out = str(tmp_path / "report")
    assert main(["report", inp, "-o", out, "--vocab-k", "100"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["groups"] >= 2
    one = next(iter(res["report"].values()))
    assert {"n_docs", "total_chars", "oov_tokens", "oov_rate",
            "n_terms", "jsd", "n_docs_distinct", "approx_ngrams",
            "mass_rank", "cum_share", "gini", "ttr"} <= set(one)
    assert 0.0 <= one["ttr"] <= 1.0
    # power-law panel: slope negative (Zipf), beta in (0, 1] (Heaps)
    assert res["zipf"]["zipf_slope"] < 0
    assert 0 < res["heaps"]["heaps_beta"] <= 1
    # persisted report matches the printed one
    saved = spark.read.parquet(out)
    assert saved.count() == res["groups"]


def test_cli_media_dedup(spark, tmp_path, capsys):
    import numpy as np

    from rainforest_spark.cli import main
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.grid.png import encode_png_bytes
    from tests.test_multimodal import _structured_plane

    media = tmp_path / "media"
    media.mkdir()
    a, b = _structured_plane(41), _structured_plane(42)
    (media / "a.gif").write_bytes(encode_gif_bytes(a))
    (media / "a_copy.png").write_bytes(encode_png_bytes(a))
    (media / "b.gif").write_bytes(encode_gif_bytes(b))
    (media / "junk.bin").write_bytes(b"not an image")

    out = str(tmp_path / "keep")
    assert main(["media-dedup", str(media), "-o", out]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_files"] == 4 and res["n_undecodable"] == 1
    assert res["n_pairs"] == 1          # the re-encoded copy
    assert res["n_kept"] == 2           # one of the copies + b
    kept = spark.read.parquet(out)
    assert kept.filter("keep").count() == 2


def test_cli_media_dedup_corpus_sigs_writes_output(spark, tmp_path,
                                                   capsys):
    """--corpus-sigs combined with -o writes the per-file flag table
    (duplicate_of_corpus) instead of silently ignoring the flag."""
    from rainforest_spark.cli import main
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.operators.multimodal import image_phash
    from tests.test_multimodal import _structured_plane

    media = tmp_path / "media"
    media.mkdir()
    known, fresh = _structured_plane(51), _structured_plane(52)
    (media / "known.gif").write_bytes(encode_gif_bytes(known))
    (media / "fresh.gif").write_bytes(encode_gif_bytes(fresh))

    corpus = spark.createDataFrame(
        [(9, bytearray(encode_gif_bytes(known)))],
        "img_id long, content binary")
    sigs = str(tmp_path / "sigs")
    image_phash(corpus).select("img_id", "phash") \
        .write.parquet(sigs)

    out = str(tmp_path / "flags")
    assert main(["media-dedup", str(media), "--corpus-sigs", sigs,
                 "-o", out]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["mode"] == "vs-corpus" and res["n_flagged"] == 1
    flags = {os.path.basename(r.media_path): r.duplicate_of_corpus
             for r in spark.read.parquet(out).collect()}
    assert flags == {"known.gif": True, "fresh.gif": False}


def test_cli_shell(spark, tmp_path, capsys, monkeypatch):
    """The interactive shell dispatches lines through the same parser,
    survives bad commands and errors, and exits on quit/EOF
    (reference interface.py menu-loop surface)."""
    from rainforest_spark.cli import main

    pd.DataFrame({"k": [1, 2, 3]}).to_parquet(tmp_path / "t.parquet")
    lines = iter([
        "",                                       # blank: skipped
        "# a comment",
        "not-a-command",                          # parse error survives
        f'query "SELECT COUNT(*) AS n FROM t" '
        f'-t t={tmp_path / "t.parquet"}',
        "help",
        "quit",
    ])
    monkeypatch.setattr("builtins.input", lambda _="": next(lines))
    rc = main(["shell"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"n"' in out or "n" in out  # the query ran and printed


def test_cli_quality_gate(spark, tmp_path, capsys):
    import json as _json
    import random

    from rainforest_spark.cli import main

    rng = random.Random(5)
    words = ["clean", "plain", "text", "with", "common", "words", "and",
             "usual", "structure", "here"]
    seed = ([(i, " ".join(rng.choices(words, k=25)), 1)
             for i in range(80)]
            + [(100 + i, " ".join("".join(rng.choices("0123456789#$%", k=8))
                                  for _ in range(25)), 0)
               for i in range(80)])
    pd.DataFrame(seed, columns=["doc_id", "text", "label"]).to_parquet(
        tmp_path / "seed.parquet")
    corpus = [(500, " ".join(rng.choices(words, k=25))),
              (501, " ".join("".join(rng.choices("0123456789#$%", k=8))
                             for _ in range(25)))]
    pd.DataFrame(corpus, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "corpus.parquet")
    out = str(tmp_path / "scored")
    assert main(["quality", str(tmp_path / "corpus.parquet"),
                 "--seed", str(tmp_path / "seed.parquet"),
                 "-o", out, "--threshold", "0.5"]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_in"] == 2 and res["n_out"] == 1
    kept = spark.read.parquet(out)
    assert [r.doc_id for r in kept.collect()] == [500]


def test_cli_compact_and_novelty(spark, tmp_path):
    import glob
    import json as _json
    import os
    import subprocess
    import sys

    import numpy as np

    # compact: fragment one partition with three appends, sweep it
    store = str(tmp_path / "store")
    for i in range(3):
        (spark.createDataFrame([(i, "A", float(i))],
                               "k long, day string, v double")
         .coalesce(1).write.mode("append").partitionBy("day")
         .parquet(store))
    r = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "compact",
         store, "--min-files", "2"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = _json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rewritten"] == {"A": 3}
    files = [f for f in glob.glob(f"{store}/day=A/*")
             if not os.path.basename(f).startswith(("_", "."))]
    assert len(files) == 1

    # novelty: batch member identical to a corpus vector -> dropped by
    # the gate; an orthogonal vector survives
    base = [1.0, 0.0, 0.0, 0.0]
    rng = np.random.RandomState(5)
    corpus_rows = [(100 + i, (np.array(base) + rng.randn(4) * 0.01)
                    .astype(np.float32).tolist()) for i in range(20)]
    spark.createDataFrame(corpus_rows,
                          "vec_id long, embedding array<float>") \
        .write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [0.0, 0.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>") \
        .write.parquet(str(tmp_path / "batch"))
    out = str(tmp_path / "novel")
    r2 = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "novelty",
         str(tmp_path / "batch"), str(tmp_path / "corpus"), out,
         "--min-novelty", "0.1"],
        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    kept = {r["batch_id"] for r in spark.read.parquet(out).collect()}
    assert 0 not in kept          # re-served content gated out
