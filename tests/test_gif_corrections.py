"""Pure-python GIF codec round-trips + status-noise / VPR application
golden tests (round-1 Missing #3/#5/#6)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_lzw_roundtrip_stress():
    from rainforest_spark.grid.gif import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(3)
    cases = [
        bytes(range(256)) * 40,                       # cycling, all codes
        bytes(rng.randint(0, 256, 60000, dtype=np.uint8)),  # dict overflow
        b"\x00" * 50000,                              # max compression
        bytes(rng.randint(0, 4, 30000, dtype=np.uint8)),
        b"a",
        b"",
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data)) == data


def test_gif_file_roundtrip(tmp_path):
    from rainforest_spark.grid.gif import (
        grayscale_palette, read_gif, write_gif,
    )

    rng = np.random.RandomState(11)
    m = rng.randint(0, 256, (64, 100), dtype=np.uint8)
    p = str(tmp_path / "t.gif")
    write_gif(m, p)
    back, pal = read_gif(p)
    assert back.shape == m.shape
    assert (back == m).all()
    assert pal == grayscale_palette()
    # container structure: GIF87a header, trailer byte
    raw = open(p, "rb").read()
    assert raw[:6] == b"GIF87a" and raw[-1] == 0x3B


def test_read_gif_stock_encoders():
    """Golden interop: GIFs written by standard encoders (shipped with
    libxslt's docs, giflib-era toolchains) must decode with the
    spec-conventional LZW width pairing.  The pinned hashes were taken
    from this decoder after the pairing fix; decoding previously died
    with 'corrupt LZW stream' on every stock GIF."""
    import hashlib
    import os

    from rainforest_spark.grid.gif import read_gif

    here = os.path.join(os.path.dirname(__file__), "data")
    golden = [
        ("redhat.gif", (41, 44), "0611b7d1e5bd0474"),
        ("smallfootonly.gif", (60, 48), "ff40de340d534363"),
    ]
    for name, shape, digest in golden:
        m, pal = read_gif(os.path.join(here, name))
        assert m.shape == shape
        assert hashlib.sha256(m.tobytes()).hexdigest()[:16] == digest
        assert len(pal) % 3 == 0 and len(pal) > 0


def test_save_load_grid_gif(spark, tmp_path):
    from rainforest_spark.grid.gif import load_grid_gif, save_grid_gif
    from rainforest_spark.grid.io import scale_cpc

    df = spark.createDataFrame(pd.DataFrame({
        "x_idx": np.int32([1, 2, 3]), "y_idx": np.int32([4, 5, 6]),
        "rr": [0.5, 3.0, 120.0]}))
    p = str(tmp_path / "rzc.gif")
    save_grid_gif(df, "rr", p)
    back = load_grid_gif(spark, p).toPandas().set_index(["x_idx", "y_idx"])
    scale = scale_cpc()
    for x, y, v in [(1, 4, 0.5), (2, 5, 3.0), (3, 6, 120.0)]:
        dn = back.loc[(x, y), "dn"]
        assert dn == np.searchsorted(scale, v), (x, y, v)
        assert back.loc[(x, y), "value"] == scale[dn]
    # untouched pixels carry the nodata DN (255), value NaN
    assert back.loc[(0, 0), "dn"] == 255
    assert np.isnan(back.loc[(0, 0), "value"])


STATUS_XML = """<status>
  <sweep number="1"><RADAR><STAT>
    <CALIB>
      <noisepower_frontend_h_inuse value="4.0e-6"/>
      <rconst_h value="72.5"/>
      <noisepower_frontend_v_inuse value="3.0e-6"/>
      <rconst_v value="71.0"/>
    </CALIB>
  </STAT></RADAR></sweep>
  <sweep number="2"><RADAR><STAT>
    <CALIB>
      <noisepower_frontend_h_inuse value="5.0e-6"/>
      <rconst_h value="73.0"/>
    </CALIB>
    <WET_RADOME><wetradome_mmh value="1.25"/></WET_RADOME>
  </STAT></RADAR></sweep>
</status>"""


def test_status_noise_applied(spark):
    from rainforest_spark.grid.corrections import (
        apply_status_noise, wet_radome_feature,
    )
    from rainforest_spark.sources.status_xml import status_noise_table

    st = status_noise_table(spark, [("A", 1000, STATUS_XML)])
    stp = st.toPandas().set_index("SWEEP")
    # noisedBADU = 10·log10(noisepower) + rconst
    assert stp.loc[1, "noisedbadu_h"] == pytest.approx(
        10 * np.log10(4.0e-6) + 72.5)
    assert stp.loc[2, "wetradome_mmh"] == 1.25

    polar = spark.createDataFrame(pd.DataFrame({
        "RADAR": "A", "SWEEP": 1,
        "rng_idx": np.int32([0, 10, 100]),
        "ZH": [-31.0, 10.0, 10.0],
        "RHOHV": [0.99, 0.98, 0.97],
        "KDP": [0.1, 0.2, 0.3],
        "nwp_T": [270.0, 271.0, 272.0]}))
    out = apply_status_noise(polar, st, snr_threshold=3.0) \
        .toPandas().set_index("rng_idx")
    nb = 10 * np.log10(4.0e-6) + 72.5
    for r in (0, 10, 100):
        exp_nh = nb + 20 * np.log10((r + 0.5) * 0.5 / 100.0)
        assert out.loc[r, "NH"] == pytest.approx(exp_nh)
    # the noise floor RISES with range (20·log10 law): the weak echo
    # survives mid-range but is masked near the radar and far out
    assert pd.isna(out.loc[0, "ZH"])      # snr = -31+33.5 = 2.5 < 3
    assert out.loc[10, "ZH"] == 10.0      # snr ≈ 17
    assert pd.isna(out.loc[100, "ZH"])    # snr ≈ -2.5
    # snr_mask nulls EVERY radar field at bad gates (radarprocessing.py
    # :116-142), not just ZH — and leaves NWP columns untouched
    for c in ("RHOHV", "KDP"):
        assert pd.isna(out.loc[0, c]) and pd.isna(out.loc[100, c])
        assert not pd.isna(out.loc[10, c])
    assert out["nwp_T"].notna().all()

    wr = wet_radome_feature(polar, st).toPandas()
    assert (wr["RADPRECIP"] == 1.25).all()


def test_vpr_curve_and_application(spark):
    from rainforest_spark.grid.corrections import (
        MAX_VPR_CORRECTION_DB, apply_vpr_to_zlin, vpr_correction_curve,
    )

    # profile: strong melting-layer bump then decay with height
    values = [1.0, 1.2, 1.5, 1.2, 0.9, 0.5, 0.2, 0.05]
    res = 500.0
    curve = vpr_correction_curve(spark, values, res, "A") \
        .toPandas().sort_values("alt_m")
    m = 10 ** (0.1 * MAX_VPR_CORRECTION_DB)
    # ref height 1500 m → slice 3 (value 1.2); corr = 1.2/v clamped
    exp = np.clip(1.2 / np.array(values), 1 / m, m)
    assert np.allclose(curve["corr_lin"].to_numpy(), exp)

    df = spark.createDataFrame(pd.DataFrame({
        "pix": [0, 1, 2, 3],
        "height": [0.0, 1250.0, 3500.0, 9000.0],
        "zh_lin": [100.0, 100.0, 100.0, 100.0]}))
    out = apply_vpr_to_zlin(df, vpr_correction_curve(spark, values, res, "A"),
                            height_col="height").toPandas().set_index("pix")
    assert out.loc[0, "VPR"] == pytest.approx(1.2 / 1.0)
    # 1250 m: midway between slices 2 (1.2/1.5) and 3 (1.2/1.2)
    assert out.loc[1, "VPR"] == pytest.approx((1.2 / 1.5 + 1.0) / 2)
    assert out.loc[2, "VPR"] == pytest.approx(min(1.2 / 0.05, m))
    # beyond the ladder → interp1d fill_value = max factor
    assert out.loc[3, "VPR"] == pytest.approx(m)
    assert out.loc[3, "zh_lin"] == pytest.approx(100.0 * m)


def test_vpr_profile_xml_ladder():
    from rainforest_spark.sources.status_xml import (
        parse_vpr_xml, vpr_profile_values,
    )

    xml = """<VPR><HEADER><vpr_res>200</vpr_res></HEADER><DATA>
      <slice><value>0.8</value></slice>
      <slice><value>1.1</value></slice>
      <slice><value>0.6</value></slice>
    </DATA></VPR>"""
    vals, res = vpr_profile_values(xml)
    assert vals == [0.8, 1.1, 0.6] and res == 200.0
    pdf = parse_vpr_xml(xml)
    assert list(pdf["height_m"]) == [0.0, 200.0, 400.0]


def test_cli_qpe_with_corrections(spark, tmp_path, monkeypatch):
    """CLI qpe end-to-end with --status-xml and --vpr-xml: the parsed
    corrections flow through the chain (noise SNR mask at gate level,
    VPR at sweep-grid level) and the sink still writes the composite."""
    import json as _json

    from rainforest_spark.cli import main
    from rainforest_spark.sources.polar_ingest import encode_volume_npz

    rng = np.random.RandomState(5)
    drop = tmp_path / "drop"
    drop.mkdir()
    sweeps = {}
    for sw in (1, 3):
        zh = rng.uniform(20, 50, (60, 40))
        sweeps[sw] = {"ZH": zh, "VISIB": rng.uniform(50, 100, (60, 40))}
    (drop / "A241530510.npz").write_bytes(encode_volume_npz(sweeps))

    vpr_xml = tmp_path / "vpr.xml"
    vpr_xml.write_text(
        "<VPR><HEADER><vpr_res>500</vpr_res></HEADER><DATA>"
        + "".join(f"<slice><value>{v}</value></slice>"
                  for v in [1.0, 1.2, 1.5, 1.2, 0.9, 0.5])
        + "</DATA></VPR>")
    status_xml = tmp_path / "status.xml"
    status_xml.write_text(STATUS_XML)

    out = str(tmp_path / "map.npz")
    rc = main(["qpe", str(drop), out,
               "--status-xml", str(status_xml),
               "--vpr-xml", str(vpr_xml)])
    assert rc == 0
    m = np.load(out)["data"]
    assert m.shape == (640, 710)
    assert np.isfinite(m).sum() > 100
    meta = _json.load(open(out + ".json"))
    assert meta["shape"] == [1, 640, 710]
