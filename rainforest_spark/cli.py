"""Command-line interface (reference: rainforest_interface,
rainforest/interface.py + pyproject.toml:39-43 console scripts).

Subcommands mirror the reference's user surface:

  query   — interactive SQL over registered tables (UT() macro works)
  bench   — run the headline benchmark
  qpe     — batch QPE composite from a polar drop directory
  dataset — run the Phase-2 prepare_input pipeline to parquet

Usage: python -m rainforest_spark.cli <subcommand> [args]
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_query(args) -> int:
    from rainforest_spark.catalog import Database

    db = Database()
    for spec in args.table or []:
        name, path = spec.split("=", 1)
        db.add_tables({name: path})
    result = db.query(args.sql, output_file=args.output)
    if args.output is None:
        if hasattr(result, "show"):
            result.show(args.n)        # lazy DataFrame (big result)
        else:
            print(result.to_string())  # collected pandas
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def cmd_qpe(args) -> int:
    from rainforest_spark.grid.io import save_grid_npz
    from rainforest_spark.grid.lookup import polar_to_cart_lut
    from rainforest_spark.grid.qpe import (
        apply_polar_masks, polar_to_grid, rain_rate, vertical_composite,
    )
    from rainforest_spark.session import get_spark
    from rainforest_spark.sources.polar_ingest import read_polar_volumes
    from rainforest_spark.testing.fixtures import RADAR_XYZ

    spark = get_spark("rainforest-qpe")
    polar = read_polar_volumes(spark, args.input)
    # build the LUT only for the (radar, sweep) pairs actually present —
    # one tiny distinct scan instead of the full 5×20 geometry
    present = polar.select("RADAR", "SWEEP").distinct().collect()
    radars = {r["RADAR"]: RADAR_XYZ[r["RADAR"]] for r in present}
    sweeps = sorted({r["SWEEP"] for r in present})
    lut = polar_to_cart_lut(spark, radars, sweeps=sweeps)
    if getattr(args, "status_xml", None):
        # status-derived per-sweep noise replaces the constant SNR floor
        from rainforest_spark.grid.corrections import apply_status_noise
        from rainforest_spark.sources.status_xml import status_noise_table

        docs = [(r, 0, open(args.status_xml).read()) for r in radars]
        polar = apply_status_noise(polar, status_noise_table(spark, docs))
    grid = polar_to_grid(apply_polar_masks(polar), lut, ["zh_lin"])
    if getattr(args, "vpr_xml", None):
        # VPR factor at the sweep-grid beam height (before compositing),
        # multiplicative on linear Z — io_data.py:332-380 semantics
        from rainforest_spark.grid.corrections import (
            apply_vpr_to_zlin, vpr_correction_curve,
        )
        from rainforest_spark.sources.status_xml import vpr_profile_values

        vals, res = vpr_profile_values(open(args.vpr_xml).read())
        curve = vpr_correction_curve(spark, vals, res, sorted(radars)[0])
        grid = apply_vpr_to_zlin(grid, curve, zlin_col="zh_lin",
                                 height_col="height")
    comp = vertical_composite(grid, ["zh_lin"], visib_col=None)
    rr = rain_rate(comp)
    ts = rr.agg({"TIMESTAMP": "max"}).collect()[0][0] or 0
    save_grid_npz(rr, "rain_rate", args.output, timestamp=int(ts))
    print(json.dumps({"output": args.output, "timestamp": int(ts)}))
    return 0


def cmd_dataset(args) -> int:
    from rainforest_spark.ml.dataset import prepare_input
    from rainforest_spark.session import get_spark

    spark = get_spark("rainforest-dataset")
    dfs = {name: spark.read.parquet(f"{args.input}/{name}.parquet")
           for name in ("gauge", "radar", "reference", "stations", "radars")}
    out = prepare_input(dfs["gauge"], dfs["radar"], dfs["reference"],
                        dfs["stations"], dfs["radars"])
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"output": args.output, "rows": out.count()}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rainforest-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="SQL over registered tables")
    q.add_argument("sql")
    q.add_argument("-t", "--table", action="append",
                   help="name=path.parquet (repeatable)")
    q.add_argument("-o", "--output", default=None)
    q.add_argument("-n", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    b = sub.add_parser("bench", help="run headline benchmark")
    b.set_defaults(fn=cmd_bench)

    g = sub.add_parser("qpe", help="batch QPE from a polar drop dir")
    g.add_argument("input")
    g.add_argument("output")
    g.add_argument("--status-xml", default=None,
                   help="radar status XML: per-sweep noise SNR mask")
    g.add_argument("--vpr-xml", default=None,
                   help="VPR profile XML: height-dependent correction")
    g.set_defaults(fn=cmd_qpe)

    d = sub.add_parser("dataset", help="prepare_input to parquet")
    d.add_argument("input")
    d.add_argument("output")
    d.set_defaults(fn=cmd_dataset)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
