"""CLI mirroring the reference's `opera-db` commands (cli.py:28-44):

    python -m burst_db_spark create --out /tmp/db [--n-triplets 600]
    python -m burst_db_spark lookup --db /tmp/db --frame-id 1001000
    python -m burst_db_spark intersect --db /tmp/db --bbox "-10,-10,10,10"

`create` runs EP1 on the deterministic fixtures (point it at real burst
parquet via the library API); `lookup`/`intersect` answer from the
artifacts, printing JSON to stdout like the reference.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="burst_db_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="build the frame DB artifacts (EP1)")
    c.add_argument("--out", required=True)
    c.add_argument("--n-triplets", type=int, default=600)
    c.add_argument("--n-tracks", type=int, default=12)
    c.add_argument("--target", type=int, default=9)

    lk = sub.add_parser("lookup", help="one frame's record (EP3)")
    lk.add_argument("--db", required=True)
    lk.add_argument("--frame-id", type=int, required=True)

    ix = sub.add_parser("intersect", help="frames intersecting a bbox (EP3)")
    ix.add_argument("--db", required=True)
    ix.add_argument("--bbox", required=True, help="xmin,ymin,xmax,ymax")

    args = p.parse_args(argv)

    from burst_db_spark.session import get_spark

    spark = get_spark(app_name=f"burst_db_spark_{args.cmd}")

    if args.cmd == "create":
        from burst_db_spark.plans import fixtures
        from burst_db_spark.plans.create_pipeline import create

        trip = fixtures.burst_triplets(spark, args.n_triplets, args.n_tracks)
        bursts = fixtures.burst_id_map(spark, args.n_triplets, args.n_tracks)
        out = create(spark, trip, bursts, args.out, target=args.target)
        print(
            json.dumps(
                {
                    "out": args.out,
                    "n_frames": out["frames"].count(),
                    "n_bridge_rows": out["bridge"].count(),
                }
            )
        )
        return 0

    if args.cmd == "lookup":
        from burst_db_spark.plans.query_frame import lookup

        frames = spark.read.parquet(f"{args.db}/frames")
        bridge = spark.read.parquet(f"{args.db}/frames_bursts")
        rows = [r.asDict() for r in lookup(frames, bridge, args.frame_id).collect()]
        print(json.dumps(rows, default=str))
        return 0

    if args.cmd == "intersect":
        from burst_db_spark.geo.wkt import rect_wkt
        from burst_db_spark.plans.query_frame import intersect

        xmin, ymin, xmax, ymax = (float(v) for v in args.bbox.split(","))
        frames = spark.read.parquet(f"{args.db}/frames")
        hits = intersect(
            frames.withColumnRenamed("sxmin", "xmin")
            .withColumnRenamed("symin", "ymin")
            .withColumnRenamed("sxmax", "xmax")
            .withColumnRenamed("symax", "ymax"),
            rect_wkt(xmin, ymin, xmax, ymax),
        )
        rows = [
            {"frame_fid": r.frame_fid, "epsg": r.epsg, "is_land": r.is_land}
            for r in hits.collect()
        ]
        print(json.dumps(rows))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
