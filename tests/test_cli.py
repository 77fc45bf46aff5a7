"""CLI parity test: create → lookup → intersect through __main__.main."""

from __future__ import annotations

import json

from burst_db_spark.__main__ import main


def test_cli_create_lookup_intersect(spark, tmp_path, capsys):
    db = str(tmp_path / "db")
    assert main(["create", "--out", db, "--n-triplets", "120", "--n-tracks", "2"]) == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["n_frames"] > 0 and created["n_bridge_rows"] > 0

    # pick a real frame id from the created artifacts (run numbering
    # depends on the land-widening pass, so no hardcoded id)
    fid = int(spark.read.parquet(f"{db}/frames").agg({"frame_fid": "min"}).first()[0])
    assert main(["lookup", "--db", db, "--frame-id", str(fid)]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec) == 1
    assert rec[0]["geom_wkt"].startswith("MULTIPOLYGON")
    assert rec[0]["n_bursts"] == rec[0]["burst_ids"].count(",") + 1

    assert main(["intersect", "--db", db, "--bbox=-180,-90,180,90"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) == created["n_frames"]  # world bbox hits every frame
