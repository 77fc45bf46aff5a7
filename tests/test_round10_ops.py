"""Round-10 operator invariants: row-local MinHash parity and the
epoch-shuffle permutation law."""

from __future__ import annotations

from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import dedup as dd
from burst_db_spark.operators import text as tx
from tests.conftest import SF_DIR


def test_row_local_minhash_matches_batch_signatures(spark):
    """array_min row-local signatures (both the one-expression form and
    the two-step digest form) == the batch explode+groupBy signatures,
    per doc and per hash."""
    docs = load(spark, SF_DIR, "documents")
    batch = {
        r["doc_id"]: tuple(r[f"h{j}"] for j in range(16))
        for r in dd.minhash_signatures(docs, "doc_id").collect()
    }
    sh = tx.shingles(F.col("text"))
    one = {
        r["doc_id"]: tuple(r["sig"])
        for r in docs.where(F.size(sh) > 0)
        .select("doc_id", dd.row_local_minhash(sh).alias("sig"))
        .collect()
    }
    assert one == batch
    two = {
        r["doc_id"]: tuple(r["sig"])
        for r in docs.where(F.size(sh) > 0)
        .select("doc_id", dd.shingle_digests(sh).alias("digs"))
        .select("doc_id", dd.minhash_from_digests(F.col("digs")).alias("sig"))
        .collect()
    }
    assert two == batch


def test_row_local_band_keys_match_band_frame(spark):
    docs = load(spark, SF_DIR, "documents")
    sigs = dd.minhash_signatures(docs, "doc_id")
    frame = {
        (r["doc_id"], r["band_idx"]): r["band_key"]
        for r in dd.lsh_band_frame(sigs, "doc_id").collect()
    }
    sh = tx.shingles(F.col("text"))
    got = {}
    rows = (
        docs.where(F.size(sh) > 0)
        .select("doc_id", dd.row_local_minhash(sh).alias("sig"))
        .select("doc_id", dd.row_local_band_keys(F.col("sig")).alias("keys"))
        .collect()
    )
    for r in rows:
        for i, k in enumerate(r["keys"]):
            got[(r["doc_id"], i)] = k
    assert got == frame


def test_epoch_shuffle_is_permutation_with_balanced_shards(spark):
    """epoch_pos is a bijection 1..N; fixed-size shards differ by at
    most one row; different seeds give different permutations."""
    from burst_db_spark.operators.packing import epoch_shuffle

    docs = load(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    out = epoch_shuffle(docs, "doc_id", "e0", 8).collect()
    assert sorted(r["epoch_pos"] for r in out) == list(range(1, n + 1))
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    other = epoch_shuffle(docs, "doc_id", "e1", 8).collect()
    assert {r["doc_id"]: r["epoch_pos"] for r in other} != {
        r["doc_id"]: r["epoch_pos"] for r in out
    }


def test_sampling_priority_and_headline_names_exist():
    """Unknown names in _SAMPLING_PRIORITY are silently ignored (that's
    deliberate, it lets planned queries pre-register) — which means a
    TYPO would silently shift the driver's 50-row sampling prefix. Pin
    every listed name (and every bench HEADLINE name) to a real
    registered query."""
    import importlib.util
    import os

    from burst_db_spark.queries import _SAMPLING_PRIORITY
    from burst_db_spark.registry import all_queries

    specs = all_queries()
    missing = [n for n in _SAMPLING_PRIORITY if n not in specs]
    assert not missing, f"_SAMPLING_PRIORITY typos: {missing}"

    spec = importlib.util.spec_from_file_location(
        "benchmod_check",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    missing_h = [n for n in bm.HEADLINE if n not in specs]
    assert not missing_h, f"bench HEADLINE typos: {missing_h}"
    missing_p = [n for n in bm.PINNED_SF if n not in bm.HEADLINE]
    assert not missing_p, f"PINNED_SF names not in HEADLINE: {missing_p}"


def test_w5b_oracle_walk_matches_python_on_anchor_moving_case():
    """The self-review repro: an event date fires the MOVE with
    n_refs == 1, relocating the FIRST reference — the interval anchor
    must move to the CURRENT acquisition (python refs[-1] = t), not the
    previous row's ts. Runs the committed oracle SQL in DuckDB against
    select_reference_dates on a synthetic single-frame series."""
    from datetime import datetime, timedelta

    import duckdb

    from burst_db_spark.plans.reference_dates import select_reference_dates
    from burst_db_spark.queries.round10 import _W5B_ORACLE

    d0 = datetime(2020, 1, 6)
    offsets = [0, 3, 10, 11, 12, 13, 14, 15, 18, 25, 32]
    times = [d0 + timedelta(days=o) for o in offsets]
    # event dates exactly as the query derives them: min date +10, +20
    events = {(d0 + timedelta(days=10)).date(), (d0 + timedelta(days=20)).date()}
    expect = select_reference_dates(
        times, event_dates=events, interval_days=7, min_acquisitions=5
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE events (user_id INTEGER, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO events VALUES (1, ?)", [(t,) for t in times]
    )
    rows = con.execute(_W5B_ORACLE).fetchall()
    got = [r[2] for r in sorted(rows, key=lambda r: r[1])]
    assert got == expect, (got, expect)
    # and the move path genuinely fired: a ref slot was superseded
    assert len(expect) < len(
        con.execute(
            _W5B_ORACLE.split("SELECT frame_fid, CAST(n_refs AS INTEGER)")[0]
            + "SELECT 1 FROM walk WHERE chg > 0"
        ).fetchall()
    )


def test_cluster_incremental_reduced_merge_equals_star_merge(spark):
    """r14 rework of dd_cluster_incremental: the reduced-graph merge
    (old endpoints contracted to their stored cluster reps, CC over
    new docs ∪ touched reps, sizes joined from the label store) returns
    EXACTLY the rows of the retired full-spine star merge. Labels agree
    because CC labels are component-minimum ids and each old cluster's
    rep is its minimum member; counts agree because old clusters merge
    atomically through their star."""
    docs = load(spark, SF_DIR, "documents")
    is_new = F.col("doc_id") % 3 == 0
    all_p = dd.minhash_lsh_dedup(docs, "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    ).persist()
    old_pairs = all_p.where((F.col("id_a") % 3 != 0) & (F.col("id_b") % 3 != 0))
    new_pairs = all_p.where((F.col("id_a") % 3 == 0) | (F.col("id_b") % 3 == 0))
    stored = dd.connected_components(
        old_pairs, docs.where(~is_new), "doc_id"
    ).persist()

    # retired r13 shape: star edge per old doc, CC over the full spine
    star = stored.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("id_b")
    )
    cc_star = dd.connected_components(star.unionByName(new_pairs), docs, "doc_id")
    ref = (
        cc_star.groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(is_new.cast("int")).cast("bigint").alias("n_new"),
        )
        .where(F.col("n_new") > 0)
    )

    # production shape (the dd_cluster_incremental body)
    lbl_a = stored.select(F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("ca"))
    lbl_b = stored.select(F.col("doc_id").alias("id_b"), F.col("cluster_id").alias("cb"))
    mapped = (
        new_pairs.join(lbl_a, "id_a", "left")
        .join(lbl_b, "id_b", "left")
        .select(
            F.coalesce("ca", F.col("id_a")).alias("id_a"),
            F.coalesce("cb", F.col("id_b")).alias("id_b"),
        )
    )
    nodes = (
        docs.where(is_new)
        .select("doc_id")
        .unionByName(mapped.select(F.col("id_a").alias("doc_id")))
        .unionByName(mapped.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cc_red = dd.connected_components(mapped, nodes, "doc_id")
    sizes = stored.groupBy("cluster_id").agg(F.count("*").cast("bigint").alias("sz"))
    got = (
        cc_red.join(sizes.withColumnRenamed("cluster_id", "doc_id"), "doc_id", "left")
        .groupBy("cluster_id")
        .agg(
            F.sum(F.coalesce(F.col("sz"), F.lit(1).cast("bigint")))
            .cast("bigint")
            .alias("n_docs"),
            F.sum(is_new.cast("int")).cast("bigint").alias("n_new"),
        )
        .where(F.col("n_new") > 0)
    )

    assert sorted(map(tuple, ref.collect())) == sorted(map(tuple, got.collect()))
    all_p.unpersist()
    stored.unpersist()
