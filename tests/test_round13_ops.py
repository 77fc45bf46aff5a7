"""Round-13-era operator invariants: UniMax allocation, PSI drift,
quality-ranked survivors, pipeline provenance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import text as tx
from burst_db_spark.registry import all_queries
from tests.conftest import SF_DIR


def test_unimax_matches_iterative_water_filling(spark):
    """The closed-form window allocator == the textbook iterative
    water-filling loop, and the standard invariants hold: alloc <= cap,
    epochs <= cap factor, binding level exhausts the budget."""
    out = {
        r["lang"]: r
        for r in all_queries()["t_unimax_allocation"]
        .build(spark, SF_DIR)
        .collect()
    }
    assert out
    caps = {l: r["cap"] for l, r in out.items()}
    n_tok = {l: r["n_tokens"] for l, r in out.items()}
    budget = math.floor(0.5 * sum(n_tok.values()))

    # iterative reference: raise the water level until the budget is spent
    remaining = float(budget)
    active = dict(caps)
    alloc = {l: 0.0 for l in caps}
    while active and remaining > 1e-9:
        share = remaining / len(active)
        binding = {l: c for l, c in active.items() if c - alloc[l] <= share}
        if not binding:
            for l in active:
                alloc[l] += share
            remaining = 0.0
        else:
            for l, c in binding.items():
                remaining -= c - alloc[l]
                alloc[l] = float(c)
                del active[l]
    for l, r in out.items():
        assert r["alloc"] <= r["cap"] + 1e-6
        assert abs(r["alloc"] - alloc[l]) < 1e-6, (l, r["alloc"], alloc[l])
        assert abs(r["epochs"] - r["alloc"] / n_tok[l]) < 1e-12
        assert r["epochs"] <= 2 + 1e-9
    assert abs(sum(r["alloc"] for r in out.values()) - budget) < 1e-3


def test_psi_drift_reference_and_invariants(spark):
    """PSI >= 0, and each type's value matches an independent Python
    computation over the same parity split and width-25 bins."""
    rows = {
        r["event_type"]: r
        for r in all_queries()["a42_psi_drift"].build(spark, SF_DIR).collect()
    }
    assert rows
    ev = load(spark, SF_DIR, "events").select(
        "event_type", "event_id", "value"
    ).collect()
    from collections import defaultdict

    cnt: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in ev:
        b = math.floor(r["value"] / 25.0)
        cnt[r["event_type"]][b][r["event_id"] % 2] += 1
    for et, r in rows.items():
        bins = cnt[et]
        z_old = sum(v[0] for v in bins.values())
        z_new = sum(v[1] for v in bins.values())
        nb = len(bins)
        psi = 0.0
        for b in sorted(bins):
            p_old = (bins[b][0] + 0.5) / (z_old + 0.5 * nb)
            p_new = (bins[b][1] + 0.5) / (z_new + 0.5 * nb)
            psi += (p_new - p_old) * round(math.log(p_new / p_old), 6)
        assert r["n_bins"] == nb
        assert abs(r["psi"] - psi) < 1e-9
        assert r["psi"] >= -1e-12  # PSI is a symmetrized KL: non-negative


def test_cluster_best_survivor_is_max_quality(spark):
    """Every survivor has the max quality score in its cluster (tie ->
    lowest id), and only multi-member clusters appear."""
    from burst_db_spark.operators import dedup as dd

    docs = load(spark, SF_DIR, "documents")
    out = all_queries()["dd_cluster_best_survivor"].build(spark, SF_DIR).collect()
    assert out
    pairs = dd.ngram_jaccard_pairs(docs, "doc_id", threshold=0.2)
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.connected_components(pairs, docs, "doc_id").collect()
    }
    q = {
        r["doc_id"]: r["quality_score"]
        for r in tx.quality_features(docs.select("doc_id", "text"))
        .select("doc_id", "quality_score")
        .collect()
    }
    members: dict = {}
    for d, c in labels.items():
        members.setdefault(c, []).append(d)
    for r in out:
        mem = members[r["cluster_id"]]
        assert len(mem) == r["n_members"] > 1
        best = min(mem, key=lambda d: (-q[d], d))
        assert r["survivor_id"] == best
        assert r["survivor_quality"] == q[best]


def test_pipeline_provenance_statuses_consistent(spark):
    """final_status is the FIRST failing stage; kept docs pass every
    stage; every doc appears exactly once."""
    docs = load(spark, SF_DIR, "documents")
    out = all_queries()["t_pipeline_provenance"].build(spark, SF_DIR).collect()
    assert len(out) == docs.count()
    for r in out:
        if r["final_status"] == "kept":
            assert r["passed_quality"]
            assert not r["is_exact_dup"]
            assert not r["is_near_dup_loser"]
        elif r["final_status"] == "drop:quality":
            assert not r["passed_quality"]
        elif r["final_status"] == "drop:exact_dup":
            assert r["passed_quality"] and r["is_exact_dup"]
        elif r["final_status"] == "drop:near_dup":
            assert (
                r["passed_quality"]
                and not r["is_exact_dup"]
                and r["is_near_dup_loser"]
            )
        else:
            raise AssertionError(r["final_status"])
    statuses = {r["final_status"] for r in out}
    assert "kept" in statuses


def test_matryoshka_funnel_invariants_and_recall(spark):
    """Ranks are 1..3 per query; the full-dim cosine is exact; the
    funnel keeps useful recall vs brute-force top-3."""
    from burst_db_spark.operators.similarity import cosine_topk

    out = (
        all_queries()["knn_matryoshka_funnel"].build(spark, SF_DIR).collect()
    )
    emb = load(spark, SF_DIR, "embeddings")
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3]
    brute = cosine_topk(
        emb, emb.where(F.col("vec_id") < 10), k=3
    ).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    fset = {(r["query_id"], r["neighbor_id"]) for r in out}
    recall = len(bset & fset) / len(bset)
    assert recall >= 0.5, f"funnel recall {recall} too low"


def test_bootstrap_ci_deterministic_and_sane(spark):
    """Re-running yields identical CIs (hashed Poisson weights, no RNG);
    lo <= hi; the full-sample mean falls inside every 95% interval; and
    the Poisson weights match an independent Python inversion."""
    import hashlib

    q = all_queries()["a43_bootstrap_ci"]
    a = sorted(map(tuple, q.build(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q.build(spark, SF_DIR).collect()))
    assert a == b
    ev = load(spark, SF_DIR, "events")
    means = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    for et, lo, hi, nb in a:
        assert nb == 32
        assert lo <= hi
        assert lo <= means[et] <= hi

    # spot-check the sliced-digest Poisson inversion against the query's
    # own weight expression evaluated in Spark (one md5 digest = four
    # 32-bit uniforms: seed = b // 4, hex slice = b % 4)
    from burst_db_spark.queries.round13 import _POIS_CDF

    rows = spark.createDataFrame(
        [(0, 1), (3, 17), (31, 999)], "b int, event_id long"
    )
    u_col = (
        F.conv(
            F.md5(
                F.concat(
                    F.lit("boot"),
                    (F.col("b") / 4).cast("int").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                )
            ).substr((F.col("b") % 4) * 8 + 1, F.lit(8)),
            16,
            10,
        ).cast("bigint").cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    wt = F.lit(5)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wt = F.when(u_col <= F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(wt)
    got = {(r["b"], r["event_id"]): r["wt"] for r in rows.select("b", "event_id", wt.alias("wt")).collect()}
    for (bb, eid), w_spark in got.items():
        dig = hashlib.md5(f"boot{bb // 4}:{eid}".encode()).hexdigest()
        h = int(dig[(bb % 4) * 8 : (bb % 4) * 8 + 8], 16)
        u = (h + 0.5) / 4294967296.0
        expect = next((k for k, t in enumerate(_POIS_CDF) if u <= t), 5)
        assert w_spark == expect


def test_zipf_slope_matches_python_ols(spark):
    """Slope/intercept match an independent Python OLS on the same
    6dp-rounded ln(rank)/ln(freq) points, and the slope is negative
    (frequencies decay with rank by construction)."""
    from collections import Counter

    row = all_queries()["t_zipf_slope"].build(spark, SF_DIR).collect()[0]
    docs = load(spark, SF_DIR, "documents").select("text").collect()
    cnt: Counter = Counter()
    for r in docs:
        cnt.update(r["text"].lower().strip().split())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    pts = [
        (round(math.log(i + 1), 6), round(math.log(f), 6))
        for i, (_, f) in enumerate(top)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["n_terms"] == n
    assert abs(row["zipf_slope"] - slope) < 1e-9
    assert row["zipf_slope"] < 0


def test_heaps_law_cumulative_invariants(spark):
    """Cumulative curves are monotone; the last checkpoint equals the
    corpus totals; vocabulary growth decelerates overall (Heaps)."""
    rows = sorted(
        all_queries()["t_heaps_law"].build(spark, SF_DIR).collect(),
        key=lambda r: r["cp"],
    )
    assert rows
    docs = load(spark, SF_DIR, "documents").select("text").collect()
    vocab = set()
    total = 0
    for r in docs:
        ts = r["text"].lower().strip().split()
        total += len(ts)
        vocab.update(ts)
    for a, b in zip(rows, rows[1:]):
        assert b["tokens_cum"] > a["tokens_cum"]
        assert b["vocab_cum"] >= a["vocab_cum"]
    assert rows[-1]["tokens_cum"] == total
    assert rows[-1]["vocab_cum"] == len(vocab)
    # deceleration: the second half of the corpus adds fewer new terms
    mid = rows[len(rows) // 2 - 1]
    assert (
        rows[-1]["vocab_cum"] - mid["vocab_cum"] < mid["vocab_cum"]
    )


def test_pmi_collocations_match_python(spark):
    """Top-PMI pairs match an independent Python computation (same
    6dp-rounded ln, same >= 5 count floor, same tiebreaks)."""
    from collections import Counter

    out = all_queries()["t_pmi_collocations"].build(spark, SF_DIR).collect()
    assert len(out) == 50
    docs = load(spark, SF_DIR, "documents").select("text").collect()
    uni: Counter = Counter()
    bi: Counter = Counter()
    for r in docs:
        ts = r["text"].lower().strip().split()
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    zu, zb = sum(uni.values()), sum(bi.values())
    pmi = {
        (w1, w2): round(
            math.log((c / zb) / ((uni[w1] / zu) * (uni[w2] / zu))), 6
        )
        for (w1, w2), c in bi.items()
        if c >= 5
    }
    top = sorted(pmi.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    expect = [(w1, w2, pmi_v) for (w1, w2), pmi_v in top]
    got = [
        (r["w1"], r["w2"], r["pmi"])
        for r in sorted(out, key=lambda r: r["rnk"])
    ]
    assert got == expect
    for r in out:
        assert r["pair_count"] >= 5


def test_ks_drift_matches_python_ecdf(spark):
    """KS D equals the max ECDF gap computed independently, per type."""
    rows = {
        r["event_type"]: r
        for r in all_queries()["a44_ks_drift"].build(spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events").select(
        "event_type", "event_id", "value"
    ).collect()
    from collections import defaultdict

    samples: dict = defaultdict(lambda: ([], []))
    for r in ev:
        samples[r["event_type"]][r["event_id"] % 2].append(r["value"])
    for et, r in rows.items():
        old, new = samples[et]
        old.sort()
        new.sort()
        pts = sorted(set(old) | set(new))
        import bisect

        d = max(
            abs(
                bisect.bisect_right(old, v) / len(old)
                - bisect.bisect_right(new, v) / len(new)
            )
            for v in pts
        )
        assert r["n_old"] == len(old) and r["n_new"] == len(new)
        assert abs(r["ks_d"] - d) < 1e-12
        assert 0 <= r["ks_d"] <= 1


def test_renyi_diversity_exact_integers(spark):
    """h2 / effective vocab match exact integer sums of squared counts."""
    from collections import Counter, defaultdict

    rows = {
        r["source"]: r
        for r in all_queries()["t_renyi_diversity"].build(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").select("source", "text").collect()
    per_src: dict = defaultdict(Counter)
    for r in docs:
        per_src[r["source"]].update(r["text"].lower().strip().split())
    assert set(rows) == set(per_src)
    for src, cnt in per_src.items():
        z = sum(cnt.values())
        ssq = sum(c * c for c in cnt.values())
        r = rows[src]
        assert r["vocab"] == len(cnt)
        assert r["n_tokens"] == z
        assert r["h2"] == round(-math.log(ssq / (z * z)), 6)
        assert abs(r["effective_vocab"] - (z * z) / ssq) < 1e-9
        # effective vocab can never exceed the raw vocab
        assert r["effective_vocab"] <= r["vocab"] + 1e-9


def test_mmr_rerank_greedy_invariants(spark):
    """Five unique picks; first pick is the max-relevance doc; every
    later pick maximizes lambda*rel - (1-lambda)*max-sim among the
    remaining pool (re-derived in Python from the raw vectors)."""
    out = sorted(
        all_queries()["t_mmr_rerank"].build(spark, SF_DIR).collect(),
        key=lambda r: r["sel_rank"],
    )
    assert [r["sel_rank"] for r in out] == [1, 2, 3, 4, 5]
    assert len({r["neighbor_id"] for r in out}) == 5
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, SF_DIR, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return dot / (na * nb)

    q = emb[0]
    rel = {i: cos(q, v) for i, v in emb.items() if i != 0}
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    sel = []
    for step, r in enumerate(out, 1):
        best, best_score = None, None
        for i in pool:
            if i in sel:
                continue
            pen = max((cos(emb[i], emb[j]) for j in sel), default=0.0)
            score = 0.7 * rel[i] - (0.3 * pen if sel else 0.0)
            if best is None or score > best_score:
                best, best_score = i, score
        assert r["neighbor_id"] == best, (step, r["neighbor_id"], best)
        assert abs(r["mmr"] - best_score) < 1e-9
        sel.append(best)


def test_mann_whitney_matches_python_ranks(spark):
    """U statistics match a midrank computation in Python, and
    u_old + u_new == n0*n1 exactly."""
    rows = {
        r["event_type"]: r
        for r in all_queries()["a45_mann_whitney"].build(spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events").select(
        "event_type", "event_id", "value"
    ).collect()
    from collections import defaultdict

    samples: dict = defaultdict(list)
    for r in ev:
        samples[r["event_type"]].append((r["value"], r["event_id"] % 2))
    for et, r in rows.items():
        vals = sorted(samples[et])
        # midranks
        n = len(vals)
        r0 = 0.0
        i = 0
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                if vals[k][1] == 0:
                    r0 += avg
            i = j
        n0 = sum(1 for _, s in vals if s == 0)
        n1 = n - n0
        u_old = r0 - n0 * (n0 + 1) / 2.0
        assert r["n_old"] == n0 and r["n_new"] == n1
        assert abs(r["u_old"] - u_old) < 1e-9
        assert abs(r["u_old"] + r["u_new"] - n0 * n1) < 1e-9


def test_good_turing_matches_counter(spark):
    """Hapax/dis counts and the unseen-mass estimate match a Counter."""
    from collections import Counter, defaultdict

    rows = {
        r["lang"]: r
        for r in all_queries()["t_good_turing"].build(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").select("lang", "text").collect()
    per_lang: dict = defaultdict(Counter)
    for r in docs:
        per_lang[r["lang"]].update(r["text"].lower().strip().split())
    assert set(rows) == set(per_lang)
    for lang, cnt in per_lang.items():
        n1 = sum(1 for c in cnt.values() if c == 1)
        n2 = sum(1 for c in cnt.values() if c == 2)
        z = sum(cnt.values())
        r = rows[lang]
        assert r["n_hapax"] == n1 and r["n_dis"] == n2
        assert r["vocab"] == len(cnt) and r["n_tokens"] == z
        assert abs(r["p_unseen"] - n1 / z) < 1e-12
        if n1 > 0:
            assert abs(r["r1_star"] - 2.0 * n2 / n1) < 1e-12
        else:
            assert r["r1_star"] is None
