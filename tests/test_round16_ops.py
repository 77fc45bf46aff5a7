"""Build-round-14 additions: Gopher within-doc repetition and
per-language BPE fertility — python brute-force mirrors + plan pins."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from burst_db_spark.catalog import load
from burst_db_spark.queries.round16 import (
    t_gopher_repetition,
    t_bpe_fertility_by_lang,
)
from tests.conftest import SF_DIR


def _toks(text: str) -> list[str]:
    return [w for w in text.strip().lower().split() if w]


def test_gopher_repetition_matches_python(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    got = {r["doc_id"]: r for r in t_gopher_repetition(spark, SF_DIR).collect()}
    checked = 0
    for d in docs:
        t = _toks(d["text"])
        n = len(t)
        if n < 5:
            assert d["doc_id"] not in got
            continue
        checked += 1
        g2 = Counter(
            " ".join(t[i : i + 2]) for i in range(n - 1)
        )
        # ties: max count, then lexicographically smallest gram
        top2 = max(g2.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
        top2_cnt = max(g2.values())
        g5pos: dict[str, list[int]] = {}
        for i in range(n - 4):
            g5pos.setdefault(" ".join(t[i : i + 5]), []).append(i)
        covered: set[int] = set()
        for g, ps in g5pos.items():
            if len(ps) >= 2:
                for p in ps:
                    covered.update(range(p, p + 5))
        r = got[d["doc_id"]]
        assert r["n_tokens"] == n
        assert r["top2_cnt"] == top2_cnt
        assert r["dup5_cov"] == len(covered), d["doc_id"]
        assert r["top2_ok"] == (10 * top2_cnt <= n)
        assert r["dup5_ok"] == (20 * len(covered) <= 3 * n)
    assert checked > 0


def test_gopher_repetition_interval_union_no_double_count(spark):
    """Overlapping duplicated 5-grams must count each token ONCE:
    dup5_cov can never exceed n_tokens."""
    rows = t_gopher_repetition(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["dup5_cov"] <= r["n_tokens"]
        assert 0 <= r["top2_cnt"] * 2 <= r["n_tokens"] + 1


def test_bpe_fertility_by_lang_decodes_and_masses(spark):
    rows = t_bpe_fertility_by_lang(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # pieces >= words (a piece never spans words), fertility >= 1
        assert r["n_pieces"] >= r["n_words"] > 0
        assert r["fertility_fx"] >= 1048576  # >= 1.0 in 2^-20 units
        assert (
            r["fertility_fx"]
            == (r["n_pieces"] * 1048576) // r["n_words"]
        )


def test_fertility_uses_broadcast_encode(spark):
    """The word-type encode table rides a broadcast join (model-sized),
    never a shuffle join."""
    plan = (
        t_bpe_fertility_by_lang(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_kcore_peel_profile_properties(spark):
    """Peel profile invariants + the unroll-depth safety margin: the
    fixpoint must land >= 3 rounds inside the oracle's unroll (12), so
    small data drift can't silently outrun the unrolled CTE chain."""
    from burst_db_spark.queries.round16 import (
        _KCORE_ROUNDS,
        g6_kcore_peel,
    )

    rows = sorted(
        g6_kcore_peel(spark, SF_DIR).collect(), key=lambda r: r["round"]
    )
    assert rows[0]["round"] == 0 and rows[0]["n_removed"] == 0
    t_fix = rows[-1]["round"]
    assert t_fix <= _KCORE_ROUNDS - 3, (
        f"fixpoint at round {t_fix} is within 3 of the unroll depth "
        f"{_KCORE_ROUNDS}; deepen the oracle unroll"
    )
    # monotone shrink, removed = node delta, terminal row is a no-op
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_nodes"] <= prev["n_nodes"]
        assert cur["n_edges"] <= prev["n_edges"]
        assert cur["n_removed"] == prev["n_nodes"] - cur["n_nodes"]
    assert rows[-1]["n_nodes"] == rows[-2]["n_nodes"]
    assert rows[-1]["n_edges"] == rows[-2]["n_edges"]


def test_kcore_terminal_graph_has_min_degree_k(spark):
    """Every node surviving the peel keeps >= k neighbors — the k-core
    defining property, checked directly on the terminal edge set."""
    from burst_db_spark.operators.graph import kcore_peel
    from burst_db_spark.queries.round16 import _KCORE_K

    # tiny handcrafted graph: a 4-clique with a pendant chain
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, "src bigint, dst bigint")
    prof = sorted(
        kcore_peel(df, k=_KCORE_K, max_rounds=8).collect(),
        key=lambda r: r["round"],
    )
    # chain peels (5 then dangling 4->5 edge goes with it); 4-clique stays
    assert prof[-1]["n_nodes"] == 4
    assert prof[-1]["n_edges"] == 12  # 4-clique, both directions


def test_domain_jsd_matches_python(spark):
    """Full python mirror: exact fixed-point JSD assembly per pair."""
    import math

    from burst_db_spark.queries.round16 import t_domain_jsd

    docs = load(spark, SF_DIR, "documents").select("source", "text").collect()
    dist: dict[str, Counter] = {}
    for d in docs:
        dist.setdefault(d["source"], Counter()).update(_toks(d["text"]))
    S = 1073741824.0

    def fx(x: float) -> int:
        return math.floor(x * S)

    stats = {}
    for s, cnt in dist.items():
        n = sum(cnt.values())
        ps = {w: c / n for w, c in cnt.items()}
        stats[s] = (
            ps,
            sum(fx(-p * math.log(p)) for p in ps.values()),
            sum(fx((p / 2) * math.log(p / 2)) for p in ps.values()),
        )
    got = {
        (r["src_a"], r["src_b"]): r
        for r in t_domain_jsd(spark, SF_DIR).collect()
    }
    srcs = sorted(dist)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            pa, ha, aa = stats[sa]
            pb, hb, ab = stats[sb]
            shared = set(pa) & set(pb)
            corr = sum(
                fx(((pa[w] + pb[w]) / 2) * math.log((pa[w] + pb[w]) / 2))
                - fx((pa[w] / 2) * math.log(pa[w] / 2))
                - fx((pb[w] / 2) * math.log(pb[w] / 2))
                for w in shared
            )
            want = -2 * (aa + ab + corr) - ha - hb
            r = got[(sa, sb)]
            assert r["n_shared"] == len(shared)
            assert r["jsd2_fx"] == want, (sa, sb)
            # 0 <= JSD <= ln 2 (up to quantization slack of a few ulps)
            assert -16 <= r["jsd2_fx"] <= 2 * math.log(2) * S + 16


def test_rake_keywords_matches_python(spark):
    """Brute python RAKE mirror: same delimiters, deg/freq fixed-point
    word scores, phrase-sum scoring, per-source top-5 ties on phrase."""
    import re

    from burst_db_spark.queries.round16 import (
        _RAKE_STOP,
        _RAKE_TOPK,
        t_rake_keywords,
    )

    docs = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    alnum = re.compile(r"^[a-z0-9]+$")
    phrases = []  # (source, tuple(words))
    for d in docs:
        run: list[str] = []
        for w in _toks(d["text"]):
            if w in _RAKE_STOP or len(w) < 2 or not alnum.match(w):
                if run:
                    phrases.append((d["source"], tuple(run)))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append((d["source"], tuple(run)))
    freq: Counter = Counter()
    deg: Counter = Counter()
    for _, ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    wscore = {w: (deg[w] * 1048576) // freq[w] for w in freq}
    agg: dict = {}
    for srcph in phrases:
        src, ph = srcph
        e = agg.setdefault(
            (src, " ".join(ph)),
            [len(ph), 0, sum(wscore[w] for w in ph)],
        )
        e[1] += 1
    want: dict = {}
    by_src: dict = {}
    for (src, phrase), (n_words, n_occ, score) in agg.items():
        by_src.setdefault(src, []).append((phrase, n_words, n_occ, score))
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (-r[3], r[0]))
        for rank, (phrase, n_words, n_occ, score) in enumerate(
            rows[:_RAKE_TOPK], 1
        ):
            want[(src, rank)] = (phrase, n_words, n_occ, score)
    got = t_rake_keywords(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[(r["source"], r["rank"])]
        assert (r["phrase"], r["n_words"], r["n_occ"], r["score_fx"]) == w


def test_pca_power_aligns_with_numpy_eigensolver(spark):
    """The fixed-point iterate must align with numpy's top eigenvector
    of the SAME quantized gram (|cos| > 0.995 after the unrolled rounds
    — the synthetic embeddings are near-isotropic, eigengap
    lam2/lam1 ~ 0.93, so convergence needs ~60 rounds) and the
    eigenvalue estimate must be within quantization slack."""
    import numpy as np

    from burst_db_spark.queries.round16 import (
        _PCA_Q,
        _PCA_VNORM,
        knn_pca_power,
    )

    rows = sorted(
        knn_pca_power(spark, SF_DIR).collect(), key=lambda r: r["dim"]
    )
    assert len(rows) == 64
    v = np.array([r["v_fx"] for r in rows], dtype=np.float64)
    assert np.max(np.abs(v)) == _PCA_VNORM  # normalized to the target
    X = np.vstack(
        [
            r["embedding"]
            for r in load(spark, SF_DIR, "embeddings")
            .select("embedding")
            .collect()
        ]
    ).astype(np.float64)
    Q = np.floor(X * _PCA_Q)
    G = Q.T @ Q
    w, U = np.linalg.eigh(G)
    top = U[:, np.argmax(w)]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.995, cos
    lam = rows[0]["lam_fx"]
    assert all(r["lam_fx"] == lam for r in rows)
    # m = max|G v|, v normalized to VNORM in inf-norm: lam approximates
    # the dominant eigenvalue within the inf/2-norm gap — sanity band
    assert 0.5 * max(w) / _PCA_VNORM <= lam * 1.0 <= 1.5 * max(w)


def test_nn_descent_recall_climbs_and_lists_are_valid(spark):
    """Recall vs the exact top-k graph must improve from the block init
    through the NND rounds, and the final lists must be valid top-k
    (exact dps, rank-ordered, no self-edges)."""
    import numpy as np

    from burst_db_spark.queries.round16 import (
        _NND_BLOCKS,
        _NND_K,
        dd_nn_descent,
    )

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.vstack([r["embedding"] for r in rows]).astype(np.float64)
    Q = np.floor(X * 127).astype(np.int64)
    D = Q @ Q.T
    order = np.argsort(ids)
    ids, Q, D = ids[order], Q[order], D[order][:, order]
    n = len(ids)

    def topk(cand_mask: np.ndarray) -> dict:
        out = {}
        for i in range(n):
            cs = [
                (int(-D[i, j]), int(ids[j]))
                for j in range(n)
                if j != i and cand_mask[i, j]
            ]
            cs.sort()
            out[int(ids[i])] = [c[1] for c in cs[:_NND_K]]
        return out

    from burst_db_spark.queries.round16 import _NND_HASH

    exact = topk(np.ones((n, n), dtype=bool))
    b1 = ids % _NND_BLOCKS
    b2 = ((ids.astype(object) * _NND_HASH) % 4294967296) // 268435456
    init = topk(
        np.equal.outer(b1, b1) | np.equal.outer(b2, b2)
    )

    got: dict = {}
    for r in dd_nn_descent(spark, SF_DIR).collect():
        got.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["dp"])
        )
    hits_final = hits_init = total = 0
    for v, lst in got.items():
        lst.sort()
        assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
        for _, nb, dp in lst:
            assert nb != v
            i = int(np.searchsorted(ids, v))
            j = int(np.searchsorted(ids, nb))
            assert dp == D[i, j]  # exact integer dot
        ex = set(exact[v][: len(lst)])
        hits_final += len(ex & {nb for _, nb, _ in lst})
        hits_init += len(ex & set(init[v][: len(lst)]))
        total += len(ex)
    assert total > 0
    # NND must improve markedly on the crossed-block init (isotropic
    # embeddings cap absolute recall — see the operator docstring)
    assert hits_final >= 1.5 * hits_init, (hits_final, hits_init)


def test_ktruss_peel_profile_and_margin(spark):
    """Truss profile invariants + unroll margin, plus the defining
    property on a handcrafted graph: a 4-clique (every edge in 2
    triangles) survives k=4; a triangle hanging off it (edges in 1
    triangle) peels."""
    from burst_db_spark.operators.graph import ktruss_peel
    from burst_db_spark.queries.round16 import (
        _KTRUSS_ROUNDS,
        g7_ktruss_peel,
    )

    rows = sorted(
        g7_ktruss_peel(spark, SF_DIR).collect(), key=lambda r: r["round"]
    )
    t_fix = rows[-1]["round"]
    assert t_fix <= _KTRUSS_ROUNDS - 3, t_fix
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_edges"] <= prev["n_edges"]
        assert cur["n_removed"] == prev["n_edges"] - cur["n_edges"]
    assert rows[-1]["n_edges"] == rows[-2]["n_edges"]

    # 4-clique {1,2,3,4} + pendant triangle {4,5,6}
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (4, 5), (4, 6), (5, 6)]
    sym = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, "src bigint, dst bigint")
    prof = sorted(
        ktruss_peel(df, k=4, max_rounds=6).collect(),
        key=lambda r: r["round"],
    )
    assert prof[-1]["n_edges"] == 12  # the 4-clique, both directions


def test_cluster_modularity_matches_python(spark):
    """Exact python mirror of Q·4m² over the CC labeling, plus the
    CC-specific identity Σe_c = m (every edge is intra-cluster)."""
    from burst_db_spark.operators import dedup as dd
    from burst_db_spark.queries.round16 import dd_cluster_modularity

    docs = load(spark, SF_DIR, "documents")
    pairs = [
        (r["id_a"], r["id_b"])
        for r in dd.ngram_jaccard_pairs(docs, "doc_id", threshold=0.2)
        .select("id_a", "id_b")
        .collect()
    ]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label = {i: find(i) for i in ids}
    m = len(pairs)
    deg: Counter = Counter()
    ec: Counter = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
        ec[label[a]] += 1
    dc: Counter = Counter()
    nd: Counter = Counter()
    for i in ids:
        dc[label[i]] += deg[i]
        nd[label[i]] += 1
    q4m2 = sum(4 * m * ec[c] - dc[c] * dc[c] for c in nd)
    r = dd_cluster_modularity(spark, SF_DIR).collect()[0]
    assert r["n_edges"] == m
    assert r["n_clusters"] == len(nd)
    assert r["n_multi_clusters"] == sum(1 for c in nd.values() if c > 1)
    assert r["largest_cluster"] == max(nd.values())
    assert r["q4m2"] == q4m2
    assert sum(ec.values()) == m  # CC labeling: every edge intra


def test_nb_margin_calibration_partitions_and_totals(spark):
    """Decile partition invariants + total accuracy must equal the
    diagonal mass of the confusion row (same model, same argmax)."""
    from burst_db_spark.queries.round15 import t_nb_domain_confusion
    from burst_db_spark.queries.round16 import t_nb_margin_calibration

    rows = sorted(
        t_nb_margin_calibration(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    n = sum(r["n_docs"] for r in rows)
    # exact-rank decile split: sizes differ by at most 1
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # margins are non-decreasing across deciles
    for a, b in zip(rows, rows[1:]):
        assert a["max_margin_fx"] <= b["min_margin_fx"]
        assert a["min_margin_fx"] >= 0
    conf = t_nb_domain_confusion(spark, SF_DIR).collect()
    diag = sum(r["n"] for r in conf if r["true_source"] == r["pred_source"])
    assert sum(r["n_correct"] for r in rows) == diag
    assert sum(r["n"] for r in conf) == n


def test_label_propagation_matches_python(spark):
    """Exact python replay of the frozen-frontier majority propagation
    over the same integer edge set, plus the unroll margin."""
    from burst_db_spark.operators.similarity import int_cos_edges
    from burst_db_spark.queries.round16 import (
        _LP_ROUNDS,
        _LP_SEED_MOD,
        g8_label_propagation,
    )

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "label")
    truth = {r["vec_id"]: int(r["label"]) for r in emb.collect()}
    pairs = [
        (r["ia"], r["ib"])
        for r in int_cos_edges(
            load(spark, SF_DIR, "embeddings"), num=3, den=10
        ).collect()
    ]
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {
        v: (t, 0) for v, t in truth.items() if v % _LP_SEED_MOD == 0
    }
    for r in range(1, _LP_ROUNDS + 1):
        new = {}
        for v in truth:
            if v in lab:
                continue
            votes: Counter = Counter(
                lab[n][0] for n in nbrs.get(v, []) if n in lab
            )
            if votes:
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = (best[0], r)
        lab.update(new)
    want = {
        v: (l, rr, truth[v]) for v, (l, rr) in lab.items() if rr > 0
    }
    got = {
        r["vec_id"]: (r["pred_label"], r["assigned_round"], r["true_label"])
        for r in g8_label_propagation(spark, SF_DIR).collect()
    }
    assert got == want
    max_round = max((rr for _, rr, _ in want.values()), default=0)
    assert max_round <= _LP_ROUNDS - 2, max_round  # unroll margin
