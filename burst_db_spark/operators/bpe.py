"""Distributed BPE merge training (Sennrich et al. 2016), bounded
iterations.

Classic BPE trains on the WORD-TYPE table (distinct words + corpus
counts), not the raw token stream — word types are tiny relative to a
100 TB corpus (Heaps' law), so after one corpus-wide groupBy the
iterative part runs on a frame that fits comfortably per-executor while
still being computed distributively.

Each merge iteration is:
  1. explode adjacent symbol pairs from every word's current symbol
     array, weighted by word count → groupBy pair, sum;
  2. argmax pair (count DESC, then lexicographic (left, right) — a total
     order, so the winner is deterministic);
  3. rewrite every word's symbol array with the pair greedily merged
     left-to-right — a pure higher-order-function fold (no Python row
     UDF): scan symbols, and when prev == left and cur == right collapse
     them into the concatenated symbol.

Driver involvement is ONE row per iteration (the winning pair) — the
same bounded-collect pattern as the k-means codebook trainer. The number
of iterations is the caller's merge budget, exactly like real tokenizer
training (30k merges = 30k bounded rounds; each round is a shuffle on
pair keys with map-side partial aggregation).

Not SQL-expressible as one query (state threads through iterations), so
the registered query is rows-only; correctness is pinned by a pytest
golden against an independent pure-Python BPE on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from burst_db_spark.operators.text import tokens


def word_types(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word-type table — the BPE training input."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (left, right) inside
    a symbol array, as a fold: append, or collapse the tail element when
    it equals ``left`` and the incoming symbol is ``right``.

    The collapsed symbol ``left+right`` differs from ``left`` (strictly
    longer), so a just-merged tail can't immediately re-merge — which is
    exactly BPE's non-overlapping scan ("aaa" + (a,a) → ["aa", "a"]).
    """
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` merges; returns [(rank, left, right, count)].

    The working frame is (word-type symbols, count); each iteration
    re-derives pair counts relationally and collects exactly one row.
    """
    words = word_types(df, text_col)
    state = words.select(
        F.split(F.col("word"), "").alias("sym"), F.col("n")
    ).persist()
    state.count()  # materialize once; iterations rewrite from here

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = state.select(
            F.explode(
                F.when(
                    F.size("sym") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("sym") - 2),
                        lambda i: F.struct(
                            F.get("sym", i).alias("l"),
                            F.get("sym", i + 1).alias("r"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
            F.col("n"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        left, right, count = row["l"], row["r"], int(row["c"])
        merges.append((rank, left, right, count))
        new_state = state.select(
            _merge_pair(F.col("sym"), left, right).alias("sym"), F.col("n")
        ).persist()
        new_state.count()
        state.unpersist()
        state = new_state
    state.unpersist()
    return merges


def bpe_reference(word_counts: dict[str, int], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Independent single-process BPE for the golden test (no Spark)."""
    state = {tuple(w): n for w, n in word_counts.items()}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in state.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, c))
        new_state: dict[tuple[str, ...], int] = {}
        for sym, n in state.items():
            out: list[str] = []
            for s in sym:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + n
        state = new_state
    return merges
