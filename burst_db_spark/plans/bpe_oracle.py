"""DuckDB oracle SQL for BPE training/encoding (VERDICT r12 item #5).

Promotes ``t_bpe_merges`` / ``t_bpe_encode`` from rows-only to fully
hash-checked, the ep1_oracle playbook: the trainer is driver-PACED
(one bounded collect per round) but each ROUND is pure relational
algebra, so a fixed round count unrolls into CTEs.

The greedy left-to-right non-overlapping merge — the one step with no
obvious SQL form — becomes a plain string ``replace`` via a SENTINEL
encoding: a word's symbol state is stored as ``\\x1f s1 \\x1f\\x1f s2
\\x1f ...`` (every symbol wrapped in chr(31)). chr(31)/chr(30) are not
regex ``\\s``, so the invariant "no sentinel inside a token" is
ENFORCED, not assumed: the ``wt`` CTE filters words containing either
control char, mirrored by the identical filter in
``operators.bpe.word_types`` (r13 ADVICE).

The batched acceptance's ``fin{r}`` slot assignment orders by
``(c DESC, l, r)`` — the acceptance-walk visit order — rather than
relying on ``unnest`` preserving list order under an ORDER-BY-less
``row_number()`` (r13 ADVICE; accepted merges are symbol-disjoint so
slot order does not change the final state, but the slot ids in any
debugging output are now deterministic). Merging pair (l, r) is then
``replace(state, chr(31)||l||chr(31)||chr(31)||r||chr(31),
chr(31)||l||r||chr(31))``: the sentinels force symbol-boundary
alignment (no cross-symbol false matches), and SQL replace's greedy
left-to-right non-overlapping scan IS the BPE merge semantics
(operators/bpe._merge_pair; "aaa" + (a,a) -> ["aa","a"]).

The batched trainer's symbol-disjoint acceptance
(operators/bpe._accept_disjoint) is a sequential scan over the top-16
candidates with a growing used-set — replayed exactly by a recursive
CTE that walks the candidate rows in (count DESC, l, r) order carrying
``used`` and ``accepted`` as list state.

Every multiply-referenced CTE is ``MATERIALIZED``: DuckDB otherwise
inlines CTEs, and a chain where round r references round r-1 twice
re-expands the scan 2^rounds times.
"""

from __future__ import annotations

#: DuckDB expression for the shared whitespace tokenizer
#: (queries/textops._TOKS twin, over the ``documents`` view).
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_SEP = "chr(31)"
#: pattern that can never occur in a state string — the no-op replace
#: target when a batch slot is empty.
_NOPAT = "chr(30)"

_WT = f"""
    wt AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest({_TOKS}) AS word FROM documents
        ) WHERE len(word) > 0
          AND NOT contains(word, {_SEP})
          AND NOT contains(word, {_NOPAT})
        GROUP BY word
    ),
    st0 AS (
        SELECT word, n,
               regexp_replace(word, '(.)', {_SEP}||'\\1'||{_SEP}, 'g')
                   AS state
        FROM wt
    )"""


def _pairs_cte(r: int, src: str) -> str:
    """sy{r} (split states back to symbol lists) — single consumer of
    the previous round's state."""
    return f"""
    sy{r} AS MATERIALIZED (
        SELECT word, n,
               string_split(trim(state, {_SEP}), {_SEP}||{_SEP}) AS sym
        FROM {src})"""


def _counts_from(r: int) -> str:
    return f"""
          SELECT s['l'] AS l, s['r'] AS r, CAST(sum(n) AS BIGINT) AS c
          FROM (SELECT unnest(list_transform(range(1, len(sym)),
                       i -> {{'l': sym[i], 'r': sym[i+1]}})) AS s, n
                FROM sy{r})
          GROUP BY 1, 2"""


def bpe_merges_oracle_sql(n_merges: int = 8) -> str:
    """Sequential (batch_size=1) trainer: per round, exact pair counts,
    argmax with the (count DESC, l, r) total order, sentinel-replace
    rewrite. Output matches t_bpe_merges: (rank, left, right,
    pair_count)."""
    ctes = [_WT]
    for r in range(1, n_merges + 1):
        prev = f"st{r - 1}"
        ctes.append(_pairs_cte(r, prev))
        ctes.append(f"""
    t{r} AS MATERIALIZED (
        SELECT l, r, c FROM ({_counts_from(r)})
        ORDER BY c DESC, l, r LIMIT 1),
    st{r} AS MATERIALIZED (
        SELECT word, n,
               replace({_SEP}||array_to_string(sym, {_SEP}||{_SEP})||{_SEP},
                       {_SEP}||t.l||{_SEP}||{_SEP}||t.r||{_SEP},
                       {_SEP}||t.l||t.r||{_SEP}) AS state
        FROM sy{r}, t{r} t)""")
    finals = "\n    UNION ALL ".join(
        f'SELECT CAST({r - 1} AS INTEGER) AS rank, l AS "left", '
        f'r AS "right", c AS pair_count FROM t{r}'
        for r in range(1, n_merges + 1)
    )
    return f"WITH{','.join(ctes)}\n    {finals}\n    ORDER BY rank"


def _batched_round(r: int, k: int, lim: int) -> str:
    ok = (
        f"(len(w.acc) < {k} AND NOT list_contains(w.used, t.l) "
        f"AND NOT list_contains(w.used, t.r) "
        f"AND NOT list_contains(w.used, t.l || t.r))"
    )
    expr = "state"
    for j in range(k):
        p = (
            f"COALESCE((SELECT {_SEP}||l||{_SEP}||{_SEP}||r||{_SEP} "
            f"FROM fin{r} WHERE slot={j}), {_NOPAT})"
        )
        q = (
            f"COALESCE((SELECT {_SEP}||l||r||{_SEP} "
            f"FROM fin{r} WHERE slot={j}), {_NOPAT})"
        )
        expr = f"replace({expr}, {p}, {q})"
    return f"""
    cand{r} AS MATERIALIZED (
        SELECT l, r, c,
               CAST(row_number() OVER (ORDER BY c DESC, l, r) AS INTEGER)
                   AS rn
        FROM ({_counts_from(r)})
        ORDER BY c DESC, l, r LIMIT {lim}),
    walk{r}(i, used, acc) AS (
        SELECT 0, CAST([] AS VARCHAR[]),
               CAST([] AS STRUCT(l VARCHAR, r VARCHAR, c BIGINT)[])
        UNION ALL
        SELECT w.i + 1,
               CASE WHEN {ok} THEN w.used || [t.l, t.r, t.l || t.r]
                    ELSE w.used END,
               CASE WHEN {ok}
                    THEN list_append(w.acc, {{'l': t.l, 'r': t.r, 'c': t.c}})
                    ELSE w.acc END
        FROM walk{r} w JOIN cand{r} t ON t.rn = w.i + 1),
    fin{r} AS MATERIALIZED (
        SELECT u['l'] AS l, u['r'] AS r, u['c'] AS c,
               CAST(row_number() OVER (ORDER BY u['c'] DESC, u['l'], u['r'])
                    - 1 AS INTEGER) AS slot
        FROM (SELECT unnest(acc) AS u
              FROM walk{r} WHERE i = (SELECT count(*) FROM cand{r}))),
    st{r} AS MATERIALIZED (
        SELECT word, n, {expr} AS state
        FROM (SELECT word, n,
                     {_SEP}||array_to_string(sym, {_SEP}||{_SEP})||{_SEP}
                         AS state
              FROM sy{r}))"""


def bpe_encode_oracle_sql(n_merges: int = 12, batch_size: int = 4) -> str:
    """Batched trainer (recursive-CTE disjoint acceptance, exactly
    operators/bpe._accept_disjoint) + encoding. The final training
    state IS the encoded word-type table — the trainer applies each
    accepted merge with the same greedy scan the encoder uses. Output
    matches t_bpe_encode: (word, word_count, n_pieces, pieces_str)."""
    assert n_merges % batch_size == 0
    rounds = n_merges // batch_size
    lim = max(4 * batch_size, 8)
    ctes = [_WT]
    for r in range(1, rounds + 1):
        ctes.append(_pairs_cte(r, f"st{r - 1}"))
        ctes.append(_batched_round(r, batch_size, lim))
    return f"""WITH RECURSIVE{','.join(ctes)}
    SELECT word, CAST(n AS BIGINT) AS word_count,
           CAST(len(pieces) AS INTEGER) AS n_pieces,
           array_to_string(pieces, ' ') AS pieces_str
    FROM (SELECT word, n,
                 string_split(trim(state, {_SEP}), {_SEP}||{_SEP}) AS pieces
          FROM st{rounds})"""


def bpe_fertility_oracle_sql(n_merges: int = 12, batch_size: int = 4) -> str:
    """Trainer + encode + per-LANGUAGE fertility rollup: instance-
    weighted pieces-per-word under the corpus-trained merges — the
    cross-lingual tokenizer-equity audit (a tokenizer with high
    fertility on a language inflates its training cost and truncates
    its effective context). All-integer hash surface: word/piece counts
    are bigints and the fertility ratio is the exact integer
    (pieces·2^20) div words — no rounding route (r13 post-mortem)."""
    assert n_merges % batch_size == 0
    rounds = n_merges // batch_size
    lim = max(4 * batch_size, 8)
    ctes = [_WT]
    for r in range(1, rounds + 1):
        ctes.append(_pairs_cte(r, f"st{r - 1}"))
        ctes.append(_batched_round(r, batch_size, lim))
    return f"""WITH RECURSIVE{','.join(ctes)},
    pieces AS (
        SELECT word,
               CAST(len(string_split(trim(state, {_SEP}),
                                     {_SEP}||{_SEP})) AS BIGINT) AS np
        FROM st{rounds}
    ),
    lw AS (
        SELECT lang, word, CAST(count(*) AS BIGINT) AS nw FROM (
            SELECT lang, unnest({_TOKS}) AS word FROM documents
        ) WHERE len(word) > 0
          AND NOT contains(word, {_SEP})
          AND NOT contains(word, {_NOPAT})
        GROUP BY lang, word
    )
    SELECT lang,
           CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(nw * np) AS BIGINT) AS n_pieces,
           CAST((sum(nw * np) * 1048576) // sum(nw) AS BIGINT)
               AS fertility_fx
    FROM lw JOIN pieces USING (word)
    GROUP BY lang
    """
