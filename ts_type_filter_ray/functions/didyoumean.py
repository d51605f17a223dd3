"""Noisy-channel phrase correction — "did you mean" over the corpus.

The classic two-model decomposition (Kernighan/Church/Gale 1990; Brill &
Moore 2000): a corrected phrase w1..wk for a typed query q1..qk maximizes

    score(w) = log P_LM(w) + log P_channel(q | w)

Here the source model is the add-one bigram LM the CCNet family already
uses (first token against the unigram distribution, each next token
against its history's bigram distribution) and the channel model charges
``-dist(q_i, w_i) * ln(pen)`` per token (``pen`` an integer >= 2) — i.e.
each edit divides the likelihood by *pen*. Candidates per position are
every vocabulary term within Levenshtein *max_dist* of the typed token,
plus the typed token itself (so an OOV token can survive verbatim,
smoothed). The best path comes out of a Viterbi pass over the lattice,
tie-broken by the lexicographically smallest corrected phrase.

Value-exactness: every log argument is an INTEGER (counts + 1, history
+ V, N + V, the integer penalty base), per-path accumulation is a strict
position-ascending left fold, and the SQL oracle ENUMERATES the lattice
(cross join of per-position candidate sets — bounded by construction)
scoring each path with identical float64 expression shapes, then takes
the same (score desc, path asc) argmax. A Viterbi decode checked by an
exhaustive oracle — the exactness-configuration trick, decoder edition.

Scale shape: queries are tiny (driver contract, same as every query
surface); the corpus-scale work is (1) the candidate sweep — one
vectorized length-band + banded-DP pass over the DISTINCT-term table,
never the corpus (the SymSpell deletion index in ``pipelines/fuzzy.py``
is the documented extreme-vocabulary upgrade path), and (2) ONE corpus
pass for the lattice's bigram/history counts: the candidate set is
broadcast, per-batch partials count only candidate-hitting bigrams
(``pc.index_in`` maps tokens to dense candidate ids, so the exchange
ships packed int keys bounded by |candidates|^2), and a tiny groupby
reduces. Driver state is O(candidates^2), never vocabulary-sized.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from .textstats import _tokens, term_df_tf

__all__ = ["did_you_mean"]


def _candidate_sweep(terms: Dataset, qtokens: list[str],
                     max_dist: int) -> dict[str, list[tuple[str, int]]]:
    """{query token -> [(term, dist), ...]} over the distinct-term
    table: vectorized length-band prune, banded-DP verify on survivors
    (the ``match_fuzzy`` vocabulary-sweep shape). Adds the typed token
    itself at dist 0 when absent from the vocabulary."""
    from ..pipelines.query import _lev_within

    qtokens = sorted(set(qtokens))

    def sweep(batch: pa.Table) -> pa.Table:
        t = batch["term"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        lens = pc.utf8_length(t).to_numpy(zero_copy_only=False)
        toks, cands, dists = [], [], []
        for q in qtokens:
            band = np.flatnonzero(np.abs(lens - len(q)) <= max_dist)
            for i in band.tolist():
                term = t[i].as_py()
                d = _lev_within(q, term, max_dist)
                if d is not None:
                    toks.append(q)
                    cands.append(term)
                    dists.append(d)
        return pa.table({
            "q": pa.array(toks, type=pa.string()),
            "term": pa.array(cands, type=pa.string()),
            "dist": pa.array(dists, type=pa.int64()),
        })

    rows = terms.map_batches(sweep, batch_format="pyarrow").take_all()
    out: dict[str, list[tuple[str, int]]] = {q: [] for q in qtokens}
    for r in rows:
        out[r["q"]].append((r["term"], r["dist"]))
    for q in qtokens:
        if not any(t == q for t, _ in out[q]):
            out[q].append((q, 0))
        out[q].sort()
    return out


def _lattice_counts(ds: Dataset, cand_terms: list[str]
                    ) -> tuple[dict[tuple[str, str], int], dict[str, int]]:
    """(bigram counts, history counts) restricted to candidate tokens,
    from ONE corpus pass: candidate strings broadcast, per-batch
    partials over packed dense-int keys, tiny Sum groupby; driver
    assembly is bounded by |candidates|^2 + |candidates|."""
    cand_arr = pa.array(cand_terms, type=pa.string())
    n_c = len(cand_terms)

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        _, flat, parents = _tokens(batch)
        if len(flat) < 2:
            return empty
        flat = pc.utf8_lower(flat)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        par = parents.to_numpy(zero_copy_only=False)
        idx = np.nonzero(par[1:] == par[:-1])[0]
        if idx.size == 0:
            return empty
        ids = pc.index_in(flat, value_set=cand_arr)
        ids = ids.to_numpy(zero_copy_only=False).astype(np.float64)
        # nulls (non-candidates) -> -1
        ids = np.where(np.isnan(ids), -1, ids).astype(np.int64)
        a = ids[idx]
        b = ids[idx + 1]
        keys = []
        # history occurrences: candidate as bigram-left, any right
        ha = a[a >= 0]
        if ha.size:
            keys.append(n_c * n_c + ha)
        # candidate-pair occurrences
        both = (a >= 0) & (b >= 0)
        if both.any():
            keys.append(a[both] * n_c + b[both])
        if not keys:
            return empty
        k = np.concatenate(keys)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    rows = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .take_all())                # <= n_c^2 + n_c rows
    c12: dict[tuple[str, str], int] = {}
    c1h: dict[str, int] = {}
    for r in rows:
        k, cnt = int(r["k"]), int(r["cnt"])
        if k >= n_c * n_c:
            c1h[cand_terms[k - n_c * n_c]] = cnt
        else:
            c12[(cand_terms[k // n_c], cand_terms[k % n_c])] = cnt
    return c12, c1h


def did_you_mean(ds: Dataset, queries: list[str], max_dist: int = 1,
                 pen: int = 16) -> pa.Table:
    """(query_idx, pos, term, score) — the corrected phrase for each
    query (one row per 1-based token position; ``score`` is the winning
    path's total, repeated on each of its rows) under the module-
    docstring noisy-channel model. Queries with no tokens emit no rows.
    """
    if not isinstance(pen, int) or pen < 2:
        raise ValueError("pen must be an integer >= 2 — integer log "
                         "arguments are the value-exact contract")
    qtoks = [q.strip().lower().split() for q in queries]
    all_tokens = sorted({t for ws in qtoks for t in ws})
    if not all_tokens:
        return pa.table({"query_idx": pa.array([], type=pa.int64()),
                         "pos": pa.array([], type=pa.int64()),
                         "term": pa.array([], type=pa.string()),
                         "score": pa.array([], type=pa.float64())})

    terms = term_df_tf(ds).materialize()   # vocabulary-bounded
    n_total = int(terms.aggregate(Sum("tf", alias_name="n"))["n"] or 0)
    v_total = terms.count()
    if v_total == 0:
        raise ValueError("corpus has no tokens")
    tf_rows = None   # lazy: only candidate terms' tf are needed

    cands = _candidate_sweep(terms, all_tokens, max_dist)
    cand_union = sorted({t for lst in cands.values() for t, _ in lst})

    # unigram counts for candidates only (one pruned pass over the
    # vocabulary-bounded term table)
    cand_arr = pa.array(cand_union, type=pa.string())

    def tf_filter(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["term"], value_set=cand_arr)
        return batch.filter(m).select(["term", "tf"])

    tf_rows = terms.map_batches(tf_filter,
                                batch_format="pyarrow").take_all()
    c1u = {r["term"]: int(r["tf"]) for r in tf_rows}

    c12, c1h = _lattice_counts(ds, cand_union)

    log_pen = math.log(pen)
    log_nv = math.log(n_total + v_total)

    out_qi, out_pos, out_term, out_score = [], [], [], []
    for qi, ws in enumerate(qtoks):
        if not ws:
            continue
        # Viterbi with (score desc, path asc) tie-break: per state keep
        # the best (score, path) — for equal scores the lex-smaller
        # prefix extends to the lex-smaller full path (common suffix)
        states: dict[str, tuple[float, tuple[str, ...]]] = {}
        for w, d in cands[ws[0]]:
            e = ((math.log(c1u.get(w, 0) + 1) - log_nv)
                 - float(d) * log_pen)
            cur = (e, (w,))
            old = states.get(w)
            if old is None or cur[0] > old[0] or \
                    (cur[0] == old[0] and cur[1] < old[1]):
                states[w] = cur
        for i in range(1, len(ws)):
            nxt: dict[str, tuple[float, tuple[str, ...]]] = {}
            for w, d in cands[ws[i]]:
                chan = float(d) * log_pen
                best = None
                for a, (s, path) in states.items():
                    e = (math.log(c12.get((a, w), 0) + 1)
                         - math.log(c1h.get(a, 0) + v_total)) - chan
                    cand = (s + e, path + (w,))
                    if best is None or cand[0] > best[0] or \
                            (cand[0] == best[0] and cand[1] < best[1]):
                        best = cand
                nxt[w] = best
            states = nxt
        win = max(states.values(), key=lambda sp: (sp[0], _NegPath(sp[1])))
        score, path = win
        for pos, w in enumerate(path, start=1):
            out_qi.append(qi)
            out_pos.append(pos)
            out_term.append(w)
            out_score.append(score)
    return pa.table({
        "query_idx": pa.array(out_qi, type=pa.int64()),
        "pos": pa.array(out_pos, type=pa.int64()),
        "term": pa.array(out_term, type=pa.string()),
        "score": pa.array(out_score, type=pa.float64()),
    })


class _NegPath:
    """max() key wrapper: prefer the lexicographically SMALLEST path."""

    __slots__ = ("p",)

    def __init__(self, p):
        self.p = p

    def __lt__(self, other):
        return self.p > other.p

    def __eq__(self, other):
        return self.p == other.p
