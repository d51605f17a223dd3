"""Two-table edit-similarity join (record linkage / fuzzy entity
resolution): every (left, right) key pair with Levenshtein distance
≤ ``max_dist``.

The reference has no similarity join; this belongs to the
training-data-pipeline family (linking near-identical titles / names /
URLs across two corpora before cross-corpus dedup or decontamination).
The within-ONE-vocabulary fuzzy machinery already exists
(``pipelines/query.py`` length-band sweep, ``pipelines/fuzzy.py``
SymSpell deletion index); this operator is the TWO-TABLE shape, where
neither side fits on the driver and candidates must come from a
distributed blocking join rather than a broadcast vocabulary sweep.

Shape — q-gram prefix-filter blocking (Gravano et al. 2001 VLDB
"Approximate string joins in a database"; Xiao et al. 2008 Ed-Join):

1. **Gram emission** (``map_batches`` per side, fully vectorized):
   each key of codepoint length L yields L−q+1 overlapping q-grams,
   packed into one int64 each (q·21-bit codepoints for q ≤ 3, a
   splitmix-mixed fold otherwise — hash collisions only MERGE gram
   identities, which can only ADD candidates, never lose a pair).
   Under a fixed total order on gram keys, two keys with
   ed ≤ d share ≥ t = max(L_a, L_b) − q + 1 − q·d multiset grams (each
   edit destroys at most q grams), so the first
   ``|G| − t + 1 ≤ q·d + 1`` entries of each key's gram multiset must
   intersect (the classic prefix filter) — only those ≤ q·d+1 grams
   are emitted, capping shuffle volume per key independent of key
   length. The bound is vacuous when max(L_a, L_b) < q·(d+1); every
   key SHORTER than that additionally emits one shared sentinel gram,
   so short×short pairs meet in the sentinel bucket (a short×long
   pair with ed ≤ d cannot exist: the length gap alone exceeds d only
   when... it is covered because the LONG side then satisfies
   L ≥ q·(d+1) and contributes its own prefix grams, and t ≥ 1 holds
   for the pair — see the inline proof note).
2. **Candidate generation** (one coarse gram-hash exchange): within
   each gram bucket, left×right cross pairs, pre-pruned by the length
   band |L_a − L_b| ≤ d, expanded with the vectorized repeat/offset
   idiom (no per-gram Python loop).
3. **Verify** (one coarse pair-hash exchange): candidate pairs dedup
   (a pair can meet under several grams) and each DISTINCT pair runs
   the exact banded Levenshtein DP (``pipelines.query._lev_within``,
   O(d·min(L)) per pair) exactly once.

Both exchanges are coarse ``groupby("part").map_groups`` segment scans
(the repo's shuffle idiom); nothing vocabulary- or corpus-sized ever
lands on the driver. Keys are carried through the shuffles by value —
the operator's contract is SHORT join keys (names, titles, terms,
URLs); joining on long documents should join on ids and attach text
with the ``_attach_blobs`` union-shuffle pattern instead.

Proof note for mixed short/long pairs: if L_b < q·(d+1) ≤ L_a then
t = L_a − q + 1 − q·d ≥ 1 and the multiset-overlap prefix argument
applies unchanged — key b emits ALL its grams (it has
L_b − q + 1 < q·d + 1 of them, fewer than the prefix budget), key a
emits its q·d+1 prefix, and the two prefixes must share a gram; the
sentinel is needed only when BOTH sides are short (both gram lists can
be empty when L < q).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .partitioning import auto_num_parts

logger = logging.getLogger(__name__)

# sentinel gram key for the short-key bucket (any fixed value outside
# the 63-bit packed-codepoint range; collisions with a real gram would
# only add candidates)
_SENTINEL = np.int64(-0x5ED0_15ED_0B0C_4E7)

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer — the repo's standard integer mixer."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _codepoints(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint32 codepoint stream, per-row codepoint lengths) for an
    Arrow string array. One ``join`` + one utf-32 encode per batch —
    O(total chars) with two Python ops per row, not per char."""
    pylist = arr.to_pylist()
    joined = "".join(s if s is not None else "" for s in pylist)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.array([0 if s is None else len(s) for s in pylist],
                    dtype=np.int64)
    return cp, lens


def _gram_keys(cp: np.ndarray, lens: np.ndarray, q: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """(row index, mixed int64 gram key) for every overlapping q-gram of
    every row, vectorized over the flat codepoint stream. For q ≤ 3 the
    pack is injective (codepoints < 2^21); larger q uses a splitmix
    fold whose collisions are candidate-safe (see module docstring)."""
    n_grams = np.maximum(lens - q + 1, 0)
    total = int(n_grams.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    starts = np.cumsum(lens) - lens
    offs = np.cumsum(n_grams) - n_grams
    within = np.arange(total, dtype=np.int64) - np.repeat(offs, n_grams)
    gpos = np.repeat(starts, n_grams) + within
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), n_grams)
    if q <= 3:
        key = np.zeros(total, dtype=np.uint64)
        for i in range(q):
            key |= cp[gpos + i].astype(np.uint64) << np.uint64(21 * i)
    else:
        key = np.zeros(total, dtype=np.uint64)
        for i in range(q):
            key = _splitmix64(key ^ (cp[gpos + i].astype(np.uint64)
                                     * _GOLDEN))
    # mix so the prefix order is effectively random (selectivity) and
    # the partition key's low bits are uniform
    return rows, _splitmix64(key).view(np.int64)


def _prefix_emit(arr: pa.Array, q: int, max_dist: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(row index, gram key) restricted to each row's q·d+1-entry gram
    MULTISET prefix (duplicates occupy slots; distinct values emitted),
    plus the sentinel emission for rows shorter than q·(d+1)."""
    cp, lens = _codepoints(arr)
    rows, keys = _gram_keys(cp, lens, q)
    budget = q * max_dist + 1
    if len(rows):
        order = np.lexsort((keys, rows))
        rows, keys = rows[order], keys[order]
        seg_starts = np.concatenate(
            [[0], 1 + np.flatnonzero(rows[1:] != rows[:-1])])
        counts = np.diff(np.concatenate([seg_starts, [len(rows)]]))
        rank = (np.arange(len(rows), dtype=np.int64)
                - np.repeat(seg_starts, counts))
        in_prefix = rank < budget
        first = np.ones(len(rows), dtype=bool)
        first[1:] = (keys[1:] != keys[:-1]) | (rows[1:] != rows[:-1])
        keep = in_prefix & first
        rows, keys = rows[keep], keys[keep]
    short = np.flatnonzero(lens < q * (max_dist + 1)).astype(np.int64)
    if len(short):
        rows = np.concatenate([rows, short])
        keys = np.concatenate(
            [keys, np.full(len(short), _SENTINEL, dtype=np.int64)])
    return rows, keys


def _emit_side(ds: Dataset, key_col: str, side: int, q: int,
               max_dist: int) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        arr = pc.cast(batch[key_col], pa.string()).combine_chunks()
        rows, keys = _prefix_emit(arr, q, max_dist)
        lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
        taken = arr.take(pa.array(rows, type=pa.int64()))
        return pa.table({
            "gkey": pa.array(keys, type=pa.int64()),
            "side": pa.array(np.full(len(rows), side, dtype=np.int8)),
            "key": taken,
            "klen": pa.array(lens[rows].astype(np.int32)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _cross_pairs(nl: np.ndarray, nr: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-segment left×right index expansion: returns
    (segment id, left ordinal, right ordinal) for every cross pair of
    segments sized (nl[s], nr[s])."""
    tot = nl * nr
    n = int(tot.sum())
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    offs = np.cumsum(tot) - tot
    seg = np.repeat(np.arange(len(tot), dtype=np.int64), tot)
    within = np.arange(n, dtype=np.int64) - np.repeat(offs, tot)
    nr_rep = np.repeat(nr, tot)
    return seg, within // nr_rep, within % nr_rep


def edit_similarity_join(left: Dataset, right: Dataset, *,
                         key_col: str = "key", max_dist: int = 1,
                         q: int = 2, num_parts: int | None = None,
                         max_bucket_pairs: int | None = None) -> Dataset:
    """All (left_key, right_key, dist) with Levenshtein ≤ ``max_dist``
    between the ``key_col`` strings of two Datasets, sorted by
    (left_key, right_key). Inputs are key tables (duplicates tolerated;
    output pairs are DISTINCT key pairs).

    ``max_bucket_pairs`` bounds the per-gram-bucket cross product for
    skewed data (a gram shared by everything); buckets over the cap are
    DROPPED with a logged warning — an under-report-only contract, the
    ``max_shingle_df`` precedent. Default None = complete join.
    """
    from ..pipelines.query import _lev_within

    if num_parts is None:
        num_parts = auto_num_parts(left.count() + right.count())
    d = int(max_dist)

    emitted = _emit_side(left, key_col, 0, q, d).union(
        _emit_side(right, key_col, 1, q, d))

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(pc.bit_wise_and(batch["gkey"], num_parts - 1),
                       pa.int32())
        return batch.append_column("part", part)

    def gen_pairs(group: pa.Table) -> pa.Table:
        gkey = group["gkey"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        klen = group["klen"].to_numpy(zero_copy_only=False)
        # segment-contiguous by gram, lefts before rights
        order = np.lexsort((side, gkey))
        gkey, side, klen = gkey[order], side[order], klen[order]
        keys = group["key"].combine_chunks().take(
            pa.array(order, type=pa.int64()))
        seg_starts = np.concatenate(
            [[0], 1 + np.flatnonzero(gkey[1:] != gkey[:-1])])
        seg_counts = np.diff(np.concatenate([seg_starts, [len(gkey)]]))
        # lefts are sorted first within each segment
        csum = np.concatenate([[0], np.cumsum(side == 0)])
        nl = (csum[seg_starts + seg_counts] - csum[seg_starts])
        nr = seg_counts - nl
        if max_bucket_pairs is not None:
            over = nl * nr > max_bucket_pairs
            if over.any():
                logger.warning(
                    "edit_similarity_join: dropping %d gram buckets over "
                    "max_bucket_pairs=%d (under-report contract)",
                    int(over.sum()), max_bucket_pairs)
                nl, nr = nl.copy(), nr.copy()
                nl[over] = 0
                nr[over] = 0
        seg, li, ri = _cross_pairs(nl, nr)
        lrow = seg_starts[seg] + li
        rrow = seg_starts[seg] + nl[seg] + ri
        band = np.abs(klen[lrow] - klen[rrow]) <= d
        lrow, rrow = lrow[band], rrow[band]
        return pa.table({
            "left_key": keys.take(pa.array(lrow, type=pa.int64())),
            "right_key": keys.take(pa.array(rrow, type=pa.int64())),
        })

    cand = (emitted.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(gen_pairs, batch_format="pyarrow"))

    def pair_part(batch: pa.Table) -> pa.Table:
        from ..text.hashvec import md5_lower64_strings
        lh = md5_lower64_strings(batch["left_key"].combine_chunks())
        rh = md5_lower64_strings(batch["right_key"].combine_chunks())
        part = ((lh ^ _splitmix64(rh)) & np.uint64(num_parts - 1)) \
            .astype(np.int32)
        return batch.append_column("part", pa.array(part))

    def verify(group: pa.Table) -> pa.Table:
        lk = group["left_key"].to_pylist()
        rk = group["right_key"].to_pylist()
        out_l, out_r, out_d = [], [], []
        seen: set[tuple[str, str]] = set()
        for a, b in zip(lk, rk):
            pair = (a, b)
            if pair in seen:
                continue
            seen.add(pair)
            dist = _lev_within(a, b, d)
            if dist is not None:
                out_l.append(a)
                out_r.append(b)
                out_d.append(dist)
        return pa.table({
            "left_key": pa.array(out_l, type=pa.string()),
            "right_key": pa.array(out_r, type=pa.string()),
            "dist": pa.array(out_d, type=pa.int64()),
        })

    out = (cand.map_batches(pair_part, batch_format="pyarrow")
           .groupby("part")
           .map_groups(verify, batch_format="pyarrow"))
    return out.sort(["left_key", "right_key"])


def distinct_token_bigrams(ds: Dataset, num_parts: int = 32) -> Dataset:
    """Distinct space-joined adjacent-token bigram strings of a documents
    Dataset (whitespace tokenization, reference breaker semantics) — the
    gate-support key table for :func:`edit_similarity_join`. One corpus
    pass of per-batch-unique bigrams, then a coarse hash-partition
    distinct scan. Column: ``key``."""
    from .textstats import _tokens
    from ..text.hashvec import md5_lower64_strings

    def explode(batch: pa.Table) -> pa.Table:
        n_tok, flat, parents = _tokens(batch)
        par = parents.to_numpy(zero_copy_only=False)
        n = len(par)
        if n == 0:
            adj = np.empty(0, dtype=np.int64)
        else:
            idx = np.arange(n - 1, dtype=np.int64)
            adj = idx[par[1:] == par[:-1]]
        a = flat.take(pa.array(adj, type=pa.int64()))
        b = flat.take(pa.array(adj + 1, type=pa.int64()))
        bg = pc.unique(pc.binary_join_element_wise(a, b, " "))
        part = (md5_lower64_strings(bg)
                & np.uint64(num_parts - 1)).astype(np.int32)
        return pa.table({"key": bg, "part": pa.array(part)})

    def distinct(group: pa.Table) -> pa.Table:
        return pa.table({"key": pc.unique(group["key"].combine_chunks())})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("part")
            .map_groups(distinct, batch_format="pyarrow"))
