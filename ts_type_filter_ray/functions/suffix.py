"""Distributed suffix array over the corpus character stream — the
faithful ExactSubstr machinery (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", §4: suffix-array
duplicate-substring detection), built by prefix doubling
(Manber & Myers 1990) as a sequence of linear Ray Data shuffles.

The corpus string is ``G = concat over doc_id asc of
(lower(trim(text)) + chr(1))`` — every document (blank included)
followed by one separator; ``chr(1)`` sorts below every text character
and never appears inside a document, so an equal pair of
separator-free windows is automatically a pair of *within-document*
windows. Positions are 0-based code points of ``G``.

Prefix doubling, shuffle-native: the state after round *j* is one row
per position ``(pos, r)`` where ``r`` is the **first-ordinal** of the
position's equal-``2^j``-prefix class — the number of positions whose
``2^j``-prefix sorts strictly below (ties share the ordinal). First
ordinals preserve both order and equality, and they make the re-rank
*local*: because ``r`` already counts every row in smaller classes,
the next round's ordinal is

    r' = r + (first-ordinal of r2 within the r-class)

which needs only the rows of ONE class — so each round is exactly two
linear exchanges, with no global sort and no driver state:

1. *shift zip*: attach ``r2 = r[pos + 2^j]`` (−1 past the end — the
   shorter suffix sorts first, which is lexicographic for suffixes) by
   re-keying a copy of the rank table to ``pos − 2^j`` and aligning
   inside contiguous ``pos >> cbits`` ranges (positions are dense, so
   the alignment is one searchsorted);
2. *class re-rank*: group by ``r`` (same class → same partition), sort
   the class by ``r2``, add the within-class subgroup offsets.

Rounds continue until no class holds ≥ 2 rows — i.e. until
``2^j`` exceeds the longest repeated substring, so the round count is
``O(log(max repeat))``, not ``O(log n)``. Skew note: the largest
round-*j* task is the largest equal-``2^j``-prefix class. For natural
text that decays geometrically (round 1 ≈ the most frequent
character's share); a degenerate corpus (one repeated byte) keeps O(n)
classes through ``log(n)`` rounds — the known doubling worst case;
difference-cover (DC3) sampling is the published fix if such corpora
matter.

Value-exactness: ``suffix_ranks`` is gate-checked against a DuckDB
oracle that materializes every suffix of the same ``G`` **truncated to
``max_compare`` code points** and takes ``rank() over (order by
suffix)``; truncation is sound because the engine refuses to answer
(raises) unless doubling converged within ``max_compare`` — i.e. the
longest repeated substring is shorter than the oracle's comparison
window. ``sa_dup_coverage`` is checked against an L-gram
``group by having count(*) >= 2`` + gaps-and-islands SQL oracle — the
fixed-length formulation computed by independent means.

No reference counterpart: retaildevcrews/ts_type_filter has no
suffix-array or dedup machinery; this extends the engine's
training-data family (``ngrams.dup_token_spans`` is the token-level
fixed-k cousin; this module gives variable-length char-level matching
from the same corpus contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .partitioning import auto_num_parts

__all__ = ["suffix_ranks", "sa_dup_coverage"]

_SEP = "\x01"

_CHAR_SCHEMA = {"pos": pa.int64(), "r": pa.int64()}


def _norm_text(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """lower(trim(text)) with the SQL-trim contract (ASCII space only),
    nulls as '' — the corpus-string normalization shared with the
    DuckDB oracle."""
    col = pc.fill_null(col, "")
    col = pc.utf8_trim(col, " ")
    col = pc.utf8_lower(col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def _char_stream(ds: Dataset, part_bits: int = 12
                 ) -> tuple[Dataset, Dataset, int]:
    """(chars, bounds, n): ``chars`` has one row per code point of G —
    (pos, r) with r = the raw code point (an order- and equality-
    preserving labeling; :func:`_ordinalize` turns it into first
    ordinals) — and ``bounds`` one row per document (doc_id, off, len)
    giving its half-open char range [off, off+len) inside G (the
    separator at off+len belongs to no document).

    Offsets come from the packing-style two-pass exclusive scan: one
    length pass, a per-part Sum groupby, an O(parts) driver prefix
    broadcast via ``ray.put`` — document CONTENT never shuffles, and
    because ``part = doc_id >> part_bits`` owns a contiguous doc-id
    range, each part also owns one contiguous char range: its task
    emits (pos, code) rows from a single whole-group encode + arange.
    """
    import ray
    from ray.data.aggregate import Sum

    def lens(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = _norm_text(batch["text"])
        return pa.table({
            "part": pa.array((d >> part_bits).astype(np.int64)),
            "doc_id": pa.array(d, type=pa.int64()),
            "len": pc.cast(pc.utf8_length(t), pa.int64()),
        })

    counts = ds.map_batches(lens, batch_format="pyarrow").materialize()

    def part_partials(batch: pa.Table) -> pa.Table:
        part = batch["part"].to_numpy(zero_copy_only=False)
        ln = batch["len"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(part, return_inverse=True)
        sums = np.bincount(inv, weights=(ln + 1).astype(np.float64))
        return pa.table({
            "part": pa.array(uniq, type=pa.int64()),
            "part_n": pa.array(sums.astype(np.int64)),
        })

    totals = (counts.map_batches(part_partials, batch_format="pyarrow")
              .groupby("part").aggregate(Sum("part_n"))
              .rename_columns(["part", "part_n"]).take_all())
    totals.sort(key=lambda row: row["part"])
    base: dict[int, int] = {}
    off = 0
    for row in totals:
        base[int(row["part"])] = off
        off += int(row["part_n"])
    n = off
    base_ref = ray.put(base)

    def bounds_rows(group: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        ln = group["len"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        d, ln = d[order], ln[order]
        part = int(group["part"][0].as_py())
        offs = bases[part] + np.concatenate(
            ([0], np.cumsum(ln + 1)))[:-1]
        return pa.table({
            "doc_id": pa.array(d, type=pa.int64()),
            "off": pa.array(offs),
            "len": pa.array(ln),
        })

    bounds = counts.groupby("part").map_groups(
        bounds_rows, batch_format="pyarrow")

    # the char emission needs text + the part base: zip the original
    # docs with nothing — each task re-derives its part's doc order and
    # within-part offsets from its own rows (one length pass per group)
    def doc_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array((d >> part_bits).astype(np.int64)),
            "doc_id": pa.array(d, type=pa.int64()),
            "text": pc.cast(_norm_text(batch["text"]), pa.large_string()),
        })

    def emit_chars(group: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        texts = group["text"].combine_chunks().take(pa.array(order))
        part = int(group["part"][0].as_py())
        joined = _SEP.join(texts.to_pylist()) + _SEP
        codes = np.frombuffer(joined.encode("utf-32-le"),
                              dtype="<u4").astype(np.int64)
        pos = bases[part] + np.arange(len(codes), dtype=np.int64)
        return pa.table({"pos": pa.array(pos), "r": pa.array(codes)})

    chars = (ds.map_batches(doc_rows, batch_format="pyarrow")
             .groupby("part").map_groups(emit_chars,
                                         batch_format="pyarrow"))
    return chars, bounds, n


def _empty_rank() -> pa.Table:
    return pa.table({"pos": pa.array([], type=pa.int64()),
                     "r": pa.array([], type=pa.int64())})


def _ordinalize(chars: Dataset) -> Dataset:
    """Raw code-point labels → first ordinals (count of strictly
    smaller code points) via one alphabet-bounded groupby + an
    O(alphabet) driver prefix broadcast — establishes the doubling
    invariant for round 0 (prefix length 1)."""
    import ray
    from ray.data.aggregate import Count

    hist = (chars.groupby("r").aggregate(Count(alias_name="c"))
            .take_all())                      # <= |alphabet| rows
    hist.sort(key=lambda row: row["r"])
    first = {}
    acc = 0
    for row in hist:
        first[int(row["r"])] = acc
        acc += int(row["c"])
    first_ref = ray.put(first)

    def relabel(batch: pa.Table) -> pa.Table:
        lut = ray.get(first_ref)
        r = batch["r"].to_numpy(zero_copy_only=False)
        keys = np.array(sorted(lut), dtype=np.int64)
        vals = np.array([lut[int(k)] for k in keys], dtype=np.int64)
        idx = np.searchsorted(keys, r)
        return pa.table({"pos": batch["pos"],
                         "r": pa.array(vals[idx])})

    return chars.map_batches(relabel, batch_format="pyarrow")


def _attach_shifted(ranks: Dataset, k: int, n: int,
                    num_parts: int) -> Dataset:
    """(pos, r, r2) with ``r2 = r[pos + k]`` (−1 past the end): one
    union-shuffle zip inside contiguous pos ranges — positions are
    dense, so a searchsorted aligns the shifted copy."""
    shift = max(1, (n + num_parts - 1) // num_parts)

    def own(batch: pa.Table) -> pa.Table:
        p = batch["pos"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(p // shift),
            "pos": batch["pos"],
            "side": pa.array(np.zeros(len(p), dtype=np.int8)),
            "r": batch["r"],
        })

    def shifted(batch: pa.Table) -> pa.Table:
        p = batch["pos"].to_numpy(zero_copy_only=False)
        keep = p >= k
        p2 = p[keep] - k
        return pa.table({
            "part": pa.array(p2 // shift),
            "pos": pa.array(p2),
            "side": pa.array(np.ones(len(p2), dtype=np.int8)),
            "r": batch["r"].filter(pa.array(keep)),
        })

    def zip_pos(group: pa.Table) -> pa.Table:
        p = group["pos"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        r = group["r"].to_numpy(zero_copy_only=False)
        o0 = np.flatnonzero(side == 0)
        o1 = np.flatnonzero(side == 1)
        order0 = o0[np.argsort(p[o0], kind="stable")]
        p0, r0 = p[order0], r[order0]
        r2 = np.full(len(p0), -1, dtype=np.int64)
        if len(o1):
            order1 = o1[np.argsort(p[o1], kind="stable")]
            p1, r1 = p[order1], r[order1]
            idx = np.searchsorted(p0, p1)
            if (idx >= len(p0)).any() or not np.array_equal(p0[idx], p1):
                raise ValueError(
                    "suffix doubling: shifted rank rows reference "
                    "positions absent from the dense range")
            r2[idx] = r1
        return pa.table({
            "pos": pa.array(p0),
            "r": pa.array(r0),
            "r2": pa.array(r2),
        })

    return (ranks.map_batches(own, batch_format="pyarrow")
            .union(ranks.map_batches(shifted, batch_format="pyarrow"))
            .groupby("part").map_groups(zip_pos, batch_format="pyarrow"))


def _rerank(pairs: Dataset, num_parts: int) -> Dataset:
    """(pos, r, dup): the class-local re-rank — group by the current
    rank (one class per task), sort by r2, new first ordinals =
    ``r + subgroup offset``; ``dup`` marks rows whose (r, r2) subgroup
    still holds ≥ 2 members (Σ dup = 0 ⇔ converged)."""

    def mask(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((r & (num_parts - 1)).astype(np.int32)))

    def rerank(group: pa.Table) -> pa.Table:
        r = group["r"].to_numpy(zero_copy_only=False)
        r2 = group["r2"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((r2, r))
        r, r2, p = r[order], r2[order], p[order]
        m = len(r)
        class_new = np.ones(m, dtype=bool)
        class_new[1:] = r[1:] != r[:-1]
        pair_new = class_new.copy()
        pair_new[1:] |= r2[1:] != r2[:-1]
        idx = np.arange(m, dtype=np.int64)
        class_start = idx[class_new][np.cumsum(class_new) - 1]
        pair_start = idx[pair_new][np.cumsum(pair_new) - 1]
        new_r = r + (pair_start - class_start)
        pair_id = np.cumsum(pair_new) - 1
        sizes = np.bincount(pair_id)
        dup = (sizes[pair_id] >= 2)
        return pa.table({
            "pos": pa.array(p),
            "r": pa.array(new_r),
            "dup": pa.array(dup.astype(np.int64)),
        })

    return (pairs.map_batches(mask, batch_format="pyarrow")
            .groupby("part").map_groups(rerank, batch_format="pyarrow"))


def _double_until(ds: Dataset, stop_k: int | None, max_k: int,
                  num_parts: int | None
                  ) -> tuple[Dataset, Dataset, int, int, bool]:
    """Shared doubling driver → (ranks, bounds, n, k, converged):
    ``ranks`` holds first ordinals of the equal-``k``-prefix classes.
    Runs until convergence (``stop_k`` None) or until ``k >= stop_k``,
    whichever first; raises if convergence would need ``k > max_k``.
    """
    from ray.data.aggregate import Sum

    chars, bounds, n = _char_stream(ds)
    if num_parts is None:
        num_parts = auto_num_parts(n)
    # Block-count discipline: each round unions two branches (doubling
    # the block count) and the groupbys preserve it, so without a cap
    # the rounds accumulate 2^round blocks — measured 1.1 s → 310 s per
    # round by k=32 at a 150k-char corpus from per-block overhead
    # alone. Re-coalescing to num_parts blocks at every materialize
    # boundary keeps per-round cost flat (and is what a multi-node run
    # needs too: the sort-shuffle's sample/reduce fan-out is
    # block-count-bounded).
    ranks = _ordinalize(chars).repartition(num_parts).materialize()
    k = 1
    converged = False
    while stop_k is None or k < stop_k:
        if stop_k is None:
            # convergence probe: any class with >= 2 members left?
            pairs = _attach_shifted(ranks, k, n, num_parts)
            nxt = (_rerank(pairs, num_parts)
                   .repartition(num_parts).materialize())
            dups = nxt.aggregate(Sum("dup", alias_name="d"))["d"] or 0
            ranks = nxt.drop_columns(["dup"])
            k *= 2
            if dups == 0:
                converged = True
                break
            if k > max_k:
                raise ValueError(
                    f"suffix doubling needs prefix length > {max_k} "
                    f"to separate all suffixes — the corpus holds a "
                    f"repeated substring of >= {max_k} code points; "
                    f"raise max_compare")
        else:
            pairs = _attach_shifted(ranks, k, n, num_parts)
            ranks = (_rerank(pairs, num_parts).drop_columns(["dup"])
                     .repartition(num_parts).materialize())
            k *= 2
    return ranks, bounds, n, k, converged


def suffix_ranks(ds: Dataset, stride: int = 1,
                 max_compare: int = 4096,
                 num_parts: int | None = None) -> Dataset:
    """(pos, rank) — the suffix-array rank of every ``stride``-th code
    point of the corpus string G (rank = number of suffixes of G that
    sort strictly below; all suffixes of one string are distinct, so
    ranks are a permutation of 0..n−1 restricted to the probed
    positions). Raises unless doubling converges within
    ``max_compare`` code points — the guarantee that makes the
    truncated-suffix SQL oracle exact (module docstring)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    ranks, _bounds, _n, _k, _converged = _double_until(
        ds, None, max_compare, num_parts)

    def strided(batch: pa.Table) -> pa.Table:
        p = batch["pos"].to_numpy(zero_copy_only=False)
        keep = pa.array(p % stride == 0)
        return pa.table({
            "pos": batch["pos"].filter(keep),
            "rank": batch["r"].filter(keep),
        })

    return ranks.map_batches(strided, batch_format="pyarrow").sort("pos")


def sa_dup_coverage(ds: Dataset, min_len: int,
                    num_parts: int | None = None) -> Dataset:
    """(doc_id, n_chars, n_dup_chars, dup_char_fraction) — per
    document, how many of its code points are covered by at least one
    window of exactly ``min_len`` code points that occurs >= 2 times in
    the corpus string G (within-document windows only pair with
    within-document windows — the separator argument in the module
    docstring). Only documents with >= 1 covered position are reported
    (inner semantics, the dedup-family convention). ExactSubstr at the
    fixed threshold length: a position is covered by some >= min_len
    repeat iff it is covered by some exactly-min_len repeat.

    Distributed shape: doubling runs only to the largest power of two
    <= min_len (NOT to convergence), one shift zip attaches the second
    sparse-table anchor ``r[pos + L − 2^j]``, one rank-keyed groupby
    counts (r, r2) key multiplicities (equal keys ⟺ equal L-prefix) —
    duplicated starts come out of a segment scan, never a pair
    expansion — then a pos-range zip attributes starts to documents
    (bounds rows replicated to the O(1) pos parts their span touches)
    and a doc-keyed groupby takes each document's interval union with
    one diff-array cumsum."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    kj = 1
    while kj * 2 <= min_len:
        kj *= 2
    ranks, bounds, n, _k, converged = _double_until(
        ds, kj, 1 << 62, num_parts)
    if num_parts is None:
        num_parts = auto_num_parts(n)

    empty = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "n_chars": pa.array([], type=pa.int64()),
        "n_dup_chars": pa.array([], type=pa.int64()),
        "dup_char_fraction": pa.array([], type=pa.float64()),
    })
    if converged:
        # every suffix separated before prefix length kj <= min_len:
        # no min_len-gram occurs twice
        import ray.data as rd
        return rd.from_arrow(empty)

    d = min_len - kj
    if d > 0:
        keyed = _attach_shifted(ranks, d, n, num_parts)
    else:
        keyed = ranks.map_batches(
            lambda b: b.append_column("r2", b["r"]),
            batch_format="pyarrow")

    def count_key(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((r & (num_parts - 1)).astype(np.int32)))

    last_valid = n - min_len  # start of the last full window

    def dup_starts(group: pa.Table) -> pa.Table:
        r = group["r"].to_numpy(zero_copy_only=False)
        r2 = group["r2"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        valid = p <= last_valid
        r, r2, p = r[valid], r2[valid], p[valid]
        order = np.lexsort((r2, r))
        r, r2, p = r[order], r2[order], p[order]
        m = len(r)
        if m == 0:
            return pa.table({"pos": pa.array([], type=pa.int64())})
        new = np.ones(m, dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (r2[1:] != r2[:-1])
        gid = np.cumsum(new) - 1
        dup = (np.bincount(gid) >= 2)[gid]
        return pa.table({"pos": pa.array(np.sort(p[dup]))})

    starts = (keyed.map_batches(count_key, batch_format="pyarrow")
              .groupby("part").map_groups(dup_starts,
                                          batch_format="pyarrow"))

    # doc attribution: bounds rows replicated to every pos part their
    # char span touches; starts keyed by their own part
    shift = max(1, (n + num_parts - 1) // num_parts)

    def start_rows(batch: pa.Table) -> pa.Table:
        p = batch["pos"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(p // shift),
            "pos": pa.array(p, type=pa.int64()),
            "doc_id": pa.array(np.full(len(p), -1, dtype=np.int64)),
            "off": pa.array(np.zeros(len(p), dtype=np.int64)),
            "len": pa.array(np.zeros(len(p), dtype=np.int64)),
        })

    def bound_rows(batch: pa.Table) -> pa.Table:
        off = batch["off"].to_numpy(zero_copy_only=False)
        ln = batch["len"].to_numpy(zero_copy_only=False)
        d_ = batch["doc_id"].to_numpy(zero_copy_only=False)
        lo = off // shift
        hi = np.maximum(off + ln - 1, off) // shift
        reps = (hi - lo + 1).astype(np.int64)
        ends = np.cumsum(reps)
        within = np.arange(int(ends[-1]) if len(ends) else 0,
                           dtype=np.int64) - np.repeat(ends - reps, reps)
        return pa.table({
            "part": pa.array(np.repeat(lo, reps) + within),
            "pos": pa.array(np.full(int(reps.sum()), -1, dtype=np.int64)),
            "doc_id": pa.array(np.repeat(d_, reps), type=pa.int64()),
            "off": pa.array(np.repeat(off, reps)),
            "len": pa.array(np.repeat(ln, reps)),
        })

    def attribute(group: pa.Table) -> pa.Table:
        p = group["pos"].to_numpy(zero_copy_only=False)
        is_start = p >= 0
        sp = p[is_start]
        b_off = group["off"].to_numpy(zero_copy_only=False)[~is_start]
        b_len = group["len"].to_numpy(zero_copy_only=False)[~is_start]
        b_doc = group["doc_id"].to_numpy(
            zero_copy_only=False)[~is_start]
        order = np.argsort(b_off, kind="stable")
        b_off, b_len, b_doc = b_off[order], b_len[order], b_doc[order]
        if sp.size == 0 or b_off.size == 0:
            return pa.table({
                "dpart": pa.array([], type=pa.int32()),
                "doc_id": pa.array([], type=pa.int64()),
                "lp": pa.array([], type=pa.int64()),
                "len": pa.array([], type=pa.int64()),
            })
        di = np.searchsorted(b_off, sp, side="right") - 1
        ok = di >= 0
        dj = np.maximum(di, 0)
        ok &= (sp >= b_off[dj]) & (sp + min_len <= b_off[dj] + b_len[dj])
        sp, dj = sp[ok], dj[ok]
        doc = b_doc[dj]
        return pa.table({
            "dpart": pa.array((doc & (num_parts - 1)).astype(np.int32)),
            "doc_id": pa.array(doc, type=pa.int64()),
            "lp": pa.array(sp - b_off[dj]),
            "len": pa.array(b_len[dj]),
        })

    routed = (starts.map_batches(start_rows, batch_format="pyarrow")
              .union(bounds.map_batches(bound_rows,
                                        batch_format="pyarrow"))
              .groupby("part").map_groups(attribute,
                                          batch_format="pyarrow"))

    def cover(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        lp = group["lp"].to_numpy(zero_copy_only=False)
        ln = group["len"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lp, doc))
        doc, lp, ln = doc[order], lp[order], ln[order]
        first = np.ones(len(doc), dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        prev = np.empty(len(lp), dtype=np.int64)
        prev[0] = 0
        prev[1:] = lp[:-1]
        contrib = np.where(first, min_len,
                           np.minimum(min_len, lp - prev))
        seg = np.cumsum(first) - 1
        covered = np.bincount(seg, weights=contrib).astype(np.int64)
        u_doc, u_len = doc[first], ln[first]
        return pa.table({
            "doc_id": pa.array(u_doc, type=pa.int64()),
            "n_chars": pa.array(u_len, type=pa.int64()),
            "n_dup_chars": pa.array(covered),
            "dup_char_fraction": pa.array(covered / u_len,
                                          type=pa.float64()),
        })

    return routed.groupby("dpart").map_groups(
        cover, batch_format="pyarrow")
