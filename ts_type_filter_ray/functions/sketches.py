"""Distributed cardinality sketching — HyperLogLog (Flajolet et al. 2007,
public algorithm) over the corpus vocabulary.

The exact distinct-term count (``term_df_tf`` → count) costs a full
O(vocabulary) shuffle; at 100 TB the vocabulary is billions of terms and
often the answer only needs to be right to a few percent (capacity
planning, bucket sizing, progress estimation). The HLL sketch shuffles
exactly ≤ 2^p register rows per batch (kilobytes, constant in corpus
size), merges with an associative-commutative per-register Max — the
ideal Ray Data reduction — and the driver folds 2^p integers. Standard
error ≈ 1.04/√2^p (~1.6 % at p=12).

Register assignment uses the md5-based 64-bit token hash shared with the
dedup family — uniform by construction, and hashing only the UNIQUE
tokens of each batch (the tokenizer's trick).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max

from .textstats import _tokens


def _hll_partial(p: int):
    from ..text.hashvec import md5_lower64_strings

    def fn(batch: pa.Table) -> pa.Table:
        _, flat, _ = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"reg": pa.array([], type=pa.int32()),
                             "rho": pa.array([], type=pa.int8())})
        uniq = pc.unique(pc.utf8_lower(flat))
        h = md5_lower64_strings(uniq)
        reg = (h >> np.uint64(64 - p)).astype(np.int32)
        rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
        # rho = leading zeros of the remaining bits + 1 (capped at 64-p+1)
        rho = np.full(len(h), 64 - p + 1, dtype=np.int8)
        nz = rest != 0
        # count leading zeros via float64 exponent trick is lossy; use
        # bit_length: lz = 64 - bit_length(rest)
        bl = np.zeros(len(h), dtype=np.int8)
        r = rest[nz]
        for shift in (32, 16, 8, 4, 2, 1):  # 6 vectorized halving steps
            big = r >= (np.uint64(1) << np.uint64(shift))
            bl[nz] = bl[nz] + np.where(big, shift, 0).astype(np.int8)
            r = np.where(big, r >> np.uint64(shift), r)
        bl[nz] += 1  # bit_length
        rho[nz] = (64 - bl[nz] + 1).astype(np.int8)
        # per-batch max per register (shrinks the shuffle to ≤ 2^p rows)
        regs, inv = np.unique(reg, return_inverse=True)
        mx = np.zeros(len(regs), dtype=np.int8)
        np.maximum.at(mx, inv, rho)
        return pa.table({"reg": pa.array(regs),
                         "rho": pa.array(mx)})

    return fn


def approx_distinct_terms(ds: Dataset, p: int = 12) -> Dataset:
    """One row (estimate, n_registers): approximate distinct lowercased
    whitespace terms. Approximate by nature → rows-only on the driver
    gate; accuracy asserted (<5 % at p=12) in pytest against the exact
    vocabulary count."""
    import ray.data as rd

    rows = (ds.map_batches(_hll_partial(p), batch_format="pyarrow")
            .groupby("reg").aggregate(Max("rho", alias_name="rho"))
            .take_all())  # ≤ 2^p rows — constant in corpus size
    m = 1 << p
    regs = np.zeros(m, dtype=np.float64)
    for r in rows:
        regs[r["reg"]] = r["rho"]
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    if est <= 2.5 * m:  # small-range correction (linear counting)
        zeros = int(np.sum(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return rd.from_arrow(pa.table({
        "estimate": pa.array([int(round(est))], type=pa.int64()),
        "n_registers": pa.array([m], type=pa.int64()),
    }))


def heavy_hitters(ds: Dataset, k: int = 25,
                  capacity: int = 4096, certify: bool = True) -> Dataset:
    """(term, n, rank) — the k most frequent lowercased terms with EXACT
    counts, found with bounded state: the scale path for top-k when the
    exact df table (``top_terms``'s full vocabulary shuffle) is too wide.

    Two passes (Misra-Gries, public algorithm): (1) each batch emits its
    counts truncated to ``capacity`` survivors with the MG decrement
    (subtract the (capacity+1)-th count), so the candidate shuffle is ≤
    capacity rows per batch regardless of vocabulary; each batch also
    emits its decrement so the global undercount bound D = Σ per-batch
    decrements (≤ N/capacity) is itself EXACT, not estimated. (2) the
    top 4k candidates by approximate count are re-counted exactly
    (broadcast candidate set, one vectorized ``pc.is_in`` pass, one tiny
    groupby), so reported counts carry no sketch error.

    **Certified exactness** (``certify=True``, the default): any term
    outside the 4k shortlist has true count ≤ apx_cutoff + D (a dropped
    candidate's approximate count is ≤ apx_cutoff, the best dropped
    approximation, and MG undercounts any term by at most D; a term
    that never survived a batch has true count ≤ D). So when the k-th
    re-counted frequency strictly exceeds apx_cutoff + D, the reported
    set IS the exact top-k — the bounded-state path is then
    value-identical to the full ``GROUP BY`` and carries a DuckDB
    oracle on the driver gate. If the margin fails (near-flat
    distribution or undersized ``capacity``), ``certify=True`` raises
    ``ValueError`` naming the bound instead of silently returning an
    uncertified list; ``certify=False`` returns the best-effort result
    (the r3-original behavior)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .textstats import _tokens

    def mg_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        enc = pc.dictionary_encode(pc.utf8_lower(flat))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        counts = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                             minlength=len(enc.dictionary))
        if len(counts) > capacity:
            # MG merge-truncate: keep top-capacity, subtract the next
            order = np.argsort(-counts, kind="stable")[:capacity + 1]
            dec = counts[order[-1]]
            keep = order[:capacity]
            vals = counts[keep] - dec
            pos = keep[vals > 0]
            vals = vals[vals > 0]
        else:
            dec = 0
            pos = np.flatnonzero(counts)
            vals = counts[pos]
        terms = enc.dictionary.take(pa.array(pos))
        out = pa.table({
            "term": terms,
            "n": pa.array(vals.astype(np.int64)),
        })
        if dec:
            # decrement sentinel: "" can never be a token (_tokens
            # filters empties), so the candidate groupby sums these
            # into the exact global undercount bound D
            out = pa.concat_tables([out, pa.table({
                "term": pa.array([""], type=pa.string()),
                "n": pa.array([int(dec)], type=pa.int64()),
            })])
        return out

    cand = (ds.map_batches(mg_partial, batch_format="pyarrow")
            .groupby("term").aggregate(Sum("n", alias_name="n"))
            .take_all())  # ≤ capacity × #batches rows — bounded state
    total_dec = sum(r["n"] for r in cand if r["term"] == "")
    cand = [r for r in cand if r["term"] != ""]
    cand.sort(key=lambda r: (-r["n"], r["term"]))
    apx_cutoff = cand[4 * k]["n"] if len(cand) > 4 * k else 0
    bound = int(apx_cutoff + total_dec)
    shortlist = pa.array([r["term"] for r in cand[:4 * k]])

    def exact_count(batch: pa.Table) -> pa.Table:
        _, flat, _ = _tokens(batch)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        low = pc.utf8_lower(flat)
        hit = low.filter(pc.is_in(low, value_set=shortlist))
        enc = pc.dictionary_encode(hit)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        counts = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                             minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary,
                         "n": pa.array(counts.astype(np.int64))})

    def topk(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pylist())
        n = batch["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -n))[:k]
        uncertified = (
            (len(order) == k and int(n[order[-1]]) <= bound)
            # fewer than k survivors while decrements happened: an
            # excluded term (true count ≤ D) might deserve a tail rank
            or (len(order) < k and total_dec > 0))
        if certify and uncertified:
            kth = int(n[order[-1]]) if len(order) else 0
            raise ValueError(
                f"heavy_hitters top-{k} not certifiably exact: k-th "
                f"exact count {kth} <= exclusion bound "
                f"{bound} (apx_cutoff {int(apx_cutoff)} + total MG "
                f"decrement {int(total_dec)}); raise capacity or pass "
                f"certify=False")
        return pa.table({
            "term": pa.array(terms[order].tolist(), type=pa.string()),
            "n": pa.array(n[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1,
                                       dtype=np.int64)),
        })

    return (ds.map_batches(exact_count, batch_format="pyarrow")
            .groupby("term").aggregate(Sum("n", alias_name="n"))
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow"))
