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


# ------------------------------------------------------------------ KLL


class KllSketch:
    """Karnin–Lang–Liberty quantile sketch (FOCS'16, public algorithm) —
    the mergeable bounded-state scale path past
    ``events.exact_value_quantiles`` (which range-partitions the full
    value space): space O(k·log(n/k)), rank error O(n/k) w.h.p., and an
    EXACT mode when ``k ≥ n`` (level 0 never overflows ⇒ no compaction
    ⇒ every element retained at weight 1 ⇒ queries reduce to
    ``percentile_disc`` order statistics — the exactness-configuration
    gate trick).

    Compaction coin flips are DETERMINISTIC (blake2b over the level,
    the per-level compaction counter, and the first surviving value's
    bits), so equal inputs in equal order produce bit-equal sketches —
    reproducible pipelines, no ``Math.random``-style seams.

    Levels hold float64 arrays; an item at level h represents 2^h
    original elements. Level capacities follow the standard
    ``k·(2/3)^(H-1-h)`` schedule (min 2)."""

    _C = 2.0 / 3.0

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("KLL k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0

    def _cap(self, h: int) -> int:
        height = len(self.levels)
        return max(2, int(np.ceil(self.k * self._C ** (height - 1 - h))))

    def insert_many(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        self.n += len(values)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()

    def merge(self, other: "KllSketch") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, arr in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], arr])
        self.n += other.n
        self._compress()

    def _coin(self, h: int, arr: np.ndarray) -> int:
        import hashlib
        payload = (h.to_bytes(4, "little")
                   + self._compactions.to_bytes(8, "little")
                   + arr[:1].tobytes())
        return hashlib.blake2b(payload, digest_size=1).digest()[0]

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) <= self._cap(h):
                h += 1
                continue
            arr = np.sort(self.levels[h])
            coin = self._coin(h, arr)
            self._compactions += 1
            leftover = np.empty(0, dtype=np.float64)
            if len(arr) % 2 == 1:
                # compact an EVEN count so retained weight is conserved
                # exactly (2m items -> m at double weight); the odd one
                # out stays at this level, end chosen by the coin's
                # second bit
                if coin & 2:
                    leftover, arr = arr[:1], arr[1:]
                else:
                    leftover, arr = arr[-1:], arr[:-1]
            promoted = arr[(coin & 1)::2]
            self.levels[h] = leftover
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate(
                [self.levels[h + 1], promoted])
            # capacities shrink for low levels when height grows, so
            # re-check from the bottom
            h = 0

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        """(values, weights) of every retained item."""
        vals = np.concatenate(self.levels) if self.levels else (
            np.empty(0, dtype=np.float64))
        wts = np.concatenate(
            [np.full(len(a), 1 << h, dtype=np.int64)
             for h, a in enumerate(self.levels)]) if self.levels else (
            np.empty(0, dtype=np.int64))
        return vals, wts

    def quantile(self, q: float) -> float:
        """``percentile_disc``-style query: the retained value whose
        cumulative weight first reaches ceil(q·n) (exact when no
        compaction ever ran)."""
        vals, wts = self.items()
        if len(vals) == 0:
            raise ValueError("empty sketch")
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        rank = max(1, int(np.ceil(q * self.n)))
        i = int(np.searchsorted(cum, rank, side="left"))
        return float(vals[min(i, len(vals) - 1)])

    def to_rows(self) -> pa.Table:
        vals, wts = self.items()
        lv = np.concatenate(
            [np.full(len(a), h, dtype=np.int32)
             for h, a in enumerate(self.levels)]) if self.levels else (
            np.empty(0, dtype=np.int32))
        return pa.table({
            "level": pa.array(lv),
            "value": pa.array(vals, type=pa.float64()),
            "n": pa.array(np.full(len(vals), 0, dtype=np.int64)),
        })

    @classmethod
    def from_rows(cls, level: np.ndarray, value: np.ndarray, n: int,
                  k: int) -> "KllSketch":
        sk = cls(k)
        top = int(level.max()) if len(level) else 0
        sk.levels = [value[level == h].astype(np.float64)
                     for h in range(top + 1)]
        sk.n = int(n)
        sk._compress()
        return sk


def kll_quantiles(ds: Dataset, col: str = "value",
                  ps: tuple[float, ...] = (0.5, 0.9, 0.99),
                  k: int = 200,
                  num_merge_parts: int = 16) -> Dataset:
    """One row (n_events, p50, p90, p99) of KLL-approximate quantiles —
    same output shape as :func:`events.exact_value_quantiles`, bounded
    state everywhere: per-batch sketches (map-side), one
    ``groupby(mpart)`` merge into ``num_merge_parts`` partial sketches,
    and a driver fold over ≤ num_merge_parts · O(k log n) retained
    rows. Nothing proportional to the data ever concentrates: at 100 TB
    the shuffle volume is #batches · O(k) rows.

    With ``k ≥ n`` this is EXACT (see :class:`KllSketch`) and equals
    ``percentile_disc`` bit-for-bit — the driver gate runs that
    configuration; approximate-mode rank error is pytest-bounded."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        sk = KllSketch(k)
        sk.insert_many(v)
        rows = sk.to_rows()
        # deterministic merge-part routing: digest the batch's FULL
        # content (first-value+length alone collapsed near-constant
        # columns into one merge part; identical batches still collide
        # — the remaining pathological case, documented)
        import hashlib
        mp = hashlib.blake2b(v.tobytes(), digest_size=2).digest()
        mpart = int.from_bytes(mp, "little") % num_merge_parts
        rows = rows.append_column(
            "mpart", pa.array(np.full(rows.num_rows, mpart,
                                      dtype=np.int32)))
        # one count row per batch (level = -1) carries the exact n
        return pa.concat_tables([rows, pa.table({
            "level": pa.array([-1], type=pa.int32()),
            "value": pa.array([0.0], type=pa.float64()),
            "n": pa.array([len(v)], type=pa.int64()),
            "mpart": pa.array([mpart], type=pa.int32()),
        })])

    def merge_part(group: pa.Table) -> pa.Table:
        lv = group["level"].to_numpy(zero_copy_only=False)
        val = group["value"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        data = lv >= 0
        sk = KllSketch.from_rows(lv[data], val[data],
                                 int(n[~data].sum()), k)
        out = sk.to_rows()
        return pa.concat_tables([out, pa.table({
            "level": pa.array([-1], type=pa.int32()),
            "value": pa.array([0.0], type=pa.float64()),
            "n": pa.array([sk.n], type=pa.int64()),
        })])

    parts = (ds.select_columns([col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("mpart")
             .map_groups(merge_part, batch_format="pyarrow")
             .take_all())  # ≤ num_merge_parts · O(k·log n) rows
    lv = np.array([r["level"] for r in parts], dtype=np.int64)
    val = np.array([r["value"] for r in parts], dtype=np.float64)
    data = lv >= 0
    n_tot = int(sum(r["n"] for r in parts if r["level"] == -1))
    final = KllSketch.from_rows(lv[data], val[data], n_tot, k)
    out = {"n_events": pa.array([n_tot], type=pa.int64())}
    for p in ps:
        out[f"p{int(p * 100)}"] = pa.array([final.quantile(p)],
                                           type=pa.float64())
    return rd.from_arrow(pa.table(out))


def distinct_terms_by_group(ds: Dataset,
                            group_col: str = "lang",
                            num_parts: int = 64) -> Dataset:
    """EXACT distinct lowercased-term count per group — one row
    (group, n_distinct_terms) per distinct ``group_col`` value, the
    per-corpus-slice vocabulary report. Per-batch UNIQUE (group,
    term-hash) pairs explode (the tokenizer trick: md5 only the
    batch-unique tokens), every copy of a hash lands in ONE coarse term
    partition where a segment scan dedups (group, hash) globally, and a
    tiny ``groupby(group)`` sums the per-partition distinct counts.
    Shuffle volume O(Σ per-batch distinct pairs) — never the token
    stream, never a driver vocabulary. Value-exact vs
    ``count(distinct term) group by``."""
    from ray.data.aggregate import Sum

    from ..text.hashvec import md5_lower64_strings

    def explode(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        if len(flat) == 0:
            return pa.table({
                "part": pa.array([], type=pa.int32()),
                "h": pa.array([], type=pa.uint64()),
                "grp": pa.array([], type=pa.string()),
            })
        low = pc.utf8_lower(flat)
        enc = pc.dictionary_encode(low)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        hu = md5_lower64_strings(enc.dictionary)
        h = hu[enc.indices.to_numpy(zero_copy_only=False)]
        grp = batch[group_col].combine_chunks() if isinstance(
            batch[group_col], pa.ChunkedArray) else batch[group_col]
        genc = pc.dictionary_encode(grp)
        if isinstance(genc, pa.ChunkedArray):
            genc = genc.combine_chunks()
        gcodes = genc.indices.to_numpy(zero_copy_only=False)[
            parents.to_numpy(zero_copy_only=False)]
        order = np.lexsort((h, gcodes))
        h_s, g_s = h[order], gcodes[order]
        keep = np.ones(len(h_s), dtype=bool)
        keep[1:] = (h_s[1:] != h_s[:-1]) | (g_s[1:] != g_s[:-1])
        return pa.table({
            "part": pa.array((h_s[keep] % num_parts).astype(np.int32)),
            "h": pa.array(h_s[keep]),
            "grp": genc.dictionary.take(
                pa.array(g_s[keep], type=pa.int32())),
        })

    def scan(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        genc = pc.dictionary_encode(group["grp"].combine_chunks())
        if isinstance(genc, pa.ChunkedArray):
            genc = genc.combine_chunks()
        g = genc.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((h, g))
        h_s, g_s = h[order], g[order]
        keep = np.ones(len(h_s), dtype=bool)
        keep[1:] = (h_s[1:] != h_s[:-1]) | (g_s[1:] != g_s[:-1])
        cnt = np.bincount(g_s[keep], minlength=len(genc.dictionary))
        return pa.table({
            "grp": genc.dictionary,
            "n": pa.array(cnt.astype(np.int64)),
        })

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("part").map_groups(scan, batch_format="pyarrow")
           .groupby("grp").aggregate(Sum("n", alias_name="n_distinct_terms")))
    return out.rename_columns({"grp": group_col}).sort(group_col)


# ----------------------------------------------------- Count-Min sketch


def _cms_row_hashes(terms, depth: int, width: int) -> np.ndarray:
    """``(depth, len(terms))`` slot indices — row *d* hashes
    ``md5_number_lower(term || ':' || d) % width``, the oracle-shared
    md5 convention (DuckDB computes the identical slots)."""
    from ..text.hashvec import md5_lower64_strings
    arr = terms if isinstance(terms, pa.Array) else pa.array(
        list(terms), type=pa.string())
    out = np.empty((depth, len(arr)), dtype=np.int64)
    for d in range(depth):
        from .dedup import join_elementwise
        suff = join_elementwise(arr, str(d), ":")
        out[d] = (md5_lower64_strings(suff)
                  % np.uint64(width)).astype(np.int64)
    return out



def _sketch_partial_table(dictionary: pa.Array, per_code_counts,
                          depth: int, width: int) -> pa.Table:
    """Shared CMS accumulation body: per-unique-value counts scattered
    into a (depth, width) counter grid via the oracle-shared md5 slots,
    packed to nonzero (key, count) rows."""
    slots = _cms_row_hashes(dictionary, depth, width)
    acc = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        np.add.at(acc[d], slots[d], per_code_counts)
    rows, cols = np.nonzero(acc)
    return pa.table({
        "key": pa.array(rows * width + cols),
        "count": pa.array(acc[rows, cols]),
    })


def cms_sketch(ds: Dataset, depth: int = 4, width: int = 1024) -> np.ndarray:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the corpus
    TERM frequencies: a ``(depth, width)`` int64 counter array where
    ``counts[d, h_d(t)]`` sums the tf of every term hashing there.

    Distributed shape: per-batch bounded partials (≤ depth·width
    counters regardless of batch bytes — per-unique-token hashing via
    dictionary-encode) → one ``groupby(key).Sum`` over ≤ depth·width
    packed keys → a driver fold over the bounded nonzero rows. Counter
    addition commutes, so the merged sketch is bit-identical to a
    single-pass build — the property the value-exact gate checks.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _tokens(batch)
        if len(flat) == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"key": z, "count": z})
        flat = pc.utf8_lower(flat)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        tf_u = np.bincount(codes, minlength=len(enc.dictionary)) \
            .astype(np.int64)
        return _sketch_partial_table(enc.dictionary, tf_u, depth, width)

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("key").aggregate(Sum("count", alias_name="count"))
              .take_all())  # ≤ depth·width rows, corpus-size-independent
    sketch = np.zeros((depth, width), dtype=np.int64)
    for r in merged:
        sketch[r["key"] // width, r["key"] % width] = r["count"]
    return sketch


def cms_estimate(sketch: np.ndarray, terms) -> np.ndarray:
    """Point estimates ``min_d sketch[d, h_d(t)]`` for *terms* —
    overestimate-only: ``est ≥ true tf`` always (counters only ever add
    colliding terms' mass)."""
    depth, width = sketch.shape
    if len(terms) == 0:
        return np.empty(0, dtype=np.int64)
    slots = _cms_row_hashes(terms, depth, width)
    ests = sketch[np.arange(depth)[:, None], slots]
    return ests.min(axis=0)


def cms_term_counts(ds: Dataset, depth: int = 4, width: int = 1024,
                    num_parts: int | None = None) -> pa.Table:
    """(term, tf, cms_count) for every distinct corpus term — the exact
    distributed word count beside the Count-Min estimate from a small
    sketch. Two passes over the corpus (count + sketch); both driver
    tables are vocab-bounded. With ``width`` below the vocabulary size
    the estimates visibly overestimate (collision mass) while the min
    over rows keeps them tight — all integer arithmetic, value-exact
    against an oracle that computes the same sketch."""
    from .bpe import word_count_table
    words = word_count_table(ds, num_parts=num_parts)
    sketch = cms_sketch(ds, depth=depth, width=width)
    ests = cms_estimate(sketch, words["term"].combine_chunks())
    return pa.table({
        "term": words["term"],
        "tf": words["n"],
        "cms_count": pa.array(ests),
    })


def cms_key_sketch(ds: Dataset, key_col: str, depth: int = 4,
                   width: int = 1024) -> np.ndarray:
    """Count-Min sketch of an INTEGER key column's frequencies — the
    key is hashed through the oracle-shared md5 convention via its
    decimal string (``md5(key::VARCHAR || ':' || d) % width``), so a
    SQL oracle reproduces identical slots. Same bounded-partial shape
    as :func:`cms_sketch`: per-batch ≤ depth·width counters, one
    packed-key Sum groupby, driver fold."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        # null keys never join (SQL equi-join semantics; NULL slots in
        # the oracle's md5 expression never match) — drop, don't crash
        col = col.filter(pc.is_valid(col))
        keys = col.cast(pa.string())
        enc = pc.dictionary_encode(keys)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        if len(codes) == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"key": z, "count": z})
        n_u = np.bincount(codes, minlength=len(enc.dictionary)) \
            .astype(np.int64)
        return _sketch_partial_table(enc.dictionary, n_u, depth, width)

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("key").aggregate(Sum("count", alias_name="count"))
              .take_all())  # ≤ depth·width rows
    sketch = np.zeros((depth, width), dtype=np.int64)
    for r in merged:
        sketch[r["key"] // width, r["key"] % width] = r["count"]
    return sketch


def cms_join_size(ds_a: Dataset, col_a: str, ds_b: Dataset, col_b: str,
                  depth: int = 4, width: int = 1024) -> pa.Table:
    """Equi-join SIZE estimation from two Count-Min sketches (the
    AMS-style inner-product estimator, Cormode & Muthukrishnan 2005):
    ``est = min_d Σ_w A[d,w]·B[d,w]`` — an OVERESTIMATE-ONLY bound on
    ``|A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k)`` (collisions only ever add
    cross-terms; the min over depth rows keeps it tight). The classic
    query-planner cardinality estimate WITHOUT executing the join:
    each side costs one bounded-state sketch pass, the estimate is a
    driver dot product over 2·depth·width counters. One row out:
    (depth, width, est_join_size). All-integer arithmetic → the
    estimate itself is value-exact against a SQL oracle computing the
    same sketches."""
    a = cms_key_sketch(ds_a, col_a, depth=depth, width=width)
    b = cms_key_sketch(ds_b, col_b, depth=depth, width=width)
    # Python-int dot products: row sums can exceed int64 in principle
    # (n_a·n_b per slot); exact arbitrary precision keeps the oracle
    # shape (HUGEINT sums) honest
    ests = [sum(int(x) * int(y) for x, y in zip(a[d], b[d]))
            for d in range(depth)]
    est = min(ests)
    if est >= (1 << 63):
        raise ValueError("join-size estimate exceeds int64 — the "
                         "oracle-shape (::BIGINT) contract breaks")
    return pa.table({
        "depth": pa.array([depth], type=pa.int64()),
        "width": pa.array([width], type=pa.int64()),
        "est_join_size": pa.array([est], type=pa.int64()),
    })


def cms_join_size_sql(table_a: str, col_a: str, table_b: str,
                      col_b: str, depth: int, width: int) -> str:
    """DuckDB mirror of :func:`cms_join_size` (same md5 slots, HUGEINT
    row dot products, min over depth)."""
    def sk(table, col, name):
        return f"""
    {name} as (
      select d, md5_number_lower({col}::VARCHAR || ':' || d) % {width}
                 as slot,
             count(*)::BIGINT as cnt
      from {table} cross join range(0, {depth}) as r(d)
      group by 1, 2)"""
    return f"""
    with {sk(table_a, col_a, 'sa')[5:]},
    {sk(table_b, col_b, 'sb')[5:]},
    dots as (
      select sa.d, sum(sa.cnt::HUGEINT * sb.cnt::HUGEINT) as dot
      from sa join sb on sb.d = sa.d and sb.slot = sa.slot
      group by sa.d)
    select {depth}::BIGINT as depth, {width}::BIGINT as width,
           coalesce(min(dot), 0)::BIGINT as est_join_size
    from dots"""


def _rho_from_hash(h: np.ndarray, p: int) -> np.ndarray:
    """HLL rho per 64-bit hash: leading zeros of the low ``64-p`` bits
    (left-aligned convention) + 1; all-zero rest → ``64-p+1``."""
    q = 64 - p
    low = h & np.uint64((1 << q) - 1)
    rho = np.full(len(h), q + 1, dtype=np.int64)
    nz = low != 0
    bl = np.zeros(len(h), dtype=np.int64)
    r = low[nz]
    for shift in (32, 16, 8, 4, 2, 1):
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl[nz] = bl[nz] + np.where(big, shift, 0)
        r = np.where(big, r >> np.uint64(shift), r)
    bl[nz] += 1  # bit_length(low)
    rho[nz] = q - bl[nz] + 1
    return rho


def hll_distinct_by_group(ds: Dataset, group_col: str = "lang",
                          p: int = 8) -> Dataset:
    """HyperLogLog distinct-term estimates PER GROUP — and, unlike the
    classic "approximate → rows-only" framing, VALUE-EXACT on the gate:
    HLL is a deterministic function of the md5 hashes, so a SQL oracle
    reproduces the registers (reg = top ``p`` hash bits, rho via
    ``bin()`` length on the low bits) and the exact float expression
    shapes (ordered ``2^-rho`` fold in register order + the
    linear-counting small-range branch). The cms_counts trick, HLL
    edition.

    Distributed shape: per-batch unique (group, term) pairs → md5 the
    batch-unique terms once → per-(group, register) MAX-rho partials
    (≤ groups·2^p rows per batch) → one tiny groupby Max → driver fold
    over ≤ groups·2^p rows. Output (group, estimate:float64,
    n_registers), group-ascending."""
    import ray.data as rd
    from ray.data.aggregate import Max as AggMax
    m = 1 << p

    rows = (ds.map_batches(_hll_group_partial_fn(group_col, p),
                           batch_format="pyarrow")
            .groupby(["grp", "reg"])
            .aggregate(AggMax("rho", alias_name="rho"))
            .take_all())  # ≤ groups · 2^p rows
    per = {}
    for r in rows:
        per.setdefault(r["grp"], []).append((r["reg"], r["rho"]))
    out_g, out_e = [], []
    for g in sorted(per):
        out_g.append(g)
        out_e.append(_hll_estimate(sorted(per[g]), m))
    return rd.from_arrow(pa.table({
        "grp": pa.array(out_g, type=pa.string()),
        "estimate": pa.array(out_e, type=pa.float64()),
        "n_registers": pa.array([m] * len(out_g), type=pa.int64()),
    }))


def hll_group_sql(group_col: str, p: int) -> str:
    """DuckDB mirror of :func:`hll_distinct_by_group`: identical md5
    registers and float expression shapes."""
    m = 1 << p
    q = 64 - p
    mask = (1 << q) - 1
    alpha = f"(0.7213::DOUBLE / (1::DOUBLE + 1.079::DOUBLE / {m}::DOUBLE))"
    return f"""
    with toks as (
      select {group_col} as grp,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                 as term
      from documents where trim(text) <> ''),
    u as (select distinct grp, term from toks),
    h as (select grp, md5_number_lower(term) as hv from u),
    rr as (select grp, (hv >> {q})::BIGINT as reg,
                  case when (hv & {mask}) = 0 then {q + 1}
                       else {q} - length(bin((hv & {mask})::BIGINT)) + 1
                  end as rho
           from h),
    regs as (select grp, reg, max(rho)::BIGINT as rho
             from rr group by 1, 2),
    sums as (select grp,
                    list_aggregate(
                        list(power(2::DOUBLE, -rho::DOUBLE)
                             order by reg), 'sum') as acc,
                    count(*)::BIGINT as n_nz
             from regs group by 1),
    est as (select grp,
                   {alpha} * {m}::DOUBLE * {m}::DOUBLE
                       / (acc + ({m} - n_nz)::DOUBLE) as raw,
                   ({m} - n_nz) as zeros
            from sums)
    select grp,
           case when raw <= {2.5 * m} and zeros > 0
                then {m}::DOUBLE * ln({m}::DOUBLE / zeros::DOUBLE)
                else raw end as estimate,
           {m}::BIGINT as n_registers
    from est"""


def _hll_estimate(regs: list, m: int) -> float:
    """Shared estimate fold: ordered 2^-rho left fold over (reg, rho)
    pairs in register order + the linear-counting small-range branch —
    the exact float shapes :func:`hll_group_sql` mirrors."""
    import math
    acc = 0.0
    for _, rho in sorted(regs):
        acc += 2.0 ** (-float(rho))
    zeros = m - len(regs)
    den = acc + float(zeros)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    est = alpha * float(m) * float(m) / den
    if est <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / float(zeros))
    return est


def hll_set_ops(ds: Dataset, group_col: str, group_a: str,
                group_b: str, p: int = 8) -> Dataset:
    """HLL SET ALGEBRA over two corpus slices' vocabularies — the
    mergeability that makes HLL the distributed sketch: the union
    sketch is the REGISTER-WISE MAX of the two slices' sketches (no
    re-scan), and the intersection estimate follows by
    inclusion-exclusion. One row: (est_a, est_b, est_union,
    est_intersection), every float value-exact vs a SQL oracle
    computing the same registers, the same max-merge, and the same
    ordered folds — approximate answers, exactly reproducible.

    Same distributed shape as :func:`hll_distinct_by_group` (the
    per-(group, register) partials are shared machinery); the merge is
    a driver fold over ≤ 2·2^p rows."""
    import ray.data as rd
    from ray.data.aggregate import Max as AggMax

    m = 1 << p
    reg_rows = (ds.map_batches(_hll_group_partial_fn(group_col, p),
                               batch_format="pyarrow")
                .groupby(["grp", "reg"])
                .aggregate(AggMax("rho", alias_name="rho"))
                .take_all())  # ≤ groups · 2^p rows
    if group_a == group_b:
        raise ValueError("hll_set_ops needs two distinct groups")
    per = {group_a: {}, group_b: {}}
    for r in reg_rows:
        if r["grp"] in per:
            per[r["grp"]][r["reg"]] = r["rho"]
    for g, regs in per.items():
        if not regs:
            # an absent/empty group would estimate 0.0 here while the
            # SQL mirror's empty-CTE aggregate yields NULL — out of
            # contract, raise loudly
            raise ValueError(
                f"group {g!r} has no tokens under {group_col!r}")
    ra = sorted(per[group_a].items())
    rb = sorted(per[group_b].items())
    merged: dict = dict(ra)
    for reg, rho in rb:
        merged[reg] = max(merged.get(reg, 0), rho)
    est_a = _hll_estimate(ra, m)
    est_b = _hll_estimate(rb, m)
    est_u = _hll_estimate(sorted(merged.items()), m)
    est_i = est_a + est_b - est_u
    return rd.from_arrow(pa.table({
        "est_a": pa.array([est_a], type=pa.float64()),
        "est_b": pa.array([est_b], type=pa.float64()),
        "est_union": pa.array([est_u], type=pa.float64()),
        "est_intersection": pa.array([est_i], type=pa.float64()),
    }))


def _hll_group_partial_fn(group_col: str, p: int):
    """The per-batch (group, register, max rho) partial shared by
    :func:`hll_distinct_by_group` and :func:`hll_set_ops`."""
    from ..text.hashvec import md5_lower64_strings
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, parents = _tokens(batch)
        if len(flat) == 0:
            return pa.table({
                "grp": pa.array([], type=pa.string()),
                "reg": pa.array([], type=pa.int32()),
                "rho": pa.array([], type=pa.int64()),
            })
        low = pc.utf8_lower(flat)
        enc = pc.dictionary_encode(low)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        hu = md5_lower64_strings(enc.dictionary)
        h = hu[enc.indices.to_numpy(zero_copy_only=False)]
        grp = batch[group_col]
        genc = pc.dictionary_encode(
            grp.combine_chunks() if isinstance(grp, pa.ChunkedArray)
            else grp)
        if isinstance(genc, pa.ChunkedArray):
            genc = genc.combine_chunks()
        gcodes = genc.indices.to_numpy(zero_copy_only=False)[
            parents.to_numpy(zero_copy_only=False)]
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rho = _rho_from_hash(h, p)
        key = gcodes.astype(np.int64) * m + reg
        uk, inv = np.unique(key, return_inverse=True)
        mx = np.zeros(uk.size, dtype=np.int64)
        np.maximum.at(mx, inv, rho)
        return pa.table({
            "grp": genc.dictionary.take(pa.array(uk // m)),
            "reg": pa.array((uk % m).astype(np.int32)),
            "rho": pa.array(mx),
        })

    return partial


def hll_set_ops_sql(group_col: str, group_a: str, group_b: str,
                    p: int) -> str:
    """DuckDB mirror of :func:`hll_set_ops`: per-group registers,
    register-wise max merge for the union, identical estimate shapes,
    inclusion-exclusion intersection."""
    m = 1 << p
    q = 64 - p
    mask = (1 << q) - 1
    alpha = f"(0.7213::DOUBLE / (1::DOUBLE + 1.079::DOUBLE / {m}::DOUBLE))"

    def est(regs_cte, name):
        return f"""
    {name}_s as (select list_aggregate(
                     list(power(2::DOUBLE, -rho::DOUBLE)
                          order by reg), 'sum') as acc,
                   count(*)::BIGINT as n_nz
            from {regs_cte}),
    {name}_e as (select case
          when {alpha} * {m}::DOUBLE * {m}::DOUBLE
                   / (acc + ({m} - n_nz)::DOUBLE) <= {2.5 * m}
               and ({m} - n_nz) > 0
          then {m}::DOUBLE * ln({m}::DOUBLE / ({m} - n_nz)::DOUBLE)
          else {alpha} * {m}::DOUBLE * {m}::DOUBLE
                   / (acc + ({m} - n_nz)::DOUBLE) end as est
        from {name}_s)"""

    return f"""
    with toks as (
      select {group_col} as grp,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                 as term
      from documents
      where trim(text) <> '' and {group_col} in ('{group_a}',
                                                 '{group_b}')),
    u as (select distinct grp, term from toks),
    h as (select grp, md5_number_lower(term) as hv from u),
    rr as (select grp, (hv >> {q})::BIGINT as reg,
                  case when (hv & {mask}) = 0 then {q + 1}
                       else {q} - length(bin((hv & {mask})::BIGINT)) + 1
                  end as rho
           from h),
    regs as (select grp, reg, max(rho)::BIGINT as rho
             from rr group by 1, 2),
    ra as (select reg, rho from regs where grp = '{group_a}'),
    rb as (select reg, rho from regs where grp = '{group_b}'),
    ru as (select reg, max(rho)::BIGINT as rho
           from (select * from ra union all select * from rb)
           group by reg),{est('ra', 'a')},{est('rb', 'b')},{est('ru',
                                                               'un')}
    select a_e.est as est_a, b_e.est as est_b, un_e.est as est_union,
           a_e.est + b_e.est - un_e.est as est_intersection
    from a_e, b_e, un_e"""
