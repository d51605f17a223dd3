"""Deterministic dataset splitting — the train/valid/test assignment a
training-data pipeline needs to be reproducible across reruns, machines
and engine versions.

Split by a content-independent stable hash of the document id
(``md5_number_lower``-compatible, the same digest DuckDB exposes, so the
assignment is value-exact checkable): every worker computes the same
split for the same row with no coordination, no shuffle, no RNG state —
the property that matters at 100 TB, where "sample 10%" must not require
a pass that materializes or re-keys anything. One vectorized
``map_batches`` over the id column only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..text.hashvec import md5_lower64_ints

#: split fractions in percent: train gets [0, train), valid
#: [train, train+valid), test the rest — of md5(doc_id) mod 100
DEFAULT_TRAIN_PCT = 80
DEFAULT_VALID_PCT = 10


def _md5_bucket(doc_ids: np.ndarray, mod: int = 100) -> np.ndarray:
    """md5_number_lower(doc_id::VARCHAR) % mod. md5 of the DECIMAL
    STRING of the id (not raw bytes) so the DuckDB oracle can reproduce
    it with ``md5_number_lower(doc_id::VARCHAR)``. Fully vectorized
    (single-block md5 in numpy — see ``text/hashvec.py``)."""
    key = md5_lower64_ints(np.asarray(doc_ids))
    return (key % np.uint64(mod)).astype(np.int64)


def dataset_split(ds: Dataset, train_pct: int = DEFAULT_TRAIN_PCT,
                  valid_pct: int = DEFAULT_VALID_PCT,
                  id_col: str = "doc_id") -> Dataset:
    """(doc_id, bucket, split) — deterministic hash split. ``bucket`` is
    md5(id-string) mod 100; split = 'train' below ``train_pct``, 'valid'
    below ``train_pct + valid_pct``, else 'test'."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bucket = _md5_bucket(ids)
        split = np.where(
            bucket < train_pct, "train",
            np.where(bucket < train_pct + valid_pct, "valid", "test"))
        return pa.table({
            id_col: batch[id_col],
            "bucket": pa.array(bucket, type=pa.int64()),
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return ds.select_columns([id_col]).map_batches(
        fn, batch_format="pyarrow")


def split_counts(ds: Dataset, train_pct: int = DEFAULT_TRAIN_PCT,
                 valid_pct: int = DEFAULT_VALID_PCT,
                 id_col: str = "doc_id") -> Dataset:
    """(split, n_docs) — the split sizes, one tiny groupby."""
    from ray.data.aggregate import Count
    return (dataset_split(ds, train_pct, valid_pct, id_col)
            .groupby("split").aggregate(Count(alias_name="n_docs")))


def _md5_key64(doc_ids: np.ndarray) -> np.ndarray:
    """Full 64-bit ``md5_number_lower(doc_id::VARCHAR)`` per row (the
    hash :func:`_md5_bucket` reduces mod *mod*). Vectorized."""
    return md5_lower64_ints(np.asarray(doc_ids))


def deterministic_shuffle(ds: Dataset, id_col: str = "doc_id",
                          part_bits: int = 6) -> Dataset:
    """(id, position) — a REPRODUCIBLE global shuffle: every row's
    position in the md5-of-id order (tie-broken by id), the epoch
    ordering a training pipeline wants instead of ``random_shuffle``
    (whose placement depends on run-time block boundaries and seeds
    that don't survive an engine swap). Value-exact: position ≡ SQL
    ``row_number() over (order by md5_number_lower(id::VARCHAR), id)``.

    Distributed exact ranking without a global sort step: the 64-bit
    key's HIGH ``part_bits`` bits range-partition the key space (md5 is
    uniform, so parts are balanced within noise — no skew by
    construction); per-part row counts (2^part_bits tiny rows) prefix-sum
    into part offsets on the driver; each part then sorts locally and
    adds its offset. One shuffle of (id, key) pairs, O(2^part_bits)
    driver state. Scale part_bits with the corpus (the default 64 parts
    suits bench scale; 100 TB wants ~2^14 so a part stays
    node-resident)."""
    num_parts = 1 << part_bits

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = _md5_key64(ids)
        return pa.table({
            id_col: batch[id_col],
            "key": pa.array(key),
            "part": pa.array((key >> np.uint64(64 - part_bits))
                             .astype(np.int32)),
        })

    keyed_ds = ds.select_columns([id_col]).map_batches(
        keyed, batch_format="pyarrow")
    counts = keyed_ds.groupby("part").count().take_all()  # ≤ 2^bits rows
    sizes = np.zeros(num_parts, dtype=np.int64)
    for r in counts:
        sizes[r["part"]] = r["count()"]
    offsets = np.cumsum(sizes) - sizes

    def rank(group: pa.Table) -> pa.Table:
        part = group["part"][0].as_py()
        ids = group[id_col].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))
        pos = np.empty(len(ids), dtype=np.int64)
        pos[order] = offsets[part] + 1 + np.arange(len(ids))
        return pa.table({
            id_col: group[id_col],
            "position": pa.array(pos),
        })

    return keyed_ds.groupby("part").map_groups(rank,
                                               batch_format="pyarrow")


def sample_exact_k(ds: Dataset, k: int = 100,
                   id_col: str = "doc_id") -> "pa.Table":
    """(rank, id) — an EXACT-size deterministic global sample: the k
    rows with the smallest ``md5_number_lower(id)`` key (tie-broken by
    id), rank 1..k in key order. The reproducible replacement for
    reservoir sampling when "give me exactly k rows, same k every
    rerun" matters (eval subsets, debug slices): hash order is fixed by
    the ids alone, so the sample is stable across engines, partitions
    and reruns.

    Distributed shape: each batch reduces to its own k smallest keys
    (vectorized lexsort-head), so the final exact selection sorts only
    the ~(#batches × k) survivors — never a global sort of the corpus.
    Returns a small in-memory Arrow table (k rows) with rank attached."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = _md5_key64(ids)
        if len(ids) > k:
            head = np.lexsort((ids, key))[:k]
            ids, key = ids[head], key[head]
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         "key": pa.array(key)})

    cand = (ds.select_columns([id_col])
            .map_batches(partial, batch_format="pyarrow")
            .sort(["key", id_col]).limit(k))
    tbl = cand.to_arrow_refs()
    import ray as _ray
    parts = [t for t in _ray.get(tbl) if t.num_rows]
    small = pa.concat_tables(parts) if parts else pa.table(
        {id_col: pa.array([], type=pa.int64()),
         "key": pa.array([], type=pa.uint64())})
    # re-sort the k survivors locally: immune to block-order drift under
    # preserve_order=False, and trivially cheap at k rows
    small = small.sort_by([("key", "ascending"), (id_col, "ascending")])
    n = small.num_rows
    return pa.table({
        "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        id_col: small[id_col],
    })


def upsample_by_weight(ds: Dataset, weights: dict[str, int],
                       default_weight: int = 1,
                       strata_col: str = "source",
                       id_col: str = "doc_id") -> Dataset:
    """(id, strata, copy_id) — integer-weight upsampling: every row is
    emitted ``weights[stratum]`` times with copy_id 0..w-1, the
    deterministic form of data-mixture temperature weighting ("epochs
    per source"). Weight 0 drops the stratum. One vectorized
    ``np.repeat`` per batch, no shuffle, no RNG — rerun-identical, and
    downstream consumers can hash ``(id, copy_id)`` for per-copy salt
    (e.g. distinct shuffle positions per epoch)."""
    for k, v in weights.items():
        if v != int(v):
            raise ValueError(
                f"weights must be non-negative integers; {k!r} has "
                f"fractional weight {v!r} (int() would silently "
                "truncate it)")
    w = {k: int(v) for k, v in weights.items()}
    if any(v < 0 for v in w.values()) or default_weight < 0 \
            or default_weight != int(default_weight):
        raise ValueError("weights must be non-negative integers")

    def fn(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch[strata_col].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq_w = np.fromiter(
            (w.get(s, default_weight) for s in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        rep = uniq_w[enc.indices.to_numpy(zero_copy_only=False)]
        total = int(rep.sum())
        idx = np.repeat(np.arange(len(rep)), rep)
        cs = np.cumsum(rep)
        copy_id = np.arange(total, dtype=np.int64) - np.repeat(cs - rep,
                                                               rep)
        return pa.table({
            id_col: batch[id_col].take(pa.array(idx)),
            strata_col: batch[strata_col].take(pa.array(idx)),
            "copy_id": pa.array(copy_id),
        })

    return ds.select_columns([id_col, strata_col]).map_batches(
        fn, batch_format="pyarrow")


def stratified_sample(ds: Dataset, rates: dict[str, float],
                      default_rate: float = 0.0,
                      strata_col: str = "lang",
                      id_col: str = "doc_id",
                      mod: int = 10_000) -> Dataset:
    """(id, strata, bucket) of the rows KEPT by a per-stratum
    deterministic hash sample — the data-mixture step of corpus assembly
    ("keep 80% of English, 20% of everything else"), reproducible with
    no RNG state, no shuffle and no coordination: a row is kept iff
    ``md5(id-string) % mod < round(rate·mod)``, so the same row gets the
    same verdict on any worker, any rerun, any engine (the SQL oracle
    reproduces it with ``md5_number_lower``).

    ``rates`` maps stratum value → keep fraction in [0, 1]; strata not
    listed use ``default_rate``. The rates dict is a tiny driver-side
    constant captured in the task closure (broadcast once per task by
    Ray, never per batch)."""
    cut = {k: int(round(v * mod)) for k, v in rates.items()}
    default_cut = int(round(default_rate * mod))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        bucket = _md5_bucket(ids, mod=mod)
        # strata cardinality is tiny — look up cuts per UNIQUE value
        enc = pc.dictionary_encode(batch[strata_col].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq_cuts = np.fromiter(
            (cut.get(s, default_cut) for s in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        codes = enc.indices.to_numpy(zero_copy_only=False)
        keep = bucket < uniq_cuts[codes]
        return pa.table({
            id_col: pc.array_filter(batch[id_col], pa.array(keep)),
            strata_col: pc.array_filter(batch[strata_col],
                                        pa.array(keep)),
            "bucket": pa.array(bucket[keep], type=pa.int64()),
        })

    return ds.select_columns([id_col, strata_col]).map_batches(
        fn, batch_format="pyarrow")


def partial_topk_prune(ids: np.ndarray, key: np.ndarray,
                       k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch prune for a distributed top-k-by-key-DESC: keep the k
    highest keys (ties id-ascending). Shared by every (key, id) top-k
    sampler so the tie-break stays consistent across operators."""
    if ids.size > k:
        head = np.lexsort((ids, -key))[:k]
        return ids[head], key[head]
    return ids, key


def ranked_topk_table(cand: Dataset, k: int, id_col: str = "doc_id",
                      key_col: str = "key") -> "pa.Table":
    """(rank, id) from a Dataset of per-batch (id, key) survivors: one
    global (key desc, id asc) sort + limit, a driver concat of the ≤k
    surviving rows, ranks 1..n. The shared tail of weighted_sample_k /
    dsir_select — any change to the sort/tie-break applies to both."""
    import ray as _ray

    cand = cand.sort([key_col, id_col], descending=[True, False]).limit(k)
    parts = [t for t in _ray.get(cand.to_arrow_refs()) if t.num_rows]
    small = pa.concat_tables(parts) if parts else pa.table(
        {id_col: pa.array([], type=pa.int64()),
         key_col: pa.array([], type=pa.float64())})
    small = small.sort_by([(key_col, "descending"), (id_col, "ascending")])
    n = small.num_rows
    return pa.table({
        "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        id_col: small[id_col],
    })


def weighted_sample_k(ds: Dataset, k: int = 100,
                      weight_col: str = "n_chars",
                      id_col: str = "doc_id") -> "pa.Table":
    """(rank, id) — an EXACT-size deterministic WEIGHTED sample without
    replacement: Efraimidis–Spirakis A-ES keys ``ln(u)/w`` with
    ``u = (md5_number_lower(id) + 0.5)·2⁻⁶⁴`` (deterministic uniform
    from the id hash, never 0), top-k by key DESC (dividing the
    negative ``ln(u)`` by a larger weight pulls it toward 0) — each doc
    selected with probability proportional to its weight, reproducible
    across engines/partitions/reruns like :func:`sample_exact_k`. The
    quality-weighted subset selection a curation pipeline runs ("keep
    100k docs, favor high-quality ones").

    Rows with weight ≤ 0 are excluded (they carry no sampling mass).
    Distributed shape: per-batch partial top-k, global sort of only the
    ~(#batches × k) survivors."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(
            zero_copy_only=False).astype(np.float64)
        pos = w > 0.0
        ids, w = ids[pos], w[pos]
        u = (_md5_key64(ids).astype(np.float64) + 0.5) * 2.0 ** -64
        key = np.log(u) / w
        ids, key = partial_topk_prune(ids, key, k)
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         "key": pa.array(key)})

    cand = (ds.select_columns([id_col, weight_col])
            .map_batches(partial, batch_format="pyarrow"))
    return ranked_topk_table(cand, k, id_col=id_col)


def sample_per_stratum(ds: Dataset, k: int = 20,
                       strata_col: str = "lang",
                       id_col: str = "doc_id") -> Dataset:
    """(stratum, rank, id) — EXACTLY k rows per stratum (fewer when the
    stratum is smaller), deterministically: each stratum's k smallest
    ``md5_number_lower(id)`` keys, rank 1..k in key order. The balanced
    counterpart of :func:`stratified_sample` (rates) and
    :func:`sample_exact_k` (global) — "k docs per language" for eval
    sets and per-source debug slices.

    Distributed shape: every batch reduces to its own per-stratum k
    smallest keys (one lexsort per batch), then one SMALL groupby over
    the ~(#batches × strata × k) survivors ranks each stratum — the
    corpus never globally sorts and no stratum's full membership ever
    co-locates."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # dictionary-encode the stratum so the lexsort runs on int codes
        # (grouping only — code order is irrelevant)
        enc = pc.dictionary_encode(batch[strata_col].combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        key = _md5_key64(ids)
        order = np.lexsort((ids, key, codes))  # stratum-major, key asc
        s_s, i_s, k_s = codes[order], ids[order], key[order]
        new_s = np.ones(s_s.size, dtype=bool)
        new_s[1:] = s_s[1:] != s_s[:-1]
        # rank within stratum run = position - run start
        starts = np.flatnonzero(new_s)
        run_start = starts[np.cumsum(new_s) - 1]
        within = np.arange(s_s.size, dtype=np.int64) - run_start
        keep = np.flatnonzero(within < k)
        return pa.table({
            strata_col: enc.dictionary.take(pa.array(s_s[keep])),
            id_col: pa.array(i_s[keep], type=pa.int64()),
            "key": pa.array(k_s[keep])})

    def rank_group(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        head = np.lexsort((ids, key))[:k]
        return pa.table({
            strata_col: group[strata_col].take(pa.array(head)),
            "rank": pa.array(np.arange(1, head.size + 1,
                                       dtype=np.int64)),
            id_col: pa.array(ids[head], type=pa.int64()),
        })

    return (ds.select_columns([id_col, strata_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(strata_col)
            .map_groups(rank_group, batch_format="pyarrow"))


def _order_key_desc(v: np.ndarray) -> np.ndarray:
    """uint64 key whose ASCENDING order is the DESCENDING order of the
    score values — int64 scores map exactly (sign-bit flip), floats via
    the IEEE total-order key (events._float_order_key), both inverted."""
    if np.issubdtype(v.dtype, np.integer):
        key = v.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
    else:
        from .events import _float_order_key
        key = _float_order_key(v)
    return ~key


def select_until_budget(ds: Dataset, budget: int, weight_col: str,
                        score_col: str | None = None,
                        group_col: str | None = None,
                        id_col: str = "doc_id",
                        part_bits: int = 6) -> Dataset:
    """The pretraining data-allocation step: within each group, rank
    rows by ``(score desc, id asc)`` and keep the maximal prefix whose
    INCLUSIVE running ``weight_col`` total stays ``<= budget`` ("take
    the best documents until the token budget is spent"). Returns the
    selected rows as ``(id, group?, score?, weight, cum_weight)`` where
    ``cum_weight`` is the inclusive running total in selection order —
    ``row qualifies iff cum_weight <= budget``, the SQL window-cumsum
    contract (``sum(w) over (partition by g order by score desc, id)``).

    Distributed exact ranking without a global sort (the
    ``deterministic_shuffle`` construction pointed at scores): the
    score's order-preserving uint64 key is INVERTED so ascending key ==
    descending score, its high ``part_bits`` bits range-partition each
    group; per-(group, part) weight sums (a tiny bounded aggregate)
    prefix into per-part base offsets on the driver; parts whose base
    already exceeds the budget are dropped before the shuffle, the rest
    sort locally and attach ``base + cumsum``. One shuffle of the
    surviving candidate rows, O(groups · 2^part_bits) driver state.
    Equal scores share a partition by construction, so the id tie-break
    never crosses parts. Weights must be non-negative integers (token
    counts); a negative weight raises."""
    from ray.data.aggregate import Sum

    if score_col is None:
        score_col = weight_col
    num_parts = 1 << part_bits
    cols = [id_col, weight_col]
    if score_col not in cols:
        cols.append(score_col)
    if group_col is not None and group_col not in cols:
        cols.append(group_col)
    src = ds.select_columns(cols)

    if group_col is None:
        gid_of = {None: 0}
    else:
        gvals = sorted(r[group_col] for r in
                       src.groupby(group_col).count().take_all())
        gid_of = {g: i for i, g in enumerate(gvals)}

    def keyed(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        if len(w) and w.min() < 0:
            raise ValueError(
                "select_until_budget: negative weights are not "
                "budget-semantics-meaningful")
        s = batch[score_col].to_numpy(zero_copy_only=False)
        key = _order_key_desc(s)
        bucket = (key >> np.uint64(64 - part_bits)).astype(np.int64)
        if group_col is None:
            gids = np.zeros(batch.num_rows, dtype=np.int64)
        else:
            enc = pc.dictionary_encode(
                batch[group_col].combine_chunks())
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            lut = np.fromiter(
                (gid_of[g] for g in enc.dictionary.to_pylist()),
                dtype=np.int64, count=len(enc.dictionary))
            gids = lut[enc.indices.to_numpy(zero_copy_only=False)]
        out = batch.append_column(
            "pkey", pa.array(gids * num_parts + bucket))
        return out.append_column("okey", pa.array(key))

    keyed_ds = src.map_batches(keyed, batch_format="pyarrow")
    # tiny bounded aggregate: one row per (group, score-range bucket)
    sums = keyed_ds.groupby("pkey").aggregate(Sum(weight_col)).take_all()
    n_groups = (max(gid_of.values()) + 1) if gid_of else 1
    totals = np.zeros(n_groups * num_parts, dtype=np.int64)
    for r in sums:
        totals[r["pkey"]] = r[f"sum({weight_col})"]
    # exclusive prefix within each group, bucket-ascending (score desc)
    base = np.zeros_like(totals)
    for g in range(n_groups):
        seg = totals[g * num_parts:(g + 1) * num_parts]
        base[g * num_parts:(g + 1) * num_parts] = \
            np.cumsum(seg) - seg
    def prune(batch: pa.Table) -> pa.Table:
        # a part whose exclusive base exceeds the budget cannot qualify
        # any positive-weight row — drop it before the shuffle
        pk = batch["pkey"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(base[pk] <= budget))

    def local(group: pa.Table) -> pa.Table:
        pk = group["pkey"][0].as_py()
        ids = group[id_col].to_numpy(zero_copy_only=False)
        okey = group["okey"].to_numpy(zero_copy_only=False)
        w = group[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ids, okey))
        cum = base[pk] + np.add.accumulate(w[order])
        keep_sorted = cum <= budget
        sel = order[keep_sorted]
        out = group.select(
            [c for c in group.column_names
             if c not in ("pkey", "okey")]).take(pa.array(sel))
        return out.append_column(
            "cum_weight", pa.array(cum[keep_sorted], type=pa.int64()))

    return (keyed_ds
            .map_batches(prune, batch_format="pyarrow")
            .groupby("pkey")
            .map_groups(local, batch_format="pyarrow"))
