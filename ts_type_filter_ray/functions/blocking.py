"""Sorted-neighborhood blocking (Hernández & Stolfo 1995): global-sort
the corpus by a caller-computed blocking key, then emit every candidate
pair within a fixed rank window — the third classic near-dup candidate
generator next to LSH bucketing (MinHash/SimHash) and gram-signature
joins (``edjoin``). Sorted-neighborhood shines when similarity is
concentrated in a sort key (titles, URLs, normalized prefixes): the
candidate count is exactly ``n·w`` regardless of value skew.

Distributed shape — exact global ranks without a global sort step,
then ONE windowed exchange with halo replication:

1. **Rank assignment** (the ``deterministic_shuffle`` construction,
   generalized to semantic keys): the key's first 8 utf-8 bytes pack
   into an order-preserving uint64 (byte order ≡ codepoint order);
   range bounds over that packed space come from a deterministic
   md5-of-id row sample (driver state: O(sample) = O(64·parts));
   per-part counts prefix-sum into offsets; each part sorts locally by
   (full key, id) and adds its offset. Rows sharing a packed prefix
   land in one part by construction (bounds are packed VALUES), so the
   local sort resolves ties exactly and the global rank equals SQL
   ``row_number() over (order by key, id)``. Sampling skew only
   unbalances parts, never breaks rank correctness.
2. **Windowed pairs with halo replication**: each ranked row goes to
   rank-bucket ``rank // window`` AND (as a halo copy) to the next
   bucket; inside each bucket group, a pair (a, b) with
   ``0 < rank_b − rank_a ≤ window`` is emitted exactly once — in the
   LARGER rank's home bucket, where the smaller rank is guaranteed
   present (home or halo, since ``rank_a ≥ rank_b − window``). The
   per-bucket expansion is the vectorized searchsorted + repeat/offset
   idiom; every bucket holds ≤ 2·window rows, so the exchange is
   skew-free by construction.

Verification composes downstream: feed the pairs to the sketch-join
exact-Jaccard verify (``dedup._attach_blobs`` + vectorized set
intersection) or the banded-DP edit verify (``edjoin``) — blocking and
verification are deliberately separate stages, like the LSH family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .partitioning import auto_num_parts

_SAMPLE_PER_PART = 64
_SAMPLE_MOD = np.uint64(1 << 20)


def _packed_prefix(arr: pa.Array) -> np.ndarray:
    """Order-preserving uint64 of each string's first 8 utf-8 bytes
    (big-endian pack, zero-padded): packed_a < packed_b ⇒ key_a < key_b,
    and equal packs are resolved by the in-part full-key sort."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset:arr.offset + n + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    for i in range(8):
        have = lens > i
        byte = np.zeros(n, dtype=np.uint64)
        idx = starts[have] + i
        byte[have] = data[idx].astype(np.uint64)
        out |= byte << np.uint64(8 * (7 - i))
    return out


def global_ranks(ds: Dataset, key_col: str, id_col: str = "doc_id",
                 num_parts: int | None = None) -> Dataset:
    """(id, key, rank) — every row's exact 1-based global rank in
    (key asc, id asc) order; rank ≡ SQL ``row_number() over (order by
    key, id)``. Null keys rank as '' (lowest). See module docstring for
    the range-partition + prefix-sum construction."""
    import ray

    from ..text.hashvec import md5_lower64_ints

    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def keyed(batch: pa.Table) -> pa.Table:
        key = pc.fill_null(pc.cast(batch[key_col], pa.string()), "")
        return pa.table({
            "id": pc.cast(batch[id_col], pa.int64()),
            "key": key,
            "pk": pa.array(_packed_prefix(key).view(np.int64)),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    n = keyed_ds.count()
    if n == 0:
        return keyed_ds.map_batches(
            lambda b: b.append_column("rank", pa.array(
                np.empty(0, dtype=np.int64))).drop_columns(["pk"]),
            batch_format="pyarrow")

    # deterministic md5-of-id row sample → packed-value range bounds;
    # driver state O(sample size), never O(rows)
    thresh = np.uint64(min(
        int(_SAMPLE_MOD),
        max(1, (_SAMPLE_PER_PART * num_parts * int(_SAMPLE_MOD)) // n)))

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        m = (md5_lower64_ints(ids) % _SAMPLE_MOD) < thresh
        return pa.table({"pk": pa.array(
            batch["pk"].to_numpy(zero_copy_only=False)[m])})

    sampled = np.sort(np.concatenate(
        [b["pk"].to_numpy(zero_copy_only=False)
         for b in keyed_ds.map_batches(sample, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]
        + [np.empty(0, np.int64)]).view(np.uint64))
    if len(sampled):
        step = max(1, len(sampled) // num_parts)
        bounds = np.unique(sampled[step::step])
    else:
        bounds = np.empty(0, dtype=np.uint64)
    bref = ray.put(bounds)

    def add_part(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        pk = batch["pk"].to_numpy(zero_copy_only=False).view(np.uint64)
        part = np.searchsorted(b, pk, side="right").astype(np.int32)
        return batch.append_column("part", pa.array(part))

    parted = keyed_ds.map_batches(
        add_part, batch_format="pyarrow").materialize()
    counts = parted.groupby("part").count().take_all()  # ≤ parts rows
    sizes = np.zeros(len(bounds) + 1, dtype=np.int64)
    for r in counts:
        sizes[r["part"]] = r["count()"]
    offsets = np.cumsum(sizes) - sizes

    def rank(group: pa.Table) -> pa.Table:
        part = group["part"][0].as_py()
        order = pc.sort_indices(
            group, sort_keys=[("key", "ascending"), ("id", "ascending")]
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.empty(group.num_rows, dtype=np.int64)
        pos[order] = offsets[part] + 1 + np.arange(group.num_rows)
        return pa.table({
            "id": group["id"],
            "key": group["key"],
            "rank": pa.array(pos),
        })

    return parted.groupby("part").map_groups(rank, batch_format="pyarrow")


def sorted_neighborhood_pairs(ds: Dataset, key_col: str,
                              id_col: str = "doc_id", window: int = 3,
                              num_parts: int | None = None) -> Dataset:
    """(id_a, id_b, rank_a, rank_b) — every pair within ``window`` of
    each other in the global (key, id) sort order (0 < rank_b − rank_a
    ≤ window), sorted by (id_a, id_b). Exactly n·window − O(window²)
    pairs regardless of key skew; each rank bucket holds ≤ 2·window
    rows, so no exchange partition can be degenerate."""
    w = int(window)
    if w < 1:
        raise ValueError("window must be ≥ 1")
    ranked = global_ranks(ds, key_col, id_col=id_col,
                          num_parts=num_parts)

    def to_buckets(batch: pa.Table) -> pa.Table:
        rk = batch["rank"].to_numpy(zero_copy_only=False)
        ids = batch["id"].to_numpy(zero_copy_only=False)
        bucket = rk // w
        return pa.table({
            "bucket": pa.array(np.concatenate([bucket, bucket + 1])),
            "id": pa.array(np.tile(ids, 2)),
            "rank": pa.array(np.tile(rk, 2)),
        })

    def pairs(group: pa.Table) -> pa.Table:
        bucket = group["bucket"][0].as_py()
        rk = group["rank"].to_numpy(zero_copy_only=False)
        ids = group["id"].to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rk, ids = rk[order], ids[order]
        # halo copies duplicate ranks across buckets, not within one
        home = rk // w == bucket  # pair emitted in the LARGER rank's home
        lo = np.searchsorted(rk, rk - w, side="left")
        cnt = np.where(home, np.arange(len(rk), dtype=np.int64) - lo, 0)
        tot = int(cnt.sum())
        if tot == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"id_a": z, "id_b": z,
                             "rank_a": z, "rank_b": z})
        offs = np.cumsum(cnt) - cnt
        j = np.repeat(np.arange(len(rk), dtype=np.int64), cnt)
        i = np.repeat(lo, cnt) + (np.arange(tot, dtype=np.int64)
                                  - np.repeat(offs, cnt))
        return pa.table({
            "id_a": pa.array(ids[i]), "id_b": pa.array(ids[j]),
            "rank_a": pa.array(rk[i]), "rank_b": pa.array(rk[j]),
        })

    out = (ranked.map_batches(to_buckets, batch_format="pyarrow")
           .groupby("bucket").map_groups(pairs, batch_format="pyarrow"))
    return out.sort(["id_a", "id_b"])
