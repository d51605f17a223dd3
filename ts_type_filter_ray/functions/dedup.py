"""Deduplication operators: exact (sha256), MinHash+LSH, SimHash, and
exact n-gram Jaccard — the scale path for training-data dedup.

Shapes (all Ray-Data-first, per the guide's dedup patterns):
- exact:   vectorized sha256 per batch → ``groupby(sha)`` (hash shuffle)
           → min-doc_id winner per group.
- minhash: shingle→signature per batch (pure-int, seeded, process-stable
           hashing — never Python ``hash()``) → explode to
           (band, band_hash, doc_id) rows → ``groupby`` buckets →
           candidate pairs → verify with exact Jaccard.
- simhash: 64-bit simhash per doc; near-dup candidates via 4-band exact
           blocking (Hamming ≤ 3 ⇒ at least one of 4 bands equal).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"),
                                          digest_size=8).digest(), "big")


# ---------------------------------------------------------------- exact


def exact_dedup_groups(ds: Dataset) -> Dataset:
    """(sha256, keep_doc_id, n_copies) per distinct content — the engine's
    version of the reference's duplicate-document detection
    (``ts_type_filter/inverted_index.py:48-50``): instead of raising, it
    elects the minimum doc_id as the canonical copy."""

    def add_sha(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(t.encode("utf-8")).hexdigest()
                for t in batch["text"].to_pylist()]
        return pa.table({"sha256": pa.array(shas, type=pa.string()),
                         "doc_id": batch["doc_id"]})

    return (ds.map_batches(add_sha, batch_format="pyarrow")
            .groupby("sha256")
            .aggregate(Min("doc_id", alias_name="keep_doc_id"),
                       Count(alias_name="n_copies")))


# -------------------------------------------------------------- minhash


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([_stable_hash64(s) for s in shingles],
                              dtype=np.uint64))


class MinHashStage:
    """Actor-pool stage: text → num_perm-wide MinHash signature.

    Permutations ``h_i(x) = (a_i * x + b_i) mod p`` with seeded a/b built
    once per actor; vectorized over the shingle set per doc.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self._a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self._b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self._k = shingle_k
        self._num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        hs = _shingle_hashes(text, self._k)
        if hs.size == 0:
            return np.zeros(self._num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) in python-int space to avoid u64 overflow:
        # do the mod-mul in object-free numpy via 128-bit-safe split
        out = np.empty(self._num_perm, dtype=np.uint64)
        hs_i = hs.astype(object)
        for i in range(self._num_perm):
            vals = (int(self._a[i]) * hs_i + int(self._b[i])) % _MERSENNE
            out[i] = np.uint64(min(vals))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.array([s.tolist() for s in sigs],
                            type=pa.list_(pa.uint64())),
        })


def minhash_signatures(ds: Dataset, num_perm: int = 64, shingle_k: int = 3,
                       concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(MinHashStage,
                          fn_constructor_args=(num_perm, shingle_k),
                          batch_format="pyarrow", concurrency=concurrency)


def lsh_candidate_pairs(sigs: Dataset, bands: int = 16) -> Dataset:
    """Signatures → distinct candidate (id_a, id_b) pairs via banded LSH:
    explode to (band, band_hash, doc_id), groupby the bucket, emit pairs
    within each bucket, dedup. a<b ordering makes pairs canonical."""

    def explode(batch: pa.Table) -> pa.Table:
        b_ids, b_hash, d_ids = [], [], []
        for doc_id, sig in zip(batch["doc_id"].to_pylist(),
                               batch["sig"].to_pylist()):
            sig = np.asarray(sig, dtype=np.uint64)
            rows = np.array_split(sig, bands)
            for bi, row in enumerate(rows):
                b_ids.append(bi)
                b_hash.append(_stable_hash64(",".join(map(str, row))))
                d_ids.append(doc_id)
        return pa.table({
            "band": pa.array(b_ids, type=pa.int32()),
            "bhash": pa.array(b_hash, type=pa.uint64()),
            "doc_id": pa.array(d_ids, type=pa.int64()),
        })

    def pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        a_col, b_col = [], []
        for a, b in itertools.combinations(ids, 2):
            a_col.append(a)
            b_col.append(b)
        return pa.table({"id_a": pa.array(a_col, type=pa.int64()),
                         "id_b": pa.array(b_col, type=pa.int64())})

    cand = (sigs.map_batches(explode, batch_format="pyarrow")
            .groupby(["band", "bhash"])
            .map_groups(pairs, batch_format="pyarrow"))
    return cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands"))


def jaccard(text_a: str, text_b: str, shingle_k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, shingle_k).tolist())
    sb = set(_shingle_hashes(text_b, shingle_k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(ds: Dataset, num_perm: int = 64, shingle_k: int = 3,
                        bands: int = 16, threshold: float = 0.5) -> pa.Table:
    """Full near-dup pipeline: signatures → LSH candidates → exact-Jaccard
    verification. Returns the verified pair table
    (id_a, id_b, jaccard:double).

    Verification joins candidate texts back by broadcasting the candidate
    id set into a corpus filter (semi-join; candidates ≪ corpus)."""
    sigs = minhash_signatures(ds, num_perm, shingle_k)
    cand = lsh_candidate_pairs(sigs, bands).take_all()
    if not cand:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    need = sorted({r["id_a"] for r in cand} | {r["id_b"] for r in cand})
    need_arr = pa.array(need, type=pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["doc_id"], value_set=need_arr))

    texts = {r["doc_id"]: r["text"]
             for r in ds.map_batches(keep, batch_format="pyarrow")
                        .select_columns(["doc_id", "text"]).take_all()}
    a_out, b_out, j_out = [], [], []
    for r in sorted(cand, key=lambda r: (r["id_a"], r["id_b"])):
        j = jaccard(texts[r["id_a"]], texts[r["id_b"]], shingle_k)
        if j >= threshold:
            a_out.append(r["id_a"])
            b_out.append(r["id_b"])
            j_out.append(j)
    return pa.table({"id_a": pa.array(a_out, type=pa.int64()),
                     "id_b": pa.array(b_out, type=pa.int64()),
                     "jaccard": pa.array(j_out, type=pa.float64())})


# -------------------------------------------------------------- simhash


class SimHashStage:
    """Actor-pool stage: 64-bit SimHash over whitespace tokens (tf-weighted
    bit votes; stable blake2b token hashing)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            toks = text.lower().split()
            if not toks:
                out.append(0)
                continue
            votes = np.zeros(64, dtype=np.int64)
            vals, counts = np.unique(np.array(toks), return_counts=True)
            for tok, cnt in zip(vals.tolist(), counts.tolist()):
                h = _stable_hash64(tok)
                bits = (h >> np.arange(64, dtype=np.uint64)) & 1
                votes += np.where(bits.astype(bool), cnt, -cnt)
            bits_out = (votes > 0).astype(np.uint64)
            out.append(int((bits_out << np.arange(64, dtype=np.uint64)).sum()))
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(out, type=pa.uint64())})


def simhash_values(ds: Dataset, concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(SimHashStage, batch_format="pyarrow",
                          concurrency=concurrency)


def simhash_near_dup_pairs(ds: Dataset, max_hamming: int = 3) -> Dataset:
    """Near-dup (id_a, id_b, hamming) via 4-band blocking: with 4 16-bit
    bands, Hamming ≤ 3 guarantees one identical band (pigeonhole), so the
    ``groupby`` bucket pass finds all qualifying pairs without an n²
    comparison."""

    def explode(batch: pa.Table) -> pa.Table:
        band, key, doc, sim = [], [], [], []
        for d, h in zip(batch["doc_id"].to_pylist(),
                        batch["simhash"].to_pylist()):
            for bi in range(4):
                band.append(bi)
                key.append((h >> (16 * bi)) & 0xFFFF)
                doc.append(d)
                sim.append(h)
        return pa.table({"band": pa.array(band, type=pa.int32()),
                         "key": pa.array(key, type=pa.int32()),
                         "doc_id": pa.array(doc, type=pa.int64()),
                         "simhash": pa.array(sim, type=pa.uint64())})

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group["doc_id"].to_pylist(),
                          group["simhash"].to_pylist()))
        a_c, b_c, h_c = [], [], []
        for (da, ha), (db, hb) in itertools.combinations(rows, 2):
            ham = bin(ha ^ hb).count("1")
            if ham <= max_hamming:
                a_c.append(da)
                b_c.append(db)
                h_c.append(ham)
        return pa.table({"id_a": pa.array(a_c, type=pa.int64()),
                         "id_b": pa.array(b_c, type=pa.int64()),
                         "hamming": pa.array(h_c, type=pa.int32())})

    sim = simhash_values(ds)
    cand = (sim.map_batches(explode, batch_format="pyarrow")
            .groupby(["band", "key"]).map_groups(pairs, batch_format="pyarrow"))
    return cand.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))
