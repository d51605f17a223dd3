"""Vectorized single-block MD5 — the batch form of DuckDB's
``md5_number_lower``.

Every hash contract in this engine that must be reproducible in the SQL
oracle uses the lower 64 bits of md5 (little-endian of digest bytes
8..16), because md5 is the only hash DuckDB exposes whose value is
*contractually* stable across versions (``hash()`` is explicitly not).
The inputs we hash under that contract are short — decimal doc-id
strings (≤ 20 bytes) and whitespace tokens (almost always ≤ 55 bytes) —
so each message fits ONE md5 block after padding, and the md5 compression
function can run fully vectorized in numpy across the whole batch:
64 rounds of uint32 adds/rotates over chunk-sized vectors instead of N
``hashlib`` calls, with no per-row Python.

Implementation notes that matter for speed here:
- everything runs in ~16k-row chunks so the ~30 working vectors stay
  L2-resident and the 64-byte block buffer is reused (a fresh
  ``np.zeros((N, 64))`` per million-row batch is pure page-fault cost);
- decimal rendering is numeric (repeated int64 divmod-by-10 — numpy's
  *uint64* division takes a ~100× slower scalar path, so magnitudes stay
  int64), and digit j (LSB-first) lands directly at string column
  ``length-1-j`` — no per-digit gather;
- messages longer than 55 bytes (rare: a pathological "token" with no
  whitespace) fall back to ``hashlib`` row-wise — output is identical
  either way (asserted in tests against ``hashlib`` directly).

Public MD5 algorithm per RFC 1321.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "md5_lower64_ints",
    "md5_lower64_strings",
    "MAX_SINGLE_BLOCK",
]

#: longest message (bytes) that fits a single 64-byte md5 block
#: (1 padding byte + 8 length bytes must follow).
MAX_SINGLE_BLOCK = 55

#: rows per processing chunk — sized so block buffer + working vectors
#: stay L2/L3-resident.
_CHUNK = 16384

# -- round constants (RFC 1321) ----------------------------------------
_K32 = np.floor(np.abs(np.sin(np.arange(1, 65))) * 2**32).astype(
    np.uint64).astype(np.uint32)
_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + \
     [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
_G = ([i for i in range(16)] +
      [(5 * i + 1) % 16 for i in range(16, 32)] +
      [(3 * i + 5) % 16 for i in range(32, 48)] +
      [(7 * i) % 16 for i in range(48, 64)])

#: 10^0 .. 10^18 (the largest power of ten an int64 magnitude reaches)
_POW10 = np.array([10 ** k for k in range(19)], dtype=np.int64)


def _compress_chunk(m: np.ndarray) -> np.ndarray:
    """One cache-resident chunk of the 64-round md5 kernel.

    *m* is (n, 16) little-endian uint32 message words. Returns the
    lower-64 digest per row (``int.from_bytes(digest[8:], 'little')``).
    Temporaries are reused in-place — each round is ~8 vector ops.
    """
    n = m.shape[0]
    a = np.full(n, 0x67452301, dtype=np.uint32)
    b = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d = np.full(n, 0x10325476, dtype=np.uint32)
    f = np.empty(n, dtype=np.uint32)
    t = np.empty(n, dtype=np.uint32)
    for i in range(64):
        if i < 16:
            np.bitwise_and(b, c, out=f)
            np.bitwise_and(~b, d, out=t)
            np.bitwise_or(f, t, out=f)
        elif i < 32:
            np.bitwise_and(d, b, out=f)
            np.bitwise_and(~d, c, out=t)
            np.bitwise_or(f, t, out=f)
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_xor(f, d, out=f)
        else:
            np.bitwise_or(b, ~d, out=f)
            np.bitwise_xor(c, f, out=f)
        f += a
        f += _K32[i]
        f += m[:, _G[i]]                            # uint32 wraps
        s = _S[i]
        np.right_shift(f, np.uint32(32 - s), out=t)
        np.left_shift(f, np.uint32(s), out=f)
        np.bitwise_or(f, t, out=f)
        f += b
        a, d, c, b, f = d, c, b, f, a
    # digest = LE(a0+a) LE(b0+b) LE(c0+c) LE(d0+d); bytes 8..16 little
    # endian == (c0+c) | (d0+d) << 32.
    lo = (c + np.uint32(0x98BADCFE)).astype(np.uint64)
    hi = (d + np.uint32(0x10325476)).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def _pad_tail(block: np.ndarray, lengths: np.ndarray) -> None:
    """Append the 0x80 marker and the 64-bit little-endian bit length."""
    n = len(lengths)
    block[np.arange(n), lengths] = 0x80
    bitlen = (lengths.astype(np.uint64) * np.uint64(8)).astype("<u8")
    block[:, 56:64] = bitlen.view(np.uint8).reshape(n, 8)


def _ints_chunk(ids: np.ndarray, block: np.ndarray) -> np.ndarray:
    """Hash one chunk of int64 ids; *block* is a reused (n, 64) buffer."""
    n = len(ids)
    block[:] = 0
    neg = ids < 0
    x = np.where(neg, -ids, ids)                   # int64 magnitudes
    # exact digit count: 1 + #{k >= 1 : x >= 10^k}
    ndig = np.ones(n, dtype=np.int64)
    max_x = int(x.max())
    for k in range(1, 19):
        if max_x < int(_POW10[k]):
            break
        ndig += x >= _POW10[k]
    max_dig = int(ndig.max())
    sign = neg.astype(np.int64)                    # '-' occupies col 0
    lengths = ndig + sign
    if neg.any():
        block[neg, 0] = 0x2D                       # '-'
    rows_all = np.arange(n)
    flat = block.reshape(-1)
    # LSB-first digit j sits at string column lengths-1-j: peel digits
    # with int64 divmod-by-10 and scatter each directly — no gather.
    y = x.copy()
    col = lengths - 1
    for _ in range(max_dig):
        live = y > 0 if _ else slice(None)         # digit 0 always live
        q = y // 10
        dig = y - q * 10
        if _ == 0:
            flat[rows_all * 64 + col] = (dig + 0x30).astype(np.uint8)
        else:
            rows = rows_all[live]
            flat[rows * 64 + col[rows]] = (dig[rows] + 0x30).astype(
                np.uint8)
        y = q
        col -= 1
    _pad_tail(block, lengths)
    m = block.reshape(-1).view("<u4").reshape(n, 16)
    return _compress_chunk(m)


def md5_lower64_ints(ids: np.ndarray) -> np.ndarray:
    """``md5_number_lower(id::VARCHAR)`` for a whole int64 array at once
    (md5 of the DECIMAL STRING of each id, lower 64 bits little-endian).
    """
    ids = np.ascontiguousarray(np.asarray(ids, dtype=np.int64))
    n = len(ids)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    block = np.zeros((min(n, _CHUNK), 64), dtype=np.uint8)
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        out[lo:hi] = _ints_chunk(ids[lo:hi], block[:hi - lo])
    return out


def _strings_to_arrow(strings) -> pa.Array:
    if isinstance(strings, pa.ChunkedArray):
        return strings.combine_chunks()
    if isinstance(strings, pa.Array):
        return strings
    return pa.array(strings, type=pa.string())


def _strings_chunk(starts: np.ndarray, lengths: np.ndarray,
                   data: np.ndarray, block: np.ndarray) -> np.ndarray:
    """Hash one chunk of ≤55-byte strings; *block* is a reused buffer."""
    m = len(starts)
    block[:] = 0
    tot = int(lengths.sum())
    if tot:
        row_rep = np.repeat(np.arange(m), lengths)
        within = np.arange(tot) - np.repeat(np.cumsum(lengths) - lengths,
                                            lengths)
        flat = block.reshape(-1)
        flat[row_rep * 64 + within] = data[np.repeat(starts, lengths) +
                                           within]
    _pad_tail(block, lengths)
    words = block.reshape(-1).view("<u4").reshape(m, 16)
    return _compress_chunk(words)


def md5_lower64_strings(strings) -> np.ndarray:
    """``md5_number_lower(s)`` for a batch of utf-8 strings (an Arrow
    string array, chunked array, or list of str). Vectorized for every
    string ≤ 55 utf-8 bytes; longer strings (rare) use hashlib row-wise.
    """
    arr = _strings_to_arrow(strings)
    n = len(arr)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    off_dtype = np.int64 if arr.type == pa.large_string() else np.int32
    arr_off = arr.offset
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr_off:arr_off +
                                                      n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)

    short = lengths <= MAX_SINGLE_BLOCK
    m = int(short.sum())
    if m:
        st = starts if m == n else starts[short]
        ln = lengths if m == n else lengths[short]
        res = np.empty(m, dtype=np.uint64)
        block = np.zeros((min(m, _CHUNK), 64), dtype=np.uint8)
        for lo in range(0, m, _CHUNK):
            hi = min(lo + _CHUNK, m)
            res[lo:hi] = _strings_chunk(st[lo:hi], ln[lo:hi], data,
                                        block[:hi - lo])
        if m == n:
            out = res
        else:
            out[short] = res
    if m < n:
        for i in np.nonzero(~short)[0]:
            dig = hashlib.md5(
                data[starts[i]:starts[i] + lengths[i]].tobytes()).digest()
            out[i] = int.from_bytes(dig[8:], "little")
    return out
