"""Deterministic synthetic corpora (FIXTURES.md F1/F2).

F1: a source-code corpus in the `BASELINE.json` ``input_hint`` shape
``(repo, path, commit, lang, content)`` with extreme zipf token skew
(hot code tokens like ``import``/``def`` exercise hot-term salting),
mid-frequency identifiers, per-file singleton identifiers, punctuation
tokens (the reference breaker keeps punctuation —
``ts_type_filter/inverted_index.py:26-33``), mixed case, byte-identical
duplicate files, and occasional non-ASCII.

F2: a 154-document sonnets-analog corpus replicating the *structure* of
the reference's documented golden outputs
(``documentation/inverted-index.md:22-136``,
``samples/inverted_index/query.md``) with planted term co-occurrences.

Everything is seeded; no wall clock, no network.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------- F2 ---

_ROMAN_VALS = (
    (1000, "M"), (900, "CM"), (500, "D"), (400, "CD"), (100, "C"),
    (90, "XC"), (50, "L"), (40, "XL"), (10, "X"), (9, "IX"),
    (5, "V"), (4, "IV"), (1, "I"),
)


def roman(n: int) -> str:
    out = []
    for v, s in _ROMAN_VALS:
        while n >= v:
            out.append(s)
            n -= v
    return "".join(out)


# Golden match sets mirrored from the reference documentation:
#   "same"          -> Sonnets V, L, LXIX     (inverted-index.md:22-79)
#   "thrall quench" -> CXXIV, CLIV            (inverted-index.md:81-123)
#   "fire heat"     -> XII, XLV, LV, CXLIV, CLIII, CLIV (query.md:1-120)
GOLDEN_SAME = (5, 50, 69)
GOLDEN_THRALL_QUENCH = (124, 154)
GOLDEN_FIRE_HEAT = (12, 45, 55, 144, 153, 154)

_PLANTS: dict[int, list[str]] = {
    5: ["same"], 50: ["same"], 69: ["Same"],
    # matched only via stem-equivalent inflections (validates stemming)
    124: ["thralled"], 154: ["quenched", "fire"],
    # repeats must not duplicate postings (set semantics)
    12: ["fire", "fire", "fire"], 45: ["fires"], 55: ["heat"],
    144: ["fire", "heat"], 153: ["heated"],
}


def sonnets_analog(n_docs: int = 154, seed: int = 42) -> list[str]:
    """154 synthetic documents ``"Doc {ROMAN}\\n\\n<body>"`` with the planted
    co-occurrences above. Filler words are collision-free ``w<i>z`` tokens
    (no filler stems to same/fire/heat/thrall/quench)."""
    rng = random.Random(seed)
    docs = []
    for i in range(1, n_docs + 1):
        n_fill = rng.randint(60, 120)
        words = [f"w{rng.randint(0, 800)}z" for _ in range(n_fill)]
        for j in range(0, len(words), 9):
            if rng.random() < 0.2:
                words[j] = words[j].capitalize()
            if rng.random() < 0.15:
                words[j] += rng.choice([".", ";", ","])
        plants = _PLANTS.get(i, [])
        for p in plants:
            words.insert(rng.randrange(len(words) + 1), p)
        # break into lines of ~8 words
        lines = [" ".join(words[k:k + 8]) for k in range(0, len(words), 8)]
        docs.append(f"Doc {roman(i)}\n\n" + "\n".join(lines))
    return docs


def sonnets_corpus_table(seed: int = 42) -> pa.Table:
    """F2 mapped into the F1 corpus shape (FIXTURES.md)."""
    docs = sonnets_analog(seed=seed)
    n = len(docs)
    return pa.table({
        "repo": pa.array(["golden/sonnets"] * n),
        "path": pa.array([f"doc{i:03}.txt" for i in range(1, n + 1)]),
        "commit": pa.array(["0" * 40] * n),
        "lang": pa.array(["txt"] * n),
        "content": pa.array(docs, type=pa.large_string()),
    })


# ---------------------------------------------------------------- F1 ---

_HOT = ["import", "def", "self", "return", "class", "from", "if", "else",
        "for", "while", "in", "not", "None", "True", "False", "=", "==",
        "(", ")", "->", "{", "}", "const", "let", "function", "var",
        "public", "void", "fn", "func"]
_PUNCT = ["foo():", "by;", "x=1;", "()=>", "err!=nil", "i++;", "a[0]",
          "#!/usr/bin", "/*", "*/", "//", "..."]
_MIXED = ["Import", "DEF", "Class", "Running", "Tested", "Testing",
          "HandlerFactory", "parseJSON", "jalapeños", "naïve"]
_LANGS = ["py", "ts", "js", "go", "rs", "java"]
_LANG_W = [0.3, 0.2, 0.2, 0.12, 0.1, 0.08]


def _zipf_weights(n: int, s: float = 1.3) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def generate_corpus(out_dir: str, num_docs: int, seed: int = 42,
                    num_files: int = 8, dup_fraction: float = 0.01,
                    doc_len_range: tuple[int, int] = (20, 200),
                    vocab: str = "code") -> list[str]:
    """Write the F1 synthetic corpus as ``num_files`` parquet files under
    *out_dir*; returns the file paths (deterministic order). Idempotent:
    regenerating with the same arguments produces byte-identical content.

    ``vocab="code"`` (default) is the zipf-skewed source-code shape —
    few hot tokens dominate, which flatters per-batch unique-token
    dedup and the stem lru cache. ``vocab="high"`` is the
    realistic-entropy stress shape (VERDICT r2 #7): a 200k-identifier
    mid tier with a much flatter zipf, a smaller hot share, and a wider
    singleton/word tail, so most tokens in a batch are near-unique and
    caches stop helping."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    pyrng = random.Random(seed + 1)

    high_vocab = vocab == "high"
    n_mid = 200_000 if high_vocab else 2000
    mid = np.array([f"ident_{i}x" for i in range(n_mid)])
    hot = np.array(_HOT)
    hot_w = _zipf_weights(len(hot), 1.1)
    mid_w = _zipf_weights(n_mid, 1.05 if high_vocab else 1.3)
    punct = np.array(_PUNCT)
    mixed = np.array(_MIXED)
    word_pool = 500_000 if high_vocab else 5000

    repos = [f"org{i}/proj{j}" for i in range(8) for j in range(32)]
    repo_w = _zipf_weights(len(repos), 1.05)
    dirs = ["src", "lib", "pkg", "core", "util", "api", "cmd", "internal"]

    lens = rng.integers(doc_len_range[0], doc_len_range[1], size=num_docs)
    doc_repo = rng.choice(len(repos), size=num_docs, p=repo_w)
    doc_lang = rng.choice(len(_LANGS), size=num_docs, p=np.array(_LANG_W))

    contents: list[str] = []
    for d in range(num_docs):
        n = int(lens[d])
        n_hot = n // 8 if high_vocab else n // 2
        n_mid_t = (n - n_hot) * 2 // 3 if high_vocab else n // 3
        n_rest = n - n_hot - n_mid_t
        toks = list(hot[rng.choice(len(hot), size=n_hot, p=hot_w)])
        toks += list(mid[rng.choice(n_mid, size=n_mid_t, p=mid_w)])
        for _ in range(n_rest):
            r = pyrng.random()
            if r < 0.35:
                toks.append(f"uniq_{d}_{pyrng.randint(0, 3)}")  # singletons
            elif r < 0.6:
                toks.append(str(punct[pyrng.randrange(len(punct))]))
            elif r < 0.8:
                toks.append(str(mixed[pyrng.randrange(len(mixed))]))
            else:
                toks.append(f"word{pyrng.randint(0, word_pool)}")
        pyrng.shuffle(toks)
        lines = [" ".join(toks[k:k + 10]) for k in range(0, len(toks), 10)]
        contents.append("\n".join(lines))

    # byte-for-byte duplicate files (dup-detection path, inverted_index.py:48-50)
    n_dup = max(1, int(num_docs * dup_fraction)) if num_docs >= 10 else 0
    for k in range(n_dup):
        src = pyrng.randrange(num_docs)
        dst = pyrng.randrange(num_docs)
        if src != dst:
            contents[dst] = contents[src]

    paths_col = []
    commits = []
    hexd = "0123456789abcdef"
    for d in range(num_docs):
        depth = pyrng.randint(1, 4)
        parts = [pyrng.choice(dirs) for _ in range(depth)]
        ext = _LANGS[doc_lang[d]]
        paths_col.append("/".join(parts) + f"/file_{d}.{ext}")
        commits.append("".join(pyrng.choice(hexd) for _ in range(40)))

    table = pa.table({
        "repo": pa.array([repos[i] for i in doc_repo]),
        "path": pa.array(paths_col),
        "commit": pa.array(commits),
        "lang": pa.array([_LANGS[i] for i in doc_lang]),
        "content": pa.array(contents, type=pa.large_string()),
    })

    files = []
    per = (num_docs + num_files - 1) // num_files
    for f in range(num_files):
        chunk = table.slice(f * per, per)
        if chunk.num_rows == 0:
            break
        p = os.path.join(out_dir, f"part-{f:05d}.parquet")
        pq.write_table(chunk, p, row_group_size=1024)
        files.append(p)
    return files
