"""Corpus-wide line dedup: naive reference, goldens, edge cases, fuzz."""

import random

import pyarrow as pa
import ray.data as rd

from ts_type_filter_ray.functions.linededup import dedup_lines


def naive_dedup_lines(texts, min_chars=1):
    """First occurrence by (doc_id, line_idx) wins; short lines exempt."""
    first = {}
    for d, t in enumerate(texts):
        for i, ln in enumerate(t.split("\n")):
            if len(ln) >= min_chars and ln not in first:
                first[ln] = (d, i)
    out = []
    for d, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for i, ln in enumerate(lines)
                if len(ln) < min_chars or first[ln] == (d, i)]
        out.append({"doc_id": d, "text": "\n".join(kept),
                    "n_lines": len(lines),
                    "n_removed": len(lines) - len(kept)})
    return out


def _run(texts, min_chars=1, num_parts=4):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    }))
    rows = dedup_lines(ds, min_chars=min_chars,
                       num_parts=num_parts).take_all()
    return sorted(rows, key=lambda r: r["doc_id"])


def test_cross_doc_first_wins(ray_session):
    texts = ["header\nbody one\nfooter",
             "header\nbody two\nfooter",
             "body one\nheader"]
    got = _run(texts)
    assert got == naive_dedup_lines(texts)
    # doc 0 keeps everything; doc 1 loses header+footer; doc 2 loses both
    assert got[0]["text"] == "header\nbody one\nfooter"
    assert got[1]["text"] == "body two"
    assert got[1]["n_removed"] == 2
    assert got[2]["text"] == ""
    assert got[2]["n_lines"] == 2


def test_same_doc_repeat_removed(ray_session):
    texts = ["la\nla\nla\nother"]
    got = _run(texts)
    assert got[0]["text"] == "la\nother"
    assert got[0]["n_removed"] == 2


def test_blank_lines_always_survive(ray_session):
    texts = ["a\n\nb\n\na", "c\n\n\nc"]
    got = _run(texts)
    assert got == naive_dedup_lines(texts)
    assert got[0]["text"] == "a\n\nb\n"          # trailing dup 'a' removed
    assert got[1]["text"] == "c\n\n"             # blanks kept, dup 'c' gone


def test_min_chars_exempts_short_lines(ray_session):
    texts = ["ok\nlong line here", "ok\nlong line here\nok"]
    got = _run(texts, min_chars=3)
    assert got == naive_dedup_lines(texts, min_chars=3)
    # 'ok' (2 chars) exempt everywhere; the long line dedups
    assert got[1]["text"] == "ok\nok"


def test_empty_and_single_line_docs(ray_session):
    texts = ["", "solo", "solo", ""]
    got = _run(texts)
    assert got == naive_dedup_lines(texts)
    assert got[0] == {"doc_id": 0, "text": "", "n_lines": 1,
                      "n_removed": 0}
    assert got[2]["text"] == ""
    assert got[2]["n_removed"] == 1


def test_fuzz_matches_naive(ray_session):
    rng = random.Random(11)
    pool = ["alpha", "beta", "gamma", "", "x", "yy", "the end",
            "lorem ipsum", "zz top"]
    for trial in range(5):
        texts = ["\n".join(rng.choice(pool)
                           for _ in range(rng.randint(0, 8)))
                 for _ in range(rng.randint(1, 25))]
        mc = rng.choice([1, 2, 3])
        got = _run(texts, min_chars=mc,
                   num_parts=rng.choice([1, 2, 8]))
        assert got == naive_dedup_lines(texts, min_chars=mc), (
            trial, mc, texts)


def test_paragraph_granularity(ray_session):
    """delimiter='\\n\\n' dedups whole paragraphs: a repeated paragraph
    survives only at its first (doc_id, idx) occurrence, and rebuilt
    text re-joins with the same delimiter."""
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.functions.linededup import dedup_lines

    boiler = "same boilerplate para"
    docs = [
        f"{boiler}\n\nunique one",
        f"another body\n\n{boiler}",
        f"{boiler}\n\n{boiler}",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(docs)}))
    out = {r["doc_id"]: r for r in
           dedup_lines(ds, delimiter="\n\n").take_all()}
    assert out[0]["text"] == f"{boiler}\n\nunique one"
    assert out[0]["n_removed"] == 0
    assert out[1]["text"] == "another body"
    assert out[1]["n_removed"] == 1
    assert out[2]["text"] == ""
    assert out[2]["n_removed"] == 2
    # newline-internal content is untouched at paragraph granularity
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["a\nb", "a\nb"])}))
    out2 = {r["doc_id"]: r["text"] for r in
            dedup_lines(ds2, delimiter="\n\n").take_all()}
    assert out2 == {0: "a\nb", 1: ""}
