"""CLI entry points mirroring the reference's ``query.sh`` / ``stats.sh``
samples (``samples/inverted_index/query.py``, ``stats.py`` — SURVEY.md
§3.1/§3.2) plus ``build``:

  python -m ts_type_filter_ray build  --corpus DIR --out INDEX [--shards N]
  python -m ts_type_filter_ray query  INDEX "terms ..." [--bm25] [-k K] [--highlight --corpus DIR]
  python -m ts_type_filter_ray stats  INDEX [--top N]

Owns its Ray session (guarded init — the driver/test contract forbids
library code from calling ray.init, but a CLI run is standalone).
"""

from __future__ import annotations

import argparse
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray
    if not ray.is_initialized():
        # honor RAY_ADDRESS so `ray job submit` runs attach to the
        # cluster's GCS; num_cpus is only legal when starting local Ray
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if addr == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=addr, **kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def df_table(index, limit: int | None = None) -> list[tuple[str, int]]:
    """Global (term, df) sorted (df desc, term asc) — the reference's
    word-frequency table (``inverted_index.py:148-153``) with the
    deterministic tie-break. Reads the persisted column-pruned per-bucket
    ``_df.parquet`` tables and sorts in Arrow — only the printed rows
    ever become Python objects (no vocab-sized dicts on the driver)."""
    import pyarrow.compute as pc
    from .pipelines.serve import load_global_df
    tbl = load_global_df(index)
    order = pc.sort_indices(tbl, sort_keys=[("df", "descending"),
                                            ("term", "ascending")])
    if limit:
        order = order[:limit]
    out = tbl.take(order)
    return list(zip(out["term"].to_pylist(), out["df"].to_pylist()))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ts_type_filter_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from a parquet corpus dir")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--shards", type=int, default=0,
                   help=">0: checkpointed sharded build (resumable)")
    b.add_argument("--buckets", type=int, default=32)

    e = sub.add_parser("extend",
                       help="add a parquet corpus dir to an existing index")
    e.add_argument("--corpus", required=True)
    e.add_argument("--index", required=True)

    cp = sub.add_parser("compact",
                        help="collapse extension segments to one file per "
                             "bucket (tightens pruning; results unchanged) "
                             "and purge any delete tombstones")
    cp.add_argument("index")
    cp.add_argument("--if-needed", action="store_true",
                    help="tiered policy: compact only when segments > "
                         "--max-segments or tombstones exceed "
                         "--max-tombstone-fraction of docs")
    cp.add_argument("--max-segments", type=int, default=4)
    cp.add_argument("--max-tombstone-fraction", type=float, default=0.2)

    mg = sub.add_parser("merge",
                        help="merge independently built shard indexes "
                             "into one (doc ids re-based shard by shard; "
                             "equals a fresh build over the concatenation)")
    mg.add_argument("--shards", required=True,
                    help="comma-separated shard index roots, in id order")
    mg.add_argument("--out", required=True)

    dl = sub.add_parser("delete",
                        help="tombstone doc ids (invisible immediately; "
                             "stats frozen until compact purges)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", required=True,
                    help="comma-separated doc ids, e.g. 3,17,42")

    q = sub.add_parser("query", help="boolean or BM25 query an index")
    q.add_argument("index")
    q.add_argument("terms")
    q.add_argument("--bm25", action="store_true")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--highlight", action="store_true")
    q.add_argument("--corpus", help="corpus dir (needed for --highlight)")

    se = sub.add_parser(
        "search",
        help="boolean EXPRESSION search: AND/OR/NOT, parens, pre*/*suf/"
             "*in* wildcards, term~d fuzzy, numeric ranges "
             "'field:[lo TO hi]' when the index has a numeric sidecar "
             "(quoted phrases need a positional index — not available "
             "here)")
    se.add_argument("index")
    se.add_argument("expr")
    se.add_argument("--rank", metavar="QUERY",
                    help="BM25-rank the expression's match set by QUERY "
                         "(filter + rank)")
    se.add_argument("-k", type=int, default=10)

    co = sub.add_parser("correct",
                        help='spell correction ("did you mean"): top-k '
                             "vocabulary terms by (distance, df)")
    co.add_argument("index")
    co.add_argument("token")
    co.add_argument("--max-dist", type=int, default=2)
    co.add_argument("-k", type=int, default=3)

    pb = sub.add_parser("posbuild",
                        help="build a POSITIONAL (phrase/proximity) index "
                             "from a parquet corpus dir")
    pb.add_argument("--corpus", required=True)
    pb.add_argument("--out", required=True)

    ph = sub.add_parser("phrase",
                        help="phrase containment over a positional index; "
                             "--near W makes a 2-term query a proximity "
                             "(|dpos| <= W) match; --snippet W prints each "
                             "doc's best W-token window")
    ph.add_argument("index")
    ph.add_argument("phrase")
    ph.add_argument("--near", type=int, metavar="W")
    ph.add_argument("--window", type=int, metavar="N",
                    help="ordered window (#odN): all terms in order, "
                         "every adjacent gap <= N (1 = exact phrase)")
    ph.add_argument("--snippet", type=int, metavar="W")

    pe = sub.add_parser(
        "percolate",
        help="reverse search: classify every corpus doc by a file of "
             "stored rules in ONE streaming pass, no index (boolean "
             "expressions incl. phrases, proximity, wildcards, ~d "
             "fuzzy, field:value and numeric ranges over the corpus's "
             "own columns; pure NOT is legal here)")
    pe.add_argument("--corpus", required=True)
    pe.add_argument("--rules", required=True,
                    help="file of 'rule_id<TAB>expression' lines "
                         "(# comments and blank lines ignored)")
    pe.add_argument("--counts", action="store_true",
                    help="print per-rule match counts instead of pairs")

    st = sub.add_parser("stats", help="print index statistics")
    st.add_argument("index")
    st.add_argument("--top", type=int, default=20)

    fs = sub.add_parser(
        "fsck", help="verify index integrity (postings recount, df "
                     "tables, doc-id uniqueness; --corpus also verifies "
                     "the per-row sha256 invariant)")
    fs.add_argument("index")
    fs.add_argument("--corpus", help="parquet corpus dir to re-hash")

    ex = sub.add_parser(
        "export", help="decode the index to (term, doc_id, tf) parquet "
                       "triples (the interchange dump)")
    ex.add_argument("index")
    ex.add_argument("--out", required=True)

    ck = sub.add_parser(
        "checksum", help="order-insensitive corpus checksum "
                         "(per-row md5-64 XOR; equal corpora => equal "
                         "checksums regardless of row/partition order)")
    ck.add_argument("corpus")

    df = sub.add_parser(
        "diff", help="snapshot diff: added/removed/changed doc ids "
                     "between two parquet corpus dirs")
    df.add_argument("corpus_a")
    df.add_argument("corpus_b")
    df.add_argument("--limit", type=int, default=20,
                    help="changed rows to print (counts are always full)")

    dsp = sub.add_parser(
        "dupspans", help="ExactSubstr duplicate-span report (Lee et al. "
                         "2022): per-corpus duplication summary; --strip "
                         "writes the span-removed corpus")
    dsp.add_argument("corpus")
    dsp.add_argument("--k", type=int, default=5,
                     help="token n-gram window (default 5)")
    dsp.add_argument("--strip", action="store_true")
    dsp.add_argument("--out", help="output parquet dir for --strip")

    args = ap.parse_args(argv)
    _ensure_ray(args.num_cpus)

    from .pipelines.build import BuiltIndex, build_index
    from .pipelines.query import LocalSearcher, highlight
    from .sources.corpus import read_corpus

    if args.cmd in ("query", "stats", "search", "correct", "phrase",
                    "fsck") and \
            not os.path.exists(os.path.join(args.index, "stats.json")):
        print(f"error: no index at {args.index!r} (missing stats.json)",
              file=sys.stderr)
        return 2

    if args.cmd == "build":
        if args.shards > 0:
            from .state.manifest import build_index_checkpointed
            idx = build_index_checkpointed(args.corpus, args.out,
                                           num_shards=args.shards,
                                           num_term_buckets=args.buckets)
            if idx is None:
                print("build interrupted; re-run to resume")
                return 1
        else:
            idx = build_index(read_corpus(args.corpus), args.out,
                              num_term_buckets=args.buckets)
        s = idx.stats
        print(f"built {s.num_documents} docs, {s.num_unique_terms} terms, "
              f"{s.num_postings} postings -> {args.out}")
        return 0

    if args.cmd == "extend":
        from .pipelines.build import extend_index
        if not os.path.exists(os.path.join(args.index, "stats.json")):
            print(f"error: no index at {args.index!r} (missing stats.json)",
                  file=sys.stderr)
            return 2
        idx = extend_index(args.index, read_corpus(args.corpus))
        s = idx.stats
        print(f"extended to {s.num_documents} docs, "
              f"{s.num_unique_terms} terms, {s.num_postings} postings "
              f"({s.num_segments} segments) -> {args.index}")
        return 0

    if args.cmd == "compact":
        from .pipelines.build import compact_index, maybe_compact
        if not os.path.exists(os.path.join(args.index, "stats.json")):
            print(f"error: no index at {args.index!r} (missing stats.json)",
                  file=sys.stderr)
            return 2
        if args.if_needed:
            did, idx = maybe_compact(
                args.index, max_segments=args.max_segments,
                max_tombstone_fraction=args.max_tombstone_fraction)
            if not did:
                s = idx.stats
                print(f"no compaction needed ({s.num_segments} segments)")
                return 0
        else:
            idx = compact_index(args.index)
        s = idx.stats
        print(f"compacted to 1 segment: {s.num_documents} docs, "
              f"{s.num_unique_terms} terms, {s.num_postings} postings")
        return 0

    if args.cmd == "merge":
        from .pipelines.build import merge_index_roots
        roots = [r.strip() for r in args.shards.split(",") if r.strip()]
        for r in roots:
            if not os.path.exists(os.path.join(r, "stats.json")):
                print(f"error: no index at {r!r} (missing stats.json)",
                      file=sys.stderr)
                return 2
        idx = merge_index_roots(roots, args.out)
        s = idx.stats
        print(f"merged {len(roots)} shards: {s.num_documents} docs, "
              f"{s.num_unique_terms} terms, {s.num_postings} postings "
              f"-> {args.out}")
        return 0

    if args.cmd == "delete":
        from .pipelines.build import delete_docs, load_tombstones
        if not os.path.exists(os.path.join(args.index, "stats.json")):
            print(f"error: no index at {args.index!r} (missing stats.json)",
                  file=sys.stderr)
            return 2
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
        delete_docs(args.index, ids)
        print(f"tombstoned {len(set(ids))} doc ids "
              f"({load_tombstones(args.index).size} total pending purge); "
              f"run compact to reclaim")
        return 0

    if args.cmd == "export":
        from .pipelines.build import export_postings
        if not os.path.exists(os.path.join(args.index, "stats.json")):
            print(f"error: no index at {args.index!r} (missing stats.json)",
                  file=sys.stderr)
            return 2
        ds = export_postings(args.index)
        ds.write_parquet(args.out)
        print(f"exported postings triples -> {args.out}")
        return 0

    if args.cmd in ("checksum", "diff", "dupspans"):
        from .sources.corpus import read_corpus_docs as _docs_ds

        if args.cmd == "checksum":
            from .functions.snapshot import corpus_checksum
            row = corpus_checksum(_docs_ds(args.corpus)).take_all()[0]
            print(f"n_docs: {row['n_docs']}")
            print(f"checksum: {row['checksum']:016x}")
            return 0

        if args.cmd == "diff":
            from .functions.snapshot import corpus_diff
            rows = corpus_diff(_docs_ds(args.corpus_a),
                               _docs_ds(args.corpus_b)).take_all()
            from collections import Counter
            counts = Counter(r["status"] for r in rows)
            for status in ("added", "removed", "changed"):
                print(f"{status}: {counts.get(status, 0)}")
            for r in rows[:args.limit]:
                print(f"{r['status']}\t{r['doc_id']}")
            if len(rows) > args.limit:
                print(f"... {len(rows) - args.limit} more")
            return 0

        # dupspans
        from .functions.ngrams import dup_token_spans, strip_dup_spans
        if args.strip:
            if not args.out:
                print("error: --strip requires --out", file=sys.stderr)
                return 2
            out_ds = strip_dup_spans(_docs_ds(args.corpus),
                                     shingle_k=args.k)
            out_ds.write_parquet(args.out)
            print(f"span-stripped corpus -> {args.out}")
            return 0
        rows = dup_token_spans(_docs_ds(args.corpus),
                               shingle_k=args.k).take_all()
        n_flag = len(rows)
        tot_dup = sum(r["n_dup_tokens"] for r in rows)
        tot_tok = sum(r["n_tokens"] for r in rows)
        max_span = max((r["max_dup_span"] for r in rows), default=0)
        print(f"docs with duplicated spans (k={args.k}): {n_flag}")
        print(f"duplicated tokens in flagged docs: {tot_dup}/{tot_tok}")
        print(f"longest duplicated span: {max_span} tokens")
        return 0

    if args.cmd == "fsck":
        from .pipelines.fsck import fsck_index
        corpus = read_corpus(args.corpus) if args.corpus else None
        report = fsck_index(args.index, corpus).to_pylist()[0]
        for key, val in report.items():
            print(f"{key}: {val}")
        return 0 if report["ok"] else 1

    if args.cmd == "percolate":
        from .pipelines.percolate import percolate
        from .pipelines.querylang import QuerySyntaxError
        rules: list[tuple[str, str]] = []
        with open(args.rules) as f:
            for ln, line in enumerate(f, 1):
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rid, _, expr = line.partition("\t")
                if not expr.strip():
                    print(f"error: {args.rules}:{ln}: expected "
                          "'rule_id<TAB>expression'", file=sys.stderr)
                    return 2
                rules.append((rid.strip(), expr.strip()))
        if not rules:
            print("error: no rules in file", file=sys.stderr)
            return 2
        try:
            out = percolate(read_corpus(args.corpus), rules).to_pandas()
        except (QuerySyntaxError, ValueError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        if args.counts:
            counts = out.groupby("query_id").size()
            for rid, _expr in rules:
                print(f"{rid}\t{int(counts.get(rid, 0))}")
        else:
            for row in out.sort_values(
                    ["query_id", "doc_id"]).itertuples(index=False):
                print(f"{row.query_id}\t{row.doc_id}")
        return 0

    if args.cmd == "query":
        searcher = LocalSearcher(BuiltIndex.load(args.index))
        if args.bm25:
            for doc_id, score in searcher.bm25(args.terms, k=args.k):
                print(f"{doc_id}\t{score:.6f}")
        else:
            ids = searcher.match(args.terms)
            print(f"Found {ids.size} matches.")
            if args.highlight and args.corpus:
                import pyarrow as pa
                import pyarrow.compute as pc_
                id_set = pa.array(ids, type=pa.int64())

                def keep(batch):
                    return batch.filter(
                        pc_.is_in(batch["doc_id"], value_set=id_set))

                tbl = (read_corpus(args.corpus)
                       .map_batches(keep, batch_format="pyarrow")
                       .to_pandas())
                for _, row in tbl.sort_values("doc_id").iterrows():
                    print(f"--- doc {row['doc_id']} ({row['path']}) ---")
                    print(highlight(args.terms, row["content"]))
            else:
                print(" ".join(map(str, ids.tolist())))
        return 0

    if args.cmd == "posbuild":
        from .pipelines.positional import build_positional_index
        idx = build_positional_index(read_corpus(args.corpus), args.out)
        print(f"built positional index: {idx.num_documents} docs, "
              f"{idx.num_terms} terms, {idx.num_positions} positions "
              f"-> {args.out}")
        return 0

    if args.cmd == "phrase":
        from .pipelines.positional import (PositionalIndex,
                                           PositionalSearcher)
        s = PositionalSearcher(PositionalIndex.load(args.index))
        if args.near is not None and args.window is not None:
            print("error: --near and --window are exclusive",
                  file=sys.stderr)
            return 2
        if args.near is not None:
            terms = args.phrase.split()
            if len(terms) != 2:
                print("error: --near needs exactly two terms",
                      file=sys.stderr)
                return 2
            ids = s.proximity(terms[0], terms[1], args.near)
        elif args.window is not None:
            ids = s.ordered_window(args.phrase, args.window)
        else:
            ids = s.phrase(args.phrase)
        print(f"Found {ids.size} matches.")
        print(" ".join(map(str, ids.tolist())))
        if args.snippet and ids.size:
            for doc_id, start, distinct, hits in s.best_windows(
                    args.phrase, args.snippet, ids.tolist()):
                print(f"doc {doc_id}: tokens [{start}, "
                      f"{start + args.snippet}) — {distinct} terms, "
                      f"{hits} hits")
        return 0

    if args.cmd == "search":
        from .pipelines.querylang import QuerySyntaxError, evaluate
        searcher = LocalSearcher(BuiltIndex.load(args.index))
        # numeric range atoms (n:[lo TO hi]) work when the index carries
        # a numeric sidecar (build_numeric_index under the same root)
        numeric = None
        if os.path.isdir(os.path.join(args.index, "_numeric")):
            from .pipelines.numeric import NumericIndex
            numeric = NumericIndex(args.index)
        try:
            ids = evaluate(args.expr, searcher, numeric=numeric)
        except (QuerySyntaxError, ValueError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        if args.rank:
            for doc_id, score in searcher.bm25(args.rank, k=args.k,
                                               allowed=ids):
                print(f"{doc_id}\t{score:.6f}")
        else:
            print(f"Found {ids.size} matches.")
            print(" ".join(map(str, ids.tolist())))
        return 0

    if args.cmd == "correct":
        searcher = LocalSearcher(BuiltIndex.load(args.index))
        for term, dist, df in searcher.suggest_correction(
                args.token, args.max_dist, args.k):
            print(f"{term}\t{dist}\t{df}")
        return 0

    if args.cmd == "stats":
        idx = BuiltIndex.load(args.index)
        s = idx.stats
        # reference output shape (inverted_index.py:143-153)
        print(f"Number of documents: {s.num_documents}")
        print(f"Number of unique words: {s.num_unique_terms}")
        print(f"Number of postings: {s.num_postings}")
        print()
        print("Word Frequency Table:")
        for term, df in df_table(idx, args.top):
            print(f"{term}: {df}")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
