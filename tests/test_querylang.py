"""Boolean query language (pipelines/querylang.py): parser AST shape,
precedence, syntax errors, and end-to-end evaluation over a built index
vs a brute-force Python reference evaluator."""

import numpy as np
import pyarrow as pa
import pytest

from ts_type_filter_ray.pipelines.flagship import identity_stemmer
from ts_type_filter_ray.pipelines.querylang import (And, Contains, Fuzzy,
                                                    Not, Or, Phrase, Prefix,
                                                    QuerySyntaxError, Suffix,
                                                    Term, evaluate,
                                                    parse_query)

DOCS = [
    "the fast key order sort",            # 0
    "order fast order fast order",        # 1
    "batch batch batch stream",           # 2
    "",                                   # 3
    "Fast ORDER fast",                    # 4
    "solo sorting",                       # 5
    "keys fastest batch",                 # 6
    "stream sort order",                  # 7
]


# -- parser ---------------------------------------------------------------


def test_ast_shapes():
    assert parse_query("fast") == Term("fast")
    assert parse_query("fa*") == Prefix("fa")
    assert parse_query("*st") == Suffix("st")
    assert parse_query("*as*") == Contains("as")
    assert parse_query("fst~1") == Fuzzy("fst", 1)
    assert parse_query('"order fast"') == Phrase("order fast")
    # precedence: AND binds tighter than OR; NOT tighter than AND
    assert parse_query("a OR b AND c") == Or(
        (Term("a"), And((Term("b"), Term("c")))))
    assert parse_query("a AND NOT b") == And((Term("a"), Not(Term("b"))))
    assert parse_query("(a OR b) AND c") == And(
        (Or((Term("a"), Term("b"))), Term("c")))
    # lowercase and/or/not are plain terms, not operators
    assert parse_query("a AND and") == And((Term("a"), Term("and")))


@pytest.mark.parametrize("bad", [
    "", "a b", "a AND", "OR a", "a AND (b", "a)", "*", "a**b", "a~x",
    '"" AND a', "a ~1",
])
def test_syntax_errors(bad):
    with pytest.raises(QuerySyntaxError):
        parse_query(bad)


# -- evaluation -----------------------------------------------------------


@pytest.fixture(scope="module")
def lang_index(tmp_path_factory, ray_session):
    import ray.data as rd

    from ts_type_filter_ray.pipelines.build import build_index
    from ts_type_filter_ray.pipelines.positional import (
        PositionalSearcher, build_positional_index)
    from ts_type_filter_ray.pipelines.query import LocalSearcher

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array(DOCS, type=pa.string()),
    })).repartition(3)
    base = tmp_path_factory.mktemp("langidx")
    idx = build_index(corpus, str(base / "bool"), doc_part_bits=2,
                      num_term_buckets=4, tokenize_batch_size=2,
                      stemmer=identity_stemmer)
    pos = build_positional_index(corpus, str(base / "pos"),
                                 num_term_buckets=4, doc_part_bits=2,
                                 batch_size=2)
    return (idx, LocalSearcher(idx, stemmer=identity_stemmer),
            PositionalSearcher(pos))


def _ref_lev(a, b):
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[lb]


def _doc_terms():
    return [set(t.lower().split()) for t in DOCS]


def _ref_eval(node):
    terms = _doc_terms()

    def docs_where(pred):
        return {d for d, ts in enumerate(terms) if any(pred(t) for t in ts)}

    if isinstance(node, Term):
        return docs_where(lambda t: t == node.text.lower())
    if isinstance(node, Prefix):
        return docs_where(lambda t: t.startswith(node.text.lower()))
    if isinstance(node, Suffix):
        return docs_where(lambda t: t.endswith(node.text.lower()))
    if isinstance(node, Contains):
        return docs_where(lambda t: node.text.lower() in t)
    if isinstance(node, Fuzzy):
        return docs_where(
            lambda t: _ref_lev(node.text.lower(), t) <= node.max_dist)
    if isinstance(node, Phrase):
        p = node.text.lower().split()
        out = set()
        for d, text in enumerate(DOCS):
            t = text.lower().split()
            if any(t[i:i + len(p)] == p
                   for i in range(len(t) - len(p) + 1)):
                out.add(d)
        return out
    if isinstance(node, Or):
        out = set()
        for c in node.children:
            out |= _ref_eval(c)
        return out
    if isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        cur = _ref_eval(pos[0])
        for c in pos[1:]:
            cur &= _ref_eval(c)
        for c in neg:
            cur -= _ref_eval(c)
        return cur
    raise AssertionError(node)


EXPRS = [
    "fast",
    "fast AND order",
    "fast OR batch",
    "fast AND NOT order",
    "(fast OR batch) AND stream",
    "sort* AND NOT solo",
    "*est* OR *ing",
    "fst~1 OR ordr~1",
    '"order fast" AND NOT batch',
    '"batch batch batch"',
    "key* AND (fast OR fastest)",
    "so* AND NOT NOT solo",          # double negation = positive filter
    "stream AND NOT missing",
    "fast AND order AND NOT sort AND NOT missing",
]


@pytest.mark.parametrize("expr", EXPRS)
def test_evaluate_matches_reference(lang_index, expr):
    _idx, searcher, positional = lang_index
    got = evaluate(expr, searcher, positional).tolist()
    want = sorted(_ref_eval(parse_query(expr)))
    assert got == want, expr


def test_pure_negation_rejected(lang_index):
    _idx, searcher, positional = lang_index
    with pytest.raises(ValueError):
        evaluate("NOT fast", searcher, positional)
    with pytest.raises(ValueError):
        evaluate("NOT fast AND NOT order", searcher, positional)
    with pytest.raises(ValueError):
        evaluate("fast OR NOT order", searcher, positional)


def test_phrase_without_positional_is_contract_error(lang_index):
    _idx, searcher, _pos = lang_index
    with pytest.raises(ValueError):
        evaluate('"order fast"', searcher, None)


def test_pinned_applied_at_top(lang_index):
    from ts_type_filter_ray.pipelines.query import LocalSearcher

    idx, _searcher, positional = lang_index
    # pinned docs survive even failing conjunctions and negations
    pinned = LocalSearcher(idx, stemmer=identity_stemmer,
                           pinned_doc_ids={3})
    out = evaluate("fast AND NOT order", pinned, positional).tolist()
    ref = sorted(_ref_eval(parse_query("fast AND NOT order")) | {3})
    assert out == ref
    assert evaluate("missing AND fast", pinned, positional).tolist() == [3]


def test_double_negation_cancels_at_parse():
    assert parse_query("a AND NOT NOT b") == And((Term("a"), Term("b")))
    assert parse_query("NOT NOT a") == Term("a")


def test_proximity_ast():
    from ts_type_filter_ray.pipelines.querylang import Proximity
    assert parse_query('"order fast"~2') == Proximity("order fast", 2)
    assert parse_query('"order fast"~2 AND batch') == And(
        (Proximity("order fast", 2), Term("batch")))
    with pytest.raises(QuerySyntaxError):
        parse_query('"a b c"~2')     # slop needs exactly 2 terms
    with pytest.raises(QuerySyntaxError):
        parse_query('"solo"~1')


def test_proximity_evaluation(lang_index):
    _idx, searcher, positional = lang_index

    def ref_prox(a, b, w):
        out = set()
        for d, text in enumerate(DOCS):
            t = text.lower().split()
            pa_ = [i for i, x in enumerate(t) if x == a]
            pb = [i for i, x in enumerate(t) if x == b]
            if any(abs(i - j) <= w for i in pa_ for j in pb):
                out.add(d)
        return out

    for a, b, w in (("order", "fast", 1), ("fast", "sort", 3),
                    ("batch", "stream", 1), ("solo", "sorting", 1)):
        got = evaluate(f'"{a} {b}"~{w}', searcher, positional).tolist()
        assert got == sorted(ref_prox(a, b, w)), (a, b, w)
    # composes with boolean context
    got = evaluate('"order fast"~1 AND NOT batch', searcher,
                   positional).tolist()
    want = sorted(ref_prox("order", "fast", 1)
                  - _ref_eval(parse_query("batch")))
    assert got == want
    with pytest.raises(ValueError):
        evaluate('"order fast"~1', searcher, None)


def test_parser_roundtrip_fuzz():
    """Random expression trees render → parse back to the SAME AST
    (modulo double-negation cancellation, which the generator avoids)."""
    import random

    from ts_type_filter_ray.pipelines.querylang import Proximity

    rng = random.Random(99)
    WORDS = ["fast", "order", "batch", "solo", "stream", "key"]

    def leaf():
        kind = rng.randrange(7)
        w = rng.choice(WORDS)
        if kind == 0:
            return Term(w)
        if kind == 1:
            return Prefix(w[:2])
        if kind == 2:
            return Suffix(w[-2:])
        if kind == 3:
            return Contains(w[1:3])
        if kind == 4:
            return Fuzzy(w, rng.randint(0, 2))
        if kind == 5:
            return Phrase(f"{rng.choice(WORDS)} {rng.choice(WORDS)}")
        return Proximity(f"{rng.choice(WORDS)} {rng.choice(WORDS)}",
                         rng.randint(1, 4))

    def gen(depth):
        if depth == 0 or rng.random() < 0.3:
            return leaf()
        kind = rng.randrange(3)
        if kind == 0:
            return Or(tuple(gen(depth - 1)
                            for _ in range(rng.randint(2, 3))))
        if kind == 1:
            # AND with at least one positive, NOT only on non-Not children
            kids = []
            for j in range(rng.randint(2, 3)):
                c = gen(depth - 1)
                if j > 0 and rng.random() < 0.4 and not isinstance(c, Not):
                    c = Not(c)
                kids.append(c)
            return And(tuple(kids))
        return leaf()

    def render(n, parent=None):
        if isinstance(n, Term):
            return n.text
        if isinstance(n, Prefix):
            return n.text + "*"
        if isinstance(n, Suffix):
            return "*" + n.text
        if isinstance(n, Contains):
            return "*" + n.text + "*"
        if isinstance(n, Fuzzy):
            return f"{n.text}~{n.max_dist}"
        if isinstance(n, Phrase):
            return f'"{n.text}"'
        if isinstance(n, Proximity):
            return f'"{n.text}"~{n.slop}'
        if isinstance(n, Not):
            return "NOT " + render(n.child, Not)
        if isinstance(n, And):
            s = " AND ".join(render(c, And) for c in n.children)
            return f"({s})" if parent in (Not,) else s
        if isinstance(n, Or):
            s = " OR ".join(render(c, Or) for c in n.children)
            return f"({s})" if parent in (And, Not) else s
        raise AssertionError(n)

    def normalize(n):
        # parser right-nests nothing — it flattens chains; the generator
        # can nest And inside And (via gen), which parses flat. Normalize
        # both sides by flattening same-op chains.
        if isinstance(n, And):
            kids = []
            for c in map(normalize, n.children):
                kids.extend(c.children if isinstance(c, And) else [c])
            return And(tuple(kids))
        if isinstance(n, Or):
            kids = []
            for c in map(normalize, n.children):
                kids.extend(c.children if isinstance(c, Or) else [c])
            return Or(tuple(kids))
        if isinstance(n, Not):
            return Not(normalize(n.child))
        return n

    for _ in range(300):
        tree = gen(3)
        text = render(tree)
        assert normalize(parse_query(text)) == normalize(tree), text


def test_same_term_proximity_requires_two_occurrences(lang_index):
    _idx, searcher, positional = lang_index
    # 'order' twice within 2 only in doc 1 ("order fast order fast
    # order"); single occurrences must not self-match
    assert evaluate('"order order"~2', searcher, positional).tolist() \
        == [1]
    assert evaluate('"solo solo"~3', searcher, positional).tolist() == []


def test_field_ast():
    from ts_type_filter_ray.pipelines.querylang import Field, FieldPrefix
    assert parse_query("lang:en") == Field("lang", "en")
    assert parse_query("source:src1*") == FieldPrefix("source", "src1")
    assert parse_query("lang:en AND fast") == And(
        (Field("lang", "en"), Term("fast")))
    with pytest.raises(QuerySyntaxError):
        parse_query("lang:e*n")
    with pytest.raises(QuerySyntaxError):
        parse_query("lang:en~1")


def test_field_evaluation(lang_index, tmp_path_factory, ray_session):
    """Field filters answered from a facet-as-term metadata index,
    composed with content terms."""
    import pyarrow as pa
    import ray.data as rd

    from ts_type_filter_ray.pipelines.build import build_index
    from ts_type_filter_ray.pipelines.query import LocalSearcher

    idx, searcher, positional = lang_index
    langs = ["en", "de", "en", "fr", "EN", "de", "en", "fr"]
    meta = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "content": pa.array([f"lang:{la}" for la in langs],
                            type=pa.string()),
    })).repartition(2)
    root = str(tmp_path_factory.mktemp("metaidx") / "idx")
    fields = LocalSearcher(
        build_index(meta, root, doc_part_bits=2, num_term_buckets=2,
                    stemmer=identity_stemmer),
        stemmer=identity_stemmer)

    def lang_docs(*vals):
        return {d for d, la in enumerate(langs) if la.lower() in vals}

    cases = [
        ("lang:en", lang_docs("en")),
        ("lang:EN", lang_docs("en")),           # value lowercased
        ("lang:de OR lang:fr", lang_docs("de", "fr")),
        ("lang:e*", lang_docs("en")),           # value prefix
        ("fast AND lang:en", lang_docs("en")
         & _ref_eval(parse_query("fast"))),
        ("fast AND NOT lang:en", _ref_eval(parse_query("fast"))
         - lang_docs("en")),
    ]
    for expr, want in cases:
        got = evaluate(expr, searcher, positional, fields=fields).tolist()
        assert got == sorted(want), expr
    with pytest.raises(ValueError, match="metadata index"):
        evaluate("lang:en", searcher, positional)


def test_synonym_expansion(lang_index):
    _idx, searcher, positional = lang_index
    syn = {"fast": ["fastest", "quick"], "order": ["sort"],
           "solo": ["missing_syn"]}

    def docs(*terms):
        out = set()
        for t in terms:
            out |= _ref_eval(parse_query(t))
        return out

    cases = [
        ("fast", docs("fast", "fastest")),
        ("order AND NOT batch",
         docs("order", "sort") - docs("batch")),
        ("solo", docs("solo")),                      # absent syn harmless
        ("fast AND order", docs("fast", "fastest")
         & docs("order", "sort")),
        ("fa*", docs("fa*")),                        # wildcards unexpanded
    ]
    for expr, want in cases:
        got = evaluate(expr, searcher, positional, synonyms=syn).tolist()
        assert got == sorted(want), expr
    # no map → no expansion
    assert evaluate("fast", searcher, positional).tolist() == \
        sorted(docs("fast"))


def test_slop_zero_is_exact_phrase(ray_session):
    """'"a b"~0' must behave as the exact phrase (Lucene semantics) —
    Proximity(0) would demand two distinct terms at one position and
    silently match nothing (review finding)."""
    from ts_type_filter_ray.pipelines.querylang import (Phrase,
                                                        parse_query)
    node = parse_query('"hash join"~0')
    assert isinstance(node, Phrase)
    assert node.text == "hash join"
