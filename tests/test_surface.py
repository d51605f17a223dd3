"""Extension-surface parity: injectable breaker/stemmer, highlight,
pipeline specs, fenced-JSON extraction, windowed event operators."""

import duckdb
import pytest
import ray.data as rd

from ts_type_filter_ray.functions import events
from ts_type_filter_ray.functions.textstats import extract_fenced_json
from ts_type_filter_ray.oracle.index import Index
from ts_type_filter_ray.pipelines.build import build_index
from ts_type_filter_ray.pipelines.query import (LocalSearcher, highlight,
                                                highlight_matches)
from ts_type_filter_ray.pipelines.spec import PipelineSpec
from ts_type_filter_ray.sources.corpus import read_corpus

SF = "/root/testdata/sf0.001"


class IdentityStemmer:
    def stem(self, word):
        return word


def test_injectable_stemmer_oracle():
    # duck-typed stemmer contract (inverted_index.py:36-39)
    idx = Index(stemmer=IdentityStemmer())
    idx.add("Running dogs")
    assert idx.match("Running") == ["Running dogs"]
    assert idx.match("run") == []  # no stemming with identity


def test_injectable_stemmer_engine(ray_session, sonnets_corpus_dir,
                                   tmp_path_factory):
    out = tmp_path_factory.mktemp("ident_idx")
    ident = lambda w: w  # noqa: E731
    idx = build_index(read_corpus(sonnets_corpus_dir), str(out),
                      doc_part_bits=8, num_term_buckets=8,
                      stemmer=ident)
    # identity stemming: "thralled" no longer matches "thrall"
    # (the searcher takes the same injected stemmer as the build)
    s = LocalSearcher(idx, stemmer=ident)
    assert s.match("thrall").size == 0
    assert s.match("thralled").size == 1


def test_highlight():
    out = highlight("fire", "the fire burns fires bright")
    assert "[bold green]fire[/bold green]" in out
    assert "[bold green]fires[/bold green]" in out
    assert "burns" in out and "[bold green]burns" not in out


def test_highlight_matches_pipeline(ray_session, sonnets_corpus_dir,
                                    tmp_path_factory):
    out = tmp_path_factory.mktemp("hl_idx")
    corpus = read_corpus(sonnets_corpus_dir)
    idx = build_index(corpus, str(out), doc_part_bits=8, num_term_buckets=8)
    rows = highlight_matches(idx, read_corpus(sonnets_corpus_dir),
                             "fire").take_all()
    assert rows
    assert any("[bold green]fire[/bold green]" in r["content"] for r in rows)


def test_pipeline_spec(ray_session):
    ds = rd.from_items([{"x": i} for i in range(10)])

    def double(ds, times=1):
        for _ in range(times):
            ds = ds.map_batches(lambda b: {"x": b["x"] * 2},
                                batch_format="numpy")
        return ds

    def head(ds, n=3):
        return ds.limit(n)

    spec = PipelineSpec({"double": double, "head": head},
                        config={"double": {"times": 1}})
    trace = []
    out = spec.run(ds, overrides={"head.n": 2, "double.times": 2}, trace=trace)
    assert trace == ["double", "head"]
    vals = sorted(r["x"] for r in out.take_all())
    assert len(vals) == 2 and all(v % 4 == 0 for v in vals)
    with pytest.raises(KeyError):
        spec.run(ds, overrides={"nope.k": 1})


def test_extract_fenced_json():
    assert extract_fenced_json('```json\n{"a": 1}\n```') == {"a": 1}
    assert extract_fenced_json('```\n[1, 2]\n```') == [1, 2]
    assert extract_fenced_json('{"b": 2}') == {"b": 2}


def test_tumbling_window_vs_sql(ray_session):
    ds = rd.read_parquet(f"{SF}/events.parquet")
    got = {(r["user_id"], r["window_start"]):
           (r["n_events"], r["value_cents"], r["first_event"], r["last_event"])
           for r in events.tumbling_window_agg(ds, 3600).take_all()}
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{SF}/events.parquet'")
    exp = {(u, w): (n, v, f, l) for u, w, n, v, f, l in
           con.sql(events.TUMBLING_HOUR_SQL).fetchall()}
    assert got == exp


def test_sessionize_vs_sql(ray_session):
    ds = rd.read_parquet(f"{SF}/events.parquet")
    got = {r["user_id"]: (r["n_sessions"], r["n_events"],
                          r["max_session_events"])
           for r in events.sessionize(ds, 1800).take_all()}
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{SF}/events.parquet'")
    exp = {u: (s, n, m) for u, s, n, m in
           con.sql(events.SESSIONIZE_SQL.format(gap=1800)).fetchall()}
    assert got == exp


def test_hopping_window_covers_each_event_k_times(ray_session):
    """Every event must land in exactly window/hop windows, each with a
    hop-aligned start s where s <= t < s + window."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    ts = [dt.datetime(2024, 1, 1, 0, 7), dt.datetime(2024, 1, 1, 1, 2)]
    tbl = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array([5, 5], type=pa.int64()),
        "event_type": pa.array(["a", "a"]),
        "value": pa.array([1.0, 2.0], type=pa.float64()),
        "props": pa.array(["{}", "{}"]),
    })
    out = events.hopping_window_agg(rd.from_arrow(tbl), window_sec=3600,
                                    hop_sec=900).take_all()
    # event 1 at 00:07 → windows 00:00, 23:45, 23:30, 23:15 (prev day)
    # event 2 at 01:02 → windows 01:00, 00:45, 00:30, 00:15
    assert len(out) == 8
    for r in out:
        s = r["window_start"]
        assert s.minute % 15 == 0 and r["n_events"] == 1
    cents = {r["window_start"].isoformat(): r["value_cents"] for r in out}
    assert cents["2024-01-01T01:00:00"] == 200
    assert cents["2024-01-01T00:00:00"] == 100


def test_value_percentiles_disc_semantics(ray_session):
    """percentile_disc semantics: 1-based index ceil(p*n) into sorted
    values; negative cents and single-row types must work."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    vals = {"a": [0.10, 0.20, 0.30, 0.40], "b": [-1.25]}
    rows = [(t, v) for t, vs in vals.items() for v in vs]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([dt.datetime(2024, 1, 1)] * len(rows),
                       type=pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), type=pa.int64()),
        "event_type": pa.array([r[0] for r in rows]),
        "value": pa.array([r[1] for r in rows], type=pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    out = {r["event_type"]: r for r in
           events.event_value_percentiles(rd.from_arrow(tbl)).take_all()}
    assert out["a"]["p50_c"] == 20 and out["a"]["p90_c"] == 40 \
        and out["a"]["p99_c"] == 40 and out["a"]["n_events"] == 4
    assert out["b"]["p50_c"] == -125 and out["b"]["n_events"] == 1
