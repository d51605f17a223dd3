"""CLI entry points and tree repair cost."""

import json
import subprocess
import sys

import pytest
import ray.data as rd

from ts_type_filter_ray.functions.treediff import (RepairCostStage,
                                                   repair_cost, tree_size)


def test_tree_size():
    assert tree_size(1) == 1
    assert tree_size({"a": 1, "b": [1, 2]}) == 5


@pytest.mark.parametrize("a,b,cost", [
    (1, 1, 0),
    (1, 2, 1),
    (1, True, 1),                     # strict typing
    ({"a": 1}, {"a": 1}, 0),
    ({"a": 1}, {"a": 2}, 1),
    ({"a": 1}, {}, 1),
    ({"a": {"x": 1}}, {}, 2),
    ([1, 2], [2, 1], 0),              # bag semantics
    ([1, 2], [1], 1),
    ({"items": [{"name": "a"}]}, {"items": [{"name": "b"}]}, 1),
    ({"a": 1}, [1], 4),               # kind mismatch: sizes sum
])
def test_repair_cost(a, b, cost):
    assert repair_cost(a, b) == cost
    assert repair_cost(b, a) == cost  # symmetric


def test_repair_stage(ray_session):
    rows = [
        {"cart": json.dumps({"items": [1]}), "expected": json.dumps({"items": [1]})},
        {"cart": json.dumps({"items": [1]}), "expected": json.dumps({"items": [2]})},
    ]
    out = rd.from_items(rows).map_batches(
        RepairCostStage, batch_format="pyarrow", concurrency=1).take_all()
    # preserve_order is off by default, so key on row content not position.
    got = {r["expected"]: r["repair_cost"] for r in out}
    assert got == {json.dumps({"items": [1]}): 0, json.dumps({"items": [2]}): 1}


@pytest.mark.slow
def test_cli_build_query_stats(tmp_path):
    """End-to-end CLI in a subprocess (owns its own Ray session)."""
    from ts_type_filter_ray.sources.synthetic import generate_corpus
    corpus = tmp_path / "corpus"
    generate_corpus(str(corpus), num_docs=120, seed=7, num_files=2)
    idx = tmp_path / "idx"

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "ts_type_filter_ray", "--num-cpus", "2",
             *args],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)

    r = run("build", "--corpus", str(corpus), "--out", str(idx))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "built 120 docs" in r.stdout

    r = run("query", str(idx), "import def")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Found" in r.stdout

    r = run("query", str(idx), "import", "--bm25", "-k", "3")
    assert r.returncode == 0
    assert len([ln for ln in r.stdout.splitlines() if "\t" in ln]) <= 3

    r = run("stats", str(idx), "--top", "5")
    assert r.returncode == 0
    assert "Number of documents: 120" in r.stdout
    assert "Word Frequency Table:" in r.stdout
