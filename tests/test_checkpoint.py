"""Resumability (north_rule): kill after iteration k, resume from the
checkpoint, final state identical to an uninterrupted run."""

from __future__ import annotations

import numpy as np

from conftest import CHAIN_64, TWO_COMPONENTS
from ligra_spark.algorithms import connected_components, pagerank
from ligra_spark.checkpoint import Checkpointer


def test_pagerank_resume_identical(spark, mk_graph, tmp_path):
    edges = CHAIN_64 + [(63, 0), (10, 40)]
    g = mk_graph(edges)
    full = {r["id"]: r["rank"] for r in pagerank(g, max_iters=12).collect()}

    ck = Checkpointer(spark, str(tmp_path / "ck"), run_id="pr")
    pagerank(g, max_iters=5, checkpointer=ck)  # "killed" after 5 iters
    assert ck.completed_iterations() == [0, 1, 2, 3, 4]

    ck2 = Checkpointer(spark, str(tmp_path / "ck"), run_id="pr")
    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(g, max_iters=12, checkpointer=ck2).collect()
    }
    assert set(resumed) == set(full)
    keys = sorted(full)
    assert np.allclose(
        [resumed[k] for k in keys], [full[k] for k in keys], atol=1e-12
    )
    # metrics were recorded for every completed iteration
    its = [m["iteration"] for m in ck2.metrics()]
    assert its == sorted(its)
    assert 11 in its
    g.unpersist()


def test_cc_resume_identical(spark, mk_graph, tmp_path):
    g = mk_graph(TWO_COMPONENTS + [(0, 10)])
    full = {r["id"]: r["comp"] for r in connected_components(g).collect()}

    ck = Checkpointer(spark, str(tmp_path / "ck"), run_id="cc")
    connected_components(g, max_iters=1, checkpointer=ck)
    ck2 = Checkpointer(spark, str(tmp_path / "ck"), run_id="cc")
    resumed = {
        r["id"]: r["comp"]
        for r in connected_components(g, checkpointer=ck2).collect()
    }
    assert resumed == full
    g.unpersist()


def test_lineage_records_partitions(spark, mk_graph, tmp_path):
    g = mk_graph(CHAIN_64)
    ck = Checkpointer(spark, str(tmp_path / "ck"), run_id="lin")
    pagerank(g, max_iters=2, checkpointer=ck)
    import json
    lineage = json.loads(
        (ck._iter_dir(1) / "lineage.json").read_text()
    )
    assert lineage["rows"] == 64
    assert sum(lineage["partitions"].values()) == 64
    assert "rank" in lineage["columns"]
    g.unpersist()


def test_incomplete_checkpoint_ignored(spark, mk_graph, tmp_path):
    g = mk_graph(CHAIN_64)
    ck = Checkpointer(spark, str(tmp_path / "ck"), run_id="par")
    pagerank(g, max_iters=3, checkpointer=ck)
    # simulate a kill mid-write: state written, lineage (commit marker) not
    (ck._iter_dir(2) / "lineage.json").unlink()
    ck2 = Checkpointer(spark, str(tmp_path / "ck"), run_id="par")
    nxt, _ = ck2.resume()
    assert nxt == 2  # resumes after iteration 1, ignoring the torn write
    g.unpersist()
