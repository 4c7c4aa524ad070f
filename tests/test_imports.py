"""Cold-import smoke tests.

Each public package must import in a FRESH interpreter regardless of
which package a user touches first. The full pytest suite can mask
import cycles because alphabetically-earlier test files import
``ligra_spark.algorithms`` before ``ligra_spark.operators`` (the
round-2 cycle: operators/__init__ -> buckets -> algorithms._iter ->
algorithms/__init__ -> setcover -> back into the half-initialized
buckets). Subprocesses are the only honest check.
"""

import subprocess
import sys

import pytest

PUBLIC_MODULES = [
    "ligra_spark",
    "ligra_spark.operators",
    "ligra_spark.algorithms",
    "ligra_spark.functions",
    "ligra_spark.sources",
    "ligra_spark.streaming",
    "ligra_spark.plans",
    "ligra_spark.graph",
    "ligra_spark.hypergraph",
    "ligra_spark.csr",
    "ligra_spark.checkpoint",
    "ligra_spark.queries",
    "ligra_spark.session",
]


@pytest.mark.parametrize("mod", PUBLIC_MODULES)
def test_cold_import(mod):
    proc = subprocess.run(
        [sys.executable, "-c", f"import {mod}"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, f"import {mod} failed cold:\n{proc.stderr}"


def test_auto_partitions_sizing():
    """num_partitions="auto" sizes ∝ edges: floor 8, pow2 steps,
    capped at the session shuffle-partition count (the measured
    right-sizing rationale lives in graph._auto_partitions)."""
    from ligra_spark.graph import _auto_partitions

    assert _auto_partitions(0, 32) == 8
    assert _auto_partitions(1_000, 32) == 8
    assert _auto_partitions(98_500, 32) == 16  # the sf0.1 events graph
    assert _auto_partitions(486_000, 32) == 32  # capped at the session
    assert _auto_partitions(10**9, 32) == 32
    assert _auto_partitions(10**9, 256) == 256
