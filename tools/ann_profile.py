#!/usr/bin/env python
"""Attribute the ann_kernel serial fraction (VERDICT r04 item 5).

Runs the bench ann_kernel workload at one parallelism level (fresh JVM
per invocation — run twice, e.g. LIGRA_CPUS=4 and =16) and times the
phases separately:

  feed        — generate + cache the corpus (untimed in bench)
  q_collect   — the `queries.collect()` job inside cosine_topk_kernel
  scan_only   — mapInArrow candidates with _reduce='none' (count)
  full        — candidates + window top-k reduce (count)

full − scan_only isolates the reduce stage; q_collect is measured by a
separate collect of the same filter. Each phase is min-of-3 after one
untimed warmup, matching the bench protocol.

Usage: LIGRA_CPUS=4 python tools/ann_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(os.environ.get("LIGRA_CPUS", "8"))
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)

from ligra_spark.session import get_spark  # noqa: E402


def main() -> None:
    import numpy as np
    import pandas as pd

    from ligra_spark.functions.similarity import cosine_topk_kernel

    spark = get_spark("ann_profile")
    sf = 0.1
    ann_n = int(os.environ.get("SPARK_GRAFT_ANN_N", max(20_000, int(4_000_000 * sf))))
    ann_q = int(os.environ.get("SPARK_GRAFT_ANN_Q", max(100, ann_n // 200)))
    dim = 128

    def gen_vecs(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            r = np.random.default_rng(int(ids[0]) + 99)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(
                        r.normal(size=(len(ids), dim)).astype(np.float32)
                    ),
                }
            )

    feed_parts = CPUS * int(os.environ.get("LIGRA_ANN_FEED_MULT", "1"))
    t0 = time.time()
    emb = (
        spark.range(0, ann_n, 1, feed_parts)
        .mapInPandas(gen_vecs, "vec_id long, embedding array<float>")
        .cache()
    )
    emb.count()
    feed = time.time() - t0
    qs = emb.where(f"vec_id < {ann_q}")

    # full-shape warmup (bench protocol)
    cosine_topk_kernel(emb.where("vec_id % 6 = 0"), qs, k=5).count()

    def timed(fn, trials=3):
        walls = []
        for _ in range(trials):
            t1 = time.time()
            fn()
            walls.append(round(time.time() - t1, 3))
        return walls

    out = {
        "cpus": CPUS,
        "ann_n": ann_n,
        "ann_q": ann_q,
        "feed_s": round(feed, 3),
        "q_collect": timed(lambda: qs.collect()),
        "scan_only": timed(
            lambda: cosine_topk_kernel(emb, qs, k=5, _reduce="none").count()
        ),
        "full": timed(lambda: cosine_topk_kernel(emb, qs, k=5).count()),
    }
    for k in ("q_collect", "scan_only", "full"):
        out[k + "_min"] = min(out[k])
    out["reduce_stage_s"] = round(out["full_min"] - out["scan_only_min"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
