#!/usr/bin/env python
"""Interleaved feed-granularity sweep for the ann_kernel scan.

One JVM, one cached corpus per multiplier, trials interleaved across
multipliers so box noise hits all arms equally. Prints min/median per
arm. Usage: LIGRA_CPUS=16 python tools/ann_granularity.py [mults...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = int(os.environ.get("LIGRA_CPUS", "16"))
os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
MULTS = [int(x) for x in (sys.argv[1:] or ["1", "2", "4"])]
TRIALS = int(os.environ.get("LIGRA_TRIALS", "5"))


def main() -> None:
    import numpy as np
    import pandas as pd

    from ligra_spark.functions.similarity import cosine_topk_kernel
    from ligra_spark.session import get_spark

    spark = get_spark("ann_gran")
    ann_n, ann_q, dim = 400_000, 2_000, 128

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

    src = os.environ.get("LIGRA_ANN_SRC", "cache")
    arms = {}
    for mult in MULTS:
        emb = (
            spark.range(0, ann_n, 1, CPUS * mult)
            .mapInPandas(gen_vecs, "vec_id long, embedding array<float>")
            .cache()
        )
        emb.count()
        if src == "parquet":
            path = f"/tmp/ligra_ann_gran_{ann_n}_{CPUS}_{mult}.parquet"
            if not Path(path).exists():
                emb.write.parquet(path)
            emb.unpersist()
            emb = spark.read.parquet(path)
        qs = emb.where(f"vec_id < {ann_q}")
        cosine_topk_kernel(emb.where("vec_id % 6 = 0"), qs, k=5).count()  # warm
        arms[mult] = (emb, qs)

    walls: dict[str, list[float]] = {}
    for t in range(TRIALS):
        for m in MULTS:
            emb, qs = arms[m]
            for mode, kw in (("scan", {"_reduce": "none"}), ("full", {})):
                t0 = time.time()
                cosine_topk_kernel(emb, qs, k=5, **kw).count()
                walls.setdefault(f"{mode}{m}", []).append(
                    round(time.time() - t0, 3)
                )
    out: dict = {"cpus": CPUS, "trials": walls}
    for key, w in walls.items():
        w = sorted(w)
        out[key + "_min"] = w[0]
        out[key + "_med"] = w[len(w) // 2]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
