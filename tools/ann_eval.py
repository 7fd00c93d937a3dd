"""ANN recall evaluation: recall@k of every approximate search path
(IVF at nprobe < n_cells, LSH at varying table counts, sign-bit cell
probe) against exact brute-force cosine top-k ground truth on the
embeddings table.

Run: python tools/ann_eval.py [sf_dir] [k]
Records the probe/recall trade you tune in production (SCALE.md ANN
section) — the correctness gates certify full-probe ≡ exact and the
reduced-probe join shape; THIS measures what reduced probing costs.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from assignment_etl_spark.ext.similarity import (
    brute_force_topk,
    build_ivf_index,
    cell_probe_topk,
    ivf_topk,
    lsh_topk,
)
from assignment_etl_spark.session import get_spark

DIM = 64


def recall_at_k(exact, approx) -> float:
    """|approx ∩ exact| / |exact| over (query_id, neighbor_id) pairs."""
    hit = approx.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    ).count()
    total = exact.count()
    return round(hit / total, 4) if total else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-eval")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
        .persist()
    )
    queries = emb.filter(F.col("vec_id") < 64).persist()
    exact = brute_force_topk(queries, emb, k).persist()
    n_cand = emb.count()
    results: dict[str, dict] = {"sf_dir": sf_dir, "k": k, "n_candidates": n_cand}

    n_cells = 16
    assigned, centroids = build_ivf_index(emb, n_cells=n_cells)
    ivf = {}
    for nprobe in (1, 2, 4, 8, 16):
        approx = ivf_topk(queries, assigned, centroids, k, nprobe=nprobe)
        ivf[f"nprobe={nprobe}/{n_cells}"] = {
            "recall": recall_at_k(exact, approx),
            "scanned_frac": round(nprobe / n_cells, 4),
        }
    results["ivf"] = ivf

    lsh = {}
    for n_tables in (2, 4, 8, 16):
        approx = lsh_topk(
            queries, emb, k, dim=DIM, n_planes=4, n_tables=n_tables
        ).persist()
        # candidate workload = pairs scored, measured pre-window via the
        # same join the operator runs (bucket sizes drive cost)
        lsh[f"tables={n_tables},planes=4"] = {"recall": recall_at_k(exact, approx)}
    results["lsh"] = lsh

    cell = {}
    for n_bits in (2, 3, 4):
        approx = cell_probe_topk(queries, emb, k, n_bits=n_bits)
        cell[f"bits={n_bits}"] = {
            "recall": recall_at_k(exact, approx),
            "scanned_frac": round(1 / (1 << n_bits), 4),
        }
    results["signbit_cell_probe"] = cell

    print(json.dumps(results))


if __name__ == "__main__":
    main()
