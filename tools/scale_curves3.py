"""Three-point scaling curves sf0.1 → sf1 → sf10 (VERDICT r7 ask #1).

The sf1 curves in SCALE.md cannot distinguish linear from superlinear for
the fixed-stage operators: at ~6M lineitem rows several "linear-ok"
verdicts are really "scheduler latency dominates" (sub-1× ratios). A
100×-amplified sf10 directory (tools/make_scale_data.py 100) makes a
hidden superlinear term (accidentally quadratic join, growing broadcast)
visible: between sf1 and sf10 data grows 10×, so a linear operator's
RATIO2 (sf10/sf1) must approach ~10× once out of the latency floor, and
anything well beyond ~12× (or ~20× for sort-bound) is a plan bug.

Usage:
  python tools/make_scale_data.py 10  /tmp/sf1_synth
  python tools/make_scale_data.py 100 /tmp/sf10_synth
  python tools/scale_curves3.py [sf1_dir] [sf10_dir] [query ...]
Prints a markdown table to paste into SCALE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

# the 15 slowest committed-baseline headline queries + the fixed-latency
# family the sf1 table could not adjudicate (SCALE.md:933,937)
TARGETS = [
    "dedup_keep_best_quality",
    "ivfpq_search_topk",
    "curation_pipeline_funnel",
    "decontaminate_documents",
    "label_noise_suspects",
    "nb_score_calibration",
    "pq_adc_topk",
    "ivf_similarity_topk",
    "kcenter_coreset_embeddings",
    "pq_codebook_embeddings",
    "hits_event_graph",
    "streaming_hourly_events",
    "semantic_dedup_embeddings",
    "dedup_lines_corpus",
    "bpe_train_merges",
    # fixed-latency family
    "unigram_lm_vocab",
    "wordpiece_train_merges",
    "knn_graph_beam_search",
    "rank_agreement_quality_length",
    # round-8 ingest operator
    "incremental_minhash_documents",
]


import os

REPEATS = int(os.environ.get("SCALE3_REPEATS", "2"))


def run(fn, spark, sf_dir, repeats=REPEATS):
    best, rows = None, 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return rows, best


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    sf10_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_synth"
    names = sys.argv[3:] or TARGETS

    import __spark_entry__ as entry
    from assignment_etl_spark.session import get_spark

    spark = get_spark("scale-curves3")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    print(
        "| query | sf0.1 s | sf1 s | sf10 s | r1 (sf1/sf0.1) "
        "| r2 (sf10/sf1) | rows 0.1→1→10 | verdict |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for name in names:
        fn = qs[name]
        try:
            r01, t01 = run(fn, spark, "/root/testdata/sf0.1")
            r1, t1 = run(fn, spark, sf1_dir)
            r10, t10 = run(fn, spark, sf10_dir)
        except Exception as exc:  # noqa: BLE001 — report and keep sweeping
            print(f"| `{name}` | ERROR: {type(exc).__name__}: {str(exc)[:80]} |")
            continue
        ratio1 = t1 / t01 if t01 else float("inf")
        ratio2 = t10 / t1 if t1 else float("inf")
        verdict = (
            "linear-ok"
            if ratio2 <= 12
            else ("watch" if ratio2 <= 20 else "SUPER-LINEAR")
        )
        print(
            f"| `{name}` | {t01:.2f} | {t1:.2f} | {t10:.2f} | {ratio1:.1f}× "
            f"| {ratio2:.1f}× | {r01}→{r1}→{r10} | {verdict} |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
