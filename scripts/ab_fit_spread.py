"""Interleaved A/B of the fit-input width for the two regressed fit
lines (VERDICT r13 task 6): ann_opq_rotation_fit and ann_coarse_fit.

X = current code (opq_model_fit spreads its input uncapped to full
    cores before the eager checkpoint; coarse fit under the 256 KB cap)
Y = opq_model_fit's spread capped like the Lloyd fits
    (ceil(bytes/256KB) -> 1 slice at sf0.01)
Z = opq_model_fit's spread forced to identity (r12's effective width:
    the fit rides the unit corpus checkpoint's scan layout)

Each rep clears the model/fit caches (cold fit, warm unit corpus —
exactly the region bench.py times) and interleaves arms so drift hits
all equally.

Usage: python scripts/ab_fit_spread.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def main() -> None:
    import vmhub_data_pipeline_spark.operators.similarity as sim
    from vmhub_data_pipeline_spark.queries.vector import (
        _COARSE_FIT_CACHE,
        _OPQ_MODEL_CACHE,
        coarse_cents_cached,
        opq_model_cached,
    )
    from vmhub_data_pipeline_spark.session import build_session

    spark = build_session("ab-fit-spread")
    # warm the unit corpus once (bench times the fits against it warm)
    from vmhub_data_pipeline_spark.queries.vector import _pq_unit_corpus

    _pq_unit_corpus(spark, SF_DIR)

    real_spread = sim.spread_small_input

    def capped_spread(df, id_col, bytes_per_slice=None):
        return real_spread(df, id_col, bytes_per_slice or sim._FIT_BYTES_PER_SLICE)

    def identity_spread(df, id_col, bytes_per_slice=None):
        return df

    arms = (
        ("X", real_spread),
        ("Y", capped_spread),
        ("Z", identity_spread),
    )
    results: dict[str, dict[str, list[float]]] = {
        a: {"rot": [], "coarse": []} for a, _ in arms
    }
    models = {}
    for rep in range(REPS):
        for arm, spread in arms:
            sim.spread_small_input = spread
            try:
                _OPQ_MODEL_CACHE.clear()
                spark.sparkContext.setJobDescription(f"ab-fit {arm} rep{rep} rot")
                t0 = time.perf_counter()
                m = opq_model_cached(spark, SF_DIR)
                results[arm]["rot"].append(time.perf_counter() - t0)
                _COARSE_FIT_CACHE.clear()
                spark.sparkContext.setJobDescription(f"ab-fit {arm} rep{rep} coarse")
                t0 = time.perf_counter()
                c = coarse_cents_cached(spark, SF_DIR)
                results[arm]["coarse"].append(time.perf_counter() - t0)
            finally:
                sim.spread_small_input = real_spread
            models.setdefault(arm, (m, c))
            print(
                f"rep{rep} {arm}: rot={results[arm]['rot'][-1]:.3f}s "
                f"coarse={results[arm]['coarse'][-1]:.3f}s",
                flush=True,
            )
    # bit-parity across arms (partitioning must not change fit values)
    base = models["X"]
    for arm, (m, c) in models.items():
        assert m == base[0], f"rotation model diverged in {arm}"
        assert c == base[1], f"coarse centroids diverged in {arm}"
    print("models bit-identical across arms")
    for arm, _ in arms:
        for leg in ("rot", "coarse"):
            xs = results[arm][leg]
            print(
                f"{arm} {leg}: median={statistics.median(xs):.3f} min={min(xs):.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
