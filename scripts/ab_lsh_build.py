"""Interleaved A/B of the LSH pairs build (VERDICT r13 task 3).

A = r12 two-pass index (minhash_banded + hashed_token_sets checkpoints)
B = r13 single-scan index (minhash_signed_sets joint checkpoint;
    toks = projection over the joint blocks, sig arrays and all)
C = single-scan index + compact toks re-checkpoint (the candidate fix:
    keep the one-corpus-scan hash win, give the verify join compact
    (id, ws) blocks to stream instead of the sig-carrying joint blocks)

Each rep rebuilds the index from cold and then mines + publishes +
re-reads the capped pair artifact into a FRESH artifact root — exactly
the region the driver's `lsh_index_build` (detail) and `lsh_pairs_build`
(declared) lines time. Reps interleave A,B,A,B,... so host drift hits
both arms equally.

Usage: python scripts/ab_lsh_build.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    from vmhub_data_pipeline_spark.session import build_session
    from vmhub_data_pipeline_spark.operators.artifacts import publish_artifact
    from vmhub_data_pipeline_spark.operators.dedup import (
        banded_from_sig,
        hashed_token_sets,
        minhash_banded,
        minhash_pairs_from_index,
        minhash_signed_sets,
    )
    from vmhub_data_pipeline_spark.operators.similarity import checkpoint_index
    from vmhub_data_pipeline_spark.queries import dedup as qd
    from vmhub_data_pipeline_spark.tables import load

    spark = build_session("ab-lsh-build")
    cap = qd._LSH_HOT_CAP

    def build_a():
        (docs,) = load(spark, SF_DIR, "documents")
        banded = checkpoint_index(minhash_banded(docs, "doc_id", "text", portable=True))
        toks = checkpoint_index(hashed_token_sets(docs, "doc_id", "text", 3))
        return banded, toks

    def build_b():
        (docs,) = load(spark, SF_DIR, "documents")
        joint = checkpoint_index(
            minhash_signed_sets(docs, "doc_id", "text", portable=True)
        )
        banded = checkpoint_index(banded_from_sig(joint, portable=True))
        return banded, joint.select("id", "ws")

    def build_c():
        (docs,) = load(spark, SF_DIR, "documents")
        joint = checkpoint_index(
            minhash_signed_sets(docs, "doc_id", "text", portable=True)
        )
        banded = checkpoint_index(banded_from_sig(joint, portable=True))
        toks = checkpoint_index(joint.select("id", "ws"))
        return banded, toks

    def build_d():
        # single-scan build, hash work spread wide, then the RESIDENT index
        # narrowed to a byte-derived width for the cheap mine-side jobs
        # (coalesce after the checkpoint: no shuffle, blocks merge at read)
        import math
        import os as _os

        (docs,) = load(spark, SF_DIR, "documents")
        try:
            nbytes = sum(
                _os.path.getsize(f.removeprefix("file:")) for f in docs.inputFiles()
            )
        except OSError:
            nbytes = 0
        k = max(1, math.ceil(nbytes / (256 * 1024))) if nbytes else None
        joint = checkpoint_index(
            minhash_signed_sets(docs, "doc_id", "text", portable=True)
        )
        if k is not None and k < joint.rdd.getNumPartitions():
            joint = joint.coalesce(k)
        banded = checkpoint_index(banded_from_sig(joint, portable=True))
        if k is not None and k < banded.rdd.getNumPartitions():
            banded = banded.coalesce(k)
        return banded, joint.select("id", "ws")

    def mine(banded, toks, root):
        pairs = minhash_pairs_from_index(banded, toks, threshold=0.9, max_bucket_occupancy=cap)
        path = os.path.join(root, "pairs_artifact")

        def _build(staging: str) -> None:
            pairs.write.mode("overwrite").parquet(f"{staging}/pairs")

        publish_artifact(path, _build)
        return spark.read.parquet(f"{path}/pairs").count()

    arms = (("A", build_a), ("B", build_b), ("C", build_c), ("D", build_d))
    results: dict[str, dict[str, list[float]]] = {
        arm: {"index": [], "pairs": []} for arm, _ in arms
    }
    counts = set()
    for rep in range(REPS):
        for arm, builder in arms:
            with tempfile.TemporaryDirectory() as root:
                spark.sparkContext.setJobDescription(f"ab-lsh {arm} rep{rep} index")
                t0 = time.perf_counter()
                banded, toks = builder()
                t_index = time.perf_counter() - t0
                spark.sparkContext.setJobDescription(f"ab-lsh {arm} rep{rep} pairs")
                t0 = time.perf_counter()
                n = mine(banded, toks, root)
                t_pairs = time.perf_counter() - t0
                counts.add(n)
                results[arm]["index"].append(t_index)
                results[arm]["pairs"].append(t_pairs)
                print(
                    f"rep{rep} {arm}: index={t_index:.3f}s pairs={t_pairs:.3f}s n={n}",
                    flush=True,
                )
    assert len(counts) == 1, f"pair counts diverged: {counts}"
    for arm, _ in arms:
        for leg in ("index", "pairs"):
            xs = results[arm][leg]
            print(
                f"{arm} {leg}: median={statistics.median(xs):.3f} min={min(xs):.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
