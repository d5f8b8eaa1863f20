"""IVF nprobe recall sweep — evidence for similarity.ivf_topk's recall knob.

Measures recall@k of `ivf_topk` against the brute-force `cosine_topk` ground
truth at nprobe = 1, 2, 4 on a synthetic CLUSTERED corpus (IVF recall on
uniform random vectors is meaninglessly flat — real embedding spaces are
clustered, which is the regime IVF exists for). Also reports wall seconds
per plan, best-of-REPS with the plan rebuilt per rep (BENCH/BASELINE.md
methodology).

Corpus: N vectors in `dim` dims, 32 latent clusters; component d of vector i
is center(cluster(i), d) + 0.35 * noise(i, d), every pseudo-random drawn from
xxhash64 with a DISTINCT salt per attribute (decorrelated — see the fixture
note in BENCH/BASELINE.md). Queries are the first Q corpus vectors, matching
the registry's `ann_ivf` construction.

Usage: python scripts/bench_ann_recall.py [n_vectors] [n_queries] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.operators.similarity import cosine_topk, ivf_topk  # noqa: E402
from crawler_spark.sparkutils import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 32
N_CENTROIDS = 64
K = 10
REPS = int(os.environ.get("BENCH_REPS", "2"))


def synth_vectors(spark, n: int):
    """Clustered corpus as one JVM-side select; no Python in the loop."""
    unit = 1000.0  # hash -> [-1, 1] at 3 decimals

    def u(*salts):
        return (F.xxhash64(*[F.lit(s) for s in salts[:-1]], salts[-1]) % 2001 - 1000) / unit

    base = spark.range(n).select(
        F.col("id").alias("vec_id"), (F.col("id") % N_CLUSTERS).alias("_c")
    )
    comps = [
        (2.0 * u("ctr", d, F.col("_c")) + 0.35 * u("nz", d, F.col("vec_id")))
        .cast("float")
        .alias(f"_d{d}")
        for d in range(DIM)
    ]
    return base.select(
        "vec_id", F.array(*comps).alias("embedding")
    ).repartition(64).localCheckpoint()


def pairs(df) -> set:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("ann-recall", cores=cores, shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")

    vecs = synth_vectors(spark, n)
    queries = vecs.where(F.col("vec_id") < n_q).localCheckpoint()

    t0 = time.time()
    truth = pairs(cosine_topk(vecs, queries, k=K))
    brute_sec = time.time() - t0
    out = {"n": n, "q": n_q, "dim": DIM, "k": K, "cores": cores,
           "brute_force": {"sec": round(brute_sec, 1), "recall": 1.0}}
    print(json.dumps({"brute_force": out["brute_force"]}), flush=True)

    for nprobe in (1, 2, 4):
        times = []
        for _ in range(REPS):
            t0 = time.time()
            ivf_topk(vecs, queries, n_centroids=N_CENTROIDS, k=K, nprobe=nprobe) \
                .write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        got = pairs(ivf_topk(vecs, queries, n_centroids=N_CENTROIDS, k=K, nprobe=nprobe))
        rec = {
            "sec": round(min(times), 1),
            "recall": round(len(got & truth) / len(truth), 4),
        }
        out[f"nprobe{nprobe}"] = rec
        print(json.dumps({f"nprobe{nprobe}": rec}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
