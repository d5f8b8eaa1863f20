"""Production-K MinHash evidence (VERDICT r2 #4).

The registry's `dedup_minhash_lsh` runs K=8 / band_size 2 (4 bands) because
the DuckDB oracle re-derives every permutation; production at 10^10 docs
runs a bigger K with bands sized to the similarity threshold. This script
measures the SAME operator (operators/dedup.minhash_lsh_dedup — only the
k/band_size knobs change) at:

    K=8,  r=2 (4 bands)   — oracle default;    s-curve midpoint (1/4)^(1/2)  = 0.50
    K=16, r=2 (8 bands)   — recall-test knob;  midpoint (1/8)^(1/2)  = 0.35
    K=64, r=4 (16 bands)  — production-ish;    midpoint (1/16)^(1/4) = 0.50, much steeper

reporting per setting: wall seconds on the sf0.1 documents corpus, the LSH
candidate-pair count there (the verify-stage workload — a steeper s-curve
admits fewer low-similarity candidates), and recall/precision on the
planted-near-dup corpus from tests/test_dedup_recall.py (2,000 base docs,
200 planted J~0.93 dups).

Best-of-REPS, plans rebuilt from spark.read per rep (BENCH/BASELINE.md
methodology). Usage: python scripts/bench_minhash_k.py [sf_dir] [cores]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crawler_spark.operators.dedup import (  # noqa: E402
    doc_shingles,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signature,
)
from crawler_spark.sparkutils import get_spark  # noqa: E402

SETTINGS = [(8, 2), (16, 2), (64, 4)]
REPS = int(os.environ.get("BENCH_REPS", "2"))


def planted_corpus(spark):
    """Same construction as tests/test_dedup_recall.py::planted."""
    rng = random.Random(7)

    def word(i: int) -> str:
        s = ""
        for _ in range(4):
            s += chr(97 + i % 26)
            i //= 26
        return "z" + s

    vocab = [word(i) for i in range(20_000)]
    rows, pairs = [], []
    doc_id = 0
    for base in range(2_000):
        toks = [rng.choice(vocab) for _ in range(60)]
        rows.append((doc_id, " ".join(toks)))
        if base % 10 == 0:
            dup = list(toks)
            for pos in rng.sample(range(60), 2):
                dup[pos] = rng.choice(vocab)
            rows.append((doc_id + 1, " ".join(dup)))
            pairs.append((doc_id, doc_id + 1))
            doc_id += 2
        else:
            doc_id += 1
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8), set(pairs)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("minhash-k-bench", cores=cores, shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm codegen/IO

    plant_df, plant_pairs = planted_corpus(spark)
    plant_df = plant_df.localCheckpoint()  # fixture cost out of the timings

    out: dict[str, dict] = {}
    for k, r in SETTINGS:
        times = []
        for _ in range(REPS):
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
            t0 = time.time()
            minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5, k=k, band_size=r) \
                .write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        sh = doc_shingles(docs, "doc_id", "text", 3).localCheckpoint(eager=False)
        candidates = lsh_candidate_pairs(minhash_signature(sh, k), k, r).count()
        got = {
            (row["doc_a"], row["doc_b"])
            for row in minhash_lsh_dedup(
                plant_df, "doc_id", "text", threshold=0.5, k=k, band_size=r
            ).collect()
        }
        out[f"k{k}_r{r}"] = {
            "bands": k // r,
            "s_curve_midpoint": round((r / k) ** (1.0 / r), 3),
            "sf_sec": round(min(times), 2),
            "sf_candidate_pairs": candidates,
            "planted_recall": round(len(got & plant_pairs) / len(plant_pairs), 4),
            "planted_false_pairs": len(got - plant_pairs),
        }
        print(json.dumps({f"k{k}_r{r}": out[f"k{k}_r{r}"]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "cores": cores, "reps": REPS, "settings": out}))


if __name__ == "__main__":
    main()
