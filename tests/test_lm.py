"""Unigram surprisal scorer — integer-bit spec checks on a hand corpus."""

from pyspark.sql import functions as F

from crawler_spark.operators.lm import surprisal


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_surprisal_hand_computed(spark):
    # corpus: "the" x6, "rare" x1, "word" x2  -> T=9, ilog2(T)=3
    # ilog2: the -> 2, word -> 1, rare -> 0
    docs = _df(
        spark,
        [
            (1, "the the the word"),  # n=4 s=2+2+2+1=7 total=4*3-7=5
            (2, "the the the rare"),  # n=4 s=6   total=12-6=6
            (3, "word"),              # n=1 s=1   total=3-1=2
        ],
    )
    got = {r["doc_id"]: r for r in surprisal(docs).collect()}
    assert got[1]["total_bits"] == 5 and got[1]["avg_centibits"] == 125
    assert got[2]["total_bits"] == 6 and got[2]["avg_centibits"] == 150
    assert got[3]["total_bits"] == 2 and got[3]["avg_centibits"] == 200


def test_rare_heavy_doc_scores_higher(spark):
    common = " ".join(["alpha"] * 50)
    rare = "zeta yotta qoph vex jinx"
    docs = _df(spark, [(1, common), (2, common), (3, rare)])
    got = {r["doc_id"]: r["avg_centibits"] for r in surprisal(docs).collect()}
    assert got[3] > got[1] == got[2]


def test_tokenless_docs_omitted(spark):
    docs = _df(spark, [(1, "hello world"), (2, "1234 !!!"), (3, None)])
    got = surprisal(docs.where(F.col("text").isNotNull() | F.lit(True))).collect()
    assert {r["doc_id"] for r in got} == {1}
