"""bm25_search vs a python reference implementation."""

import math
import re


from batch_processing_on_aws_spark.operators.textstats import bm25_search

DOCS = [
    (1, "spark shuffle join shuffle hash"),
    (2, "hash hash hash table scan"),
    (3, "window sort order by window"),
    (4, "spark hash join large table scan scan scan"),
    (5, "tiny doc"),
]


def _py_bm25(query, k1=1.2, b=0.75):
    tokenized = {i: re.findall(r"[a-z0-9']+", t.lower()) for i, t in DOCS}
    n = len(DOCS)
    avg = sum(len(t) for t in tokenized.values()) / n
    dfreq = {
        q: sum(1 for t in tokenized.values() if q in t) for q in query
    }
    scores = {}
    for i, t in tokenized.items():
        s = 0
        for q in query:
            tf = t.count(q)
            if tf == 0 or dfreq[q] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avg))
            s += round(idf * tfn * 1_000_000)
        if s:
            scores[i] = s
    return scores


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    query = ["hash", "scan"]
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_search(df, query, top_k=10).collect()
    }
    assert got == _py_bm25(query)


def test_bm25_top_k_order_and_limit(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_search(df, ["hash"], top_k=2).collect()
    want = sorted(
        _py_bm25(["hash"]).items(), key=lambda kv: (-kv[1], kv[0])
    )[:2]
    assert [(r["doc_id"], r["score_micro"]) for r in rows] == want


def test_bm25_unmatched_query_is_empty(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert bm25_search(df, ["zzzmissing"]).count() == 0
