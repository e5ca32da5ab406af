from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.neardup import (
    jaccard,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_signatures,
)
from batch_processing_on_aws_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from batch_processing_on_aws_spark.plans.golden import _deterministic_planes

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind the tall green hills of the quiet northern valley tonight"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE.replace("quick", "swift")),  # near-dup of 1
            (3, "completely different content about database query engines and "
                "distributed shuffle execution plans running at large scale"),
            (4, BASE),  # exact dup of 1
        ],
        ["doc_id", "text"],
    )


def test_minhash_exact_dup_same_signature(spark):
    sig = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(8))
           for r in minhash_signatures(_docs(spark)).collect()}
    assert sig[1] == sig[4]
    assert sig[1] != sig[3]


def test_lsh_finds_planted_near_dups(spark):
    pairs = {(r["doc_id_a"], r["doc_id_b"])
             for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert (1, 4) in pairs          # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup shares a band
    assert not any(3 in p for p in pairs)      # unrelated doc never pairs


def test_lsh_bucket_cap_drops_boilerplate_clique(spark):
    """``max_bucket_size``: a boilerplate clique (here 30 copies of one
    template) emits C(30,2)=435 pairwise candidates uncapped; with the
    cap its oversized buckets drop out entirely while the unrelated
    normal near-dup pair is untouched. ``max_bucket_size=None`` is the
    explicit opt-in for the exact all-pairs contract (the default star
    cap of 64 is not binding on this 30-doc clique)."""
    # exact copies: identical signatures land every member in the SAME
    # bucket of every band, so the uncapped pair count is exactly
    # C(30,2) and the capped run drops the clique deterministically
    clique = [(100 + i, BASE) for i in range(30)]
    other_a = ("unrelated prose about sort merge join exchange reuse "
               "in adaptive query execution layers of an analytics engine")
    docs = spark.createDataFrame(
        clique + [(1, other_a), (2, other_a + " tail")],
        ["doc_id", "text"],
    )
    uncapped = {(r["doc_id_a"], r["doc_id_b"])
                for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in uncapped
    assert sum(1 for a, b in uncapped if a >= 100 and b >= 100) >= 400
    capped = {(r["doc_id_a"], r["doc_id_b"])
              for r in minhash_lsh_pairs(
                  docs, max_bucket_size=10, oversized="drop").collect()}
    assert (1, 2) in capped                       # normal pair survives
    assert not any(a >= 100 for a, _ in capped)   # clique pairs dropped


def test_lsh_bucket_cap_star_preserves_connectivity(spark):
    """``oversized="star"`` — the curation-path mode: an oversized
    bucket emits m-1 star edges from the bucket-min doc instead of the
    C(m,2) clique, so the pair table is LINEAR in the clique size, yet
    connected components over those edges still closes the whole
    template into ONE cluster (star edges are connectivity-equivalent
    to the clique). This pins the recall contract the cap accepts:
    verifiers see only (center, member) pairs for the template."""
    from batch_processing_on_aws_spark.operators.clustering import (
        connected_components,
    )

    clique = [(100 + i, BASE) for i in range(30)]
    other_a = ("unrelated prose about sort merge join exchange reuse "
               "in adaptive query execution layers of an analytics engine")
    docs = spark.createDataFrame(
        clique + [(1, other_a), (2, other_a + " tail")],
        ["doc_id", "text"],
    )
    starred = {(r["doc_id_a"], r["doc_id_b"])
               for r in minhash_lsh_pairs(
                   docs, max_bucket_size=10, oversized="star").collect()}
    assert (1, 2) in starred                      # normal pair survives
    clique_pairs = {(a, b) for a, b in starred if a >= 100}
    # exact copies share every band bucket, center = min doc id 100:
    # exactly 29 star edges, not C(30,2)=435
    assert clique_pairs == {(100, 100 + i) for i in range(1, 30)}
    edges = spark.createDataFrame(
        [(a, b) for a, b in starred], ["src", "dst"]
    )
    comp = {r["n"]: r["component"]
            for r in connected_components(edges).collect()}
    assert len({comp[100 + i] for i in range(30)}) == 1  # one cluster


def test_lsh_star_cap_is_identity_on_natural_corpus(spark):
    """Recall contract, other side: on a corpus with no oversized
    bucket the star-capped plan returns the EXACT uncapped pair set —
    this is why wiring ``CURATION_MAX_BUCKET_SIZE`` into the curation
    queries keeps their (template-free) DuckDB oracles hash-green."""
    docs = _docs(spark)
    uncapped = {(r["doc_id_a"], r["doc_id_b"])
                for r in minhash_lsh_pairs(
                    docs, max_bucket_size=None).collect()}
    capped = {(r["doc_id_a"], r["doc_id_b"])
              for r in minhash_lsh_pairs(
                  docs, max_bucket_size=64, oversized="star").collect()}
    assert capped == uncapped


def test_ngram_jaccard_verification(spark):
    docs = _docs(spark)
    pairs = minhash_lsh_pairs(docs)
    verified = ngram_jaccard_pairs(docs, pairs, threshold=0.5)
    got = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in verified.collect()}
    assert got[(1, 4)] == 1.0
    for (a, b), j in got.items():
        assert j >= 0.5


def test_jaccard_empty_docs(spark):
    df = spark.createDataFrame([("", "")], ["a", "b"]).select(
        jaccard(shingles(F.col("a")), shingles(F.col("b"))).alias("j")
    )
    assert df.collect()[0]["j"] == 1.0


def test_simhash_dup_invariance_and_separation(spark):
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(_docs(spark)).collect()}
    assert sig[1] == sig[4]
    ham_near = bin(sig[1] ^ sig[2]).count("1")
    ham_far = bin(sig[1] ^ sig[3]).count("1")
    assert ham_near < ham_far


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),   # closest to 2
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_orders_by_cosine(spark):
    corpus = _vecs(spark)
    queries = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(corpus, queries, k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["rank"] == 1 and out[0]["cos_sim"] > 0.99


def test_lsh_recall_vs_exact_on_testdata(spark):
    """LSH ANN must recover a reasonable fraction of the exact top-10
    on the real embeddings table (recall is the operator's contract)."""
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb, queries, k=10).collect()}
    planes = _deterministic_planes(n_planes=8, dim=64)
    approx = {(r["query_id"], r["vec_id"])
              for r in lsh_topk(emb, queries, planes, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_ivf_recall_vs_exact_on_testdata(spark):
    """IVF ANN (k-means quantizer, 3 of 16 cells probed) must recover
    a solid fraction of the exact top-10 — with clustered synthetic
    embeddings the probed cells should hold most true neighbors."""
    from batch_processing_on_aws_spark.operators.similarity import ivf_topk
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb, queries, k=10).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ivf_topk(emb, queries, n_cells=16, n_probe=3, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"


def test_cosine_arrow_matches_expression(spark):
    """The Arrow/numpy cosine and the JVM expression cosine must agree
    to float precision on real embeddings."""
    from batch_processing_on_aws_spark.operators.similarity import (
        _as_double,
        cosine,
        cosine_arrow,
    )
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
    a = emb.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        F.reverse(_as_double(F.col("embedding"))).alias("w"),
    )
    rows = a.select(
        "vec_id",
        cosine(F.col("v"), F.col("w")).alias("expr_cos"),
        cosine_arrow(F.col("v"), F.col("w")).alias("arrow_cos"),
    ).collect()
    assert len(rows) == 100
    for r in rows:
        assert abs(r["expr_cos"] - r["arrow_cos"]) < 1e-9, r


def test_simhash_neardup_pairs_banding(spark):
    """Exact duplicates (Hamming 0) must pair; the pigeonhole banding
    must not miss any pair the brute-force Hamming check finds."""
    from itertools import combinations

    from batch_processing_on_aws_spark.operators.neardup import (
        simhash_neardup_pairs,
    )

    docs = _docs(spark)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a, b in combinations(sorted(sig), 2)
        if bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    assert got == brute
    assert got[(1, 4)] == 0  # the planted exact duplicate


def test_rare_jaccard_matches_bruteforce_on_rare_sets(spark):
    """rare_jaccard_pairs must equal a Python brute force of Jaccard
    over the df-capped shingle sets, including the planted dup."""
    from itertools import combinations

    from batch_processing_on_aws_spark.operators.neardup import (
        rare_jaccard_pairs,
        shingles,
    )

    docs = _docs(spark)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in rare_jaccard_pairs(docs, threshold=0.3, max_df=3).collect()
    }
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id", shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    df_count = {}
    for s in sh.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    rare = {g for g, c in df_count.items() if c <= 3}
    expected = {}
    for a, b in combinations(sorted(sh), 2):
        ra, rb = sh[a] & rare, sh[b] & rare
        union = len(ra | rb)
        if union and len(ra & rb) / union >= 0.3:
            expected[(a, b)] = len(ra & rb) / union
    assert got == expected
    assert (1, 4) in got  # the planted near-identical pair


def test_jaccard_similar_pairs_fullset_variant(spark):
    """The full-set inverted-index variant (exact Jaccard over ALL
    shingles) finds the planted dup at a high threshold."""
    from batch_processing_on_aws_spark.operators.neardup import (
        jaccard_similar_pairs,
    )

    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in jaccard_similar_pairs(
            _docs(spark), threshold=0.8, max_df=10
        ).collect()
    }
    assert (1, 4) in got and got[(1, 4)] >= 0.8


def test_multi_table_lsh_recall_dominates_single(spark):
    """Multi-table LSH unions candidates across tables: its recall
    must beat (or match) every one of its constituent single tables,
    and the candidate set must be the exact union (same rescore)."""
    from batch_processing_on_aws_spark.operators.similarity import lsh_topk_multi
    from batch_processing_on_aws_spark.plans.golden import _multi_tables
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb, queries, k=10).collect()}
    tables = _multi_tables(n_tables=3, n_planes=6)
    multi = {(r["query_id"], r["vec_id"])
             for r in lsh_topk_multi(emb, queries, tables, k=10).collect()}
    multi_recall = len(exact & multi) / len(exact)
    for planes in tables:
        single = {(r["query_id"], r["vec_id"])
                  for r in lsh_topk(emb, queries, planes, k=10).collect()}
        assert multi_recall >= len(exact & single) / len(exact)
    assert multi_recall >= 0.2, f"multi-table recall collapsed: {multi_recall}"


def test_hard_negatives_exclude_same_label(spark):
    """Hard-negative mining: top-k most-similar DIFFERENT-label
    vectors per query; same-label vectors never appear however
    similar; null labels are never 'different' from themselves."""
    from batch_processing_on_aws_spark.operators.similarity import (
        hard_negatives,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.99, 0.1], "a"),    # most similar but SAME label
            (3, [0.9, 0.4], "b"),     # the true hard negative
            (4, [0.0, 1.0], "b"),     # easy negative
            (5, [0.95, 0.2], None),   # null label: differs from 'a'
        ],
        "vec_id long, embedding array<double>, label string",
    )
    queries = corpus.where("vec_id = 1").select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = [
        (r["vec_id"], r["neg_label"], r["rank"])
        for r in hard_negatives(corpus, queries, k=2).collect()
    ]
    ids = [v for v, _, _ in got]
    assert 2 not in ids            # same label excluded
    assert got[0][0] == 5          # null label counts as different
    assert got[1][0] == 3          # then the hard 'b' negative
    # null-label QUERY: nothing shares its label, null vs null excluded
    qnull = corpus.where("vec_id = 5").select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    ids_null = {r["vec_id"] for r in hard_negatives(corpus, qnull, k=4).collect()}
    assert ids_null == {1, 2, 3, 4}


def test_band_ledger_incremental_neardup(spark):
    """Fuzzy cross-batch dedup: a batch doc drops on any band collision
    with the persisted ledger or with a smaller-id batch doc; kept
    docs' bands (and only theirs) become the ledger increment, so
    re-ingesting an accepted doc's text drops it (idempotency)."""
    from batch_processing_on_aws_spark.operators.neardup import (
        band_signatures,
        dedup_against_band_ledger,
    )

    accepted = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
    ledger = band_signatures(accepted)
    batch = spark.createDataFrame(
        [
            (11, BASE),                             # exact dup of ledger doc
            (12, BASE.replace("quick", "swift")),   # near-dup of ledger doc
            (13, "fresh prose about bucketed shuffle joins and adaptive "
                 "query execution in distributed analytics engines"),
            (14, "fresh prose about bucketed shuffle joins and adaptive "
                 "query execution in distributed analytics engines"),
            # 14 = exact dup of 13 (earlier batch doc) -> drops in-batch
        ],
        ["doc_id", "text"],
    )
    kept, new_rows = dedup_against_band_ledger(batch, ledger)
    assert {r["doc_id"] for r in kept.collect()} == {13}
    assert kept.columns == batch.columns
    # ledger increment covers exactly the kept doc
    assert {r["doc_id"] for r in new_rows.collect()} == {13}
    # idempotency: re-ingesting doc 13's text against the grown ledger
    grown = ledger.unionByName(
        new_rows.select(F.col("doc_id").alias("doc"), "band_id", "band_hash")
    ).select("band_id", "band_hash")
    again = spark.createDataFrame(
        [(21, "fresh prose about bucketed shuffle joins and adaptive "
              "query execution in distributed analytics engines")],
        ["doc_id", "text"],
    )
    kept2, _ = dedup_against_band_ledger(again, grown)
    assert kept2.count() == 0


def test_pq_topk_cluster_structure_and_determinism(spark):
    """PQ/ADC: on cluster-structured vectors the compressed search
    returns the query's own cluster ahead of orthogonal ones; output
    is identical under repartitioning (deterministic codebooks from
    the md5 sample); indivisible dims are rejected."""
    import pytest

    from batch_processing_on_aws_spark.operators.similarity import pq_topk

    # two tight axis clusters + distractors, dim 8, m=4 subspaces
    rows = []
    for i in range(20):
        rows.append((i, [1.0, 0.05 * (i % 3)] + [0.0] * 6))              # cluster A
        rows.append((100 + i, [0.0] * 4 + [1.0, 0.05 * (i % 3)] + [0.0] * 2))  # cluster B
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(corpus, queries, m=4, k_codes=4, k=10, n_train=64)
    got = [r["vec_id"] for r in out.collect()]
    assert len(got) == 10
    assert all(v < 100 for v in got)  # all results from the query's cluster
    out2 = pq_topk(
        corpus.repartition(5), queries, m=4, k_codes=4, k=10, n_train=64
    )
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in out2.collect()]
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(corpus, queries, m=3, k_codes=4, k=5, n_train=64).collect()


def test_ivfpq_topk_cluster_structure_and_determinism(spark):
    """IVF-PQ: same cluster fixture as the PQ test — the probed-cells
    candidate reduction must still return the query's own cluster
    first (the coarse quantizer separates the two axis clusters into
    different cells, so probing keeps recall); deterministic under
    repartitioning."""
    from batch_processing_on_aws_spark.operators.similarity import ivfpq_topk

    rows = []
    for i in range(20):
        rows.append((i, [1.0, 0.05 * (i % 3)] + [0.0] * 6))
        rows.append((100 + i, [0.0] * 4 + [1.0, 0.05 * (i % 3)] + [0.0] * 2))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_topk(
        corpus, queries, n_cells=4, n_probe=2, m=4, k_codes=4, k=10, n_train=64
    )
    got = [r["vec_id"] for r in out.collect()]
    assert len(got) == 10
    assert all(v < 100 for v in got)
    out2 = ivfpq_topk(
        corpus.repartition(5), queries,
        n_cells=4, n_probe=2, m=4, k_codes=4, k=10, n_train=64,
    )
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in out2.collect()]


def test_pq_batched_shortlist_equals_unbatched(spark):
    """The per-Arrow-batch top-R emission (_batch_keep_mask) must not
    change results: pq_topk over one batch (coalesce(1) — the whole
    corpus passes a single keep-mask) and over many batches
    (repartition(8) — each batch emits its own shortlist, the window
    merges them) are row-identical, for both the raw ADC ranking
    (refine=None) and the exact-rerank path. Round-6 verdict task 2:
    the final window input is bounded by n_batches·R per query, never
    corpus-sized."""
    from batch_processing_on_aws_spark.operators.similarity import pq_topk
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for refine in (None, 50):
        one = pq_topk(emb.coalesce(1), queries, k=10, refine=refine)
        many = pq_topk(emb.repartition(8), queries, k=10, refine=refine)
        assert [tuple(r) for r in one.collect()] == [
            tuple(r) for r in many.collect()
        ], f"batched/unbatched divergence at refine={refine}"


def test_multiprobe_lsh_recall_dominates_home_bucket(spark):
    """Multi-probe LSH (probe_radius>0) can only ADD candidate
    buckets, so its recall must dominate the home-bucket-only run on
    the same planes — and at the registry operating point (6 planes,
    radius 4) it must clear the round-7 recall floor on the real
    embeddings."""
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb, queries, k=10).collect()}
    planes = _deterministic_planes(n_planes=6, dim=64)
    home = {(r["query_id"], r["vec_id"])
            for r in lsh_topk(emb, queries, planes, k=10).collect()}
    probed = {(r["query_id"], r["vec_id"])
              for r in lsh_topk(
                  emb, queries, planes, k=10, probe_radius=4
              ).collect()}
    home_recall = len(exact & home) / len(exact)
    probed_recall = len(exact & probed) / len(exact)
    assert probed_recall >= home_recall
    assert probed_recall >= 0.5, f"multiprobe recall collapsed: {probed_recall}"


def test_probe_masks_cover_hamming_ball():
    """probe_masks(b, r) is exactly the Hamming ball of radius r:
    Σ_{i≤r} C(b,i) distinct masks, each with ≤ r bits set, home
    (mask 0) first."""
    import math

    from batch_processing_on_aws_spark.operators.similarity import probe_masks

    for b, r in [(4, 1), (6, 4), (8, 2)]:
        masks = probe_masks(b, r)
        assert masks[0] == 0
        assert len(masks) == len(set(masks))
        assert len(masks) == sum(math.comb(b, i) for i in range(r + 1))
        assert all(m < 2**b and bin(m).count("1") <= r for m in masks)


def test_pq_refine_output_is_exact_cosine(spark):
    """With refine, pq_topk's cos_sim column must equal the true
    rounded cosine (brute_force_topk's value) for every returned
    pair — the re-rank is EXACT on the shortlist, approximation only
    decides shortlist membership."""
    from batch_processing_on_aws_spark.operators.similarity import pq_topk
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"]): r["cos_sim"]
             for r in brute_force_topk(emb, queries, k=500).collect()}
    for r in pq_topk(emb, queries, k=10).collect():
        key = (r["query_id"], r["vec_id"])
        assert key in exact
        assert r["cos_sim"] == exact[key], f"re-rank score drift at {key}"


def test_ranked_topk_partial_prune_equals_unbounded_window(spark):
    """_ranked_topk (partial top-k within (query_id, partition) before
    the global window) must be row-identical to the naive single-window
    plan — the prune is rank-preserving because ties are totally
    ordered by (cos_sim desc, vec_id asc). Run on real embeddings with
    a multi-partition scored set so the partial stage actually prunes."""
    from pyspark.sql import Window

    from batch_processing_on_aws_spark.operators.similarity import (
        _as_double,
        _ranked_topk,
        cosine,
    )
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = F.broadcast(
        emb.where(F.col("vec_id") < 7).select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("q_vec"),
        )
    )
    scored = (
        emb.repartition(8)
        .select(
            F.col("vec_id"), _as_double(F.col("embedding")).alias("c_vec")
        )
        .crossJoin(queries)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    k = 10
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    unbounded = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
        .collect()
    )
    bounded = _ranked_topk(scored, k).collect()
    assert [tuple(r) for r in bounded] == [tuple(r) for r in unbounded]
    # the bounded plan must actually carry the partial-rank stage:
    # two window operators, not one
    plan = _ranked_topk(scored, k)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("window") >= 2


def test_pq_topk_string_ids_flow_through(spark):
    """The PQ Arrow pass's output schema derives from the INPUT id
    column types (ADVICE r7): string corpus/query ids must flow
    through pq_topk and ivfpq_topk unchanged, not be miscast to long."""
    from batch_processing_on_aws_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
    )
    from batch_processing_on_aws_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        F.concat(F.lit("v"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    queries = emb.where(F.col("vec_id").isin("v1", "v2", "v3")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for fn in (pq_topk, ivfpq_topk):
        out = fn(emb, queries, k=5).collect()
        assert out, fn.__name__
        assert all(
            isinstance(r["vec_id"], str) and r["vec_id"].startswith("v")
            for r in out
        ), fn.__name__
        assert all(isinstance(r["query_id"], str) for r in out), fn.__name__


def test_ranked_topk_property_random_scores(spark):
    """Property check (seeded grid, heavy ties): the partial-prune
    top-k equals the naive single-window top-k for every (k,
    partition-count) combination — ties broken by vec_id make the
    order total, so the prune must be exactly rank-preserving."""
    import random

    from pyspark.sql import Window

    from batch_processing_on_aws_spark.operators.similarity import (
        _ranked_topk,
    )

    rng = random.Random(88)
    rows = [
        (q, v, round(rng.choice([0.1, 0.5, 0.5, 0.9]), 4))
        for q in range(4)
        for v in range(60)
    ]
    for k, parts in [(1, 2), (5, 7), (10, 3), (60, 4), (100, 2)]:
        scored = spark.createDataFrame(
            rows, "query_id long, vec_id long, cos_sim double"
        ).repartition(parts)
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id").asc()
        )
        naive = (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .orderBy("query_id", "rank")
            .collect()
        )
        got = _ranked_topk(scored, k).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in naive], (k, parts)


# --------------------------------------------------- prefix-filter join

def test_prefix_jaccard_complete_vs_brute_force(spark):
    """The prefix filter's whole point: ZERO false negatives — output
    must equal the brute-force all-pairs exact Jaccard at the same
    threshold, including boundary-exact pairs (J == t)."""
    from itertools import combinations

    from batch_processing_on_aws_spark.operators.neardup import (
        prefix_jaccard_pairs,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),          # J=4/6 with 1
        (3, "alpha beta gamma delta epsilon"),        # exact dup of 1
        (4, "unrelated words entirely here now"),
        (5, "alpha beta"),                            # small vs large
        (6, "gamma delta epsilon zeta eta theta iota kappa"),
        (7, ""),                                      # empty: never pairs
        (8, "ALPHA beta GAMMA delta EPSILON"),        # case-folds to 1
        (9, "x y z"),
        (10, "x y w"),                                # J=2/4 exactly 0.5
    ]
    tn, td = 1, 2  # t = 0.5, hits the J==t boundary for (9, 10)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["n_inter"]
        for r in prefix_jaccard_pairs(
            df, threshold_num=tn, threshold_den=td
        ).collect()
    }

    def toks(t):
        return set(t.lower().split())

    want = {}
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = toks(ta), toks(tb)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter * (td + tn) >= tn * (len(sa) + len(sb)):
            want[(min(ia, ib), max(ia, ib))] = inter
    assert got == want
    assert (3 in {a for a, _ in got} or 3 in {b for _, b in got})
    assert (9, 10) in got  # boundary-exact pair kept


def test_prefix_jaccard_complete_on_random_corpus(spark):
    """Property: on a seeded random corpus, prefix-filter output ==
    brute force at several rational thresholds."""
    import random
    from itertools import combinations

    from batch_processing_on_aws_spark.operators.neardup import (
        prefix_jaccard_pairs,
    )

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.sample(vocab, rng.randint(3, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for tn, td in ((3, 5), (4, 5), (1, 2)):
        got = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in prefix_jaccard_pairs(
                df, threshold_num=tn, threshold_den=td
            ).collect()
        }
        want = set()
        for (ia, ta), (ib, tb) in combinations(docs, 2):
            sa, sb = set(ta.split()), set(tb.split())
            inter = len(sa & sb)
            if inter * (td + tn) >= tn * (len(sa) + len(sb)):
                want.add((min(ia, ib), max(ia, ib)))
        assert got == want, (tn, td, got ^ want)


def test_prefix_jaccard_shingle_mode_complete(spark):
    """shingle_n switches elements to n-gram shingles; completeness
    still holds against brute force over the shingle sets."""
    from itertools import combinations

    from batch_processing_on_aws_spark.operators.neardup import (
        prefix_jaccard_pairs,
    )

    docs = [
        (1, "a b c d e f g"),
        (2, "a b c d e f h"),      # shares most 3-gram shingles with 1
        (3, "a b c d e f g"),      # exact dup of 1
        (4, "z y x w v u t"),
        (5, "a b"),                # <=3 tokens: whole text one shingle
        (6, "a b"),                # identical tiny doc: must pair with 5
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in prefix_jaccard_pairs(
            df, threshold_num=1, threshold_den=2, shingle_n=3
        ).collect()
    }

    def shingles(t):
        toks = t.split()
        if len(toks) <= 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = set()
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = shingles(ta), shingles(tb)
        n = len(sa & sb)
        if n * 3 >= 1 * (len(sa) + len(sb)):
            want.add((min(ia, ib), max(ia, ib)))
    assert got == want
    assert (1, 3) in got and (5, 6) in got


def test_ball_join_slicing_invariant(spark):
    """ball_dropped_ids returns the identical drop set under adaptive
    slicing (default), a fixed fan-out, and the naive single-slice
    join — the pair set is invariant to how cells are sliced, which
    is what lets the adaptive path skip replication on small cells."""
    from batch_processing_on_aws_spark.operators.similarity import (
        ball_dropped_ids,
    )

    rows = []
    for i in range(60):
        base = 1.0 if i % 3 else 5.0
        rows.append(
            (i, [base + (i % 7) / 50.0, base, base - (i % 5) / 40.0], i % 4)
        )
    df = spark.createDataFrame(
        rows, "vec_id long, c_vec array<double>, cell int"
    ).localCheckpoint(eager=True)

    def ids(**kw):
        return {
            r["vec_id"]
            for r in ball_dropped_ids(df, df, tau=0.999, **kw).collect()
        }

    adaptive = ids()
    assert adaptive == ids(slices=4)
    assert adaptive == ids(slices=1)
    # tiny target forces multi-slice cells through the adaptive path
    assert adaptive == ids(target_rows_per_slice=4, max_slices=8)
    assert adaptive  # the fixture plants real in-ball neighbors
