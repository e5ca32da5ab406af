"""Near-duplicate detection (M8): MinHash+LSH, SimHash, n-gram Jaccard.

All three are built from JVM-side array/hash built-ins — no Python
UDFs. Shapes and shuffle budgets at scale:

- **MinHash signatures**: pure projection (shingle → per-seed min
  hash). Banded LSH groups docs by (band_id, band_hash) — one shuffle
  keyed on the band value, O(docs × bands) rows moved; candidate pairs
  come out of same-bucket groups, never a cross product.
- **SimHash**: pure projection to a 64-bit signature; near-dup =
  Hamming distance ≤ t, checked only within LSH candidate groups.
- **n-gram Jaccard**: exact verification on candidate pairs only.

Hashing uses md5 (via ``F.md5`` on seed-prefixed shingles) rather than
``F.hash`` so signatures are engine-portable (the DuckDB oracle can
reproduce them bit-for-bit); xxhash64 would be the faster production
choice and is a one-line swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out
from .textstats import tokens


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct) of a text column: array of
    space-joined n-token windows. Empty/short docs yield their full
    token join as a single shingle so they still participate.

    PERF: prefer ``shingle_sets`` (or materialize ``tokens(col)`` as a
    real column and call ``shingles_from_tokens``) in anything hot —
    passed a raw text column, the tokenize (a regexp split) is inlined
    into every lambda reference and re-runs per window, ~13× slower at
    corpus scale."""
    return shingles_from_tokens(tokens(col), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Shingle windows over an already-materialized token-array column.
    ``concat_ws`` over ``element_at`` beats ``array_join(slice(...))``
    — no per-window array allocation."""
    k = F.size(toks)
    joined = F.array_join(toks, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - n, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(k <= n, F.array(joined)).otherwise(F.array_distinct(grams))


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """(``__id``, ``__sh``) shingle-ARRAY frame: fan out the scan,
    materialize the token array as a real column, then window it. Two
    selects instead of one so Catalyst evaluates the regexp tokenize
    ONCE per doc instead of once per shingle window (measured 13× on
    the sf0.1 corpus).

    Use ``shingle_index`` when the next step is an explode — exploding
    the ``__sh`` COLUMN from this frame trips an optimizer trap (see
    there). ``partitions`` is :func:`..partitioning.fan_out`'s escape
    hatch (0 = skip the fan-out; default adapts to the scan width)."""
    return (
        fan_out(df, partitions)
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks"))
        .select("__id", shingles_from_tokens(F.col("__toks"), shingle_n).alias("__sh"))
    )


def shingle_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """(``__id``, ``__s``) EXPLODED shingle frame — one row per
    (doc, distinct shingle) — the input to every inverted-index /
    signature aggregation.

    The generator input is deliberately the full shingle EXPRESSION
    over the materialized ``__toks`` column, not a pre-projected
    ``__sh`` column: exploding a plain column makes
    ``InferFiltersFromGenerate`` add a ``size(__sh) > 0`` filter whose
    predicate-pushdown re-inlines the whole tokenize+window expression
    into a Filter BELOW the fan-out exchange — i.e. evaluated per row
    on the unsplit scan partition, single-core (measured 20× slower at
    sf0.1). Keeping the expression inside the Generate pins all heavy
    work after the repartition."""
    return (
        fan_out(df, partitions)
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks"))
        .select(
            "__id",
            F.explode(shingles_from_tokens(F.col("__toks"), shingle_n)).alias("__s"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}) MinHash signature.

    Shape: explode shingles → hash-aggregate ``min(hash_i(s))`` per
    doc. The explode+groupBy form beats the tempting
    ``array_min(transform(...))`` projection by ~10× because
    higher-order array functions are interpreted per element, while
    the hashing and min-aggregates here run inside whole-stage codegen
    with map-side partial mins (only n_hashes values per doc cross the
    shuffle).

    One md5 yields 128 independent bits = FOUR 32-bit hash functions
    (8-hex-char substrings), so ``ceil(n/4)`` seeded md5 calls cover n
    hash functions — 4× less hashing than one md5 per function. min
    over fixed-width lowercase-hex strings is order-isomorphic to min
    over the 32-bit integers, and portable across engines (the DuckDB
    oracle reproduces it bit-for-bit). ``fan_out`` parallelizes the
    shingle+hash projection past a low-split upstream scan.
    """
    n_seeds = (n_hashes + 3) // 4
    exploded = shingle_index(df, text_col, id_col, shingle_n)
    hashed = exploded.select(
        "__id",
        *[
            F.md5(F.concat(F.lit(f"{s}:"), F.col("__s"))).alias(f"__h{s}")
            for s in range(n_seeds)
        ],
    )
    return (
        hashed.groupBy("__id")
        .agg(
            *[
                F.min(
                    F.substring(F.col(f"__h{i // 4}"), 1 + 8 * (i % 4), 8)
                ).alias(f"mh_{i}")
                for i in range(n_hashes)
            ]
        )
        .withColumnRenamed("__id", id_col)
    )


# Default boilerplate-clique cap for the CURATION path (pipeline.
# curate_corpus / plans.golden training_corpus / dup_cluster_canonical
# / neardup_verified_pairs). Chosen well above any natural bucket in
# the oracle corpora (measured max bucket: 3 at sf0.01, 12 at sf0.1)
# so the capped plan is bit-identical to the uncapped contract there,
# while a boilerplate template shared by even 1% of a large corpus
# blows past it and falls into the linear star path below.
CURATION_MAX_BUCKET_SIZE = 64


def band_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc, band_id, band_hash) — the banded MinHash signature
    stream. This is both the candidate-join key inside
    :func:`minhash_lsh_pairs` and the persistable unit of the FUZZY
    cross-batch ledger (:func:`dedup_against_band_ledger`): ~40 bytes
    per (doc, band), never document text."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        F.col(id_col).alias("doc"), F.explode(band_structs).alias("band")
    ).select("doc", "band.band_id", "band.band_hash")


def dedup_against_band_ledger(
    batch: DataFrame,
    ledger: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Cross-batch incremental NEAR-dup dedup: the fuzzy sibling of
    ``dedup.dedup_against_ledger`` (exact fingerprints) — drop every
    batch doc that LSH-collides with anything already accepted, where
    the accepted corpus is represented only by its persisted band
    hashes (:func:`band_signatures` rows; at 100 TB a bucketed table
    on (band_id, band_hash), joined without shuffling the ledger).

    Within-batch policy is EARLIER-OCCURRENCE-WINS, computed linearly:
    per (band_id, band_hash) bucket the minimum doc id survives and
    every larger id in the bucket drops — one hash-agg + one equi-join,
    NO pairwise self-join, so a boilerplate template in the batch
    costs O(m), not C(m,2) (the same discipline as the star cap).
    This is the greedy ingest-time policy, deliberately NOT
    transitive-closure dedup — batch docs that collide only with a
    DROPPED doc still drop (they share its bucket), but chains that
    never share a bucket stay separate; the offline clustering path
    (connected_components) is the tool for full closure.

    Returns ``(kept, new_ledger_rows)``: the surviving batch rows
    (schema unchanged) and the band rows to append to the ledger —
    bands of KEPT docs only, so the ledger stays a faithful signature
    of the accepted corpus and the pass is idempotent (re-ingesting a
    kept doc's identical text collides with its own bands and drops).
    """
    banded = band_signatures(
        batch, text_col, id_col, n_hashes, bands, shingle_n
    )
    led = ledger.select("band_id", "band_hash")
    hit_ledger = (
        banded.join(led, ["band_id", "band_hash"], "left_semi")
        .select("doc")
        .distinct()
    )
    bucket_min = banded.groupBy("band_id", "band_hash").agg(
        F.min("doc").alias("__m")
    )
    later = (
        banded.join(bucket_min, ["band_id", "band_hash"])
        .where(F.col("doc") > F.col("__m"))
        .select("doc")
        .distinct()
    )
    dropped = hit_ledger.unionByName(later).distinct()
    kept = batch.join(
        dropped.withColumnRenamed("doc", id_col), id_col, "left_anti"
    )
    new_rows = banded.join(dropped, "doc", "left_anti").select(
        F.col("doc").alias(id_col), "band_id", "band_hash"
    )
    return kept, new_rows


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = CURATION_MAX_BUCKET_SIZE,
    oversized: str = "star",
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of ``n_hashes/bands`` rows;
    docs sharing any band hash become a candidate pair. The band
    explode keeps the shuffle key small (band_id, md5-of-band) and the
    self-join runs per bucket — at 100 TB this is the standard
    fuzzy-dedup plan (cf. the public MinHashLSH in Spark MLlib, which
    this mirrors without the ML pipeline wrapper).

    ``max_bucket_size`` is the boilerplate-clique escape hatch: a
    bucket holding m docs emits C(m, 2) candidate pairs, so one
    template shared by 20% of a corpus makes the PAIR LIST itself
    quadratic — measured 26x wall / ~2000x output under a 20%-hot
    corpus (tools/skew_bench.py), with per-pair cost actually
    improving; the blowup is the output's size, not a serialized plan.
    With a cap, buckets larger than ``max_bucket_size`` leave the
    pairwise path (one hash-agg on the bucket key, broadcast anti-join
    of the tiny oversized-bucket list) — the standard large-scale move
    (cf. Dolma/BFF bucket caps). What happens to them is ``oversized``:

    - ``"drop"``: the bucket is removed entirely — a thousand-member
      bucket is boilerplate and belongs to exact dedup on the
      template, not a pairwise verifier.
    - ``"star"`` (default): each oversized bucket emits ``m - 1``
      star edges from the bucket's minimum doc id to every other
      member instead of the C(m, 2) clique. For a connected-
      components consumer (the curation path) star edges are EXACTLY
      connectivity-equivalent to the clique — the whole template
      still collapses into one cluster — while the pair table stays
      linear in the bucket size. The recall trade it accepts is that
      pairwise VERIFIERS see only (center, member) pairs for the
      template, not every member pair (fine: near-identical template
      copies verify against the center too).

    DEFAULTS (round-6 verdict task 6): ``CURATION_MAX_BUCKET_SIZE``
    with star fallback — the safe behavior is the default; the
    uncapped clique (``max_bucket_size=None``) is the explicit
    opt-in for exact-contract oracles and verification. On natural
    corpora the cap is not binding (measured max bucket 3 at sf0.01,
    12 at sf0.1 vs cap 64), so capped output ≡ uncapped output
    there — parity rows are unchanged by the default flip, while a
    boilerplate template can no longer quadratically blow up the
    pair list by default (SKEW_r07.json A/B).

    Output: (doc_id_a, doc_id_b) with a < b, distinct.
    """
    if oversized not in ("drop", "star"):
        raise ValueError(f"oversized must be 'drop' or 'star', got {oversized!r}")
    banded = band_signatures(df, text_col, id_col, n_hashes, bands, shingle_n)
    star = None
    if max_bucket_size is not None:
        # materialize the band stream ONCE: the cap path consumes it
        # from up to five subplans (bucket-size agg, oversized
        # semi-join, star centers, star join, the pairwise self-join's
        # two sides), and without this each consumer re-runs the
        # shingle+minhash pass — measured 2.6 s vs 1.7 s at sf0.1
        # (the round-9 leakage_safe_splits growth). The materialized
        # unit is (doc, band_id, band_hash) ≈ 40 B/band — the same
        # compact stream the fuzzy ledger persists by design, so the
        # 100-TB footprint argument is unchanged.
        banded = banded.localCheckpoint()
        big_buckets = (
            banded.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("__m"))
            .where(F.col("__m") > max_bucket_size)
            .select("band_id", "band_hash")
        )
        if oversized == "star":
            # members of oversized buckets; the per-bucket min doc is
            # one row per oversized bucket — tiny, broadcastable
            big = banded.join(
                F.broadcast(big_buckets), ["band_id", "band_hash"], "left_semi"
            )
            centers = big.groupBy("band_id", "band_hash").agg(
                F.min("doc").alias("__c")
            )
            star = (
                big.join(F.broadcast(centers), ["band_id", "band_hash"])
                .where(F.col("doc") != F.col("__c"))
                .select(
                    F.col("__c").alias("doc_id_a"),
                    F.col("doc").alias("doc_id_b"),
                )
            )
        banded = banded.join(
            F.broadcast(big_buckets), ["band_id", "band_hash"], "left_anti"
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairwise = a.join(
        b,
        on=[
            F.col("a.band_id") == F.col("b.band_id"),
            F.col("a.band_hash") == F.col("b.band_hash"),
            F.col("a.doc") < F.col("b.doc"),
        ],
    ).select(
        F.col("a.doc").alias("doc_id_a"), F.col("b.doc").alias("doc_id_b")
    )
    if star is not None:
        pairwise = pairwise.unionByName(star)
    return pairwise.distinct()


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_bits: int = 32,
    portable_hash: bool = True,
) -> DataFrame:
    """(doc_id, simhash) SimHash signatures: bit j of the signature =
    sign of the sum over shingles of ±1 according to bit j of the
    shingle's hash. ``n_bits ≤ 62`` keeps the signature a positive
    long.

    ``portable_hash=True`` (default) derives the 32-bit shingle hash
    from the first 8 hex chars of md5 — bit-reproducible in DuckDB
    (``('0x' || substr(md5(s),1,8))::BIGINT``), so signatures are
    oracle-checkable cross-engine, same trade as minhash_signatures.
    ``False`` swaps in xxhash64, the faster engine-local production
    choice. Requires ``n_bits ≤ 32`` for the portable hash.

    Shape: explode shingles → one hash per (doc, shingle) → n_bits
    codegen'd sum-aggregates (map-side partial) → final bit assembly.
    The array-fold formulation of the same thing runs interpreted per
    element and is ~100× slower.
    """
    if portable_hash:
        if n_bits > 32:
            raise ValueError("portable_hash covers 32 bits of md5 prefix")
        h = F.conv(F.substring(F.md5(F.col("__s")), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.col("__s"))
    exploded = shingle_index(df, text_col, id_col, shingle_n)
    # materialize the hash ONCE as a real column before the aggregate:
    # all n_bits sum-expressions reference it, and a projection
    # guarantees single evaluation per row instead of leaning on
    # aggregate-side subexpression elimination
    hashed = exploded.select("__id", h.alias("__h"))
    hcol = F.col("__h")
    sums = hashed.groupBy("__id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(hcol, j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"__b{j}")
            for j in range(n_bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(n_bits):
        sig = sig + F.when(F.col(f"__b{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select(F.col("__id").alias(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    n_bits: int = 32,
    max_hamming: int = 3,
    portable_hash: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding makes this an equi-join, never a cross
    product: split the signature into ``max_hamming + 1`` chunks —
    any pair within Hamming distance t must agree EXACTLY on at least
    one chunk — so candidates come from same-(chunk_id, chunk_value)
    buckets, then ``bit_count(xor)`` verifies the true distance.
    Shuffle is O(docs × chunks); the verification join is on the tiny
    candidate set. Same plan family as the MinHash-LSH pairs.

    Output: (doc_id_a, doc_id_b, hamming), a < b, distinct.
    """
    n_chunks = max_hamming + 1
    chunk_bits = n_bits // n_chunks
    sig = simhash_signatures(df, text_col, id_col, shingle_n, n_bits, portable_hash)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(F.col("simhash"), c * chunk_bits)
                .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                .alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
    )
    banded = sig.select(
        F.col(id_col).alias("doc"), F.col("simhash"), F.explode(chunks).alias("c")
    ).select("doc", "simhash", "c.chunk_id", "c.chunk_val")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(
            b,
            on=[
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk_val") == F.col("b.chunk_val"),
                F.col("a.doc") < F.col("b.doc"),
            ],
        )
        .select(
            F.col("a.doc").alias("doc_id_a"),
            F.col("b.doc").alias("doc_id_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two shingle arrays (size of intersection /
    size of union), null-safe for empty docs."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def jaccard_similar_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """Standalone n-gram Jaccard dedup via a shingle inverted index —
    no signatures: candidates are pairs sharing ≥1 *rare* shingle
    (document frequency ≤ ``max_df``), then exact Jaccard over the
    FULL shingle sets filters at ``threshold``.

    The df cap is the classic inverted-index guard: a boilerplate
    shingle appearing in k docs would emit k² candidate rows; capping
    df bounds the join fan-out at max_df² per shingle while leaving
    *verification* exact (full sets, not the filtered index). Pairs
    whose every shared shingle is boilerplate are the recall cost —
    the standard trade, stated rather than hidden. Shuffles: index
    groupBy + candidate equi-join on shingle; never a cross product.

    Output: (doc_id_a, doc_id_b, jaccard ≥ threshold), a < b.
    """
    sh_arr = shingle_sets(df, text_col, id_col, shingle_n)
    idx = shingle_index(df, text_col, id_col, shingle_n)
    rare = (
        idx.groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("__s")
    )
    filtered = idx.join(rare, "__s")
    cand = (
        filtered.alias("a")
        .join(
            filtered.alias("b"),
            on=[
                F.col("a.__s") == F.col("b.__s"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("doc_id_a"), F.col("b.__id").alias("doc_id_b")
        )
        .distinct()
    )
    out = (
        cand.join(
            sh_arr.select(
                F.col("__id").alias("doc_id_a"), F.col("__sh").alias("sh_a")
            ),
            "doc_id_a",
        )
        .join(
            sh_arr.select(
                F.col("__id").alias("doc_id_b"), F.col("__sh").alias("sh_b")
            ),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def rare_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int = 50,
) -> DataFrame:
    """n-gram Jaccard over the RARE-shingle sets, computed entirely
    from the inverted index — no signature, no array materialization.

    Jaccard restricted to shingles with document frequency ≤
    ``max_df``: |A∩B| comes from a pair-grouped count over the index
    self-join, |A|,|B| from per-doc counts, J = i / (|A|+|B|−i). All
    integer hash-agg arithmetic inside codegen — no per-pair array
    intersection (which is what makes the full-set variant
    ``jaccard_similar_pairs`` quadratic-costly on low-entropy
    corpora). Dropping the df head is the df-weighting production
    dedup uses anyway: ubiquitous shingles carry no similarity signal,
    and the cap simultaneously bounds the join fan-out at max_df² per
    shingle.

    Output: (doc_id_a, doc_id_b, jaccard ≥ threshold), a < b.
    """
    sized = _rare_intersections(df, text_col, id_col, shingle_n, max_df)
    j = F.col("__i").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__i")
    )
    return (
        sized.select(
            F.col("__ida").alias("doc_id_a"),
            F.col("__idb").alias("doc_id_b"),
            j.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _rare_intersections(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    max_df: int,
) -> DataFrame:
    """Shared skeleton of the rare-shingle pair family
    (``rare_jaccard_pairs``, ``rare_containment_pairs``): inverted
    index → df-cap filter → self-join intersection counts → per-doc
    set sizes. Returns one row per unordered pair with
    (``__ida`` < ``__idb``, ``__i`` intersection, ``__na``/``__nb``
    rare-set sizes) — callers derive their similarity ratio.

    The index carries xxhash64(shingle), not the shingle text: every
    downstream op (df count, self-join, set sizes) only needs
    equality, and an 8-byte key shrinks the checkpoint and the join
    shuffle ~4× vs ~20-byte shingle strings. Intersection COUNTS are
    unchanged (distinct shingles stay distinct barring a ~2⁻⁶⁴
    birthday collision), so string-arithmetic oracles still match
    exactly."""
    idx = shingle_index(df, text_col, id_col, shingle_n).select(
        "__id", F.xxhash64("__s").alias("__s")
    )
    rare = (
        idx.groupBy("__s")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("__s")
    )
    # materialize the narrow (id, hash) index once: it feeds three
    # consumers (both self-join sides + the size agg) and would
    # otherwise re-run the explode+df-filter subtree for each
    filtered = idx.join(rare, "__s").localCheckpoint()
    sizes = filtered.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    inter = (
        filtered.alias("a")
        .join(
            filtered.alias("b"),
            on=[
                F.col("a.__s") == F.col("b.__s"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .groupBy(
            F.col("a.__id").alias("__ida"), F.col("b.__id").alias("__idb")
        )
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    return inter.join(
        sizes.select(F.col("__id").alias("__ida"), F.col("__n").alias("__na")),
        "__ida",
    ).join(
        sizes.select(F.col("__id").alias("__idb"), F.col("__n").alias("__nb")),
        "__idb",
    )


def rare_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int = 50,
) -> DataFrame:
    """DIRECTED near-duplication by shingle containment:
    ``containment(src→dst) = |S(src) ∩ S(dst)| / |S(src)|`` over the
    rare-shingle sets (document frequency ≤ ``max_df``). Catches the
    asymmetric case Jaccard misses — a short document wholly embedded
    in a much longer one scores containment ≈ 1 while its Jaccard
    stays tiny (the union is dominated by the long doc).

    Both the numerator and denominator are restricted to rare
    shingles, so the measure is self-consistent (not a bound on
    full-set containment): this is the df-weighted variant production
    dedup uses — ubiquitous shingles carry no evidence of copying,
    and the cap simultaneously bounds the index self-join at max_df²
    per shingle (same plan skeleton as ``rare_jaccard_pairs``; the
    intersection/size arithmetic is all-integer hash-agg).

    Output: (src_id, dst_id, containment ≥ threshold), src ≠ dst —
    one directed row per direction that clears the threshold.
    """
    sized = _rare_intersections(df, text_col, id_col, shingle_n, max_df)
    # each undirected intersection row yields both directed scores
    directed = sized.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("__ida").alias("src_id"),
                    F.col("__idb").alias("dst_id"),
                    (F.col("__i").cast("double") / F.col("__na")).alias(
                        "containment"
                    ),
                ),
                F.struct(
                    F.col("__idb").alias("src_id"),
                    F.col("__ida").alias("dst_id"),
                    (F.col("__i").cast("double") / F.col("__nb")).alias(
                        "containment"
                    ),
                ),
            )
        ).alias("__d")
    ).select("__d.*")
    return directed.where(F.col("containment") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    decimals: int | None = None,
) -> DataFrame:
    """Verify candidate pairs by exact n-gram Jaccard; keep those at or
    above ``threshold``. Joins shingle arrays to both sides of the
    pair list — at scale the pair list is ≪ corpus, so both joins
    broadcast the pairs side.

    ``decimals=None`` leaves the ratio unrounded: a division of two
    identical integers is bit-identical across engines, while rounding
    can tie (1/32 = 0.03125 at 4 decimals)."""
    sh = shingle_sets(df, text_col, id_col, shingle_n)
    j = jaccard(F.col("sh_a"), F.col("sh_b"))
    if decimals is not None:
        j = F.round(j, decimals)
    out = (
        pairs.join(sh.withColumnRenamed("__id", "doc_id_a").withColumnRenamed("__sh", "sh_a"), "doc_id_a")
        .join(sh.withColumnRenamed("__id", "doc_id_b").withColumnRenamed("__sh", "sh_b"), "doc_id_b")
        .select("doc_id_a", "doc_id_b", j.alias("jaccard"))
    )
    return out.where(F.col("jaccard") >= threshold)


def span_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """(``doc_id``, ``pos``, ``span_hash``) — every positional
    ``window``-token span of every doc, md5-hashed. Unlike
    :func:`shingle_index` the windows are POSITIONAL (not distinct):
    exact-substring dedup needs every occurrence, including repeats
    inside one doc. Docs shorter than ``window`` emit nothing — a span
    shorter than the window is not a span.

    Same optimizer discipline as ``shingle_index``: the window
    expression stays inside the Generate (posexplode of the expression
    over the materialized ``__toks`` column) so pushdown cannot
    re-inline the tokenize below the fan-out exchange. ``sequence`` is
    guarded by a ``when`` — Spark's ``sequence(0, negative)`` happily
    counts DOWN, which would fabricate windows for short docs."""
    toks = F.col("__toks")
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - window),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(window)]
            )
        ),
    )
    guarded = F.when(k >= window, grams).otherwise(
        F.array().cast("array<string>")
    )
    return (
        fan_out(df, partitions)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks"))
        .select("doc_id", F.posexplode(guarded).alias("pos", "span_hash"))
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
) -> DataFrame:
    """Exact substring-duplicate occurrences at token-window
    granularity — the shuffle-engine re-expression of suffix-array
    ExactSubstr dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22): every ``window``-token span
    whose text occurs 2+ times anywhere in the corpus (cross-doc or
    repeated within one doc), with its occurrence count.

    Output: (doc_id, pos, span_hash, n_occurrences), one row per
    flagged occurrence; ``pos`` is the 0-based token offset, so
    downstream trimming can cut the exact span.

    Scale shape: one hash-agg over the span stream (map-side partial
    combine — duplicated spans collapse before the exchange) and one
    shuffle equi-join back on ``span_hash``. No pair explosion: a span
    occurring f times costs f output rows, not f² pairs, so boilerplate
    (headers, license blocks) stays linear.

    The span stream feeds BOTH sides of the frequency self-join, so it
    is materialized once via :func:`_span_base` (localCheckpoint) —
    without it the tokenize+posexplode fan-out is computed twice (the
    two exchanges differ — partial-agg vs probe side — so
    ReusedExchange cannot collapse them)."""
    base = _span_base(df, text_col, id_col)
    spans = _positional_spans(base, window)
    freq = (
        spans.groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= 2)
    )
    return spans.join(freq, "span_hash").select(
        "doc_id", "pos", "span_hash", "n_occurrences"
    )


def dup_span_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
) -> DataFrame:
    """Per-doc duplicated-substring ratio — the RefinedWeb-style
    quality signal built on :func:`duplicate_spans`: of a doc's
    ``window``-token spans, what fraction also occur elsewhere in the
    corpus. Docs shorter than ``window`` have no spans and are absent
    (their ratio is undefined, not zero).

    Output: (doc_id, n_spans, n_dup_spans, dup_share). The share is an
    exact integer ratio (count/count), so it is bit-identical across
    engines unrounded. Span stream materialized once via
    :func:`_span_base` (see :func:`duplicate_spans`)."""
    base = _span_base(df, text_col, id_col)
    spans = _positional_spans(base, window)
    freq = (
        spans.groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    flagged = spans.join(freq, "span_hash").select(
        "doc_id", (F.col("__f") >= 2).cast("int").alias("__dup")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("__dup").alias("n_dup_spans"),
        (F.sum("__dup") / F.count(F.lit(1))).alias("dup_share"),
    )


def _span_base(df, text_col: str, id_col: str):
    """(doc_id, __toks) with the tokenize materialized once and the
    lineage checkpointed — shared scaffold of the ExactSubstr family
    (both the span pass and the rebuild re-read it)."""
    return (
        fan_out(df)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks"))
        .localCheckpoint()
    )


def _positional_spans(base: DataFrame, window: int) -> DataFrame:
    """(doc_id, pos, span_hash) positional windows over a
    :func:`_span_base` frame; same Generate discipline as
    :func:`span_windows`."""
    toks = F.col("__toks")
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - window),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(window)]
            )
        ),
    )
    guarded = F.when(k >= window, grams).otherwise(
        F.array().cast("array<string>")
    )
    return base.select("doc_id", F.posexplode(guarded).alias("pos", "span_hash"))


def _excise(base: DataFrame, cut_occ: DataFrame, window: int) -> DataFrame:
    """Rebuild every doc of ``base`` with the token ranges covered by
    ``cut_occ`` (doc_id, pos span starts) removed: covered positions
    explode to ≤ window × occurrences rows before a distinct, then one
    anti-join on (doc, position) and one grouped sort-rebuild."""
    toks = F.col("__toks")
    cut_pos = (
        cut_occ.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
            ).alias("p"),
        )
        .distinct()
    )
    tokpos = base.select("doc_id", F.posexplode(toks).alias("p", "tok"))
    kept = tokpos.join(cut_pos, ["doc_id", "p"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("__text"),
        F.count(F.lit(1)).alias("__kept"),
    )
    return (
        base.select("doc_id", F.size(toks).alias("__n"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__text"), F.lit("")).alias("text"),
            (F.col("__n") - F.coalesce(F.col("__kept"), F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    keep_first: bool = True,
) -> DataFrame:
    """ExactSubstr REMOVAL — the cut step downstream of
    :func:`duplicate_spans`: rebuild each doc's text with every token
    covered by a duplicated ``window``-token span excised.

    ``keep_first=True`` (default) keeps the globally-first occurrence
    of each span (ordered by (doc_id, pos)) and cuts the rest — the
    conservative variant that never destroys the only copy of a
    passage. ``keep_first=False`` cuts every occurrence, matching the
    reference ExactSubstr tool's remove-all behavior (Lee et al.,
    ACL'22).

    Output: (doc_id, text, n_tokens_removed) for EVERY input doc —
    docs with nothing cut pass through with their tokenized text
    rejoined by single spaces (tokenization is the same ``\\s+`` split
    both engines use), fully-covered docs come back with empty text.

    Scale shape: the global-first choice is NOT a window — a
    boilerplate span occurring in millions of docs would serialize a
    per-hash ``row_number`` partition on one reducer. Instead the
    first occurrence is ``min(struct(doc_id, pos))`` inside the same
    hash-aggregate that counts occurrences: lexicographic struct-min
    is associative, so the partial (map-side) aggregation collapses
    the hot hash BEFORE the exchange and the hot key costs one
    combined row per input partition. The excision itself is
    :func:`_excise` — nothing driver-side, nothing all-pairs."""
    base = _span_base(df, text_col, id_col)
    spans = _positional_spans(base, window)
    # the first-occurrence struct-min is only aggregated when the
    # keep-first path will read it — remove-all pays for the count only
    aggs = [F.count(F.lit(1)).alias("__c")]
    if keep_first:
        aggs.append(F.min(F.struct("doc_id", "pos")).alias("__first"))
    dup_hashes = (
        spans.groupBy("span_hash").agg(*aggs).where(F.col("__c") >= 2)
    )
    cut_occ = spans.join(dup_hashes, "span_hash")
    if keep_first:
        cut_occ = cut_occ.where(
            ~(
                (F.col("doc_id") == F.col("__first.doc_id"))
                & (F.col("pos") == F.col("__first.pos"))
            )
        )
    return _excise(base, cut_occ, window)


def remove_spans_against_ledger(
    df: DataFrame,
    ledger: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    within_batch: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Incremental ExactSubstr dedup: clean a NEW batch against the
    span hashes of everything already ingested, the exact-substring
    analogue of :func:`..dedup.dedup_against_ledger` (which works at
    whole-doc granularity).

    Cuts from each batch doc (1) every span whose hash is in
    ``ledger`` — that passage already exists in the corpus — and
    (2) within-batch later occurrences (keep-first among the batch;
    disable with ``within_batch=False`` when the ledger is an
    EXTERNAL reference rather than the corpus's own history — e.g.
    benchmark decontamination, where corpus-internal repetition is
    not the ledger's business).
    Returns ``(cleaned, new_hashes)``: the rebuilt batch docs and the
    distinct span hashes of the REBUILT text not already in the
    ledger, ready to append so the next batch sees this one's content.
    The delta is recomputed from the cleaned text, not carried over
    from the pre-cut span stream: a fresh span that overlapped a
    ledger-covered region loses tokens in the rebuild, so advertising
    its pre-cut hash would let a later delivery of that passage be
    excised even though no copy survives anywhere — the ledger must
    describe exactly what the corpus contains (including the new
    token adjacencies excision creates). Appending only the delta
    keeps the ledger write O(new content); the ledger table should be
    bucketed by ``span_hash`` so this join co-locates.

    Scale shape: ledger membership is a broadcast/shuffle semi-join on
    the hash key; the within-batch pass is the same map-side
    aggregate-min as :func:`remove_duplicate_spans`. The ledger is
    never rewritten, only appended to."""
    base = _span_base(df, text_col, id_col)
    spans = _positional_spans(base, window)
    known = ledger.select("span_hash").distinct()

    # ONE pass over the corpus-scale ledger (round-14): the old
    # semi-join (in-ledger spans) + anti-join (fresh spans) pair read
    # `known` twice and re-generated the batch span stream per
    # consumer. A single left join marks membership; the marked frame
    # is one row per POSITIONAL SPAN of the batch — roughly one row
    # per batch token (span_hash + doc_id + pos ≈ 50 B/row), i.e. a
    # small multiple of the batch TEXT size, never ledger/corpus-
    # scale. It is persisted (spillable MEMORY_AND_DISK, lineage kept
    # so an executor loss recomputes instead of failing the job —
    # round-15, vs the prior localCheckpoint whose truncated lineage
    # is unrecoverable) and materialized once by the count action, so
    # the in-ledger / fresh / keep-first consumers below all read it
    # instead of re-running the ledger scan and the tokenize+span
    # generation.
    from pyspark import StorageLevel

    marked = spans.join(
        known.withColumn("__in", F.lit(True)), "span_hash", "left"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    marked.count()
    in_ledger = marked.where(F.col("__in")).select("doc_id", "pos")
    cut_occ = in_ledger
    if within_batch:
        fresh = marked.where(F.col("__in").isNull())
        batch_dups = (
            fresh.groupBy("span_hash")
            .agg(
                F.count(F.lit(1)).alias("__c"),
                F.min(F.struct("doc_id", "pos")).alias("__first"),
            )
            .where(F.col("__c") >= 2)
        )
        batch_later = (
            fresh.join(batch_dups, "span_hash")
            .where(
                ~(
                    (F.col("doc_id") == F.col("__first.doc_id"))
                    & (F.col("pos") == F.col("__first.pos"))
                )
            )
            .select("doc_id", "pos")
        )
        cut_occ = in_ledger.unionByName(batch_later)
    cleaned = _excise(base, cut_occ, window)
    new_hashes = (
        span_windows(cleaned, text_col="text", id_col="doc_id", window=window)
        .select("span_hash")
        .distinct()
        .join(known, "span_hash", "left_anti")
    )
    return cleaned, new_hashes


def winnowed_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    winnow: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
    algorithm) over the positional span-hash stream: from every run of
    ``winnow`` consecutive ``window``-token span hashes, keep the
    minimum; output each doc's DISTINCT selected hashes.

    The guarantee: any shared passage of at least
    ``window + winnow − 1`` tokens between two docs yields at least one
    shared fingerprint, while the fingerprint set shrinks to roughly
    ``2/(winnow+1)`` of the full span stream — the standard fix for
    the span ledger's ≈one-hash-per-token footprint
    (:func:`remove_spans_against_ledger` docstring) when passage-level
    RECALL at a coarser threshold is acceptable: winnowed ledgers
    detect duplicated passages, they cannot reconstruct exact cut
    positions, so they pair with flag-and-drop policies rather than
    token excision.

    Scale shape: the running min is a per-DOC window (ROWS frame of
    ``winnow``), so partitions are doc-sized — bounded by the longest
    document, never corpus-sized; the distinct is a hash-agg with
    map-side partials. Lowercase-hex md5 ordering is identical in
    Spark and DuckDB, so the selection is oracle-reproducible."""
    from pyspark.sql import Window

    spans = span_windows(df, text_col, id_col, window)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, winnow - 1)
    )
    picked = spans.select(
        "doc_id",
        F.min("span_hash").over(w).alias("fingerprint"),
        F.count("span_hash").over(w).alias("__n"),
    ).where(F.col("__n") == winnow)
    return picked.select("doc_id", "fingerprint").distinct()


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 3,
    threshold_den: int = 5,
    shingle_n: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join with the PREFIX-FILTER guarantee
    (the PPJoin/AllPairs family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08): every pair of documents whose distinct-token Jaccard is
    ≥ ``threshold_num/threshold_den``, with ZERO false negatives —
    the completeness the df-capped inverted index
    (:func:`jaccard_similar_pairs`) deliberately trades away.

    Prefix filter: order each document's tokens by global rarity
    (document frequency asc, token asc — one shared total order) and
    index only its first ``|x| − ⌈t·|x|⌉ + 1`` tokens. If two sets
    share NO indexed token, their overlap is at most ``⌈t·|x|⌉ − 1 <
    t·|x| ≤ t·|x∪y|`` — so every qualifying pair collides on some
    prefix token (completeness), while the indexed tokens are each
    document's RAREST, keeping candidate fan-out small by
    construction. A size filter (``t·max ≤ min``, exact integers)
    prunes before verification; the verify step counts the true
    intersection through a token equi-join restricted to candidates
    and applies the threshold as the EXACT integer inequality
    ``n·(t_den + t_num) ≥ t_num·(|x| + |y|)`` — no float enters until
    the reported jaccard value. The threshold is a RATIONAL
    (num/den), which is what makes every filter integer-exact and
    cross-engine replayable.

    ``shingle_n`` switches the set elements from lowercased
    whitespace tokens to n-gram SHINGLES (the :func:`shingle_index`
    space, case-sensitive): on small-vocabulary or template-heavy
    corpora unigram sets degenerate (every document shares most of a
    tiny vocabulary, so qualifying pairs are quadratic TRUE output),
    while the shingle space is vocab^n-sized and keeps qualifying
    pairs the planted near-dups.

    Scale: shuffles are (a) token hash-aggs, (b) the prefix-token
    equi-join, (c) the candidate-restricted verify equi-join — never
    a cross product. Hot tokens self-limit: a token is indexed only
    when it is among a document's rarest, so boilerplate lands in
    prefixes only for documents made OF boilerplate, where the pairs
    are true output (an output-heavy corpus is inherently pair-heavy
    under completeness — cap with the LSH family if you want recall
    trades). Empty documents have no tokens and never pair.

    Output: ``(doc_id_a, doc_id_b, n_inter, jaccard)``, a < b.
    """
    from pyspark.sql import Window

    tn, td = int(threshold_num), int(threshold_den)
    if not 0 < tn <= td:
        raise ValueError(
            f"threshold must be a rational in (0, 1]: {tn}/{td}"
        )
    if shingle_n is None:
        base = fan_out(df, partitions).select(
            F.col(id_col).alias("__id"), F.lower(F.col(text_col)).alias("__t")
        )
        tok = base.select(
            "__id", F.explode(tokens(F.col("__t"))).alias("__tok")
        ).where(F.col("__tok") != "").distinct()
    else:
        tok = shingle_index(
            df, text_col, id_col, shingle_n, partitions
        ).select("__id", F.col("__s").alias("__tok"))
    # the element frame feeds FOUR consumers (sizes, df, rank, both
    # verify legs) — a lazy localCheckpoint materializes the
    # tokenize/shingle pass once instead of re-deriving it per
    # consumer (measured 5.9 s → 3.5 s at sf0.1)
    tok = tok.localCheckpoint(eager=False)
    sizes = tok.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    dfreq = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    # per-doc rarity order; prefix length |x| - ceil(t|x|) + 1
    w = Window.partitionBy("__id").orderBy(
        F.col("__df").asc(), F.col("__tok").asc()
    )
    ranked = (
        tok.join(dfreq, "__tok")
        .withColumn("__rn", F.row_number().over(w))
        .join(sizes, "__id")
    )
    # ceil(t·|x|) via exact integer division — a double quotient can
    # mis-floor on exactly-divisible sizes
    ceil_tn = F.expr(f"({tn} * __n + {td - 1}) div {td}")
    prefix = ranked.where(
        F.col("__rn") <= F.col("__n") - ceil_tn + F.lit(1)
    ).select("__id", "__tok", "__n")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.__tok") == F.col("b.__tok"),
                F.col("a.__id") < F.col("b.__id"),
                # size filter: t * max <= min, exact integers
                F.lit(tn) * F.greatest(F.col("a.__n"), F.col("b.__n"))
                <= F.lit(td) * F.least(F.col("a.__n"), F.col("b.__n")),
            ],
        )
        .select(
            F.col("a.__id").alias("doc_id_a"),
            F.col("b.__id").alias("doc_id_b"),
            F.col("a.__n").alias("__na"),
            F.col("b.__n").alias("__nb"),
        )
        .distinct()
    )
    inter = (
        cand.join(tok.select(F.col("__id").alias("doc_id_a"), "__tok"), "doc_id_a")
        .join(
            tok.select(F.col("__id").alias("doc_id_b"), "__tok"),
            ["doc_id_b", "__tok"],
        )
        .groupBy("doc_id_a", "doc_id_b", "__na", "__nb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    out = inter.where(
        F.col("n_inter") * F.lit(td + tn)
        >= F.lit(tn) * (F.col("__na") + F.col("__nb"))
    )
    return out.select(
        "doc_id_a",
        "doc_id_b",
        "n_inter",
        F.round(
            F.col("n_inter")
            / (F.col("__na") + F.col("__nb") - F.col("n_inter")),
            6,
        ).alias("jaccard"),
    )
