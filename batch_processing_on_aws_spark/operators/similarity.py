"""Embedding similarity search (extension surface; SURVEY.md §7 M8).

Brute-force cosine top-k as the correctness baseline, and an
LSH-bucketed variant (random hyperplane signatures) as the scale path.
All arithmetic runs JVM-side via higher-order array functions
(``zip_with`` + ``aggregate``) — no Python in the hot loop.

Scale: brute force is O(Q·N) pairs; with Q broadcast it never shuffles
the corpus and is the right answer for small query sets. The LSH
variant buckets both sides on a b-bit hyperplane signature so
candidate generation is an equi-join on the bucket id — shuffle
O(N + Q) instead of a cross product — then exact-rescores candidates.
Recall is tunable via (n_planes, n_tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import fan_out


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    """Cosine similarity between two array<double> columns, as a single
    codegen'd expression."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k over a scored candidate set, with a partial
    pre-prune so the global per-query window never sees a corpus-scaled
    input.

    The naive shape — one ``Window.partitionBy(query_id)`` over all
    candidates — funnels every candidate for a query through a single
    reducer; at high-recall probe settings (IVF n_probe=12/16, LSH
    multi-probe) that is ~the whole corpus per query. Instead, rank
    within ``(query_id, spark_partition_id())`` first and keep ≤k per
    group: any row in the global top-k is by definition in its own
    group's top-k under the same total order (cos_sim desc, vec_id
    asc), so the prune is rank-preserving. The global window then sees
    ≤ num_partitions·k rows per query — bounded by plan width, not
    corpus size. This is the JVM-side twin of ``_batch_keep_mask`` in
    the PQ paths.

    Expects columns ``query_id``, ``vec_id``, ``cos_sim`` (extra
    columns pass through). Output adds ``rank`` (long, 1..k), ordered
    by (query_id, rank).
    """
    from pyspark.sql import Window

    order = [F.col("cos_sim").desc(), F.col("vec_id").asc()]
    pw = Window.partitionBy("query_id", "__part").orderBy(*order)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("__part", F.spark_partition_id())
        .withColumn("__pr", F.row_number().over(pw))
        .where(F.col("__pr") <= k)
        .drop("__part", "__pr")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_arrow(a, b):
    """Cosine similarity as an Arrow-batched Pandas UDF (numpy dot
    products over whole batches). The expression form above stays
    JVM-side but higher-order array functions run interpreted per
    element; this one pays one Python round-trip per BATCH and then
    vectorizes — the faster choice for very wide vectors (≳1k dims)
    or very hot inner loops. Both forms are result-equivalent
    (tests pin them to 1e-9)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(xs, ys):
        out = []
        for x, y in zip(xs, ys):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            denom = np.linalg.norm(xv) * np.linalg.norm(yv)
            out.append(float(xv @ yv / denom) if denom else float("nan"))
        import pandas as pd

        return pd.Series(out)

    return _cos(a, b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    partitions: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    ``queries`` (columns: query_id_col, vec_col) is broadcast — the
    corpus streams through unshuffled; the only shuffle is the final
    per-query top-k (tiny: k rows per query per partition after the
    window's partial rank pruning).

    Output: (query_id, vec_id, cos_sim, rank), rank 1..k, ties broken
    by vec_id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
        )
    )
    c = fan_out(corpus, partitions).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_by: str | None = "label",
    broadcast_right: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with a < b and
    cosine ≥ threshold.

    With ``bucket_by`` set (a cluster/label/LSH-bucket column), the
    self-join is an equi-join on the bucket — candidates stay within
    buckets and the plan shuffles O(N), the standard scale path for
    embedding dedup. ``bucket_by=None`` is the exact O(N²) cross join:
    correct at any recall, affordable only for small corpora or as the
    verification oracle.

    The right side is broadcast when ``broadcast_right`` (default):
    bucket ids are few (labels / LSH bands), so a shuffle-on-bucket
    join lands each bucket on ONE reducer and the cosine scoring
    serializes per bucket. Broadcasting the right side keeps the left
    side's fan-out partitioning through the join, so scoring
    parallelizes across all cores regardless of bucket skew. At
    corpus sizes past the broadcast limit, flip it off and rely on
    AQE skew-join splitting instead.
    """
    base = corpus.select(
        F.col(id_col).alias("__id"),
        _as_double(F.col(vec_col)).alias("__v"),
        *([F.col(bucket_by).alias("__b")] if bucket_by else []),
    )
    a = fan_out(base, partitions).select(*[F.col(c).alias(f"a{c}") for c in base.columns])
    b = base.select(*[F.col(c).alias(f"b{c}") for c in base.columns])
    if broadcast_right:
        b = F.broadcast(b)
    if bucket_by:
        joined = a.join(b, F.col("a__b") == F.col("b__b"))
    else:
        joined = a.crossJoin(b)
    return (
        joined.where(F.col("a__id") < F.col("b__id"))
        .select(
            F.col("a__id").alias("vec_id_a"),
            F.col("b__id").alias("vec_id_b"),
            F.round(cosine(F.col("a__v"), F.col("b__v")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _train_centroids(
    c: DataFrame,
    n_cells: int,
    seed: int,
    max_iter: int,
    n_train: int = 4096,
):
    """n_cells × dim numpy centroid matrix from driver-side Lloyd
    k-means over a deterministic sample.

    The sample is the ``n_train`` rows with the smallest
    ``md5(seed || ':' || vec_id)`` — a deterministic uniform draw that
    Spark executes as TakeOrdered (per-partition top-n + driver merge,
    no full sort, no shuffle of the corpus). md5 rather than xxhash64
    so the draw — and therefore the trained centroids — is reproducible
    outside Spark (hashlib / DuckDB md5 give the same hex), which lets
    the DuckDB oracle inline the identical centroids as literals.
    """
    import numpy as np

    sample = (
        c.orderBy(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("vec_id").cast("string")))
        )
        .limit(n_train)
        .select("c_vec")
        .collect()
    )
    X = np.asarray([r["c_vec"] for r in sample], dtype=np.float64)
    return _kmeans(X, n_cells, seed, max_iter)


def _kmeans(X, n_cells: int, seed: int, max_iter: int):
    """Lloyd k-means shared by the Spark path and the oracle generator
    (identical numpy ops ⇒ bit-identical centroids for the same X)."""
    import numpy as np

    k = min(n_cells, len(X))
    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(max_iter):
        # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is constant per row
        d = (centers**2).sum(1)[None, :] - 2.0 * (X @ centers.T)
        assign = d.argmin(1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                centers[j] = members.mean(0)
    return centers


def _assign_cells(c: DataFrame, centers) -> DataFrame:
    """Add a ``cell`` column: index of the nearest centroid (Euclidean)
    for each row of ``c`` (columns: vec_id, c_vec).

    Arrow-batched numpy argmax projection — the centroid matrix rides
    the task closure, so assignment is a pure map with NO shuffle; one
    ``X @ Cᵀ`` matmul scores a whole Arrow batch against every
    centroid at once. Euclidean argmin via argmax of ``v·c − ‖c‖²/2``
    (‖v‖² constant per row); ties to the lower cell id (numpy
    first-hit), matching the oracle's ``ORDER BY score DESC, cell``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    half_sq = (centers**2).sum(1) / 2.0
    dim = centers.shape[1]

    @pandas_udf("int")
    def _cell(vs):
        X = np.asarray(vs.tolist(), dtype=np.float64).reshape(-1, dim)
        s = X @ centers.T - half_sq[None, :]
        return pd.Series(s.argmax(1).astype("int32"))

    return c.withColumn("cell", _cell("c_vec"))


# within-cell compare parallelism: a cell's candidate rows split into
# salted slices, so the join key is (cell, slice) and a hot cell runs
# as many tasks instead of one. Comparators replicate ×slices (linear,
# bounded — slices ∝ cell population / TARGET rows), the pair set is
# unchanged (each candidate lives in exactly one slice of its cell).
BALL_SLICE_TARGET_ROWS = 2048
BALL_JOIN_MAX_SLICES = 64


def ball_dropped_ids(
    candidates: DataFrame,
    comparators: DataFrame,
    tau: float,
    slices: int | None = None,
    partitions: int | None = None,
    target_rows_per_slice: int = BALL_SLICE_TARGET_ROWS,
    max_slices: int = BALL_JOIN_MAX_SLICES,
) -> DataFrame:
    """ids of ``candidates`` rows having SOME strictly-smaller-id
    same-cell comparator within the cosine ball — SemDeDup's drop
    rule, shared by the one-shot :func:`semantic_dedup` and the
    standing :class:`~.semdedup_index.SemDedupIndex`. Cosine rounded
    to 4 decimals before thresholding (the cross-engine
    reproducibility convention).

    SALTED join (round-13): the naive equi-join on the cell id has at
    most ``n_cells`` distinct keys, and AQE's skew-split keys on
    shuffle INPUT bytes while the within-cell compare blows up in the
    join OUTPUT — so a hot cell (legitimately dense, or a drifted
    quantizer below the hot-cell guard) serializes its quadratic
    compare on ONE task (observed live: a 30× fold pinned a single
    core for minutes while 31 sat idle). Joining on (cell, slice)
    with candidates hashed into salted groups and comparators
    replicated per slice splits every cell's compare into independent
    tasks; the candidate×comparator pair set — and therefore the
    result — is identical. The candidate side is repartitioned on the
    join key with an EXPLICIT partition count: AQE coalescing ALSO
    keys on input bytes, so it would quietly fold the salted shuffle
    back into one or two tasks (observed on the same 30× fold — the
    blowup is invisible to it), and an explicit count is the one
    shuffle AQE leaves alone; it simultaneously fixes the inherited
    parallelism of a single-file delivery.

    ADAPTIVE slice count (round-14): a fixed slice count taxes the
    common case — comparators replicate ×slices in EVERY cell, so a
    uniform corpus of small cells shuffles slices× the vectors for
    zero parallelism gain. The default (``slices=None``) derives each
    cell's slice count from its OWN comparator population via ONE
    narrow hash-agg, then picks the cheapest attachment for what it
    finds (measured at sf0.1: the first cut of this — per-cell counts
    eagerly checkpointed and broadcast-joined into BOTH sides — cost
    the uniform one-shot path ~2.5× in extra jobs and joins):

    * NO hot cells (every population ≤ ``target_rows_per_slice``,
      the common uniform corpus): plain equi-join on the cell id —
      zero salting machinery, just the explicit-count repartition;
    * a BOUNDED hot set (≤ 4096 hot cells — far above anything the
      hot-cell guard admits): slice counts ride as a literal map in
      the plan, so neither side pays a join — small cells hash to
      slice 0 and replicate ×1, hot cells fan out;
    * an UNBOUNDED hot set (pathological; the guard aborts first in
      the index paths): the fully distributed fallback — per-cell
      counts broadcast-joined into both sides.

    The pair set and result are identical under any slicing (each
    candidate lands in exactly one slice of its cell; its cell's
    comparators are present in every slice). An explicit ``slices``
    pins a fixed fan-out (the skew harness uses ``slices=1`` as the
    naive single-task baseline).

    CONTRACT (round-15): with ``slices=None`` the hot-cell detection
    runs a driver-blocking aggregate over ``comparators`` BEFORE the
    join plan executes — callers must pass a MATERIALIZED comparator
    frame (localCheckpoint'd / persisted, as every in-repo caller
    does), otherwise a non-trivial comparator subplan executes at
    least twice (detection job + join) — the double-execution class
    round 14 removed elsewhere."""
    spark = candidates.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    a = candidates.select(
        F.col("vec_id").alias("a_id"),
        F.col("c_vec").alias("a_vec"),
        "cell",
    )
    b = comparators.select(
        F.col("vec_id").alias("b_id"), F.col("c_vec").alias("b_vec"), "cell"
    )
    if slices is None:
        max_hot_collect = 4096
        hot = (
            comparators.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .where(F.col("__cnt") > target_rows_per_slice)
            .limit(max_hot_collect + 1)
            .collect()
        )
        if not hot:
            # uniform corpus: the join on the bare cell id IS the
            # adaptive answer (1 slice everywhere) — no salt columns,
            # no replication, no extra exchanges
            a = a.repartition(n_part, F.col("cell"))
            return (
                a.join(b, ["cell"])
                .where(F.col("b_id") < F.col("a_id"))
                .where(
                    F.round(cosine(F.col("a_vec"), F.col("b_vec")), 4) >= tau
                )
                .select(F.col("a_id").alias("vec_id"))
                .distinct()
            )
        if len(hot) <= max_hot_collect:
            # bounded hot set: literal-map slice counts (plan-sized,
            # not data-sized) — absent cells coalesce to 1 slice
            from itertools import chain as _chain

            pairs = {
                r["cell"]: min(
                    max_slices,
                    -(-int(r["__cnt"]) // target_rows_per_slice),
                )
                for r in hot
            }
            nsl_map = F.create_map(
                *_chain.from_iterable(
                    (F.lit(int(c)), F.lit(int(n))) for c, n in pairs.items()
                )
            )
            # try_element_at: absent keys are NULL (plain element_at
            # throws under ANSI mode, the session default)
            nsl = F.coalesce(
                F.try_element_at(nsl_map, F.col("cell")), F.lit(1)
            )
            a = a.withColumn("__slice", F.pmod(F.hash(F.col("a_id")), nsl))
            b = b.withColumn(
                "__slice", F.explode(F.sequence(F.lit(0), nsl - F.lit(1)))
            )
        else:
            # unbounded hot set: distributed per-cell counts,
            # broadcast-joined into both sides (checkpointed so the
            # agg runs once)
            nsl_df = F.broadcast(
                comparators.groupBy("cell")
                .count()
                .select(
                    "cell",
                    F.least(
                        F.lit(max_slices),
                        F.greatest(
                            F.lit(1),
                            F.ceil(
                                F.col("count")
                                / F.lit(target_rows_per_slice)
                            ),
                        ),
                    )
                    .cast("int")
                    .alias("__nsl"),
                )
                .localCheckpoint(eager=True)
            )
            a = (
                a.join(nsl_df, "cell")
                .withColumn(
                    "__slice", F.pmod(F.hash(F.col("a_id")), F.col("__nsl"))
                )
                .drop("__nsl")
            )
            b = (
                b.join(nsl_df, "cell")
                .withColumn(
                    "__slice",
                    F.explode(
                        F.sequence(F.lit(0), F.col("__nsl") - F.lit(1))
                    ),
                )
                .drop("__nsl")
            )
    else:
        a = a.withColumn(
            "__slice", F.pmod(F.hash(F.col("a_id")), F.lit(slices))
        )
        b = b.withColumn(
            "__slice", F.explode(F.array(*[F.lit(i) for i in range(slices)]))
        )
    a = a.repartition(n_part, F.col("cell"), F.col("__slice"))
    return (
        a.join(b, ["cell", "__slice"])
        .where(F.col("b_id") < F.col("a_id"))
        .where(F.round(cosine(F.col("a_vec"), F.col("b_vec")), 4) >= tau)
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
    )


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 16,
    tau: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    n_train: int = 4096,
    partitions: int | None = None,
    ball_slices: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then
    within each cluster drop every vector that has a smaller-id
    neighbor with cosine ≥ ``tau`` — one survivor per ε-ball, chosen
    deterministically by id.

    Scale shape: the quantizer trains driver-side on a bounded
    deterministic sample (same trainer as :func:`ivf_topk`); cell
    assignment is the shuffle-free Arrow matmul; the pairwise pass is
    an equi-join ON THE CELL ID — the cross product the paper's
    within-cluster comparison implies never materializes globally,
    only per cell, and cells are sized by choosing ``n_cells ∝ N``
    (the paper uses ~0.1% of N). Skewed (hot) cells do NOT split
    under AQE — its skew handling keys on shuffle INPUT bytes while
    the within-cell compare blows up in join OUTPUT — so the compare
    runs through the salted :func:`ball_dropped_ids`, which splits a
    hot cell's pairs across slice tasks explicitly.

    Output: (id, cell, kept) for every input vector — callers filter
    ``kept`` to materialize the survivors, or keep the full frame for
    dedup-rate audits.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    centers = _train_centroids(
        c, n_cells=n_cells, seed=seed, max_iter=max_iter, n_train=n_train
    )
    # materialize the assignment ONCE: it feeds three consumers (both
    # pairwise-join sides + the final audit join), and the join's
    # inferred cell-not-null filters would otherwise re-trigger the
    # Arrow UDF per consumer — the plan shows 5 ArrowEvalPython evals
    # over 3 scans without this, 1 with it
    assigned = _assign_cells(c, centers).localCheckpoint()
    # the ball join repartitions the candidate side itself (explicit
    # count on the join key), so no fan_out hint is needed here.
    # ball_slices pins the within-cell slice fan-out (default None =
    # adaptive); the skew harness passes 1 to time the naive
    # single-task-per-cell baseline against the adaptive split.
    dropped = ball_dropped_ids(
        assigned, assigned, tau, slices=ball_slices, partitions=partitions
    )
    return (
        assigned.join(dropped.withColumn("__drop", F.lit(True)), "vec_id", "left")
        .select(
            F.col("vec_id").alias(id_col),
            F.col("cell"),
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    n_probe: int = 12,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    max_iter: int = 8,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse
    quantizer assigns every corpus vector to one of ``n_cells``
    cells; each query probes its ``n_probe`` nearest cells and
    exact-rescores only those candidates.

    Default ``n_probe=12`` of 16 cells is the measured operating
    point for recall@10 ≥ 0.8 on the near-isotropic test embeddings
    (RECALL_r07.json; the r6 default of 3 probes delivered 0.34) —
    isotropic vectors are the worst case for any partition-based ANN,
    so the probed fraction must be large. On clustered production
    embeddings the same recall costs far fewer probes; the knob, not
    the shape, is what changes.

    This is the other standard ANN scale path next to LSH: candidates
    per query ≈ N · n_probe / n_cells, recall tunable via n_probe.
    The quantizer trains DRIVER-SIDE on a fixed-size deterministic
    sample (k-means state is n_cells × dim, not data-sized — exactly
    like FAISS IVF trains on a bounded sample and persists the
    centroids with the index). Training cost is therefore constant in
    corpus size: one TakeOrdered job to draw the sample, then numpy
    Lloyd iterations in milliseconds — no iterative cluster jobs.

    Cell assignment is an Arrow-batched numpy argmax projection — the
    tiny centroid matrix rides the task closure, so assignment is a
    pure map with NO shuffle and no per-cell join; one X @ Cᵀ matmul
    scores a whole Arrow batch against every centroid at once (the
    justified-Python case: a 16-way argmin over 64-dim vectors beats
    the interpreted higher-order-function equivalent). The probe join
    is then a broadcast equi-join on cell id: the corpus never
    shuffles; only the candidate set does, for the final top-k.
    Euclidean argmin is computed as argmax of v·c − ‖c‖²/2 (‖v‖² is
    constant per row); ties go to the lower cell id (numpy first-hit).
    """
    # no fan_out here: unlike the interpreted-expression operators,
    # cell assignment is a vectorized batch matmul — so cheap per row
    # that scan-split parallelism is enough, and a repartition would
    # cost more (shuffle + one Python worker per partition to warm)
    # than it buys. At cluster scale the corpus arrives in thousands
    # of splits and parallelism is free.
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    centers = _train_centroids(c, n_cells=n_cells, seed=seed, max_iter=max_iter)
    assigned = _assign_cells(c, centers)
    return _ivf_probe_topk(
        assigned, queries, centers, n_probe, k,
        query_id_col=query_id_col, vec_col=vec_col,
    )


def _ivf_probe_topk(
    assigned: DataFrame,
    queries: DataFrame,
    centers,
    n_probe: int,
    k: int,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The probe + exact-rescore + top-k tail shared by the one-shot
    :func:`ivf_topk` and the standing :class:`~.ann_index.IVFIndex` —
    ``assigned`` is the (vec_id, c_vec, cell) corpus, ``centers`` the
    frozen quantizer. Keeping one implementation is what makes
    "incremental index == one-shot assignment" a structural identity
    rather than two code paths pinned equal by test."""
    from pyspark.sql import Window

    half_sq = (centers**2).sum(1) / 2.0
    # query probing stays JVM-side: the query set is small, so a
    # cross join against the 16-row centroid table + a rank window is
    # cheaper than spinning a second Python runner stage for it
    cent = F.broadcast(
        assigned.sparkSession.createDataFrame(
            [
                (i, [float(x) for x in ctr], float(h))
                for i, (ctr, h) in enumerate(zip(centers, half_sq))
            ],
            "cell int, centroid array<double>, half_sq double",
        )
    )
    qscore = _dot(F.col("q_vec"), F.col("centroid")) - F.col("half_sq")
    qw = Window.partitionBy("query_id").orderBy(qscore.desc(), F.col("cell").asc())
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
        )
        .crossJoin(cent)
        .withColumn("__cr", F.row_number().over(qw))
        .where(F.col("__cr") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )
    scored = (
        assigned.join(q, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def hyperplane_signature(vec_col, planes: list[list[float]]):
    """b-bit random-hyperplane (SimHash for vectors) bucket id: bit i =
    sign(v · plane_i). Returns an int column in [0, 2^b).

    The per-plane dot stays the ``_dot`` higher-order fold: unrolling
    it into 64 element_at multiply-adds per plane was MEASURED 3-4×
    slower (the ~3000-node expression tree falls out of codegen into
    per-node interpreted dispatch, worse than the HOF's tight
    per-element loop) — don't "optimize" it back."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(p) for p in plane])) >= 0, 1).otherwise(0)
        * (2**i)
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def probe_masks(n_planes: int, radius: int) -> list[int]:
    """Multi-probe LSH XOR masks (Lv et al., VLDB'07): every bit
    pattern with ≤ ``radius`` of ``n_planes`` bits set. A query probes
    its own bucket plus every bucket within Hamming distance
    ``radius`` — near vectors land in signature-adjacent buckets, so
    probing neighbors recovers the pairs a single hard bucket loses.
    Σ_{i≤r} C(b, i) masks; mask 0 (the home bucket) first."""
    import itertools

    masks = [0]
    for n_bits in range(1, radius + 1):
        for comb in itertools.combinations(range(n_planes), n_bits):
            masks.append(sum(1 << c for c in comb))
    return masks


def _explode_probes(q: DataFrame, n_planes: int, radius: int) -> DataFrame:
    """Expand each query row (with its home ``bucket``) into one row
    per probe bucket (home XOR each ≤radius mask). Query-side only —
    the corpus keeps ONE bucket per vector, so the join stays a
    bucketed equi-join with Σ C(b,i) probe keys per query."""
    masks = probe_masks(n_planes, radius)
    if len(masks) == 1:
        return q
    probes = F.array(
        *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
    )
    return q.withColumn("bucket", F.explode(probes))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    partitions: int | None = None,
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane
    signature, equi-join on the bucket, exact-rescore candidates.

    At 100 TB the bucket join replaces the cross product; candidates
    per query ≈ N / 2^b (× the probe count with multi-probe).
    ``probe_radius > 0`` turns on multi-probe (Lv et al., VLDB'07):
    each query additionally joins the buckets within that Hamming
    distance of its signature — the recall lever that does NOT grow
    index size (cf. more tables in :func:`lsh_topk_multi`). The
    corpus side is untouched: still one bucket per vector, still an
    equi-join, so the scale shape survives; only the (broadcast)
    query side fans out Σ_{i≤r} C(b,i) rows per query.
    """
    c = fan_out(corpus, partitions).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("bucket", hyperplane_signature(F.col("c_vec"), planes))
    q = F.broadcast(
        _explode_probes(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                _as_double(F.col(vec_col)).alias("q_vec"),
            ).withColumn("bucket", hyperplane_signature(F.col("q_vec"), planes)),
            len(planes),
            probe_radius,
        )
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def lsh_topk_multi(
    corpus: DataFrame,
    queries: DataFrame,
    tables: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    partitions: int | None = None,
    probe_radius: int = 0,
) -> DataFrame:
    """Multi-table LSH top-k: ``tables`` is a list of independent
    hyperplane sets; a corpus vector is a candidate for a query if
    they share a bucket in ANY table. The standard recall lever —
    recall ≈ 1 − (1 − p^b)^T for per-plane agreement p — at the cost
    of T bucket rows per vector instead of one. ``probe_radius``
    additionally multi-probes each table (query joins all buckets
    within that Hamming distance of its per-table signature —
    :func:`probe_masks`), compounding the two recall levers.

    Plan shape: one explode to (vector, table_id, bucket) rows — the
    shuffle key stays narrow, O(N·T) rows moved — then the same
    equi-join as the single-table path. Duplicate candidates (pairs
    colliding in several tables) are collapsed by a (query, vec)
    hash-agg BEFORE ranking; the rescored cosine is identical across
    collisions, so min() just picks the one value. The corpus never
    cross-joins anything.
    """
    c = fan_out(corpus, partitions).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    )

    def banded(df: DataFrame, vec: str, radius: int = 0) -> DataFrame:
        # materialize each table's signature as a COLUMN first, then
        # build the probe structs from the column: inlining the
        # signature expression (n_planes × dim literal multiply-adds)
        # into every probe struct blows the Catalyst tree up by the
        # probe count — measured 19 s vs 3 s on the clustered
        # crossover fixture before this split. CollapseProject leaves
        # the projection alone because each __sig is non-cheap and
        # referenced once per mask.
        sigs = df.select(
            "*",
            *[
                hyperplane_signature(F.col(vec), planes).alias(f"__sig{t}")
                for t, planes in enumerate(tables)
            ],
        )
        structs = []
        for t, planes in enumerate(tables):
            for m in probe_masks(len(planes), radius):
                structs.append(
                    F.struct(
                        F.lit(t).alias("table_id"),
                        F.col(f"__sig{t}")
                        .bitwiseXOR(F.lit(m))
                        .alias("bucket"),
                    )
                )
        return sigs.select(
            *df.columns, F.explode(F.array(*structs)).alias("__b")
        ).select(*df.columns, "__b.table_id", "__b.bucket")

    cb = banded(c, "c_vec")
    qb = F.broadcast(banded(q, "q_vec", probe_radius))
    scored = (
        cb.join(qb, ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.min("cos_sim").alias("cos_sim"))
    )
    return _ranked_topk(scored, k)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    partitions: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar corpus vectors whose LABEL DIFFERS from the
    query's — the examples a contrastive or retrieval loss learns the
    most from (most-confusable negatives), the batch-mining step of
    SimCLR/DPR-style pipelines.

    Same plan shape as :func:`brute_force_topk` — queries (with their
    labels) broadcast, corpus streams through unshuffled, one
    window-ranked top-k on the (tiny) scored side — with the
    different-label predicate applied BEFORE scoring so same-label
    rows never pay the cosine. Swap the scored candidate source for
    an LSH/IVF bucket join at billion-vector scale exactly as the
    top-k family does.

    Output: (query_id, vec_id, neg_label, cos_sim, rank), rank 1..k
    per query, ties broken by vec_id.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
            F.col(label_col).alias("__q_label"),
        )
    )
    c = fan_out(corpus, partitions).select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
        F.col(label_col).alias("neg_label"),
    )
    scored = (
        c.crossJoin(q)
        .where(~F.col("neg_label").eqNullSafe(F.col("__q_label")))
        .select(
            "query_id",
            "vec_id",
            "neg_label",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def _scored_schema(corpus: DataFrame, queries: DataFrame,
                   id_col: str, query_id_col: str):
    """Output schema for the PQ/IVF-PQ Arrow scoring pass, with the id
    field TYPES derived from the actual input columns — string or int
    ids flow through unchanged instead of being silently miscast to
    long (ADVICE r7)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    return StructType(
        [
            StructField("vec_id", corpus.schema[id_col].dataType),
            StructField("query_id", queries.schema[query_id_col].dataType),
            StructField("__raw", DoubleType()),
        ]
    )


def _pq_train(Xn, m: int, k_codes: int, seed: int, max_iter: int):
    """Per-subspace codebooks for product quantization: split the
    normalized sample into ``m`` contiguous dim/m blocks and run the
    SAME seeded Lloyd k-means per block (seed + s). One pure numpy
    function shared by the Spark path and the oracle generator —
    identical sample ⇒ bit-identical codebooks."""
    import numpy as np

    dim = Xn.shape[1]
    d = dim // m
    return np.stack(
        [_kmeans(Xn[:, s * d:(s + 1) * d], k_codes, seed + s, max_iter)
         for s in range(m)]
    )


def _l2_normalize(X):
    import numpy as np

    n = np.sqrt((X * X).sum(axis=1, keepdims=True))
    n[n == 0.0] = 1.0
    return X / n


def _batch_keep_mask(raw, r_keep: int):
    """Per-batch shortlist mask for one query's raw scores: keep every
    row whose raw score is within one rounding quantum (1e-4, scores
    are rounded to 4 decimals downstream) of the ``r_keep``-th best.
    Any row that can TIE the boundary row after rounding survives, so
    the JVM-side global top-``r_keep`` over the union of batch
    shortlists equals the top-``r_keep`` over all rows — the window
    input shrinks from O(corpus) to O(n_batches · r_keep) per query
    without changing a single emitted rank."""
    import numpy as np

    if len(raw) <= r_keep:
        return np.ones(len(raw), dtype=bool)
    kth = np.partition(raw, len(raw) - r_keep)[len(raw) - r_keep]
    return raw >= kth - 1.1e-4


def _exact_rerank(
    shortlist: DataFrame,
    corpus_vecs: DataFrame,
    queries: DataFrame,
    k: int,
) -> DataFrame:
    """Exact-cosine re-rank of an ANN candidate shortlist — the
    standard FAISS refine step: the compressed-domain score picks
    ~R candidates, the TRUE cosine (against the uncompressed vectors)
    picks the final k, so quantization error costs recall only when
    a true neighbor falls outside the shortlist entirely.

    ``shortlist``: (query_id, vec_id); joined back to the corpus
    vectors (shuffle is O(R·|Q|), not corpus-sized) with the query
    vectors broadcast. Output: (query_id, vec_id, cos_sim, rank).
    """
    from pyspark.sql import Window

    qv = F.broadcast(queries.select("query_id", "q_vec"))
    rescored = (
        shortlist.join(corpus_vecs, "vec_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 16,
    k_codes: int = 64,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    max_iter: int = 8,
    n_train: int = 4096,
    refine: int | None = 200,
) -> DataFrame:
    """Product-quantization ANN (the FAISS PQ/ADC kernel): corpus
    vectors are L2-normalized, split into ``m`` subspaces, and each
    subvector is replaced by the index of its nearest codebook
    centroid — ``m`` small ints (m·log2(k_codes) bits, here 32 bits)
    instead of dim floats, a 64× compression at dim=64. A query scores
    a compressed vector WITHOUT decompressing it: per subspace the dot
    products against all ``k_codes`` centroids form a lookup table
    (asymmetric distance computation), and the approximate cosine is
    the sequential sum of ``m`` table lookups.

    Scale shape: codebooks train driver-side on the same bounded
    md5-deterministic sample as the IVF quantizer (constant in corpus
    size); ENCODING is an Arrow-batched numpy projection with the
    codebooks riding the task closure — no shuffle; SCORING keeps only
    each Arrow batch's top-``refine`` rows per query (with a
    one-rounding-quantum tie margin — :func:`_batch_keep_mask`), so
    the candidate stream into the final window is O(n_batches ·
    refine) per query, NOT corpus-sized — no single reducer ever sees
    the whole scored corpus. At 100 TB the production composition is
    IVF-PQ — reuse ``_assign_cells`` for the coarse lists and apply
    this ADC kernel inside each probed cell; the kernel itself is what
    this operator pins.

    ``refine`` (default 200) then exact-reranks the ADC top-R
    shortlist by TRUE cosine — the standard FAISS refine step. ADC
    with 64-dim/16-subspace codebooks orders the head of the list
    roughly, not finely; re-ranking the 200-candidate shortlist lifts
    recall@10 from 0.18 to ≥0.9 on the isotropic test embeddings
    (RECALL_r07.json) at the cost of fetching 200·|Q| full vectors.
    ``refine=None`` returns the raw ADC ranking (the kernel itself,
    hash-checked by the oracle).

    Determinism: codebook training, encoding argmax (ties → lower
    code, numpy first-hit), and the fixed s=0..m-1 summation order are
    all reproducible outside Spark, so the DuckDB oracle re-derives
    identical codebooks/codes/scores; rounding happens ONCE, JVM-side
    (F.round, matching DuckDB ROUND), never in numpy.

    Output: (query_id, vec_id, cos_sim, rank 1..k) with ``refine``;
    (query_id, vec_id, pq_score, rank 1..k) without.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    sample = (
        c.orderBy(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("vec_id").cast("string")))
        )
        .limit(n_train)
        .select("c_vec")
        .collect()
    )
    X = np.asarray([r["c_vec"] for r in sample], dtype=np.float64)
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    cb = _pq_train(_l2_normalize(X), m, k_codes, seed, max_iter)  # m×k×d
    halfs = (cb**2).sum(2) / 2.0                                  # m×k
    qrows = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    ).collect()  # bounded query set, same contract as the broadcast paths
    qids = [r["qid"] for r in qrows]
    Qn = _l2_normalize(np.asarray([r["qv"] for r in qrows], dtype=np.float64))
    # tab[qi, s, code] = dot(q_s, centroid) — the ADC lookup tables
    tab = np.stack(
        [Qn[:, s * d:(s + 1) * d] @ cb[s].T for s in range(m)], axis=1
    )
    nq = len(qids)
    qid_arr = np.asarray(qids)
    r_keep = refine if refine is not None else k

    def _adc(batches):
        for pdf in batches:
            Xb = _l2_normalize(
                np.asarray(pdf["c_vec"].tolist(), dtype=np.float64).reshape(
                    -1, dim
                )
            )
            nb = Xb.shape[0]
            codes = np.empty((nb, m), dtype=np.int64)
            for s in range(m):
                scores = Xb[:, s * d:(s + 1) * d] @ cb[s].T - halfs[s][None, :]
                codes[:, s] = scores.argmax(1)
            out = np.zeros((nb, nq), dtype=np.float64)
            for s in range(m):  # fixed sequential order — the contract
                out += tab[:, s, :][:, codes[:, s]].T
            ids = pdf["vec_id"].to_numpy()
            out_v, out_q, out_s = [], [], []
            for qi in range(nq):
                mask = ids != qid_arr[qi]
                keep = _batch_keep_mask(out[mask, qi], r_keep)
                out_v.append(ids[mask][keep])
                out_q.append(np.full(int(keep.sum()), qid_arr[qi]))
                out_s.append(out[mask, qi][keep])
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_v),
                    "query_id": np.concatenate(out_q),
                    "__raw": np.concatenate(out_s),
                }
            )

    scored = c.mapInPandas(
        _adc, _scored_schema(corpus, queries, id_col, query_id_col)
    ).select(
        "query_id",
        "vec_id",
        F.round(F.col("__raw"), 4).alias("pq_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_score").desc(), F.col("vec_id").asc()
    )
    ranked = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= r_keep)
    )
    if refine is None:
        return ranked.where(F.col("rank") <= k).orderBy("query_id", "rank")
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    )
    return _exact_rerank(ranked.select("query_id", "vec_id"), c, qv, k)


def _ivfpq_model(X, Q, n_cells, n_probe, m, k_codes, seed, max_iter):
    """Derive the full IVF-PQ model (coarse centroids, residual
    codebooks, per-query probe sets, coarse dots, ADC tables) from the
    raw sample + query matrices — ONE pure numpy function shared by
    ivfpq_topk and the DuckDB oracle generator, so both sides hold
    bit-identical parameters."""
    import numpy as np

    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    Xn = _l2_normalize(X)
    coarse = _kmeans(Xn, n_cells, seed, max_iter)
    chalf = (coarse**2).sum(1) / 2.0
    s_cell = (Xn @ coarse.T - chalf[None, :]).argmax(1)
    cb = _pq_train(Xn - coarse[s_cell], m, k_codes, seed + 100, max_iter)
    halfs = (cb**2).sum(2) / 2.0
    Qn = _l2_normalize(np.asarray(Q, dtype=np.float64))
    qc = Qn @ coarse.T
    # probe sets: top n_probe cells by q·c − ‖c‖²/2, ties → lower cell
    order = np.argsort(-(qc - chalf[None, :]), axis=1, kind="stable")
    probes = [set(order[i, :n_probe].tolist()) for i in range(len(Qn))]
    tab = np.stack(
        [Qn[:, s * d:(s + 1) * d] @ cb[s].T for s in range(m)], axis=1
    )
    return coarse, chalf, cb, halfs, qc, probes, tab, d


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    n_probe: int = 12,
    m: int = 16,
    k_codes: int = 64,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    max_iter: int = 8,
    n_train: int = 4096,
    refine: int | None = 200,
) -> DataFrame:
    """IVF-PQ — the production FAISS index shape, composed from the
    engine's two ANN halves: a coarse quantizer assigns every
    (normalized) vector to one of ``n_cells`` inverted lists, and the
    RESIDUAL to its cell centroid is product-quantized to ``m``
    codebook codes; a query probes its ``n_probe`` nearest cells and
    scores only those lists via ADC —
    ``score(x) ≈ q·c_cell + Σ_s q_s·cb[s][code_s]``.

    Both trainers run driver-side on the one bounded md5 sample
    (coarse k-means, then per-subspace k-means on the sample's
    residuals — shared seeded numpy, reproducible outside Spark).
    The corpus pass is ONE Arrow-batched projection that assigns the
    cell, encodes the residual, AND applies the probe filter — so the
    emitted candidate stream is already ≈ corpus · n_probe / n_cells
    per query and only the final top-k window shuffles. That is the
    candidate-reduction IVF adds over plain :func:`pq_topk`, and the
    compression PQ adds over :func:`ivf_topk` (the inverted lists
    store 32-bit codes, not vectors).

    Summation order is the cross-engine contract: ``q·c_cell`` first,
    then subspaces s = 0..m−1 sequentially; rounding happens once,
    JVM-side. The oracle re-derives coarse centroids, codebooks, probe
    sets, and lookup tables from the same sample and replays the
    identical chain.

    Defaults are the measured ≥0.9-recall@10 operating point on the
    isotropic test embeddings (RECALL_r07.json): 12 of 16 cells
    probed, 16×64 residual codebooks, and ``refine=200`` exact
    re-rank of the ADC shortlist (:func:`_exact_rerank`). The Arrow
    pass emits only each batch's top-``refine`` rows per query
    (:func:`_batch_keep_mask`), so the top-k window input is bounded
    by n_batches · refine per query, never corpus-sized.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("c_vec")
    )
    sample = (
        c.orderBy(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("vec_id").cast("string")))
        )
        .limit(n_train)
        .select("c_vec")
        .collect()
    )
    X = np.asarray([r["c_vec"] for r in sample], dtype=np.float64)
    qrows = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    ).collect()
    qids = [r["qid"] for r in qrows]
    Q = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
    model = _ivfpq_model(X, Q, n_cells, n_probe, m, k_codes, seed, max_iter)
    coarse, chalf, cb, halfs, qc, probes, tab, d = model
    dim = X.shape[1]
    nq = len(qids)

    r_keep = refine if refine is not None else k

    def _score(batches):
        for pdf in batches:
            Xb = _l2_normalize(
                np.asarray(pdf["c_vec"].tolist(), dtype=np.float64).reshape(
                    -1, dim
                )
            )
            cells = (Xb @ coarse.T - chalf[None, :]).argmax(1)
            R = Xb - coarse[cells]
            nb = Xb.shape[0]
            codes = np.empty((nb, m), dtype=np.int64)
            for s in range(m):
                sc = R[:, s * d:(s + 1) * d] @ cb[s].T - halfs[s][None, :]
                codes[:, s] = sc.argmax(1)
            out_v, out_q, out_s = [], [], []
            ids = pdf["vec_id"].to_numpy()
            for qi in range(nq):
                mask = np.isin(cells, list(probes[qi])) & (ids != qids[qi])
                if not mask.any():
                    continue
                acc = np.full(int(mask.sum()), 0.0)
                acc += qc[qi][cells[mask]]          # q·c_cell first
                for s in range(m):                  # then s = 0..m−1
                    acc += tab[qi, s, :][codes[mask, s]]
                keep = _batch_keep_mask(acc, r_keep)
                out_v.append(ids[mask][keep])
                out_q.append(np.full(int(keep.sum()), qids[qi]))
                out_s.append(acc[keep])
            if out_v:
                yield pd.DataFrame(
                    {
                        "vec_id": np.concatenate(out_v),
                        "query_id": np.concatenate(out_q),
                        "__raw": np.concatenate(out_s),
                    }
                )

    scored = c.mapInPandas(
        _score, _scored_schema(corpus, queries, id_col, query_id_col)
    ).select(
        "query_id",
        "vec_id",
        F.round(F.col("__raw"), 4).alias("pq_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_score").desc(), F.col("vec_id").asc()
    )
    ranked = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= r_keep)
    )
    if refine is None:
        return ranked.where(F.col("rank") <= k).orderBy("query_id", "rank")
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("q_vec"),
    )
    return _exact_rerank(ranked.select("query_id", "vec_id"), c, qv, k)


def embedding_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    quant: int = 1_000_000,
) -> DataFrame:
    """Exact per-group centroid of an embedding column — the vector
    AGGREGATE primitive (class prototypes, per-source embedding means
    for drift monitoring, seed centroids for IVF/semantic-dedup
    training without the bounded-sample shortcut).

    Order-free exactness: a naive per-dimension ``sum(double)`` is
    partition-order-dependent; here each component is quantized ONCE
    to ``quant`` micro-units BIGINT (deterministic on the raw float —
    the same value in any engine), the per-(group, dim) sums are
    integer-exact, and the mean divides two exact integers once — so
    centroids are hash-exact cross-engine under any partitioning.
    Quantization bias is < 1/(2·quant) per component, far below
    embedding noise.

    Shape: posexplode (×dim constant fan-out, inside the Generate —
    no pre-projected array), hash-agg on (group, dim) with map-side
    partials, then a bounded per-group assembly
    (sort_array(collect_list) over ``dim`` ≤ a few thousand structs).
    Nothing data-sized crosses the driver.
    """
    exploded = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("__i", "__v"),
    ).select(
        group_col,
        "__i",
        F.round(F.col("__v").cast("double") * F.lit(float(quant)))
        .cast("long")
        .alias("__vm"),
    )
    per_dim = exploded.groupBy(group_col, "__i").agg(
        F.sum("__vm").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    comp = F.round(
        F.col("__s") / F.col("__n") / F.lit(float(quant)), 6
    ).alias("__c")
    return (
        per_dim.select(group_col, "__i", comp, "__n")
        .groupBy(group_col)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__i"), F.col("__c")))
                ),
                lambda s: s["__c"],
            ).alias("centroid"),
            F.max("__n").cast("long").alias("n_vectors"),
        )
    )
