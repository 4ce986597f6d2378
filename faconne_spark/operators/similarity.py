"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (a broadcast of
the small query set against a full scan — linear, no shuffle of the
corpus). The scale path is sign-bit LSH bucketing: hyperplanes are
derived deterministically from the portable hash so the DuckDB oracle
reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from faconne_spark.functions import (
    cosine_from_norms,
    cosine_sim,
    phash60,
    sqnorm_expr,
)
from faconne_spark.session import spread


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, dim: int = 64
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` is expected to be small → broadcast join (no shuffle of
    the corpus); ranking is one window per query id. Ties broken by
    vec_id for determinism; similarity rounded so float summation-order
    differences can't flip the oracle comparison.

    ``dim``: the statically-known vector width for the unrolled codegen
    kernels.  Callers that pass TRUNCATED vectors (matryoshka ablation,
    RRF prefix probe) must pass their slice width — with the default 64
    the `_unrolled_guard` size check fails on every sliced row and the
    whole scan silently runs the interpreted fold (optimization r13;
    values are identical either way, the guard exists for exactly that).
    """
    # Optimization r12 (guide §2.3): squared norms precomputed once per
    # ROW, per-pair work = one unrolled dot + divide (cosine_from_norms
    # is bit-identical to the old per-pair cosine_sim fold — see its
    # docstring)
    nn = sqnorm_expr("embedding", "spark", dim=dim)
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.expr(nn).alias("q_nn"),
        )
    )
    c = spread(corpus).select(
        "vec_id", "embedding", F.expr(nn).alias("nn")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                F.expr(
                    cosine_from_norms(
                        "embedding", "q_emb", "nn", "q_nn", dim=dim
                    )
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos_sim", "rk")
    )


def _plane_sign(p: int, d: int) -> float:
    """±1.0 weight of hyperplane ``p`` at coordinate ``d`` — the exact
    value the SQL expression ``(phash60('p{p}d{d}') % 2) * 2.0 - 1.0``
    computes: phash60 is the first 15 hex digits of md5, identical in
    hashlib.  (Kept as the test oracle for the hyperplane parity; an
    r12 attempt to inline these as literals in an unrolled bucket
    expression was MEASURED SLOWER — 4 planes × 64 terms in one
    projection exceeds what the JIT will compile, the same failure
    class as the unrolled cosine — and was reverted.)"""
    import hashlib

    h = int(hashlib.md5(f"p{p}d{d}".encode()).hexdigest()[:15], 16)
    return float((h % 2) * 2 - 1)


def lsh_bucket_expr(emb: str, n_planes: int, dim: int, dialect: str) -> str:
    """Sign-bit LSH bucket id: ``n_planes`` pseudo-random hyperplanes
    whose weights are ±1 from the parity of phash60('p{p}d{d}') — fully
    deterministic and engine-portable, no stored model."""
    bits = []
    for p in range(n_planes):
        if dialect == "spark":
            salt = f"concat('p{p}d', d)"
            h = phash60(salt, "spark")
            dot = (
                f"aggregate(zip_with({emb}, sequence(0, {dim - 1}),"
                f" (x, d) -> cast(x as double) * (cast(({h}) % 2 as double) * 2.0 - 1.0)),"
                f" cast(0.0 as double), (acc, v) -> acc + v)"
            )
            bits.append(f"if({dot} > 0, {1 << p}, 0)")
        else:
            salt = f"'p{p}d' || (d - 1)"
            h = phash60(salt, "duckdb")
            dot = (
                f"list_sum(list_transform(range(1, {dim + 1}),"
                f" d -> {emb}[d]::DOUBLE * ((({h}) % 2)::DOUBLE * 2.0 - 1.0)))"
            )
            bits.append(f"CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, nlist: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: the corpus is partitioned into ``nlist``
    Voronoi cells around centroids; each query scores only the cells of
    its ``nprobe`` nearest centroids.

    The coarse quantizer here is deterministic — centroids are the
    ``nlist`` lowest-``vec_id`` vectors — a stand-in for a sampled
    k-means "train" step, chosen so the DuckDB oracle can reproduce the
    exact same index. The *structure* is real IVF: assignment is a
    broadcast argmax (no shuffle of the corpus), the candidate join key
    is ``list_id`` (corpus shuffles once, by cell), and recall/cost is
    tuned by nlist/nprobe exactly as in FAISS-style deployments.
    """
    # (Optimization r12 note: the norm-precompute/unrolled-dot rewrite
    # was applied here and MEASURED SLOWER — assignment scores only
    # corpus × nlist pairs, too little compute to amortize the extra
    # per-stage codegen of the big expressions (ann_nprobe_sweep
    # 3.9 → 6.1 s); reverted to the fold.  The rewrite stays in the
    # high-volume pair stages: cosine_topk, lsh_bucketed_topk,
    # contamination_cosine, embedding_cosine_pairs, semantic_dedup.)
    cent = F.broadcast(
        corpus.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cent")
        )
    )
    sim_cent = F.round(F.expr(cosine_sim("embedding", "cent", "spark")), 6)
    # corpus→cell argmax via max_by-groupBy (map-side combine: shuffle
    # ~corpus rows, not corpus×nlist; same pick rule as ORDER BY csim
    # DESC, cid ASC).  The query-side probe ranking below keeps its
    # window — it needs top-nprobe, and the query side is tiny.
    assigned = (
        spread(corpus)
        .select("vec_id", "embedding")
        .crossJoin(cent)
        .select("vec_id", "embedding", "cid", sim_cent.alias("csim"))
        .groupBy("vec_id")
        .agg(F.expr("max_by(struct(embedding, cid), struct(csim, -cid))").alias("_b"))
        .select("vec_id", F.col("_b.embedding").alias("embedding"),
                F.col("_b.cid").alias("list_id"))
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    sim_qcent = F.round(F.expr(cosine_sim("q_emb", "cent", "spark")), 6)
    wq = Window.partitionBy("q_id").orderBy(
        F.col("csim").desc(), F.col("cid")
    )
    probes = F.broadcast(
        q.crossJoin(cent)
        .select("q_id", "q_emb", "cid", sim_qcent.alias("csim"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("q_id", "q_emb", F.col("cid").alias("list_id"))
    )
    scored = (
        assigned.join(probes, "list_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                F.expr(cosine_sim("embedding", "q_emb", "spark")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos_sim", "rk")
    )


def lsh_bucketed_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's LSH
    bucket are scored. The join key is the bucket id → the corpus
    shuffles once by bucket instead of broadcating every query against
    every row; recall is tunable via n_planes."""
    bucket = lsh_bucket_expr("embedding", n_planes, dim, "spark")
    nn = sqnorm_expr("embedding", "spark", dim=dim)
    c = spread(corpus).select(
        "vec_id", "embedding", F.expr(bucket).alias("bucket"),
        F.expr(nn).alias("nn"),
    )
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.expr(bucket).alias("bucket"),
            F.expr(nn).alias("q_nn"),
        )
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                F.expr(
                    cosine_from_norms(
                        "embedding", "q_emb", "nn", "q_nn", dim=dim
                    )
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos_sim", "rk")
    )


def knn_classify(
    corpus: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """k-NN majority-vote classification over the embedding corpus:
    each query's label is the most frequent label among its exact
    top-k cosine neighbours (ties → smaller label, deterministic).

    Built on :func:`cosine_topk`, so the corpus scans once and never
    shuffles; the per-query vote is a tiny groupBy on q_id (top-k rows
    per query only)."""
    nbrs = cosine_topk(corpus, queries, k)
    labeled = nbrs.join(
        corpus.select("vec_id", "label"), "vec_id"
    )
    votes = labeled.groupBy("q_id", "label").agg(
        F.count("*").alias("votes")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("label").alias("pred_label"), "votes")
    )
    truth = queries.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("true_label")
    )
    return pred.join(F.broadcast(truth), "q_id").select(
        "q_id", "true_label", "pred_label", "votes"
    )


def kmeans_assign(
    corpus: DataFrame, nlist: int = 8, iters: int = 2,
    with_embedding: bool = True,
) -> DataFrame:
    """Per-vector k-means cell assignment after ``iters`` Lloyd
    iterations: returns (vec_id[, embedding], cid, csim) — the relation
    :func:`kmeans_cells` aggregates into cell stats and
    :func:`faconne_spark.operators.dedup.semantic_dedup` prunes within.
    Callers that don't need the vector back (cell stats) pass
    ``with_embedding=False`` so the final assignment exchange carries
    ids and scores only, not the whole embedding column — at 100 TB
    that's the difference between shuffling the corpus and shuffling
    its keys.

    Determinism across engines (the DuckDB oracle replays the exact
    same iterations): centroid means accumulate in FIXED POINT —
    each coordinate is scaled by 1e6 and floored to a bigint before the
    sum, so the mean is an exact integer division, immune to float
    summation order (a plain ``avg(double)`` differs between engines
    and between runs at different partitioning).

    Scale: per iteration, assignment is a broadcast-argmax over nlist
    centroids (no corpus shuffle beyond the posexplode groupBy — whose
    map-side partial agg reduces to nlist×dim rows per partition); the
    centroid relation (nlist×dim, a few KB) is collected nowhere —
    it stays a broadcast DataFrame.
    """
    # (Optimization r12 note: norm-precompute was applied here too and
    # reverted — assignment scores corpus × nlist pairs only; the extra
    # per-stage codegen of the unrolled chains cost more than the fold
    # it saved.  See ivf_topk.)
    cent = corpus.filter(F.col("vec_id") < nlist).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cent")
    )
    # argmax via max_by-groupBy, not a row_number window: the window
    # formulation shuffles all corpus×nlist candidate rows to sort them,
    # while the groupBy partially aggregates each vec_id's candidates
    # map-side (they are co-located — the centroid side is broadcast),
    # so the shuffle carries ~corpus rows.  Pick rule identical to
    # ORDER BY csim DESC, cid ASC: max (csim, -cid).
    argmax = "max_by(struct(embedding, cid), struct(csim, -cid))"
    for _ in range(iters):
        sim = F.round(F.expr(cosine_sim("embedding", "cent", "spark")), 6)
        assigned = (
            spread(corpus)
            .select("vec_id", "embedding")
            .crossJoin(F.broadcast(cent))
            .select("vec_id", "embedding", "cid", sim.alias("csim"))
            .groupBy("vec_id")
            .agg(F.expr(argmax).alias("_b"))
            .select("vec_id", F.col("_b.embedding").alias("embedding"),
                    F.col("_b.cid").alias("cid"))
        )
        by_dim = assigned.select(
            "cid", F.posexplode("embedding").alias("d", "x")
        ).groupBy("cid", "d").agg(
            F.sum(
                F.expr("cast(floor(cast(x as double) * 1000000 + 0.5) as bigint)")
            ).alias("sx"),
            F.count("*").alias("n"),
        )
        cent = (
            by_dim.withColumn(
                "c",
                F.expr("cast(sx as double) / 1000000.0 / cast(n as double)"),
            )
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(d, c))), s -> s.c)"
                ).alias("cent")
            )
        )
    sim = F.round(F.expr(cosine_sim("embedding", "cent", "spark")), 6)
    carried = "embedding, csim, cid" if with_embedding else "csim, cid"
    out_cols = (
        [F.col("_b.embedding").alias("embedding")] if with_embedding else []
    )
    return (
        spread(corpus)
        .select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "cid", sim.alias("csim"))
        .groupBy("vec_id")
        .agg(F.expr(
            f"max_by(struct({carried}), struct(csim, -cid))"
        ).alias("_b"))
        .select("vec_id", *out_cols,
                F.col("_b.cid").alias("cid"), F.col("_b.csim").alias("csim"))
    )


def kmeans_cells(
    corpus: DataFrame, nlist: int = 8, iters: int = 2
) -> DataFrame:
    """Per-cell membership stats over :func:`kmeans_assign` — the
    "train" step real IVF indexes run, expressed in DataFrame ops.
    Determinism and scale notes live on :func:`kmeans_assign`."""
    final = kmeans_assign(corpus, nlist, iters, with_embedding=False)
    # exact mean: csim is 6-dp-rounded → scale to integral micro-units,
    # sum as bigint (order-independent), divide once — no float-sum drift
    return final.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.min("vec_id").alias("min_vec_id"),
        F.expr(
            "cast(sum(cast(floor(csim * 1000000 + 0.5) as bigint)) as double)"
            " / 1000000.0 / cast(count(*) as double)"
        ).alias("avg_sim"),
    )


def pq_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    m: int = 4, ncodes: int = 8, dim: int = 64,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) — the codebook-compression scale path of production vector
    stores: each vector is stored as ``m`` one-byte codes instead of
    ``dim`` floats (here 4 codes for 64 floats, a 64× compression), and
    query scoring touches only a tiny per-query lookup table.

    Deterministic train step (like the IVF variants): the codebook of
    subspace ``s`` is the s-th slice of the first ``ncodes`` corpus
    vectors.  Encoding picks the max-dot-product code per subspace
    (6-dp-rounded, tie → lowest code id).  Query time: dot(q, x) ≈
    Σ_s T[s][code_x[s]] where T is the (m×ncodes)-entry table of
    query-subvector · centroid dots.

    Scale: the codebook (m×ncodes rows) broadcasts; encoding is a
    broadcast crossJoin + max_by groupBy whose candidates are
    co-located, so partial aggregation reduces map-side and the shuffle
    carries ~corpus×m rows; the ADC join is code relation ⋈ broadcast
    lookup table; only the final per-query top-k sorts (k rows per
    query survive WindowGroupLimit)."""
    from faconne_spark.functions import dot_expr

    sub = dim // m
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.expr(f"slice(embedding, {s * sub + 1}, {sub})").alias("v"),
            )
            for s in range(m)
        ]
    )
    cent = F.broadcast(
        corpus.filter(F.col("vec_id") < ncodes)
        .select(F.col("vec_id").alias("c"), F.explode(slices).alias("sl"))
        .select("c", F.col("sl.s").alias("s"), F.col("sl.v").alias("centvec"))
    )
    subvecs = spread(corpus).select(
        "vec_id", F.explode(slices).alias("sl")
    ).select("vec_id", F.col("sl.s").alias("s"), F.col("sl.v").alias("subv"))
    codes = (
        subvecs.join(cent, "s")
        .select(
            "vec_id",
            "s",
            "c",
            F.round(F.expr(dot_expr("subv", "centvec", "spark", dim=sub)), 6).alias("d"),
        )
        .groupBy("vec_id", "s")
        .agg(F.expr("max_by(c, struct(d, -c))").alias("code"))
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.explode(slices).alias("sl")
    ).select("q_id", F.col("sl.s").alias("s"), F.col("sl.v").alias("qsub"))
    lut = F.broadcast(
        q.join(cent, "s").select(
            "q_id",
            "s",
            F.col("c").alias("code"),
            F.round(F.expr(dot_expr("qsub", "centvec", "spark", dim=sub)), 6).alias("t"),
        )
    )
    scored = (
        codes.join(lut, ["s", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.sum("t"), 6).alias("approx_dot"))
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("approx_dot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "approx_dot", "rk")
    )


def ivf_pq_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    nlist: int = 8, nprobe: int = 2, m: int = 4, ncodes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """IVF+PQ composed (the FAISS IndexIVFPQ shape): coarse cells prune
    the candidate set to the query's ``nprobe`` nearest cells, then PQ
    codes + the per-query lookup table score only those candidates —
    neither raw corpus vectors nor whole-corpus scoring at query time.

    Composition of :func:`ivf_topk`'s assignment (broadcast argmax via
    co-located max_by) and :func:`pq_topk`'s encode/ADC stages; the
    cell join key is list_id (one corpus-code shuffle), probes and LUT
    broadcast."""
    from faconne_spark.functions import dot_expr

    sub = dim // m
    # (r12 note: norm-precompute reverted here — low pair volume, see
    # ivf_topk.)
    cent = F.broadcast(
        corpus.filter(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cent")
        )
    )
    sim_cent = F.round(F.expr(cosine_sim("embedding", "cent", "spark")), 6)
    assigned = (
        spread(corpus)
        .select("vec_id", "embedding")
        .crossJoin(cent)
        .select("vec_id", "cid", sim_cent.alias("csim"))
        .groupBy("vec_id")
        .agg(F.expr("max_by(cid, struct(csim, -cid))").alias("list_id"))
    )
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.expr(f"slice(embedding, {s * sub + 1}, {sub})").alias("v"),
            )
            for s in range(m)
        ]
    )
    pq_cent = F.broadcast(
        corpus.filter(F.col("vec_id") < ncodes)
        .select(F.col("vec_id").alias("c"), F.explode(slices).alias("sl"))
        .select("c", F.col("sl.s").alias("s"), F.col("sl.v").alias("centvec"))
    )
    subvecs = spread(corpus).select(
        "vec_id", F.explode(slices).alias("sl")
    ).select("vec_id", F.col("sl.s").alias("s"), F.col("sl.v").alias("subv"))
    codes = (
        subvecs.join(pq_cent, "s")
        .select(
            "vec_id", "s", "c",
            F.round(F.expr(dot_expr("subv", "centvec", "spark", dim=sub)), 6).alias("d"),
        )
        .groupBy("vec_id", "s")
        .agg(F.expr("max_by(c, struct(d, -c))").alias("code"))
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    sim_qc = F.round(F.expr(cosine_sim("q_emb", "cent", "spark")), 6)
    wq = Window.partitionBy("q_id").orderBy(F.col("csim").desc(), F.col("cid"))
    probes = F.broadcast(
        q.crossJoin(cent)
        .select("q_id", "cid", sim_qc.alias("csim"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("q_id", F.col("cid").alias("list_id"))
    )
    qsubs = queries.select(
        F.col("vec_id").alias("q_id"), F.explode(slices).alias("sl")
    ).select("q_id", F.col("sl.s").alias("s"), F.col("sl.v").alias("qsub"))
    lut = F.broadcast(
        qsubs.join(pq_cent, "s").select(
            "q_id", "s", F.col("c").alias("code"),
            F.round(F.expr(dot_expr("qsub", "centvec", "spark", dim=sub)), 6).alias("t"),
        )
    )
    cand = assigned.join(probes, "list_id").filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(lut, ["q_id", "s", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.sum("t"), 6).alias("approx_dot"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("approx_dot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "approx_dot", "rk")
    )


def recall_eval(truth: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of an approximate index against exact ground
    truth — the standard ANN quality gauge (FAISS-style evaluation),
    run as a relational join so it scales with the EVAL set, not the
    corpus.

    Both inputs are (q_id, vec_id, ...) top-k relations: O(n_queries·k)
    rows.  The expensive part of an eval run is producing them; the
    comparison itself is a broadcast left join + one rollup, so recall
    over even a million-query eval set is a trivially small job."""
    t = truth.select("q_id", "vec_id")
    a = approx.select("q_id", "vec_id").withColumn("hit", F.lit(1))
    return (
        t.join(F.broadcast(a), ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("*").alias("n_truth"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            "q_id",
            "n_truth",
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias(
                "recall_at_k"
            ),
        )
    )


def contamination_cosine(
    corpus: DataFrame, benchmark: DataFrame, threshold: float
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors whose max
    cosine similarity against any benchmark/eval vector reaches
    ``threshold`` — the semantic sibling of n-gram contamination checks
    (paraphrased eval leakage that exact-match misses).

    The benchmark set is broadcast (eval suites are tiny next to a
    training corpus); the corpus is scanned ONCE, scored against every
    benchmark vector map-side, and the per-vector max is a partial
    aggregation — the shuffle carries one row per corpus vector, never
    the corpus × benchmark cross product. Ties on the rounded
    similarity pick the lowest benchmark id, so results are
    deterministic for the oracle."""
    nn = sqnorm_expr("embedding", "spark", dim=64)
    b = F.broadcast(
        benchmark.select(
            F.col("vec_id").alias("bench_id"),
            F.col("embedding").alias("b_emb"),
            F.expr(nn).alias("b_nn"),
        )
    )
    scored = (
        spread(corpus)
        .select("vec_id", "embedding", F.expr(nn).alias("nn"))
        .crossJoin(b)
        .select(
            "vec_id",
            "bench_id",
            F.round(
                F.expr(
                    cosine_from_norms(
                        "embedding", "b_emb", "nn", "b_nn", dim=64
                    )
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.expr("max_by(bench_id, struct(cos_sim, -bench_id))").alias(
                "bench_id"
            ),
            F.max("cos_sim").alias("max_cos"),
        )
        .filter(F.col("max_cos") >= threshold)
    )


def pca_gramian(corpus: DataFrame, dim: int = 64) -> DataFrame:
    """Upper-triangular Gram matrix of the embedding corpus — the d×d
    sufficient statistic a distributed PCA needs (the eigendecomposition
    itself is a driver-side d×d problem, not a cluster job).  Returns
    (i, j, gram, n_vecs) for i ≤ j, 0-based dims, where gram =
    Σ_vec x_i·x_j accumulated in fixed point.

    Scale (100 TB): the map side emits d(d+1)/2 products per vector and
    partially aggregates them BEFORE the shuffle, so the exchange
    carries at most d²·partitions rows regardless of corpus size — the
    classic outer-product-accumulate pattern.  No driver collect, no
    UDF, one shuffle.

    Determinism: each coordinate is scaled to micro-units and floored
    to a bigint, so every product is an exact integer (pico-units) and
    the sum is order-independent in DECIMAL(38,0); the double emerges
    only after the final division.

    ``dim`` is VALIDATED, not trusted: a vector whose actual length
    differs raises at execution (JVM-side raise_error) rather than
    silently zero-padding / overflowing the driver-side G in
    :func:`pca_project`.
    """
    guarded = spread(corpus).withColumn(
        "embedding",
        F.when(
            F.size("embedding") != F.lit(dim),
            F.raise_error(
                F.concat(
                    F.lit("pca_gramian: embedding dim "),
                    F.size("embedding").cast("string"),
                    F.lit(f" != declared dim {dim}"),
                )
            ).cast(corpus.schema["embedding"].dataType),
        ).otherwise(F.col("embedding")),
    )
    prods = (
        guarded
        .select(F.posexplode("embedding").alias("i", "xi"), "embedding")
        .select(
            "i",
            F.explode(
                F.expr(
                    "transform(slice(embedding, i + 1, size(embedding) - i),"
                    " (xj, k) -> struct(i + k as j,"
                    "  cast(floor(cast(xi as double) * 1000000 + 0.5) as bigint)"
                    "  * cast(floor(cast(xj as double) * 1000000 + 0.5) as bigint)"
                    "  as p))"
                )
            ).alias("_e"),
        )
        .select("i", F.col("_e.j").alias("j"), F.col("_e.p").alias("p"))
    )
    n = corpus.agg(F.count("*").alias("n_vecs"))
    return (
        prods.groupBy("i", "j")
        .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("_s"))
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            F.expr(
                "round(cast(_s as double) / 1000000000000.0, 6)"
            ).alias("gram"),
            "n_vecs",
        )
    )


def pca_project(corpus: DataFrame, k: int = 2, dim: int = 64) -> DataFrame:
    """Project the embedding corpus onto its top-``k`` principal
    directions.  The d×d Gram matrix comes from :func:`pca_gramian`
    (one partial-agg pass); its eigendecomposition is a DRIVER-SIDE
    d×d problem — the single documented driver-side step (d² doubles,
    size-independent of the corpus), exactly how distributed PCA is
    deployed in practice.  Components are sign-canonicalized (largest-
    magnitude coordinate positive) so the output is deterministic up to
    numpy's eigensolver.

    The projection itself is a map-only pass: the k×d component matrix
    rides back as a broadcast literal array, each output coordinate one
    zip_with dot product.  No shuffle after the gramian's.
    """
    import numpy as np

    g = pca_gramian(corpus, dim).collect()
    # G's size comes from the rows actually returned (pca_gramian has
    # already raise_error'd any vector whose length != dim, so this is
    # belt-and-braces against a stale `dim` default)
    d_actual = max(r["j"] for r in g) + 1 if g else dim
    if d_actual != dim:
        raise ValueError(
            f"pca_project: gramian spans {d_actual} dims, declared {dim}"
        )
    G = np.zeros((dim, dim))
    for r in g:
        G[r["i"], r["j"]] = G[r["j"], r["i"]] = r["gram"]
    vals, vecs = np.linalg.eigh(G)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([round(float(x), 9) for x in v])
    comp_lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"cast({x} as double)" for x in c) + ")"
            for c in comps
        )
        + ")"
    )
    proj = (
        f"transform({comp_lit}, c -> round(aggregate("
        "zip_with(embedding, c, (x, w) -> cast(x as double) * w),"
        " cast(0.0 as double), (acc, v) -> acc + v), 6))"
    )
    return spread(corpus).select(
        "vec_id", F.expr(proj).alias("components")
    )


def pca_whiten(
    corpus: DataFrame, k: int = 2, dim: int = 64, eps: float = 1e-9
) -> DataFrame:
    """PCA-whitened projection: like :func:`pca_project` but each
    component coordinate is scaled by 1/√(λ/n) so the output
    dimensions have unit variance — the decorrelation preprocessing
    contrastive/retrieval pipelines apply before cosine similarity
    (whitening removes the dominant-direction bias that makes all
    embeddings look alike).

    Same deployment shape as pca_project: ONE distributed gramian
    pass, a driver-side d×d eigensolve (corpus-size-independent), and
    a map-only projection with the scaled k×d matrix riding back as a
    broadcast literal.  Components with λ ≤ eps·λ_max are dropped
    (zero-variance directions cannot be whitened) — the output array
    always has exactly ``k`` entries only when the spectrum supports
    it."""
    import numpy as np

    g = pca_gramian(corpus, dim).collect()
    d_actual = max(r["j"] for r in g) + 1 if g else dim
    if d_actual != dim:
        raise ValueError(
            f"pca_whiten: gramian spans {d_actual} dims, declared {dim}"
        )
    n = corpus.count()
    if n < 2:
        raise ValueError(f"pca_whiten needs >= 2 vectors, got {n}")
    G = np.zeros((dim, dim))
    for r in g:
        G[r["i"], r["j"]] = G[r["j"], r["i"]] = r["gram"]
    vals, vecs = np.linalg.eigh(G)
    order = np.argsort(vals)[::-1]
    lam_max = max(float(vals[order[0]]), 0.0)
    comps = []
    for idx in order[:k]:
        lam = float(vals[idx])
        if lam <= eps * lam_max or lam <= 0:
            break
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        scale = 1.0 / np.sqrt(lam / n)
        comps.append([round(float(x * scale), 9) for x in v])
    if not comps:
        raise ValueError("pca_whiten: spectrum has no positive direction")
    comp_lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"cast({x} as double)" for x in c) + ")"
            for c in comps
        )
        + ")"
    )
    proj = (
        f"transform({comp_lit}, c -> round(aggregate("
        "zip_with(embedding, c, (x, w) -> cast(x as double) * w),"
        " cast(0.0 as double), (acc, v) -> acc + v), 6))"
    )
    return spread(corpus).select(
        "vec_id", F.expr(proj).alias("whitened")
    )


def matryoshka_recall(
    emb: DataFrame, dims=(8, 16, 32, 64), k: int = 10, nq: int = 20
) -> DataFrame:
    """Dimension-ablation gauge for matryoshka-style embeddings: for
    each truncation width d, recall@k of brute-force search over the
    FIRST d dimensions against the full-width ground truth — the
    evaluation that decides how far vectors can be truncated (and
    storage/compute cut) before retrieval quality drops.

    The mean recall is computed in integers (Σ hits / (n_queries·k),
    one final division) so no float summation order exists.

    Scale (100 TB): ground truth is computed once and persisted; each
    ablation is the standard broadcast-queries brute scan (no corpus
    shuffle).  Like every brute-force gauge here, run it on a query
    SAMPLE — the index path (IVF/PQ) serves production traffic."""
    from faconne_spark.operators.dedup import _persist_sig

    queries = emb.filter(F.col("vec_id") < nq)
    # Optimization r12 wave 3: eager-when-large persist — the ablation
    # branches all join truth in one action (concurrent-consumer case,
    # same rationale as ann_nprobe_sweep).
    truth = _persist_sig(
        cosine_topk(emb, queries, k).select("q_id", "vec_id"), emb
    )
    out = None
    for d in dims:
        trunc = f"slice(embedding, 1, {d})"
        emb_d = emb.withColumn("embedding", F.expr(trunc))
        q_d = queries.withColumn("embedding", F.expr(trunc))
        # optimization r13: pass the slice width so the per-pair dot
        # unrolls at width d (the default 64 failed the size guard on
        # every truncated row → interpreted fold); identical values
        approx = cosine_topk(emb_d, q_d, k, dim=d).select(
            "q_id", F.col("vec_id").alias("a_id")
        )
        j = truth.join(
            approx,
            (truth.q_id == approx.q_id) & (truth.vec_id == approx.a_id),
            "left",
        ).select(truth.q_id, "a_id")
        summary = j.agg(
            F.lit(d).alias("dim"),
            F.countDistinct("q_id").alias("n_queries"),
            F.sum(
                F.when(F.col("a_id").isNotNull(), 1).otherwise(0)
            ).alias("sum_hits"),
        ).select(
            "dim",
            "n_queries",
            "sum_hits",
            F.round(
                F.col("sum_hits") / (F.col("n_queries") * k), 6
            ).alias("mean_recall"),
        )
        out = summary if out is None else out.unionByName(summary)
    return out


def pairwise_diversity(emb: DataFrame, micro: int = 1_000_000) -> DataFrame:
    """Per-label mean pairwise cosine via the vector-sum identity
    Σᵢ≠ⱼ v̂ᵢ·v̂ⱼ = ‖Σv̂‖² − Σ‖v̂‖² — the collapsed-label gauge (mean
    cos → 1 means the label's vectors are near-duplicates) with NO
    pairwise join anywhere.

    Scale (100 TB): ONE corpus scan — the per-(label, dim) aggregation
    carries component sums, self-square sums, AND the vector count in
    the same map-side combine (count per dim == vector count for a
    uniform-dimension corpus, which embeddings tables are), so the
    exchange is labels×dim rows and the corpus is read exactly once.
    Normalized components quantize to integer ``micro`` units per row,
    so every downstream sum is exact integer arithmetic
    (order/partition-independent, same fixed-point design as the
    k-means/PCA family)."""
    base = emb.select(
        "label", "embedding",
        F.expr(
            "sqrt(aggregate(embedding, cast(0.0 as double),"
            " (a, v) -> a + cast(v as double) * cast(v as double)))"
        ).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    micro_rows = base.select(
        "label",
        F.posexplode("embedding").alias("pos", "val"),
        "nrm",
    ).select(
        "label", "pos",
        F.expr(
            f"cast(round(cast(val as double) / nrm * {micro}, 0) as bigint)"
        ).alias("mc"),
    )
    per_pos = micro_rows.groupBy("label", "pos").agg(
        F.sum("mc").alias("s"),
        F.sum(F.expr("cast(mc * mc as decimal(38,0))")).alias("ss"),
        F.count("*").alias("cnt"),
    )
    agg = per_pos.groupBy("label").agg(
        F.sum(F.expr("cast(s as decimal(19,0)) * s")).alias("ssq"),
        F.sum("ss").alias("self_sq"),
        F.max("cnt").alias("n_vecs"),
    )
    return agg.filter(F.col("n_vecs") > 1).select(
        "label", "n_vecs",
        F.round(
            (F.col("ssq") - F.col("self_sq")).cast("double")
            / (
                F.col("n_vecs")
                * (F.col("n_vecs") - 1)
                * F.lit(float(micro) * micro)
            )
            + 0.0,
            6,
        ).alias("mean_pairwise_cos"),
    )


RRF_MICRO = 1_000_000_000


def rrf_fuse(
    rankings: list,
    k_const: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack 2009) of retrieval rankings:
    fused score = Σ_lists 1/(k + rank) — the standard way to combine a
    cheap probe ranking with an exact one (or lexical with dense)
    without calibrating their score scales against each other.

    Each input carries (q_id, vec_id, rk).  Per-list contributions are
    fixed-pointed to RRF_MICRO units BEFORE summing, so the fused score
    is an order-independent integer sum (float addition order across ≥3
    lists would otherwise be partition-dependent) and the re-rank is
    deterministic (score desc, vec_id asc).

    Scale (100 TB): input rankings are already top-pool-sized (queries
    × pool, ≪ corpus); the fuse is one groupBy plus one window over
    that bounded relation."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    tagged = rankings[0].select("q_id", "vec_id", "rk")
    for r in rankings[1:]:
        tagged = tagged.unionByName(r.select("q_id", "vec_id", "rk"))
    scored = tagged.groupBy("q_id", "vec_id").agg(
        F.sum(
            F.expr(
                f"cast(round({RRF_MICRO} / ({k_const} + rk)) as bigint)"
            )
        ).alias("__sm"),
        F.count("*").alias("n_lists"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("__sm"), F.asc("vec_id"))
    return (
        scored.withColumn("rrf_rank", F.row_number().over(w))
        .filter(F.col("rrf_rank") <= top_k)
        .select(
            "q_id",
            "vec_id",
            "n_lists",
            F.round(F.col("__sm") / float(RRF_MICRO), 6).alias("rrf_score"),
            "rrf_rank",
        )
    )


def pq_distortion(
    corpus: DataFrame, m: int = 4, ncodes: int = 8, dim: int = 64
) -> DataFrame:
    """PQ codebook-quality gauge: per subspace, how much signal the
    quantizer throws away — vector count, codes actually used (a
    collapsed codebook shows up as n_codes_used ≪ ncodes), and the
    exact integer micro sum of squared reconstruction residuals
    ‖subv − centvec(code)‖² — the number that decides whether m/ncodes
    need to grow BEFORE recall silently degrades (the encode-side
    companion of ann_recall_eval's query-side check).

    Determinism: the assignment is pq_topk's exact argmax (6-dp dot,
    tie → lowest code); residual sums fold in index order (l2sq_expr)
    and micro-round per (vector, subspace) to BIGINT, so the per-
    subspace sum is partition-order-free.

    Scale: same shapes as encoding — codebook broadcast, one
    corpus×m-row aggregation carrying the winning centroid via max_by
    (no re-join against the codebook, no second corpus pass)."""
    from faconne_spark.functions import dot_expr, l2sq_expr
    from faconne_spark.session import spread

    sub = dim // m
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.expr(f"slice(embedding, {s * sub + 1}, {sub})").alias("v"),
            )
            for s in range(m)
        ]
    )
    cent = F.broadcast(
        corpus.filter(F.col("vec_id") < ncodes)
        .select(F.col("vec_id").alias("c"), F.explode(slices).alias("sl"))
        .select("c", F.col("sl.s").alias("s"), F.col("sl.v").alias("centvec"))
    )
    subvecs = spread(corpus).select(
        "vec_id", F.explode(slices).alias("sl")
    ).select("vec_id", F.col("sl.s").alias("s"), F.col("sl.v").alias("subv"))
    assigned = (
        subvecs.join(cent, "s")
        .select(
            "vec_id",
            "s",
            "subv",
            F.round(F.expr(dot_expr("subv", "centvec", "spark", dim=sub)), 6).alias("d"),
            F.col("c"),
            F.col("centvec"),
        )
        .groupBy("vec_id", "s")
        .agg(
            F.expr(
                "max_by(named_struct('c', c, 'cv', centvec), struct(d, -c))"
            ).alias("best"),
            F.expr("any_value(subv)").alias("subv"),
        )
    )
    dist = assigned.select(
        "s",
        F.col("best.c").alias("code"),
        F.expr(
            f"cast(round(1000000 * ({l2sq_expr('subv', 'best.cv', 'spark')}))"
            " as bigint)"
        ).alias("dist_micro"),
    )
    return dist.groupBy("s").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("code").alias("n_codes_used"),
        F.sum("dist_micro").alias("sum_sq_micro"),
    )
