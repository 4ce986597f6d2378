"""Deduplication family for large-scale document corpora.

All operators avoid O(n²): exact dedup is one hash-groupBy; near-dup
candidates come from LSH banding (shared-bucket join), never all-pairs.
Everything is Catalyst expressions built from the portable builders in
``faconne_spark.functions``, so the DuckDB oracles compute the exact
same results.

Scale notes (100 TB): the only shuffles are groupBy(fingerprint) /
groupBy(band) / candidate-pair join keys; bucket sizes are bounded by
band width choice (b, r); AQE's skew-join handles hot buckets (e.g.
empty-document shingles).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faconne_spark.functions import (
    band_sig,
    jaccard_micro_sql,
    phash60,
    tokens_ws,
    word_shingles,
)
from faconne_spark.session import spread

NORM = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
NORM_DUCK = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# Below this input size the double-compute a lazy persist risks is cheaper
# than the extra materialization job, so the eager count() is skipped.
# The gate corpora (sf0.001/sf0.01 documents ≈ 65 KB) stay lazy — gate
# latency — while bench/production sizes materialize eagerly; the
# signature relations explode to many times the input size, so the
# threshold is deliberately small.
# Optimization r12: was 2 MB, which silently left the sf0.1 bench
# corpus (documents 584 KB, embeddings 780 KB) on the LAZY path — both
# sides of every signature self-join scheduled before the cache
# filled, so the md5/shingle/bucket expressions ran ~2×.  200 KB keeps
# the gate trade and restores the designed eager path for
# bench/production inputs (before/after numbers in OPTIMIZATION_r12.md).
EAGER_BYTES = 200 * 1024
EAGER_ROWS = 20_000

_PERSISTED: list[DataFrame] = []


def _input_is_large(df: DataFrame) -> bool | None:
    """Cheap driver-side size estimate: sum of scan file sizes when the
    DataFrame is a file scan; ``None`` (unknown) otherwise — a full
    count() on a non-file-backed relation (e.g. the pair join passed by
    pair_graph_stats) would compute exactly the expensive work the
    caller's persist is trying to avoid."""
    import os

    files = [f for f in df.inputFiles() if f.startswith("file:")]
    if files:
        try:
            total = sum(os.path.getsize(f[len("file:"):]) for f in files)
            return total >= EAGER_BYTES
        except OSError:
            pass
    return None


def _persist_sig(rel: DataFrame, source: DataFrame) -> DataFrame:
    """Persist an expensive signature relation (tracked for
    :func:`release_caches`), materializing EAGERLY only when the source
    is large: a lazy persist inside a self-join schedules both sides
    before the cache fills, so the signature expression runs twice —
    which matters at 100 TB but not at gate scale, where the extra
    count() job is pure latency."""
    rel = rel.persist()
    _PERSISTED.append(rel)
    large = _input_is_large(source)
    if large is None:
        # Source size unknown (not a file scan): probe the persisted
        # relation with a bounded limit-count so the probe's work lands
        # in the cache instead of recomputing the source a second time.
        large = rel.limit(EAGER_ROWS).count() >= EAGER_ROWS
    if large:
        rel.count()
    return rel


def track_persist(rel: DataFrame) -> DataFrame:
    """Persist a (small) relation and register it for
    :func:`release_caches` — the cross-operator cache registry, so one
    release call after a gate/bench run drops every cached relation."""
    rel = rel.persist()
    _PERSISTED.append(rel)
    return rel


def release_caches() -> None:
    """Unpersist every signature relation cached by the dedup family.

    Repeated dedup calls in one session (bench loops, the driver gate)
    would otherwise accumulate cached relations in executor storage."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


# In-row candidate-pair generation from a sorted-distinct posting-list
# column named `ids`: each (x, y) with x before y in the list becomes a
# struct(id_a, id_b) — position order = id order, so id_a < id_b holds
# strictly.  Shared by containment_pairs and cdc_pairs so the slice
# arithmetic can never silently diverge between them.
INROW_PAIRS = (
    "flatten(transform(ids, (x, i) ->"
    " transform(slice(ids, i + 2, size(ids)),"
    " y -> struct(x AS id_a, y AS id_b))))"
)
POSTING_IDS = "array_distinct(array_sort(collect_list(doc_id)))"


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup on normalised text: keeper = min doc_id per
    fingerprint; one map-side-combinable groupBy."""
    return (
        spread(docs).select(
            "doc_id", F.expr(phash60(NORM, "spark")).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _minhash_sig_rel(
    docs: DataFrame, n_shingle: int, k: int
) -> DataFrame:
    """(doc_id, sig) minhash signature relation, computed as
    explode(shingles) → phash60 → k codegen ``min`` aggregates — the
    :func:`simhash_signatures` precedent (optimization r12 wave 4):
    plain aggregates run inside whole-stage codegen while the old
    higher-order ``aggregate(...)`` folds were interpreted per element,
    and map-side partial aggregation reduces the exploded shingles back
    to one k-mins row per doc per input partition before any shuffle —
    at 100 TB the shuffle carries ~8·k B/doc, not the shingle stream.

    Bit-identical to the fold formulation (pinned in
    tests/test_minhash_codegen_r12.py): the per-shingle permutation
    arithmetic is the same overflow-free BIGINT text, ``min`` over the
    group equals the fold's ``least`` chain (order-independent), and
    ``explode_outer`` keeps a NULL-shingles document as one NULL-hash
    row whose k NULL mins rebuild the same all-NULL signature the old
    expression produced."""
    from faconne_spark.functions import _MH_MOD, _mh_consts

    consts = _mh_consts(k)
    hashed = (
        spread(docs)
        .select(
            "doc_id",
            F.explode_outer(
                F.expr(word_shingles("text", n_shingle, "spark"))
            ).alias("s"),
        )
        .select("doc_id", F.expr(phash60("s", "spark")).alias("h"))
    )
    mins = [
        F.min(
            F.expr(
                f"({a}L * (h % 1073741824) + {b}L * (h div 1073741824)"
                f" + {c}L) % {_MH_MOD}L"
            )
        ).alias(f"_m{i}")
        for i, (a, b, c) in enumerate(consts)
    ]
    return (
        hashed.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[f"_m{i}" for i in range(k)]).alias("sig"),
        )
    )


def minhash_signatures(
    docs: DataFrame, n_shingle: int = 3, k: int = 12, bands: int = 4
) -> DataFrame:
    """(doc_id, sig, band) relation, PERSISTED.

    The signature (md5 per shingle + k affine permutations) is by far
    the most expensive expression in the dedup family, and Spark's
    higher-order lambdas run interpreted (outside codegen) — so it must
    be computed ONCE, not re-derived on each side of the candidate
    self-join.  Persisting (doc_id, sig, band) is the standard
    fingerprint-materialization step of production MinHash pipelines:
    it is ~100 B/doc — at 100 TB of text that's a few hundred GB across
    the cluster, well inside executor storage, and it converts the
    self-join into two scans of a tiny cached relation.

    Materialization is eager for large inputs (see :func:`_persist_sig`):
    a lazy persist inside a self-join schedules both sides before the
    cache fills, so the signature expression still runs twice."""
    r = k // bands
    with_sig = _minhash_sig_rel(docs, n_shingle, k)
    banded = with_sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[F.expr(band_sig("sig", b, r, "spark")) for b in range(bands)]
            )
        ).alias("band"),
    )
    return _persist_sig(banded, docs)


def minhash_lsh_pairs(
    docs: DataFrame, n_shingle: int = 3, k: int = 12, bands: int = 4,
    banded: DataFrame | None = None,
) -> DataFrame:
    """MinHash + LSH candidate pairs.

    shingle → k-perm minhash signature → b bands of r = k/b hashes →
    shared-band self-join (id_a < id_b) → distinct, with estimated
    Jaccard = fraction of agreeing minhashes.  The shuffle key is the
    band signature; no all-pairs comparison ever happens, and the
    signature relation is cached so it is computed once."""
    if banded is None:
        banded = minhash_signatures(docs, n_shingle, k, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr(
                "cast(size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y),"
                " v -> v)) as double) / cast(size(a.sig) as double)"
            ).alias("est_jaccard"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame, n_shingle: int = 3, threshold: float = 0.5,
    n_bands: int = 4, k: int = 12,
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates: candidates from
    :func:`minhash_lsh_pairs` banding, then the exact intersection/union
    ratio on the shingle sets, kept when ≥ threshold."""
    sh = word_shingles("text", n_shingle, "spark")
    # shingle arrays are re-read on BOTH sides of the pair join →
    # cache (eagerly when large; lazy persist would compute both join
    # sides cold)
    shingled = _persist_sig(
        spread(docs).select("doc_id", F.expr(sh).alias("sh")), docs
    )
    cand = minhash_lsh_pairs(docs, n_shingle, k, n_bands).select("id_a", "id_b")
    j = (
        cand.join(shingled.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(shingled.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(
                "cast(size(array_intersect(sh_a, sh_b)) as double) /"
                " cast(size(array_union(sh_a, sh_b)) as double)"
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j


def embedding_cosine_pairs(
    emb: DataFrame, threshold: float = 0.35, n_planes: int = 4, dim: int = 64
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from sign-bit
    LSH buckets (random-hyperplane, shared-bucket join — the same
    bucketing as ANN), exact cosine filter ≥ threshold.

    At 100 TB the only shuffle is groupBy(bucket); candidate count per
    bucket is corpus/2^n_planes on average, tuned by n_planes; AQE
    skew-join splits any hot bucket.
    """
    from faconne_spark.operators.similarity import lsh_bucket_expr
    from faconne_spark.functions import cosine_from_norms, sqnorm_expr

    bucket = lsh_bucket_expr("embedding", n_planes, dim, "spark")
    # Optimization r12 (guide §2.3): the squared norm is computed ONCE
    # per vector into the persisted bucket relation, so the pair stage
    # pays one dot + divide instead of three folds per pair
    # (cosine_from_norms is bit-identical to the old cosine_sim fold)
    bucketed = _persist_sig(  # bucketing + norm run once, not per side
        spread(emb).select(
            "vec_id", "embedding", F.expr(bucket).alias("bucket"),
            F.expr(sqnorm_expr("embedding", "spark", dim=dim)).alias("nn"),
        ),
        emb,
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")

    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                F.expr(cosine_from_norms(
                    "a.embedding", "b.embedding", "a.nn", "b.nn", dim=dim
                )), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """The per-doc 60-bit SimHash (doc_id, sh) relation — extracted
    from :func:`simhash_pairs` in round 7 (plan-identical; the bit-bias
    audit key reads the same signatures).  Computed as explode(tokens)
    → groupBy(doc_id) with 60 conditional-count aggregates rather than
    a higher-order-lambda expression: aggregates run inside whole-stage
    codegen while array lambdas are interpreted (measured ~7× faster),
    and map-side partial aggregation reduces the exploded tokens back
    to one 60-counter row per doc per input partition before any
    shuffle — at 100 TB the shuffle carries ~488 B/doc, not the token
    stream."""
    toks = tokens_ws("text", "spark")
    hashed = spread(docs).select(
        "doc_id", F.explode(F.expr(toks)).alias("t")
    ).select("doc_id", F.expr(phash60("t", "spark")).alias("h"))
    # one-bit counts, not ±1 sums: count_if(bit set) with a plain count
    # gives the same vote sign (2c > n ⟺ c - (n-c) > 0) and runs ~2×
    # faster in codegen than 60 conditional ±1 sums (no branch, no
    # signed accumulate) — bit-identical signatures, measured at sf0.1
    votes = hashed.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.count_if(
                F.expr(f"shiftright(h, {i}) % 2 = 1")
            ).alias(f"b{i}")
            for i in range(60)
        ],
    )
    sh_expr = " + ".join(
        f"if(2 * b{i} > n, {1 << i}L, 0L)" for i in range(60)
    )
    return votes.select(
        "doc_id", F.expr(f"cast({sh_expr} as bigint)").alias("sh")
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup candidates: 60-bit simhash, bucketed by 4
    15-bit bands.  With b = max_hamming + 1 bands the pigeonhole
    principle makes recall EXACT for hamming ≤ 3 — and the 15-bit band
    keyspace (32 768 buckets per band) keeps bucket populations, hence
    per-bucket pair counts, bounded: a 32-bit/8-bit-band variant on a
    clustered corpus degenerates toward all-pairs (measured ~1M pairs
    on 5k docs), which no cluster survives at 100 TB.

    The simhash itself is computed as explode(tokens) → groupBy(doc_id)
    with 60 conditional-sum aggregates rather than a higher-order-lambda
    expression: aggregates run inside whole-stage codegen while array
    lambdas are interpreted (measured ~7× faster), and map-side partial
    aggregation reduces the exploded tokens back to one 60-counter row
    per doc per input partition before any shuffle — at 100 TB the
    shuffle carries ~488 B/doc, not the token stream. The hamming
    filter runs BEFORE distinct so the 4× band duplication is pruned
    pre-shuffle."""
    with_h = simhash_signatures(docs)
    banded = _persist_sig(
        with_h.select(
            "doc_id",
            "sh",
            F.explode(
                F.array(
                    *[
                        F.expr(f"shiftright(sh, {b * 15}) % 32768 + {b} * 32768")
                        for b in range(4)
                    ]
                )
            ).alias("band"),
        ),
        docs,
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("bit_count(a.sh ^ b.sh)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _checkpoint(df: DataFrame) -> DataFrame:
    """Truncate lineage: reliable checkpoint when a checkpointDir is
    configured (fault-tolerant — GraphFrames does the same for its CC
    iterations), else localCheckpoint.  localCheckpoint blocks live on
    executors: fine on local[n], but on a real cluster losing an
    executor discards them and fails the job, so production runs should
    set ``spark.sparkContext.setCheckpointDir(...)``."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


class ConvergenceError(RuntimeError):
    """An iterative operator hit its iteration bound before converging —
    its output would be silently wrong (e.g. split dup-clusters), so at
    scale this must be an error, not a warning."""


# Bucket the CC edge relation when it is at least this many rows:
# below, re-shuffling edges each round is cheaper than a table write.
CC_COLOCATE_MIN_EDGES = 25_000_000
# Broadcast the per-round LABEL relation when the (edges ∪ self-loops)
# row count is at most this (labels ≤ nodes ≤ that count): the label
# side is then shipped instead of shuffled, so a round is ONE exchange
# (the aggregate) rather than four (SMJ both sides + agg + hop join).
# ~1M label rows ≈ tens of MB framed — routine broadcast territory on
# any cluster; beyond it the shuffle/co-locate paths take over, so the
# threshold is a join-strategy pivot (guide §3.1), not a local[32]
# tune.  Env-overridable for production sizing.
CC_BROADCAST_MAX_EDGES = int(
    os.environ.get("FACONNE_CC_BROADCAST_MAX_EDGES", str(1_000_000))
)
_CC_TABLE_SEQ = [0]


def connected_components(
    pairs: DataFrame, max_iter: int = 20, co_locate: bool | None = None
) -> DataFrame:
    """Cluster near-duplicate pairs into components: each node gets the
    MINIMUM doc_id reachable from it (the canonical keeper), via
    min-label propagation with pointer jumping.

    Scale design (what naïve DataFrame loops get wrong):

    * **Lineage truncation.** Each round's labels are eagerly
      ``localCheckpoint``-ed — without this the logical plan doubles
      per round and optimizer time blows up exponentially (measured:
      3 s → 35 s by round 4 on 700 nodes). Checkpointing makes every
      round O(edges), which is what runs on a cluster too (GraphFrames
      checkpoints its CC iterations for the same reason).
    * **Pointer jumping.** After the neighbour-min step, labels hop
      through themselves (``label ← label(label)``), doubling the
      effective path length per round — convergence in O(log diameter)
      rounds rather than O(diameter).
    * **Fused propagate round.** Edges carry explicit self-loops, so
      one join + one aggregate per round yields BOTH the neighbour-min
      label and the node's previous label (``min(label) where
      dst = src`` — the self-loop row): the old separate
      labels⋈nbr_min re-join is gone, and convergence stays an exact
      changed-label count piggybacked on the checkpoint's own
      materialization via ``observe()`` — one job per round.
    * **Edge co-location** (``co_locate``): checkpointing cannot
      preserve ``outputPartitioning``, so the per-round edge⋈label join
      would re-shuffle the EDGE relation every round — the dominant
      per-round cost at 100 TB where edges ≫ labels.  When the edge
      count (observed free during the checkpoint) reaches
      ``CC_COLOCATE_MIN_EDGES``, edges are written ONCE to a bucketed
      scratch table clustered+sorted on ``dst``; every round then reads
      bucket-local edges with NO exchange and shuffles only the
      O(nodes) label relation (plan-asserted in tests).  ``None`` =
      auto by size; the scratch table is dropped on completion.

    ``max_iter`` bounds adversarial graphs, and hitting it without
    convergence raises :class:`ConvergenceError` — returning
    unconverged labels would silently split clusters at 100 TB.
    """
    if max_iter < 1:
        raise ValueError(
            f"connected_components needs max_iter >= 1, got {max_iter}"
        )
    from pyspark.sql import Observation

    # Optimization r12 (guide §2.4): the old entry built undirected
    # edges (union + distinct), then nodes (second distinct), then
    # unioned self-loops — three exchanges and two scans of the pair
    # build before the loop even starts.  One explode emits both
    # directions AND both self-loops per pair; a single distinct
    # dedups everything (self-loops repeat across pairs) — identical
    # edge set, one exchange, one scan of the pair build.
    obs_edges = Observation()
    edges = _checkpoint(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_a").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_b").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .observe(obs_edges, F.count(F.lit(1)).alias("n"))
    )
    n_edges = obs_edges.get["n"] or 0
    if co_locate is None:
        co_locate = n_edges >= CC_COLOCATE_MIN_EDGES
    # Optimization r12 (guide §3.1/§2.4): on small-to-medium graphs the
    # label relation fits a broadcast, which removes BOTH shuffles of
    # the per-round SMJ (edges side AND labels side) and the hop join's
    # exchange — each round becomes edge-scan → BHJ → one aggregate
    # exchange.  The threshold keys off the observed edge count (known
    # free from the checkpoint), so the decision is input-adaptive, not
    # a local-mode constant; big graphs keep the shuffle/co-locate
    # paths unchanged.
    bcast_labels = (not co_locate) and 0 < n_edges <= CC_BROADCAST_MAX_EDGES
    scratch_table = None
    spark = pairs.sparkSession
    if co_locate:
        from faconne_spark.sources import write_bucketed

        _CC_TABLE_SEQ[0] += 1
        scratch_table = f"faconne_cc_edges_{os.getpid()}_{_CC_TABLE_SEQ[0]}"
        # MANAGED table: lives in spark.sql.warehouse.dir, which is
        # shared storage on a real cluster — a driver-local tempdir
        # here would leave executors on other nodes unable to read the
        # buckets, breaking exactly the 100 TB case this path exists
        # for.  DROP TABLE below removes the managed data too.
        write_bucketed(
            edges, scratch_table, ["dst"],
            n_buckets=spark.sparkContext.defaultParallelism,
        )
        edges = spark.table(scratch_table)
    try:
        # init = fused round 0: label(n) = min(n, direct neighbours);
        # the self-loop row makes min(dst) include n itself
        labels = _checkpoint(
            edges.groupBy(F.col("src").alias("node")).agg(
                F.min("dst").alias("label")
            )
        )
        changed = -1

        def _propagate(cur):
            """One fused propagate round (neighbour-min + pointer jump)
            as a LAZY plan over ``cur`` labels: one join + one
            aggregate gives the new label AND the node's pre-round
            label (the self-loop's dst = src row).  The hop side is
            NOT broadcast even when labels are: stepped ends in the
            aggregate's shuffle exchange, and a plain self-join keyed
            on the same attribute REUSES that exchange (one compute of
            stepped per round); a broadcast hop would rebuild the
            stepped subtree inside the broadcast exchange instead.
            (A second hop per round — l∘l∘l — was tried and measured:
            round count stayed 9 on the sf0.1 simhash graph, so it was
            reverted.)"""
            lab = F.broadcast(cur) if bcast_labels else cur
            stepped = (
                edges.join(lab, edges.dst == lab.node)
                .groupBy(F.col("src").alias("node"))
                .agg(
                    F.min("label").alias("label"),
                    F.min(
                        F.when(F.col("dst") == F.col("src"), F.col("label"))
                    ).alias("prev"),
                )
            )
            hop = stepped.select(
                F.col("node").alias("jnode"), F.col("label").alias("jlabel")
            )
            return (
                stepped.join(hop, stepped.label == hop.jnode, "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("jlabel", "label")
                    ).alias("label"),
                    "prev",
                )
            )

        # Optimization r12: TWO propagate rounds per materialization
        # barrier.  Each round used to be its own checkpoint+observe
        # job (the convergence count needs an action), so a
        # 9-round graph paid 9 job launches of pure scheduling
        # overhead on small graphs — and 9 barriers at any scale.
        # Labels are monotone non-increasing, so "the SECOND round of
        # a block changed nothing" is exactly the old per-round
        # convergence criterion, observed every other round; the
        # block's intermediate round stays a lazy plan (lineage is
        # still truncated at every checkpoint, now two rounds deep).
        # Work past convergence is unchanged: the old loop also paid
        # one full confirming round.
        rounds_done = 0
        while rounds_done < max_iter:
            inner = 2 if max_iter - rounds_done >= 2 else 1
            cur = labels
            for _ in range(inner):
                cur = _propagate(cur.select("node", "label"))
            obs = Observation()
            new_labels = _checkpoint(
                cur.observe(
                    obs,
                    F.sum(
                        F.expr("case when label != prev then 1 else 0 end")
                    ).alias("changed"),
                )
            )
            rounds_done += inner
            changed = obs.get["changed"] or 0
            labels = new_labels.select("node", "label")
            if changed == 0:
                break
        if changed != 0:
            raise ConvergenceError(
                f"connected_components did not converge in {max_iter} rounds"
                f" ({changed} labels still changing); raise max_iter"
            )
    finally:
        if scratch_table is not None:
            # managed table: DROP removes its warehouse data as well
            spark.sql(f"DROP TABLE IF EXISTS {scratch_table}")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def containment_pairs(
    docs: DataFrame, n_shingle: int = 3, max_df: int = 20,
    threshold: float = 0.6,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT — catches a
    short document embedded in a longer one, which symmetric Jaccard
    misses (|A∩B|/|A∪B| shrinks as |B| grows, |A∩B|/|A| does not).

    Candidate generation is an inverted index over RARE shingles:
    shingles with document frequency > ``max_df`` are dropped before
    the self-join (they are boilerplate shared by many docs — joining
    on them degenerates toward all-pairs), so per-shingle bucket size
    is bounded by max_df and pair counts by max_df² per shingle.
    Candidates then get EXACT containment from the full shingle arrays
    (cached once, joined to both sides).  A contained pair sharing only
    ultra-common shingles is missed by construction — that is the
    documented recall trade of frequency-pruned indexes.
    """
    sh = word_shingles("text", n_shingle, "spark")
    shingled = _persist_sig(
        spread(docs).select("doc_id", F.expr(sh).alias("sh")), docs
    )
    rel = shingled.select("doc_id", F.explode("sh").alias("s"))
    rare = rel.join(
        rel.groupBy("s").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("s"),
        "s",
    )
    # Candidate pairs are generated IN-ROW from each rare shingle's
    # posting list instead of a rare⋈rare self-join: after the df
    # filter every list holds ≤ max_df entries, so the per-shingle
    # expansion is bounded (≤ max_df²/2 pairs) and one groupBy shuffle
    # replaces the self-join's two exchanges — the dominant saving at
    # corpus scale, where the inverted index is the largest relation in
    # this operator.  array_distinct collapses intra-document repeats
    # (df counts occurrences, so the list may repeat a doc_id), and the
    # sorted-distinct list makes position order = id order, giving the
    # strict id_a < id_b the old join predicate enforced.
    # (Optimization r12 note: a single groupBy(s) computing df AND the
    # posting list would save the df join, but it collects lists for
    # HOT shingles before filtering — unbounded per-group state at
    # corpus scale.  The two-phase shape stays; measured instead.)
    cand = (
        rare.groupBy("s")
        .agg(F.expr(POSTING_IDS).alias("ids"))
        .select(F.explode(F.expr(INROW_PAIRS)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # Optimization r12 (guide §1.2 per-task work): the survivor filter
    # used to be `cont_a_in_b >= t OR cont_b_in_a >= t`, which Catalyst
    # pushes into the verify join's condition with the intersect inlined
    # into BOTH branches — every candidate pair paid array_intersect
    # (hash-set over ~200-string arrays) up to twice in the condition
    # alone.  max(x/a, x/b) = x / least(a, b) for x >= 0 (both sides of
    # a candidate pair own >= 1 shingle — they came out of a posting
    # list — so least() is never 0), and round() is monotone
    # non-decreasing, so ONE comparison selects the identical survivor
    # set: round(x/least(a,b), 6) >= t  <=>  the old OR.  The division
    # is bit-for-bit one of the two original divisions (least returns
    # one of the exact integer sizes).  Survivors then compute the two
    # published containment columns once (projection-level
    # subexpression elimination shares the intersect).
    return (
        cand.join(shingled.select(F.col("doc_id").alias("id_a"),
                                  F.col("sh").alias("sh_a")), "id_a")
        .join(shingled.select(F.col("doc_id").alias("id_b"),
                              F.col("sh").alias("sh_b")), "id_b")
        .filter(
            F.expr(
                "round(cast(size(array_intersect(sh_a, sh_b)) as double)"
                " / cast(least(size(sh_a), size(sh_b)) as double), 6)"
            )
            >= threshold
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                "round(cast(size(array_intersect(sh_a, sh_b)) as double)"
                " / cast(size(sh_a) as double), 6)"
            ).alias("cont_a_in_b"),
            F.expr(
                "round(cast(size(array_intersect(sh_a, sh_b)) as double)"
                " / cast(size(sh_b) as double), 6)"
            ).alias("cont_b_in_a"),
        )
    )


def pair_graph_stats(pairs: DataFrame) -> DataFrame:
    """Structural diagnostics of a near-dup pair graph in one row:
    nodes, edges, max/avg degree, and the triangle count — the density
    signals that distinguish tight duplicate cliques from chains of
    borderline matches (chains usually mean the threshold is too low).

    Triangle counting is the canonical two-join formulation over
    id-ordered edges (a<b<c), so each triangle is generated exactly
    once and no edge direction ever doubles; both joins key on node
    ids — never a cartesian.  Degree stats reuse one symmetrized
    groupBy."""
    e = pairs.select("id_a", "id_b").distinct()
    e = _persist_sig(e, pairs)
    # Optimization r12 (guide §3.1): broadcast the closing edge list
    # when small (adaptive; the count warms the persisted relation) so
    # the wedge stream is not re-shuffled — same shape as
    # triangle_counts.
    bcast = 0 < e.count() <= CC_BROADCAST_MAX_EDGES
    deg = (
        e.select(F.col("id_a").alias("n")).union(
            e.select(F.col("id_b").alias("n"))
        )
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    wedges = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.id_b") == F.col("y.id_a"))
        .select(
            F.col("x.id_a").alias("a"),
            F.col("x.id_b").alias("b"),
            F.col("y.id_b").alias("c"),
        )
    )
    closing = F.broadcast(e.alias("z")) if bcast else e.alias("z")
    tri = wedges.join(
        closing,
        (F.col("a") == F.col("z.id_a")) & (F.col("c") == F.col("z.id_b")),
    )
    return (
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.max("deg").alias("max_degree"),
            F.round(F.avg("deg"), 6).alias("avg_degree"),
        )
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(tri.agg(F.count("*").alias("n_triangles")))
    )


def incremental_exact_dedup(
    new_docs: DataFrame, existing_fps: DataFrame
) -> DataFrame:
    """Incremental ingestion dedup: classify a NEW batch against the
    fingerprint relation of the already-ingested corpus without
    rescanning old documents — the pattern that makes daily corpus
    updates O(batch), not O(corpus).

    Returns one row per new document: its fingerprint, whether it
    duplicates the existing corpus (``dup_of_existing``), and whether
    it loses to an earlier doc within its own batch
    (``dup_within_batch``); keepers are rows with both flags false.
    The existing side carries only (fingerprint, keeper_id) — at 100 TB
    that's the compact state checkpoint an ingestion pipeline persists
    between runs; the join is fingerprint ⋈ fingerprint (hash join,
    existing side bucketable)."""
    fps = spread(new_docs).select(
        "doc_id", F.expr(phash60(NORM, "spark")).alias("fingerprint")
    )
    batch_min = fps.groupBy("fingerprint").agg(
        F.min("doc_id").alias("batch_keeper")
    )
    # Defensive: duplicate (fingerprint, keeper) state rows — e.g. from a
    # replayed writer epoch — would fan out the left join below, emitting
    # duplicate verdict rows for every later batch.  min() keeps the
    # earliest keeper deterministically.
    ex = (
        existing_fps.groupBy("fingerprint")
        .agg(F.min("keeper_id").alias("existing_keeper"))
    )
    return (
        fps.join(batch_min, "fingerprint")
        .join(ex, "fingerprint", "left")
        .select(
            "doc_id",
            "fingerprint",
            F.col("existing_keeper").isNotNull().alias("dup_of_existing"),
            (F.col("doc_id") != F.col("batch_keeper")).alias(
                "dup_within_batch"
            ),
            F.coalesce("existing_keeper", "batch_keeper").alias("keeper_id"),
        )
    )


def stitch_candidates(docs: DataFrame, k: int = 8) -> DataFrame:
    """Split-document detection: pairs where one document's LAST ``k``
    tokens equal another's FIRST ``k`` tokens — the signature of a
    source document split across crawl records.  Each doc contributes
    one head hash and one tail hash (map-only), and candidates come
    from one tail ⋈ head equi-join on the 60-bit boundary hash — O(n)
    state, never a text comparison, with the boundary token count
    carried for downstream exact verification."""
    toks = tokens_ws("lower(text)", "spark")
    bounded = spread(docs).select(
        "doc_id",
        F.expr(f"transform(array({toks}), t ->"
               f" {phash60(f'concat_ws(chr(32), slice(t, 1, {k}))', 'spark')})[0]"
               ).alias("head_hash"),
        F.expr(f"transform(array({toks}), t ->"
               f" {phash60(f'concat_ws(chr(32), slice(t, -{k}, {k}))', 'spark')})[0]"
               ).alias("tail_hash"),
        F.expr(f"size({toks})").alias("n_toks"),
    ).filter(F.col("n_toks") >= k)
    a = bounded.select(
        F.col("doc_id").alias("id_head"), F.col("tail_hash").alias("h")
    )
    b = bounded.select(
        F.col("doc_id").alias("id_tail"), F.col("head_hash").alias("h")
    )
    return (
        a.join(b, "h")
        .filter(F.col("id_head") != F.col("id_tail"))
        .select("id_head", "id_tail", F.col("h").alias("boundary_hash"))
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Corpus snapshot reconciliation: classify every doc_id across two
    corpus versions as added / removed / changed / unchanged by content
    fingerprint — the audit table of an incremental crawl or recrawl.

    One full-outer equi-join on doc_id (co-partitioned at any scale)
    over two map-only fingerprint projections; the rollup is a
    map-side-combined count.  Returns (status, n_docs)."""
    fa = spread(old).select(
        "doc_id", F.expr(phash60(NORM, "spark")).alias("fp_old")
    )
    fb = spread(new).select(
        "doc_id", F.expr(phash60(NORM, "spark")).alias("fp_new")
    )
    status = (
        fa.join(fb, "doc_id", "full_outer")
        .select(
            F.expr(
                "CASE WHEN fp_old IS NULL THEN 'added'"
                " WHEN fp_new IS NULL THEN 'removed'"
                " WHEN fp_old != fp_new THEN 'changed'"
                " ELSE 'unchanged' END"
            ).alias("status")
        )
    )
    return status.groupBy("status").agg(F.count("*").alias("n_docs"))


PR_MICRO = 1_000_000  # fixed-point unit for PageRank scores
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an integer ratio


def pagerank_micro(pairs: DataFrame, iters: int = 3) -> DataFrame:
    """Degree-damped PageRank over the (undirected) near-dup pair graph
    — centrality separates template hubs (one boilerplate page matching
    hundreds) from incidental pair chains, the triage signal after
    `dup_graph_stats`.

    Fixed-point integer arithmetic throughout (scores in micro-units,
    contributions via integer division, damping as ×85//100), so every
    iteration is order-independent and the DuckDB oracle replays it
    exactly with unrolled CTEs — the same determinism design as the
    k-means trainer.  Each iteration is one contribution shuffle
    (edges-sized) plus one co-partitioned join back to the node
    relation; iterations are a fixed small count, not a fixpoint loop.
    """
    if iters < 1:
        raise ValueError(f"pagerank_micro needs iters >= 1, got {iters}")
    # `edges` is referenced by every iteration's contribution join and
    # `nodes` by every score update: without a persist the whole
    # upstream candidate-pair pipeline (signatures + banded self-join)
    # re-executes per iteration — measured 20.6 s → ~7 s at sf0.1 for
    # the simhash graph.  Both relations are near-dup-graph-sized
    # (≪ corpus), so caching them is bounded.
    # Optimization r12 wave 3: build the doubled edges with the shared
    # explode helper instead of union-of-two-selects — the union's two
    # subtrees each evaluated the WHOLE upstream pair pipeline inside
    # the one materialization job (the cache fills only after the job),
    # so the candidate build ran twice; the explode scans it once.
    # Identical multiset of (src, dst) rows.
    edges = _doubled_edges(pairs)
    nodes = _persist_sig(
        edges.groupBy("src").agg(F.count("*").alias("degree")).select(
            F.col("src").alias("doc_id"), "degree"
        ),
        edges,
    )
    base = PR_MICRO * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    # Optimization r12 (guide §3.1): the per-iteration score relation is
    # node-sized; when the (persisted) edge relation is small enough the
    # scores broadcast, so each iteration's contribution join stops
    # shuffling the edges — one aggregate exchange per round instead of
    # three.  The count() runs on the already-persisted edges (it doubles
    # as the eager cache warm before the loop); input-adaptive, big
    # graphs keep the shuffle path unchanged.
    bcast = 0 < edges.count() <= CC_BROADCAST_MAX_EDGES
    p = nodes.withColumn("p", F.lit(PR_MICRO).cast("long"))
    for _ in range(iters):
        pc = p.select(
            F.col("doc_id").alias("src"),
            F.expr("p div degree").alias("c"),
        )
        contrib = edges.join(F.broadcast(pc) if bcast else pc, "src")
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        if bcast:
            sums = F.broadcast(sums)
        p = (
            nodes.join(sums, nodes.doc_id == sums.dst, "left")
            .select(
                "doc_id",
                "degree",
                F.expr(
                    f"cast({base} + (coalesce(s, 0) * {PR_DAMP_NUM})"
                    f" div {PR_DAMP_DEN} as bigint)"
                ).alias("p"),
            )
        )
    return p.select(
        "doc_id", "degree", F.col("p").alias("pagerank_micro")
    )


def lpa_communities(pairs: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) over the
    (undirected) near-dup pair graph — community detection one level
    softer than connected components: a node adopts its neighbors'
    most frequent label each round, so weakly-bridged duplicate
    families separate where CC would fuse them.

    Determinism: classic async LPA is order-dependent; this is the
    synchronous variant with a total tie-break (max count, then min
    label), so every round is a pure function of the previous labeling
    and the DuckDB oracle replays it exactly with unrolled CTEs.

    Scale (100 TB): edges and the evolving label relation are
    graph-sized (≪ corpus); edges persist once and each round is one
    edges-sized contribution shuffle + a per-node window over the
    (node, label) frequency relation — the same per-round cost shape
    as :func:`pagerank_micro`, with a fixed small round count."""
    if iters < 1:
        raise ValueError(f"lpa_communities needs iters >= 1, got {iters}")

    edges = _doubled_edges(pairs)
    labels = edges.select(F.col("src").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("lbl")
    )
    # Optimization r12: adaptive label broadcast (same rationale and
    # threshold as pagerank_micro — the count doubles as the eager edge
    # cache warm), and the per-node argmax as max_by instead of a
    # row_number window: identical pick rule (max count, then min
    # label) but hash-aggregated with map-side partials — no per-node
    # sort, and the (node,label) relation never re-shuffles for a
    # window.
    bcast = 0 < edges.count() <= CC_BROADCAST_MAX_EDGES
    for _ in range(iters):
        lc = labels.select(F.col("doc_id").alias("src"), "lbl")
        freq = (
            edges.join(F.broadcast(lc) if bcast else lc, "src")
            .groupBy(F.col("dst").alias("doc_id"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            freq.groupBy("doc_id")
            .agg(F.expr("max_by(lbl, struct(c, -lbl))").alias("lbl"))
            .select("doc_id", "lbl")
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count("*").alias("n_members"),
        F.min("doc_id").alias("min_doc"),
    )


SEMDEDUP_TARGET_CLUSTER_ROWS = 1024


def derive_nlist(n: int, target_cluster_rows: int) -> int:
    """Corpus-derived k-means cluster count for :func:`semantic_dedup`:
    ceil(n / target_cluster_rows), floored at 8 so tiny corpora still
    cluster.  Factored out so the sizing rule is directly testable."""
    if target_cluster_rows < 1:
        raise ValueError(
            f"semantic_dedup: target_cluster_rows must be >= 1, "
            f"got {target_cluster_rows}"
        )
    return max(8, -(-n // target_cluster_rows))


def semantic_dedup(
    emb: DataFrame,
    nlist: int | None = None,
    iters: int = 2,
    tau: float = 0.35,
    target_cluster_rows: int = SEMDEDUP_TARGET_CLUSTER_ROWS,
) -> DataFrame:
    """SemDedup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus with k-means, then
    prune near-duplicates ONLY within each cluster — a vector is
    dropped when a lower-id vector in the same cluster has cosine
    similarity ≥ ``tau``.  Returns every vector with its cluster, a
    ``keep`` verdict, and the id/similarity of the duplicate it lost to
    (null when kept) — the auditable decision record.

    Scale design (100 TB): the clustering step is
    :func:`~faconne_spark.operators.similarity.kmeans_assign` —
    broadcast-argmax assignment, the corpus is never shuffled for it.
    The pairwise step joins the assignment relation to itself ON THE
    CLUSTER ID, so the only corpus shuffle is groupBy/join(cid) and the
    pair count is Σ|cluster|² instead of n² — the operator's knob is
    ``nlist``, sized so clusters stay bounded.  When ``nlist`` is None
    (the default) it is DERIVED from the corpus: ``max(8, ceil(n /
    target_cluster_rows))`` via one cheap count, so the in-cluster
    pairwise cost stays ~n·target_cluster_rows — linear in the corpus —
    instead of silently quadratic under a fixed small default (at
    100 TB / ~1e9 vectors this yields nlist ≈ 1e6, the sizing the
    SemDedup paper uses; AQE skew-join splits hot cells).  Pass an
    explicit ``nlist`` to pin determinism across differently-sized
    corpora (the registry oracle does).  This is exactly the SemDedup
    trade: global near-dup recall is sacrificed for cluster-local
    pairwise cost.

    Determinism: assignment inherits kmeans_assign's fixed-point means
    and 6-dp rounded similarities; the in-cluster verdict uses the same
    6-dp rounded cosine and min-id keeper rule as the other dedup
    operators, so the DuckDB oracle replays it bit-identically.
    """
    from faconne_spark.functions import cosine_from_norms, sqnorm_expr
    from faconne_spark.operators.similarity import kmeans_assign

    if nlist is None:
        nlist = derive_nlist(emb.count(), target_cluster_rows)
    # Optimization r12 (guide §2.3): squared norm computed once into the
    # persisted assignment, pair stage = one dot + divide
    # (cosine_from_norms — bit-identical to the old cosine_sim fold)
    assign = _persist_sig(
        kmeans_assign(emb, nlist, iters).withColumn(
            "nn", F.expr(sqnorm_expr("embedding", "spark", dim=64))
        ),
        emb,
    )
    a, b = assign.alias("a"), assign.alias("b")
    losses = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("other"),
            F.round(
                F.expr(cosine_from_norms(
                    "a.embedding", "b.embedding", "a.nn", "b.nn", dim=64
                )), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= tau)
        # keeper = the smallest qualifying lower id; ties on sim are
        # irrelevant because the rule keys on id alone
        .groupBy("vec_id")
        .agg(F.expr("min_by(struct(other, sim), other)").alias("_l"))
        .select(
            "vec_id",
            F.col("_l.other").alias("dup_of"),
            F.col("_l.sim").alias("dup_sim"),
        )
    )
    return (
        assign.select("vec_id", "cid")
        .join(losses, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            "dup_sim",
        )
    )


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle participation over the undirected near-dup
    pair graph — with degree, the local clustering coefficient: high
    triangle density marks template families (everything matches
    everything), low density marks chain-like incidental matches.
    The per-node complement of :func:`pair_graph_stats` (whose single
    summary row carries the GLOBAL triangle count): that one answers
    "is my threshold too loose", this one answers "which documents sit
    in template cliques".

    Scale: the classic ordered-wedge plan — edges are kept one-way
    (src < dst, already the pair convention), wedges come from ONE
    self-join on the middle node, and each wedge closes via a join
    against the ordered edge list.  Ordering means every triangle is
    counted exactly once, with no direction explosion; both joins key
    on node ids (AQE handles hot hubs).  The two candidate-pair inputs
    are near-dup-graph-sized (≪ corpus).
    """
    e = spread(pairs).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).distinct()
    e = _persist_sig(e, pairs)
    # Optimization r12 (guide §3.1): the closing edge list is
    # edge-sized; broadcasting it (input-adaptive — the count warms the
    # persisted relation it would materialize anyway) spares the wedge
    # stream the (a, c) re-shuffle, the widest relation in the plan.
    bcast = 0 < e.count() <= CC_BROADCAST_MAX_EDGES
    closing = e.select(F.col("a"), F.col("b").alias("c"))
    if bcast:
        closing = F.broadcast(closing)
    # wedge a-b-c with a < b < c: edges (a,b) and (b,c)
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = ab.join(bc, "b")
    closed = wedges.join(closing, ["a", "c"])
    per_node = (
        closed.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("a").alias("doc_id"))
        .union(e.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("degree"))
    )
    return deg.join(per_node, "doc_id", "left").select(
        "doc_id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        # local clustering coefficient: triangles / wedges-at-node
        F.expr(
            "round(if(degree >= 2,"
            " cast(2 * coalesce(n_triangles, 0) as double)"
            " / (degree * (degree - 1)), 0.0), 6)"
        ).alias("clustering"),
    )


def cdc_pairs(
    docs: DataFrame,
    avg_tokens: int = 16,
    min_shared: int = 2,
    max_df: int = 20,
) -> DataFrame:
    """Chunk-level near-dup candidate pairs from content-defined
    chunking: two documents pair when they share at least
    ``min_shared`` verbatim CDC chunks (by 60-bit chunk hash) — the
    shift-resistant complement of the shingle family (an insertion
    moves ONE chunk boundary, so partially-overlapping or
    concatenated/extended documents still share most chunk hashes,
    where fixed windows would share none past the edit).

    Scale shape mirrors :func:`containment_pairs`: chunk hashes with
    document frequency > ``max_df`` are dropped before pairing
    (boilerplate chunks shared by many docs degenerate toward
    all-pairs), candidate pairs generate IN-ROW from each surviving
    hash's bounded posting list (≤ max_df ids → ≤ max_df²/2 pairs per
    hash, one groupBy shuffle, no self-join), and the per-pair rollup
    counts shared chunks and tokens.  The documented recall trade: a
    pair sharing only ultra-common chunks is missed by construction.
    """
    from faconne_spark.operators.text import cdc_chunk_relation

    # persist=False: this operator consumes the chunk relation in ONE
    # lineage (the posting groupBy) — caching a once-read relation is
    # pure overhead
    chunks = cdc_chunk_relation(docs, avg_tokens, persist=False)
    posting = (
        chunks.groupBy("chunk_hash")
        .agg(
            F.expr(POSTING_IDS).alias("ids"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .filter(
            (F.size("ids") >= 2) & (F.size("ids") <= max_df)
        )
    )
    return (
        posting.select(
            "n_tokens",
            F.explode(F.expr(INROW_PAIRS)).alias("p"),
        )
        .groupBy("p.id_a", "p.id_b")
        .agg(
            F.count("*").alias("n_shared_chunks"),
            F.sum("n_tokens").alias("shared_tokens"),
        )
        .filter(F.col("n_shared_chunks") >= min_shared)
    )


# --------------------------------------------------------------- bloom

BLOOM_K = 4          # probe positions per fingerprint
BLOOM_BITS_PER = 20  # target bits per history entry (~1% FP at k=4)
BLOOM_P_MIN, BLOOM_P_MAX = 16, 26  # 8 KB .. 8 MB bitmap


def bloom_p_for(n_hist: int) -> int:
    """Smallest bitmap exponent p with 2^p ≥ BLOOM_BITS_PER · n_hist,
    clamped to [16, 26].  The same integer logic is replayed inside the
    DuckDB oracle, so both engines size the filter identically."""
    return next(
        (
            p
            for p in range(BLOOM_P_MIN, BLOOM_P_MAX + 1)
            if (1 << p) >= BLOOM_BITS_PER * n_hist
        ),
        BLOOM_P_MAX,
    )


def bloom_pos_array(m_bits: int, k: int = BLOOM_K):
    """Column of the k probe positions of a ``fp`` column — the ONE
    definition shared by the batch prefilter, the streaming epoch
    partials, and (structurally) the DuckDB oracle."""
    return F.array(
        *[
            F.expr(
                f"({phash60(f'''concat('bf{i}:', cast(fp as string))''', 'spark')})"
                f" % {m_bits}"
            )
            for i in range(k)
        ]
    )


def bloom_word_bits(fps: DataFrame, m_bits: int, k: int = BLOOM_K) -> DataFrame:
    """Fold a fingerprint relation into the Bloom bitmap's 64-bit words
    ((word, bits) rows, ``bit_or`` partial-agg'd map-side).  Word
    tables built with the same (m_bits, k) MERGE BY bit_or — the
    property the streaming face rolls up on."""
    return (
        fps.select(F.explode(bloom_pos_array(m_bits, k)).alias("pos"))
        .groupBy(F.expr("pos >> 6").alias("word"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(pos % 64 as int)))"
            ).alias("bits")
        )
    )


def bloom_prefilter_summary(
    docs: DataFrame, split_mod: int = 3, k: int = BLOOM_K
) -> DataFrame:
    """Incremental exact-dedup with a Bloom-bitmap prefilter: incoming
    documents (doc_id % split_mod == 0) are checked against the history
    corpus (the rest) WITHOUT joining the full history — the history is
    folded once into a 2^p-bit Bloom bitmap (64-bit words, ``bit_or``
    partial-agg'd map-side), the bitmap is broadcast, and the exact
    verify join's left side is only the bloom survivors.

    Per-source summary: n_incoming, n_bloom_pass (maybe-dup), n_true_dup
    (fingerprint really in history), n_bloom_fp (survivors the exact
    join cleared — the measured false-positive count), n_new.

    Scale (100 TB): the bitmap is ≤ 2^26 bits = 8 MB — broadcastable;
    history is read once, map-side, into ≤ 2^20 bit_or-reduced words.
    Definite-new docs (any probe bit absent) never enter the verify
    join, so the expensive fingerprint ⋈ fingerprint shuffle shrinks
    from |incoming| to |true dups| + |false positives|.  Beyond 2^26
    bits, shard the bitmap by fingerprint range and map each incoming
    partition against its shard (noted, not implemented — the gate
    corpora saturate at p = 17).  The driver-side ``count()`` that
    sizes p is a metadata-cheap scan of one fingerprint column.
    """
    fp = F.expr(phash60(NORM, "spark")).alias("fp")
    hist = docs.filter(F.col("doc_id") % split_mod != 0).select(fp)
    inc = docs.filter(F.col("doc_id") % split_mod == 0).select(
        "doc_id", "source", fp
    )

    m_bits = 1 << bloom_p_for(hist.count())
    pos_arr = bloom_pos_array(m_bits, k)
    word_bits = bloom_word_bits(hist, m_bits, k)

    probes = inc.select(
        "doc_id", "source", "fp", F.explode(pos_arr).alias("pos")
    ).select(
        "doc_id",
        "source",
        "fp",
        F.expr("pos >> 6").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias(
            "mask"
        ),
    )
    hits = (
        probes.join(F.broadcast(word_bits), "word", "left")
        .groupBy("doc_id", "source", "fp")
        .agg(
            F.sum(
                F.when(
                    F.col("bits").bitwiseAND(F.col("mask")) != 0, 1
                ).otherwise(0)
            ).alias("n_hits")
        )
    )
    passed = hits.filter(F.col("n_hits") == k)
    dups = passed.join(hist.distinct(), "fp", "left_semi")

    inc_cnt = inc.groupBy("source").agg(F.count("*").alias("n_incoming"))
    pass_cnt = passed.groupBy("source").agg(F.count("*").alias("n_bloom_pass"))
    dup_cnt = dups.groupBy("source").agg(F.count("*").alias("n_true_dup"))
    return (
        inc_cnt.join(pass_cnt, "source", "left")
        .join(dup_cnt, "source", "left")
        .select(
            "source",
            "n_incoming",
            F.coalesce("n_bloom_pass", F.lit(0)).alias("n_bloom_pass"),
            F.coalesce("n_true_dup", F.lit(0)).alias("n_true_dup"),
            (
                F.coalesce("n_bloom_pass", F.lit(0))
                - F.coalesce("n_true_dup", F.lit(0))
            ).alias("n_bloom_fp"),
            (F.col("n_incoming") - F.coalesce("n_true_dup", F.lit(0))).alias(
                "n_new"
            ),
        )
    )


# ------------------------------------------------------- split hygiene

SPLIT_MOD = 10  # hash-deciles: 0 → test, 1 → val, 2-9 → train


def split_expr(dialect: str) -> str:
    """Deterministic train/val/test assignment by content-independent
    id hash (stable under re-partitioning and re-runs — the property
    random() splits lack)."""
    if dialect == "spark":
        h = phash60("concat('split:', cast(doc_id as string))", "spark")
    else:
        h = phash60("('split:' || doc_id::VARCHAR)", "duckdb")
    return (
        f"CASE ({h}) % {SPLIT_MOD} WHEN 0 THEN 'test' WHEN 1 THEN 'val'"
        f" ELSE 'train' END"
    )


def split_leakage_summary(docs: DataFrame) -> DataFrame:
    """Per-split sizes + cross-split LEAKAGE: documents whose
    normalized-text fingerprint also appears in a DIFFERENT split (the
    eval-contamination bug a dedup pass must catch before training).

    Scale (100 TB): one fingerprint groupBy (map-side combined) builds
    the per-fingerprint split profile; the classify join keys on the
    fingerprint — the same asymptotics as exact dedup.  No distinct
    sets are ever collected."""
    fps = docs.select(
        F.expr(split_expr("spark")).alias("split"),
        F.expr(phash60(NORM, "spark")).alias("fp"),
    )
    profile = fps.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits")
    )
    return (
        fps.join(profile, "fp")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_splits") >= 2, 1).otherwise(0)).alias(
                "n_leaked_docs"
            ),
        )
    )


# ------------------------------------------------ prefix-filter join

SETSIM_T = 0.5  # Jaccard threshold over 3-gram shingle SETS


def setsim_prefix_pairs(
    docs: DataFrame, n_shingle: int = 3, t: float = SETSIM_T
) -> DataFrame:
    """EXACT set-similarity self-join (AllPairs/PPJoin prefix filtering,
    Bayardo et al. 2007; Xiao et al. 2008): all pairs with shingle-set
    Jaccard ≥ t — COMPLETE, unlike the MinHash/LSH path, whose banding
    can miss qualifying pairs.  Shingles sort by (document frequency,
    shingle); each document indexes only its first
    m − ceil(t·m) + 1 rarest shingles (the symmetric conservative
    prefix), and any qualifying pair provably shares a prefix shingle —
    the candidate join is prefix ⋈ prefix, never all-pairs.

    Scale (100 TB): the prefix explode is the bounded relation (rarest
    shingles first, so hot shingles fall OUT of prefixes as t rises);
    the verify join counts shared shingles only for candidate pairs.
    The df ranking is one groupBy + one per-doc window (key-partitioned
    sort, no global sort).
    """
    sh = (
        spread(docs)
        .select(
            "doc_id",
            F.explode(
                F.expr(word_shingles("text", n_shingle, "spark"))
            ).alias("s"),
        )
        .distinct()
    )
    sh = track_persist(sh)
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ranked = (
        sh.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("m", F.count("*").over(Window.partitionBy("doc_id")))
    )
    tl = repr(float(t))
    # persisted EAGERLY on large inputs (the minhash_signatures lesson):
    # a lazy persist inside the prefix self-join schedules both sides
    # before the cache fills, so the df-join + rank windows would run
    # twice anyway
    prefix = _persist_sig(
        ranked.filter(
            F.col("pos") <= F.col("m") - F.ceil(F.expr(f"{tl} * m")) + 1
        ).select("doc_id", "s", "m"),
        docs,
    )

    # Optimization r12 (guide §2.3 — shuffle fewer bytes downstream):
    # AllPairs' LENGTH filter at candidate generation.  Jaccard ≥ t
    # forces inter ≥ t·un with inter ≤ min(m_a, m_b) and
    # un ≥ max(m_a, m_b), so every qualifying pair satisfies
    # min ≥ t·max — and that implication survives double rounding
    # (min ≥ inter ≥ fl(t·un) ≥ fl(t·max), fl monotone in un ≥ max),
    # so pruning candidates on it is provably result-identical while
    # the expensive verify expansion (cand × shingles) shrinks.
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.expr(
                    f"cast(least(a.m, b.m) as double)"
                    f" >= {tl} * greatest(a.m, b.m)"
                )
            ),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("m"))
    # shared-shingle count per candidate pair: expand each pair by id_a's
    # shingles, then a TWO-key equi-join (id_b, s) against the shingle
    # relation — never an in-pair cross product
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), "s"), "id_a")
        .join(
            sh.select(
                F.col("doc_id").alias("id_b"), F.col("s").alias("s")
            ),
            ["id_b", "s"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("m", "m_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("m", "m_b"), "id_b")
        .withColumn("un", F.col("m_a") + F.col("m_b") - F.col("inter"))
        .filter(F.col("inter") >= F.expr(f"{tl} * un"))
        .select(
            "id_a",
            "id_b",
            "inter",
            F.col("un").alias("union_size"),
            F.round(F.col("inter") / F.col("un"), 6).alias("jaccard"),
        )
    )


# ------------------------------------------------------- k-core

def kcore_nodes(
    pairs: DataFrame, k: int = 2, max_iter: int = 30
) -> DataFrame:
    """k-core of the near-dup pair graph: the maximal subgraph where
    every node keeps degree ≥ k — the dense template/boilerplate
    clusters that pairwise thresholds alone can't isolate.  Classic
    iterative peel: drop degree-<k nodes, recompute, repeat to a fixed
    point.

    Returns (doc_id, degree) for the surviving nodes (degree measured
    INSIDE the core).

    Scale (100 TB): each round is one degree groupBy + two semi-joins
    on the shrinking edge relation; every round is checkpointed (the
    CC/pagerank persist lesson) so lineage stays flat and nothing
    upstream re-executes.  Converges in ≤ peel-depth rounds; the
    iteration bound raises ConvergenceError rather than returning a
    silently-unpeeled graph."""
    # Optimization r12 wave 3: both directions via ONE explode scan of
    # the pair build instead of union-of-two-selects (whose subtrees
    # each re-ran the whole upstream candidate pipeline cold inside the
    # checkpoint job); identical edge set after the same distinct.
    und = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    edges = _checkpoint(und)
    n_edges = edges.count()
    # Optimization r12 (guide §3.1): the per-round survivor set is
    # node-sized; broadcasting it turns both semi-joins into BHJs so
    # the (checkpointed) edge relation is never re-shuffled inside a
    # round — one exchange (the degree groupBy) instead of three.
    # Input-adaptive via the edge count the peel already tracks.
    bcast = n_edges <= CC_BROADCAST_MAX_EDGES
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("src")
        if bcast:
            keep = F.broadcast(keep)
        pruned = edges.join(keep, "src", "left_semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
        )
        pruned = _checkpoint(pruned.select("src", "dst"))
        n_next = pruned.count()
        if n_next == n_edges:
            return (
                pruned.groupBy("src")
                .agg(F.count("*").alias("degree"))
                .select(F.col("src").alias("doc_id"), "degree")
            )
        edges, n_edges = pruned, n_next
    if n_edges == 0:
        return pairs.sparkSession.createDataFrame(
            [], "doc_id bigint, degree bigint"
        )
    raise ConvergenceError(
        f"kcore_nodes: no fixed point after {max_iter} rounds"
        f" ({n_edges} edges remain)"
    )


RA_MICRO = 1_000_000


def _doubled_edges(pairs: DataFrame) -> DataFrame:
    """Both directions of an (id_a, id_b) pair relation as a PERSISTED
    (src, dst) edge list — the shared first step of the iterative and
    link-prediction graph passes (each reads it at least twice; an
    unpersisted build would re-run the whole upstream candidate
    pipeline per read).

    The doubling is an explode of a two-struct array — ONE scan of the
    expensive pair build per edges materialization, where a
    union-of-two-selects would evaluate the upstream self-join twice
    while the cache is still filling."""
    return _persist_sig(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst"),
        pairs,
    )


def ra_link_prediction(
    pairs: DataFrame, top_k: int = 3
) -> DataFrame:
    """Resource-allocation link prediction (Zhou 2009) over the
    (undirected) pair graph: for each non-adjacent pair sharing a
    neighbor, score = Σ_w 1/deg(w) over common neighbors w — the
    strongest of the simple common-neighbor indices and, unlike
    Adamic–Adar, free of a per-row logarithm (whose last-ulp value
    differs between libms — an engine-portability hazard this operator
    avoids by design).  Contributions are fixed-pointed to RA_MICRO
    integer units so the score sum is order-independent; the per-node
    top-k re-rank breaks ties by the candidate id.

    Returns (id_a, id_b, n_common, ra_score, rk) with id_a < id_b and
    both directions ranked (a pair can appear in a's list and b's).

    Scale (100 TB): the wedge join is keyed on the shared-neighbor
    node (cost Σ deg(w)² — the triangle-counting bound, fine on
    pair graphs whose degrees LSH banding already capped); the direct-
    edge exclusion is one anti-join on the pair key; the re-rank
    windows over the candidate relation partitioned by node."""
    from pyspark.sql import Window

    edges = _doubled_edges(pairs)
    # Optimization r12 (guide §3.1): the degree relation is node-sized
    # and the direct-edge exclusion list is edge-sized; when the
    # (persisted) edge relation is small both broadcast, so the wedge
    # stream is never re-shuffled for them — the count doubles as the
    # eager cache warm; big graphs keep the shuffle path.
    bcast = 0 < edges.count() <= CC_BROADCAST_MAX_EDGES
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    wdeg = deg.select(F.col("src").alias("w"), "deg")
    # Optimization r12 wave 3: the direct-edge exclusion list is
    # recovered from the PERSISTED doubled-edge relation (src < dst
    # keeps exactly the (min, max) orientation of every undirected
    # pair — the same set the old least/greatest projection of `pairs`
    # produced) instead of re-deriving `pairs`, which re-ran the whole
    # upstream candidate build a second time per materialization.
    direct = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    if bcast:
        wdeg, direct = F.broadcast(wdeg), F.broadcast(direct)
    wedge = (
        edges.select(F.col("src").alias("w"), F.col("dst").alias("a"))
        .join(
            edges.select(F.col("src").alias("w"), F.col("dst").alias("b")),
            "w",
        )
        .filter(F.col("a") < F.col("b"))
        .join(wdeg, "w")
    )
    cand = (
        wedge.groupBy(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .agg(
            F.count("*").alias("n_common"),
            F.sum(
                F.expr(f"cast(round({RA_MICRO}.0 / deg) as bigint)")
            ).alias("__sm"),
        )
        .join(direct, ["id_a", "id_b"], "left_anti")
    )
    # (Optimization r12: a single-pass orientation explode replacing
    # this unionByName was tried and MEASURED SLOWER — isolated A/B
    # min-of-4 at sf0.1: 3.63 → 5.29 s.  The two union branches share
    # the wedge groupBy's shuffle via exchange reuse and execute their
    # cheap post-exchange tails concurrently, while the explode
    # serializes them behind one Generate.  Reverted; see
    # OPTIMIZATION_r12.md.)
    both = cand.unionByName(
        cand.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "n_common",
            "__sm",
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.desc("__sm"), F.asc("id_b")
    )
    return (
        both.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            "id_a", "id_b", "n_common",
            F.round(F.col("__sm") / float(RA_MICRO), 6).alias("ra_score"),
            "rk",
        )
    )


def jaccard_link_prediction(
    pairs: DataFrame, top_k: int = 3
) -> DataFrame:
    """Neighborhood-Jaccard link prediction over the (undirected) pair
    graph: for each non-adjacent pair sharing a neighbor, score =
    |Γ(a) ∩ Γ(b)| / |Γ(a) ∪ Γ(b)| — the degree-normalized
    common-neighbor index (RA rewards RARE shared neighbors; Jaccard
    asks what FRACTION of the combined neighborhoods agrees, so a hub
    with thousands of neighbors can't top the list on raw overlap).

    House integer rule: jac_micro = round-half-up(10⁶·nc / d) computed
    in pure BIGINT arithmetic ((2·10⁶·nc + d) div (2·d), d = deg(a) +
    deg(b) − nc), so ranking ties break identically cross-engine; the
    reported score is that integer divided once.

    Scale (100 TB): shares ra_link_prediction's shapes — the wedge
    join keyed on the shared neighbor (Σ deg² bound), the node-sized
    degree relation joined back twice, one anti-join against direct
    edges, and a per-node top-k window over candidates."""
    from pyspark.sql import Window

    edges = _doubled_edges(pairs)
    # Optimization r12: same adaptive broadcasts as ra_link_prediction
    # (degree twice + the direct-edge anti-join list) — the candidate
    # relation is never re-shuffled for node-sized lookups.
    bcast = 0 < edges.count() <= CC_BROADCAST_MAX_EDGES
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    da = deg.select(F.col("src").alias("id_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("src").alias("id_b"), F.col("deg").alias("_db"))
    # Optimization r12 wave 3: direct edges from the persisted doubled
    # relation, not a fresh `pairs` scan — see ra_link_prediction.
    direct = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    if bcast:
        da, db, direct = F.broadcast(da), F.broadcast(db), F.broadcast(direct)
    wedge = (
        edges.select(F.col("src").alias("w"), F.col("dst").alias("a"))
        .join(
            edges.select(F.col("src").alias("w"), F.col("dst").alias("b")),
            "w",
        )
        .filter(F.col("a") < F.col("b"))
    )
    cand = (
        wedge.groupBy(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
        .join(direct, ["id_a", "id_b"], "left_anti")
        .join(da, "id_a")
        .join(db, "id_b")
        .withColumn(
            "__jm",
            F.expr(
                jaccard_micro_sql(
                    "n_common", "(_da + _db - n_common)", "spark"
                )
            ),
        )
        .select("id_a", "id_b", "n_common", "__jm")
    )
    # (Optimization r12: single-pass orientation explode tried and
    # measured slower, as in ra_link_prediction — reverted.)
    both = cand.unionByName(
        cand.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "n_common",
            "__jm",
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("__jm"), F.asc("id_b"))
    return (
        both.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("id_a", "id_b", "n_common", F.col("__jm").alias("jac_micro"), "rk")
    )


def lsh_banding_sweep(
    docs: DataFrame,
    n_shingle: int = 3,
    k: int = 12,
    bands_list: tuple = (2, 3, 4, 6),
) -> DataFrame:
    """LSH banding-parameter sweep: candidate volume and aggregate
    signature agreement for SEVERAL (bands, rows) splits of the SAME
    k-perm MinHash signatures — the tuning table that picks the
    banding threshold (s-curve midpoint ≈ (1/b)^(1/r)) before a
    production dedup run, the way ann_nprobe_sweep tunes IVF.

    One row per configuration: bands, r, candidate-pair count, and the
    exact integer Σ over candidates of agreeing-minhash counts (the
    numerator of mean estimated Jaccard — left unreduced so the output
    is pure BIGINT; mean = sig_match_sum / (k · n_candidate_pairs)).

    Scale (100 TB): the signature relation is built ONCE and persisted
    (the expensive md5+permutation pass); each configuration re-bands
    the cached ~100 B/doc relation and pays one shared-band self-join —
    the sweep costs b_configs band joins, never b_configs corpus
    scans."""
    for b in bands_list:
        if k % b:
            raise ValueError(
                f"lsh_banding_sweep needs k % bands == 0, got k={k}, "
                f"bands={b}"
            )
    # Optimization r12 wave 4: codegen signature build (see
    # _minhash_sig_rel) — same (doc_id, sig) relation, same persist.
    with_sig = _persist_sig(_minhash_sig_rel(docs, n_shingle, k), docs)
    out = None
    for b in bands_list:
        r = k // b
        banded = with_sig.select(
            "doc_id",
            "sig",
            F.explode(
                F.array(
                    *[F.expr(band_sig("sig", j, r, "spark")) for j in range(b)]
                )
            ).alias("band"),
        )
        x, y = banded.alias("a"), banded.alias("b")
        cand = (
            x.join(
                y,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.expr(
                    "size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y),"
                    " v -> v))"
                ).alias("__m"),
            )
            .distinct()
        )
        row = cand.groupBy().agg(
            F.lit(b).alias("bands"),
            F.lit(r).alias("r"),
            F.count("*").alias("n_candidate_pairs"),
            F.coalesce(F.sum("__m"), F.lit(0)).cast("long").alias(
                "sig_match_sum"
            ),
        ).select("bands", "r", "n_candidate_pairs", "sig_match_sum")
        out = row if out is None else out.unionByName(row)
    return out
