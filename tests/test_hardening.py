"""Round-2 hardening tests: convergence guards, salting soundness,
cache release, and the multimodal real-codec swap-in seam."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from faconne_spark.queries import T  # noqa: E402


# ---------------------------------------------------------------- CC guard

def _chain_pairs(spark, n):
    """Path graph 0-1-2-...-n-1 (worst-case diameter for label prop)."""
    return spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )


def test_cc_converges_on_long_chain(spark):
    """Pointer jumping: a 200-hop path converges in O(log n) rounds and
    every node gets label 0."""
    from faconne_spark.operators.dedup import connected_components

    labels = connected_components(_chain_pairs(spark, 200), max_iter=12)
    got = labels.agg(
        F.count("*").alias("n"), F.sum("cluster_id").alias("s")
    ).first()
    assert got["n"] == 200 and got["s"] == 0


def test_cc_raises_when_unconverged(spark):
    """max_iter too small for the graph diameter must raise, not return
    silently-split clusters (VERDICT round-1 item 6)."""
    from faconne_spark.operators.dedup import (
        ConvergenceError,
        connected_components,
    )

    with pytest.raises(ConvergenceError):
        connected_components(_chain_pairs(spark, 200), max_iter=1)


# ---------------------------------------------------------------- salting

@pytest.mark.parametrize("how", ["right", "right_outer", "full", "outer"])
def test_salted_join_rejects_unsound_how(spark, how):
    from faconne_spark.operators.relational import salted_join

    df = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="unsound"):
        salted_join(df, df, "k", how=how)


# ---------------------------------------------------------------- caches

def test_dedup_release_caches(spark, sf_dir):
    from faconne_spark.operators import dedup

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    banded = dedup.minhash_signatures(docs)
    assert banded.storageLevel.useMemory
    assert len(dedup._PERSISTED) >= 1
    dedup.release_caches()
    assert dedup._PERSISTED == []
    assert not banded.storageLevel.useMemory


# ------------------------------------------------------------- mm codec seam

def _media(spark, sf_dir, n=30):
    from faconne_spark.operators.multimodal import synthesize_media

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").limit(n)
    return synthesize_media(docs)


def test_synthesize_media_type_prune(spark, sf_dir):
    """media_types prunes synthesis JVM-side: the pruned relation equals
    the full relation filtered after the fact, and an unknown type is a
    call-site error."""
    import pytest as _pytest

    from faconne_spark.operators.multimodal import synthesize_media

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").limit(30)
    full = synthesize_media(docs)
    pruned = synthesize_media(docs, media_types=["audio/wav"])
    want = sorted(
        (r["doc_id"], bytes(r["payload"]))
        for r in full.filter("media_type = 'audio/wav'").collect()
    )
    got = sorted(
        (r["doc_id"], bytes(r["payload"])) for r in pruned.collect()
    )
    assert got == want and got
    assert {
        r["media_type"] for r in pruned.collect()
    } == {"audio/wav"}
    with _pytest.raises(ValueError, match="unknown media types"):
        synthesize_media(docs, media_types=["image/png"])


def test_meta_real_decoder_seam(spark, sf_dir):
    """Injecting a 'real' decoder through the seam must reach the Python
    workers and drive the output values (VERDICT round-1 item 5)."""
    from faconne_spark.operators.multimodal import extract_media_meta

    def fake_real_decoder(payload):
        return 640, 480

    out = extract_media_meta(_media(spark, sf_dir), decoder=fake_real_decoder)
    rows = out.collect()
    assert rows and all(r["width"] == 640 and r["height"] == 480 for r in rows)


def test_real_decoder_is_default_and_parses_real_containers(spark, sf_dir):
    """The DEFAULT decode path is the real pure-Python container parse:
    BMP dims come from the actual header, WAV/motion-BMP payloads are
    chunk-walked, and the reported n_bytes is the true payload size."""
    from faconne_spark.operators.multimodal import (
        bmp_dims,
        extract_media_meta,
        facv_frames,
    )

    media = _media(spark, sf_dir, n=9)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    rows = extract_media_meta(media).collect()
    assert rows
    for r in rows:
        raw = payloads[r["doc_id"]]
        assert r["n_bytes"] == len(raw)
        if r["media_type"] == "image/bmp":
            assert raw[:2] == b"BM"
            assert (r["width"], r["height"]) == bmp_dims(raw)
        elif r["media_type"] == "audio/wav":
            assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
            assert r["width"] is None and r["height"] is None
        else:
            assert (r["width"], r["height"]) == bmp_dims(facv_frames(raw)[0])


def test_real_decoder_rejects_unknown_and_unsupported_payloads():
    """Since r11 MP4 decodes for real (ISO BMFF walk; fragmented
    moof/traf/trun streams walk too since r12) — so a TRUNCATED MP4
    raises ValueError like every malformed container, a fragmented
    payload with NO movie metadata raises ValueError (not a silent
    fake decode), and garbage — including a PNG signature followed by
    junk — raises ValueError."""
    import struct

    from faconne_spark.operators.multimodal import (
        decode_media_real,
        resize_image_real,
        sample_frames_real,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_media_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    # box header claims 32 bytes, file holds 24 → truncated, not seam
    with pytest.raises(ValueError, match="overruns"):
        sample_frames_real(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 8, 2)
    with pytest.raises(ValueError, match="overruns"):
        decode_media_real(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 8)
    # fragmented since r12 is a REAL decode path — but a moof with no
    # moov has no track metadata and must still fail loud
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
    moof = struct.pack(">I", 8) + b"moof"
    with pytest.raises(ValueError, match="no moov"):
        decode_media_real(ftyp + moof)
    with pytest.raises(ValueError, match="no moov"):
        sample_frames_real(ftyp + moof, 2)
    # well-formed, unfragmented, but no movie metadata at all
    with pytest.raises(ValueError, match="no moov"):
        decode_media_real(ftyp)
    with pytest.raises(ValueError):
        decode_media_real(b"garbage-bytes-here")
    with pytest.raises(ValueError):
        resize_image_real(b"garbage-bytes-here", 8, 8)
    # and a real fragmented stream now DECODES instead of raising
    from faconne_spark.operators.multimodal import (
        jpeg_encode,
        mp4_encode_mjpeg_fragmented,
    )

    ones = ([1] * 64, [1] * 64)
    frames = [
        jpeg_encode(8, 8, bytes([v]) * 64, channels=1, quant=ones)
        for v in (3, 9)
    ]
    frag = mp4_encode_mjpeg_fragmented(frames, 8, 8)
    assert decode_media_real(frag) == (8, 8)
    assert [f for _i, f in sample_frames_real(frag, 1)] == frames


def test_resize_real_codec_seam(spark, sf_dir):
    from faconne_spark.operators.multimodal import resize_media

    def fake_real_codec(payload, w, h):
        return bytes([1]) * (w * h)

    out = resize_media(
        _media(spark, sf_dir), width=8, height=8, codec=fake_real_codec
    )
    rows = [r for r in out.collect() if r["media_type"].startswith("image/")]
    assert rows and all(bytes(r["resized"]) == bytes([1]) * 64 for r in rows)


def test_frame_sample_real_codec_seam(spark, sf_dir):
    from faconne_spark.operators.multimodal import sample_media_frames

    def fake_real_codec(payload, every_n):
        return [(0, b"head"), (every_n, b"tail")]

    out = sample_media_frames(_media(spark, sf_dir), every_n=5, codec=fake_real_codec)
    rows = out.collect()
    assert rows and {r["frame_idx"] for r in rows} == {0, 5}
    assert all(bytes(r["frame"]) in (b"head", b"tail") for r in rows)


def test_bmp_codec_roundtrip_and_resize():
    """Pure-Python BMP codec: encode → header/pixel parse roundtrip,
    and nearest-neighbour resize picks the exact expected pixels."""
    from faconne_spark.operators.multimodal import (
        bmp_dims,
        bmp_encode,
        bmp_pixels,
        bmp_resize_nearest,
        bmp_row_stride,
    )

    # 2×2 image, distinct BGR per pixel; stride pads 6 -> 8 bytes
    stride = bmp_row_stride(2)
    assert stride == 8
    row0 = bytes([1, 1, 1, 2, 2, 2, 0, 0])  # bottom row (bottom-up)
    row1 = bytes([3, 3, 3, 4, 4, 4, 0, 0])
    bmp = bmp_encode(2, 2, row0 + row1)
    assert bmp_dims(bmp) == (2, 2)
    w, h, s, px = bmp_pixels(bmp)
    assert (w, h, s, px) == (2, 2, 8, row0 + row1)
    # upscale 2×2 → 4×4: each source pixel becomes a 2×2 block
    up = bmp_resize_nearest(bmp, 4, 4)
    uw, uh, us, upx = bmp_pixels(up)
    assert (uw, uh) == (4, 4)
    assert upx[0:3] == bytes([1, 1, 1]) and upx[6:9] == bytes([2, 2, 2])
    # downscale back 4×4 → 2×2 reproduces the original pixels
    down = bmp_pixels(bmp_resize_nearest(up, 2, 2))[3]
    assert down == row0 + row1


def test_wav_and_facv_codec_roundtrip():
    from faconne_spark.operators.multimodal import (
        bmp_encode,
        facv_encode,
        facv_frames,
        sample_frames_real,
        wav_encode,
        wav_pcm,
    )

    pcm = bytes(range(20))  # 10 PCM16 samples
    wav = wav_encode(pcm)
    assert wav_pcm(wav) == pcm
    # every 2nd sample: indices 0,2,4,6,8
    frames = sample_frames_real(wav, 2)
    assert [i for i, _ in frames] == [0, 2, 4, 6, 8]
    assert frames[1][1] == pcm[4:6]

    bmps = [bmp_encode(1, 1, bytes([i, i, i, 0])) for i in range(5)]
    vid = facv_encode(bmps)
    assert facv_frames(vid) == bmps
    kept = sample_frames_real(vid, 2)
    assert [i for i, _ in kept] == [0, 2, 4]
    assert kept[2][1] == bmps[4]


# ------------------------------------------------------- stateful timeout

def test_stateful_timeout_configured(spark, sf_dir, tmp_path):
    """timeout_minutes > 0 must arm ProcessingTimeTimeout and still
    produce correct totals (the eviction branch itself needs wall-clock
    idle time; here we prove the armed path runs end-to-end)."""
    from faconne_spark.streaming import user_totals_stateful

    events = T(spark, sf_dir, "events").select("user_id", "ts", "value").limit(200)
    src = str(tmp_path / "ev")
    events.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    )
    out = user_totals_stateful(stream, timeout_minutes=5)
    q = (
        out.writeStream.format("memory")
        .queryName("totals_timeout")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql("SELECT * FROM totals_timeout").collect()
    assert len(rows) == events.select("user_id").distinct().count()
    assert all(r["batch_events"] >= 0 for r in rows)


def test_cc_reliable_checkpoint_branch(spark, tmp_path):
    """With a configured checkpointDir, _checkpoint takes the reliable
    (fault-tolerant) path and CC still converges correctly."""
    from faconne_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        labels = connected_components(_chain_pairs(spark, 50), max_iter=10)
        got = labels.agg(
            F.count("*").alias("n"), F.sum("cluster_id").alias("s")
        ).first()
        assert got["n"] == 50 and got["s"] == 0
    finally:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            spark._jvm.scala.Option.apply(None)
        )


# ---------------------------------------------------- degenerate documents

def test_text_ops_degenerate_docs(spark):
    """Empty, single-token, and fully-repeated documents must flow
    through the text family without nulls, NaNs, or division errors."""
    rows = [
        (1, ""),                      # empty text
        (2, "word"),                  # single token
        (3, "dup dup dup dup dup"),   # one repeated token
        (4, "  leading and trailing  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from faconne_spark.operators.text import (
        repetition_signals,
        token_entropy,
        unigram_logprob,
        winnowing_pairs,
    )

    rep = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rep[3]["dup_token_frac"] == 0.8  # 1 distinct of 5
    assert rep[3]["top_bigram_frac"] == 1.0 and rep[3]["repetitive"]
    assert all(
        r["dup_token_frac"] is not None and r["top_bigram_frac"] is not None
        for r in rep.values()
    )

    ent = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert ent[3]["entropy_bits"] == 0.0  # single symbol → zero entropy
    assert ent[2]["entropy_bits"] == 0.0
    assert all(r["entropy_bits"] >= 0 for r in ent.values())

    lp = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert all(r["mean_logprob"] <= 0 for r in lp.values())

    # winnowing over degenerate docs: no crash, no self-pairs
    pairs = winnowing_pairs(df, max_df=10).collect()
    assert all(p["id_a"] < p["id_b"] for p in pairs)


def test_incremental_dedup_flag_paths(spark):
    """Cross-corpus duplicate (normalization-aware, keeper from the
    existing corpus), within-batch duplicate, and fresh keeper."""
    from faconne_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )

    old = spark.createDataFrame(
        [(0, "hello world"), (2, "old only")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "hello  WORLD"), (3, "fresh text"), (5, "fresh text")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in incremental_exact_dedup(new, exact_dedup(old)).collect()
    }
    assert out[1]["dup_of_existing"] and out[1]["keeper_id"] == 0
    assert not out[3]["dup_of_existing"] and not out[3]["dup_within_batch"]
    assert out[5]["dup_within_batch"] and out[5]["keeper_id"] == 3


def test_results_partitioning_invariant(spark, sf_dir):
    """The determinism claim behind every oracle: results must be
    IDENTICAL under different shuffle-partition counts (different
    partial-aggregation groupings, different row orders). Run a sample
    spanning each family at 5 vs 32 shuffle partitions."""
    from faconne_spark.operators.dedup import release_caches
    from faconne_spark.queries import all_queries

    sample = [
        "tpch_q1_pricing", "dedup_minhash_lsh", "ann_pq_adc",
        "text_repetition", "text_unigram_logprob", "embed_label_centroids",
        "user_rfm_segments", "corpus_health",
        # r5c analytics wave: fixed-point sums (diversity), exact
        # percentile cuts (range plan), and the pruned global sweep
        # (skyline) are the partition-sensitive shapes to pin
        "embed_diversity", "events_range_partition_plan", "part_skyline",
        "events_sessionize",
    ]
    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in sample:
                rows = sorted(
                    tuple(map(str, r)) for r in qs[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
                release_caches()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b, f"{k} differs across partitioning"


def test_survey_registry_consistency():
    """SURVEY §2 is the coverage contract: every gate-style key cited in
    its tables must exist in the registry, and every registry key must
    appear in SURVEY — mechanically auditable, no doc drift."""
    import re

    from faconne_spark.queries import all_oracles, all_queries

    qs = set(all_queries())
    assert qs == set(all_oracles()) | (qs - set(all_oracles()))
    survey = open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SURVEY.md")
    ).read()
    cited = set(
        re.findall(
            r"\b(fac_\w+|tpch_q\w+|win_\w+|events_\w+|asof_join_events|"
            r"range_join_events|pivot_events|rollup_orders|cube_\w+|"
            r"set_ops_\w+|ntile_\w+|percentile_\w+|grouping_sets_\w+|"
            r"dedup_\w+|ann_\w+|knn_\w+|text_\w+|mm_\w+|embed_\w+|"
            r"sample_\w+|contamination_\w+|doc_len_\w+|doc_tfidf_\w+|"
            r"docs_\w+|pipeline_\w+|stream_window_counts|stream_session_agg|"
            r"stream_ph_drift|"
            r"source_stats|vocab_coverage|cap_per_source|quality_\w+|"
            r"lang_id_\w+|corpus_\w+|dup_graph_\w+|dup_cluster_\w+|"
            r"dup_pairs_\w+|"
            r"basket_\w+|user_rfm_\w+|"
            r"orders_\w+|lineitem_\w+|part_price_stats|part_skyline\w*|"
            r"part_copurchase_\w+|part_brand_\w+|part_type_\w+|"
            r"part_size_\w+|"
            r"customer_segment_\w+|customer_balance_\w+|supplier_\w+|"
            r"customer_nation_\w+|customer_neg_\w+|"
            r"neardup_\w+|"
            r"customer_order_reconciliation|customer_order_golden|"
            r"customer_order_value_icc|"
            r"customer_fs_scores|sql_api_\w+|sliding_window_counts|"
            r"training_manifest|join_\w+|scd2_\w+|"
            r"customer_ltv_\w+|customer_fuzzy_\w+|pack_\w+|"
            r"fk_\w+|pk_\w+|brand_\w+|copurchase_\w+)\b",
            survey,
        )
    )
    # SURVEY §7 may cite next-round bank keys (built + cross-engine
    # proven but deliberately unregistered while the driver window is
    # full) — those are known, not drift.
    from faconne_spark.queries.bank_r8 import BANK_QUERIES
    from faconne_spark.queries.bank_r9 import BANK_QUERIES as BANK_R9
    from faconne_spark.queries.bank_r10 import BANK_QUERIES as BANK_R10
    from faconne_spark.queries.bank_r11 import BANK_QUERIES as BANK_R11
    from faconne_spark.queries.bank_r12 import BANK_QUERIES as BANK_R12
    from faconne_spark.queries.bank_r13 import BANK_QUERIES as BANK_R13
    from faconne_spark.queries.staged_r9 import BANK_QUERIES as STAGED_R9

    # operator/function names that match key-shaped regex alternatives
    # but are library primitives, not registry keys (cited in SURVEY
    # scale notes by their real names)
    known_operators = {
        "sample_panel", "sample_panel_sql", "quality_score",
        "sample_frames_real",
    }
    known = (qs | set(BANK_QUERIES) | set(BANK_R9) | set(STAGED_R9)
             | set(BANK_R10) | set(BANK_R11) | set(BANK_R12) | set(BANK_R13)
             | known_operators)
    cited_keys = {k for k in cited if k in qs or not k.startswith(("text_", "events_"))}
    missing_in_registry = sorted(k for k in cited_keys if k not in known)
    missing_in_survey = sorted(k for k in qs if k not in cited)
    assert not missing_in_registry, f"SURVEY cites unknown keys: {missing_in_registry}"
    assert not missing_in_survey, f"registry keys absent from SURVEY: {missing_in_survey}"


def test_stitch_detects_split_document(spark):
    """A document whose tail k-gram equals another's head k-gram is the
    crawl-chunking artifact stitch_candidates exists to find."""
    from faconne_spark.operators.dedup import stitch_candidates

    words = [f"w{i}" for i in range(20)]
    rows = [
        (1, " ".join(words[:12])),
        (2, " ".join(words[4:16])),   # head = doc 1's tail (w4..w11)
        (3, "totally unrelated words here make up this other document text"),
    ]
    out = stitch_candidates(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    assert [(r["id_head"], r["id_tail"]) for r in out] == [(1, 2)]


# ------------------------------------------------- round-3 ADVICE fixes

def test_cc_rejects_nonpositive_max_iter(spark):
    """max_iter=0 must be a clear ValueError up front, not a misleading
    '-1 labels still changing' ConvergenceError."""
    from faconne_spark.operators.dedup import connected_components

    with pytest.raises(ValueError, match="max_iter"):
        connected_components(_chain_pairs(spark, 4), max_iter=0)


def test_incremental_dedup_dedupes_state_side(spark):
    """Duplicate (fingerprint, keeper) state rows — e.g. from a replayed
    writer epoch — must not fan out the verdict join."""
    from faconne_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
    )

    batch = spark.createDataFrame(
        [(10, "alpha text"), (11, "fresh text")], "doc_id long, text string"
    )
    seed = exact_dedup(
        spark.createDataFrame([(0, "alpha text")], "doc_id long, text string")
    ).select("fingerprint", "keeper_id")
    one = incremental_exact_dedup(batch, seed)
    fp = one.filter("doc_id = 10").first()["fingerprint"]
    dup_state = spark.createDataFrame(
        [(fp, 0), (fp, 0), (fp, 5)], "fingerprint bigint, keeper_id bigint"
    )
    rows = incremental_exact_dedup(batch, dup_state).collect()
    assert len(rows) == 2  # one verdict per batch doc, no join fan-out
    r10 = next(r for r in rows if r["doc_id"] == 10)
    assert r10["dup_of_existing"] and r10["keeper_id"] == 0  # min keeper


def test_persist_sig_nonfile_source_bounded_probe(spark):
    """A non-file-backed source must not trigger a full count of the
    expensive relation; the bounded probe warms the persisted cache."""
    from faconne_spark.operators import dedup

    rel = spark.range(100).selectExpr("id AS doc_id")
    src = spark.range(100).selectExpr("id")  # inputFiles() is empty
    assert src.inputFiles() == []
    out = dedup._persist_sig(rel, src)
    assert out.count() == 100
    dedup.release_caches()


def test_cc_co_located_edges_matches_memory_path(spark):
    """co_locate=True routes the iteration through a bucketed scratch
    edge table (the 100 TB path: the big edge relation never re-shuffles
    across rounds); labels must be identical to the in-memory path, and
    the scratch table must be dropped afterwards."""
    from faconne_spark.operators.dedup import connected_components

    pairs = _chain_pairs(spark, 120)
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs, max_iter=12).collect()
    }
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            pairs, max_iter=12, co_locate=True
        ).collect()
    }
    assert got == want and len(got) == 120
    leftover = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("faconne_cc_edges_")
    ]
    assert leftover == []


def test_cc_round_join_is_edge_side_exchange_free(spark, tmp_path):
    """The per-round CC join shape against a dst-bucketed edge table:
    the edge side reads bucket-local (no Exchange between the scan and
    the join) — only the small label relation shuffles. This is the
    plan co_locate=True produces every round."""
    from faconne_spark.sources import read_table, write_bucketed

    edges = _chain_pairs(spark, 500).selectExpr(
        "id_a AS src", "id_b AS dst"
    )
    write_bucketed(
        edges, "t_cc_plan_probe", ["dst"], n_buckets=4,
        path=str(tmp_path / "cc_edges"),
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        e = read_table(spark, "t_cc_plan_probe")
        labels = edges.selectExpr("src AS node", "src AS label")
        j = (
            e.join(labels, e.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # exactly two exchanges: the label side into the join, and the
        # post-aggregation shuffle — NONE on the bucketed edge scan
        assert plan.count("Exchange hashpartitioning") == 2
        assert "SortMergeJoin" in plan
        # src 498's only out-edge (dst=499) has no label row → dropped
        assert j.count() == 498
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_cc_plan_probe")


def test_recall_eval_properties(spark):
    """recall_eval invariants: identical truth/approx → recall 1.0 for
    every query; disjoint → 0.0; partial overlap counts hits."""
    from faconne_spark.operators.similarity import recall_eval

    t = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 20), (1, 21)], "q_id long, vec_id long"
    )
    same = {r["q_id"]: r for r in recall_eval(t, t, 2).collect()}
    assert all(
        r["recall_at_k"] == 1.0 and r["n_hits"] == 2 for r in same.values()
    )
    disjoint = spark.createDataFrame(
        [(0, 99), (1, 98)], "q_id long, vec_id long"
    )
    none = {r["q_id"]: r for r in recall_eval(t, disjoint, 2).collect()}
    assert all(
        r["recall_at_k"] == 0.0 and r["n_hits"] == 0 for r in none.values()
    )
    half = spark.createDataFrame(
        [(0, 10), (0, 99), (1, 21), (1, 98)], "q_id long, vec_id long"
    )
    p = {r["q_id"]: r for r in recall_eval(t, half, 2).collect()}
    assert p[0]["n_hits"] == 1 and p[0]["recall_at_k"] == 0.5
    assert p[1]["n_hits"] == 1 and p[1]["recall_at_k"] == 0.5


def test_minhash_calibration_mae_bounds(spark, sf_dir):
    """Calibration output invariants on real data: buckets within 0-9,
    means and MAE inside [0, 1], and every candidate pair accounted
    for (bucket counts sum to the candidate-pair count)."""
    from faconne_spark.operators.dedup import (
        minhash_lsh_pairs,
        release_caches,
    )
    from faconne_spark.queries import T
    from faconne_spark.queries.pipeline import dedup_minhash_calibration

    rows = dedup_minhash_calibration(spark, sf_dir).collect()
    assert rows, "sf0.001 corpus must yield at least one LSH candidate"
    for r in rows:
        assert 0 <= r["bucket"] <= 9
        assert 0.0 <= r["mean_est"] <= 1.0
        assert 0.0 <= r["mean_exact"] <= 1.0
        assert 0.0 <= r["mae"] <= 1.0
    n_cand = minhash_lsh_pairs(T(spark, sf_dir, "documents")).count()
    assert sum(r["n_pairs"] for r in rows) == n_cand
    release_caches()


def test_threshold_sweep_monotone(spark, sf_dir):
    """Raising the cosine cutoff can only shrink the pair set and the
    affected-doc set — the sweep must be monotone non-increasing."""
    from faconne_spark.queries.pipeline import SWEEP_TS, embed_threshold_sweep

    rows = {
        r["threshold"]: r
        for r in embed_threshold_sweep(spark, sf_dir).collect()
    }
    # a cutoff with zero surviving pairs yields no row (same in the
    # oracle); whatever reports must be a subset of the sweep list and
    # include its loosest cutoff when any pair exists at all
    assert set(rows) <= set(SWEEP_TS)
    if rows:
        assert min(SWEEP_TS) in rows
    ordered = [rows[t] for t in sorted(rows)]
    for lo, hi in zip(ordered, ordered[1:]):
        assert lo["n_pairs"] >= hi["n_pairs"]
        assert lo["n_docs"] >= hi["n_docs"]


def test_facv_frames_fails_loudly_on_corruption():
    """The motion-BMP walker must raise ValueError (the codec family's
    contract) on truncated headers/frames instead of silently
    truncating or leaking struct.error."""
    import pytest

    from faconne_spark.operators.multimodal import facv_encode, facv_frames

    good = facv_encode([b"x" * 5, b"y" * 3])
    assert [len(f) for f in facv_frames(good)] == [5, 3]
    with pytest.raises(ValueError, match="claims"):
        facv_frames(good[:-2])  # last frame short of its declared length
    with pytest.raises(ValueError, match="truncated"):
        facv_frames(b"FACV\x01")  # header cut mid-count
    with pytest.raises(ValueError, match="frame header"):
        # count says 1 frame but no length prefix follows
        facv_frames(b"FACV" + b"\x01\x00\x00\x00")


def test_learn_bpe_stops_when_pairs_exhausted(spark):
    """Pair-space exhaustion ends training early with the merges
    learned so far (empty table for single-char words) — never a wiped
    word table or silent churn."""
    from faconne_spark.operators.tokenizer import learn_bpe

    single = spark.createDataFrame(
        [(1, "a b c")], "doc_id bigint, text string"
    )
    assert learn_bpe(single, 3).count() == 0

    one_merge = spark.createDataFrame(
        [(1, "ab ab")], "doc_id bigint, text string"
    )
    rows = learn_bpe(one_merge, 5).collect()
    assert [(r["rank"], r["left"], r["right"]) for r in rows] == [
        (0, "a", "b")
    ]


def test_write_zordered_rejects_empty_input(spark, tmp_path):
    """Auto-derived cluster bounds on an empty input must raise a
    pointed ValueError, not TypeError from int(None)."""
    import pytest

    from faconne_spark.sources import write_zordered

    df = spark.createDataFrame([], "user_id bigint, hour bigint")
    with pytest.raises(ValueError, match="bounds"):
        write_zordered(df, str(tmp_path / "z"), ["user_id", "hour"])


def test_training_manifest_from_cascade_snapshot(spark, sf_dir, tmp_path):
    """bench.py's double-pay shave (VERDICT r4 ask #6): feeding
    training_manifest a parquet SNAPSHOT of the cascade verdict must
    produce rows identical to recomputing the cascade inline."""
    from faconne_spark.operators.dedup import release_caches
    from faconne_spark.queries.pipeline import dedup_cascade, training_manifest

    snap = str(tmp_path / "cascade_verdict")
    dedup_cascade(spark, sf_dir).write.mode("overwrite").parquet(snap)
    release_caches()
    inline = {
        r["doc_id"]: tuple(r) for r in training_manifest(spark, sf_dir).collect()
    }
    release_caches()
    fed = {
        r["doc_id"]: tuple(r)
        for r in training_manifest(
            spark, sf_dir, cascade=spark.read.parquet(snap)
        ).collect()
    }
    release_caches()
    assert inline == fed and len(inline) > 0


def test_cc_co_located_path_matches_oracle_at_gate_scale(spark):
    """VERDICT r4 ask #7: the bucketed CC co-location path (the 100 TB
    path, normally auto-gated behind the 25M-edge threshold) gets
    ORACLE-level verification — dedup_clusters with co_locate=True at
    sf0.01 must equal DuckDB's exact recursive-CTE transitive closure.
    The zero-per-round-edge-Exchange plan property of this path is
    asserted separately in test_cc_round_join_is_edge_side_exchange_free."""
    import duckdb

    from faconne_spark.operators.dedup import (
        connected_components,
        release_caches,
        simhash_pairs,
    )
    from faconne_spark.queries.pipeline import ORACLE_CLUSTERS, SIMHASH_MAX_HAM

    sf01 = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf01, "documents.parquet")):
        pytest.skip("sf0.01 testdata not present")
    docs = spark.read.parquet(os.path.join(sf01, "documents.parquet"))
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            simhash_pairs(docs, SIMHASH_MAX_HAM), co_locate=True
        ).collect()
    }
    release_caches()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf01, 'documents.parquet')}')"
    )
    want = {(r[0], r[1]) for r in con.sql(ORACLE_CLUSTERS).fetchall()}
    assert got == want and len(got) > 0
    # the bucketed scratch table must be gone
    leftover = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("faconne_cc_edges_")
    ]
    assert leftover == []


def test_bank_results_partitioning_invariant(spark, sf_dir):
    """The banked round-6 pairs carry the same determinism claim as
    the registry: identical results under different shuffle-partition
    counts.  The sample pins the partition-sensitive shapes — integer
    micro-sums (bootstrap, RRF, RA, MI), windowed histograms
    (AUC/KS/weighted quantiles), the fixed-point peel, and the
    sweep-line running max."""
    from faconne_spark.operators.dedup import release_caches
    from faconne_spark.queries.bank_r6 import BANK_QUERIES

    sample = [
        "events_auc_purchase", "events_value_bootstrap",
        "events_ks_value_drift", "ann_rrf_fusion", "part_copurchase_ra",
        "events_type_value_mi", "part_copurchase_kcore",
        "events_day_concurrency", "events_value_weighted_quantiles",
    ]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in sample:
                rows = sorted(
                    tuple(map(str, r))
                    for r in BANK_QUERIES[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
                release_caches()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b, f"{k} differs across partitioning"


def test_profile_completeness_hostile_identifiers(spark):
    """Column names carrying quotes, backticks, dots and spaces must
    audit cleanly — the names reach the stack() SQL only as escaped
    literals and index-based aliases (judge r6 note)."""
    from faconne_spark.operators.relational import profile_completeness

    df = spark.createDataFrame(
        [(1, "x", None, "z"), (2, " ", "y", None)],
        ["plain", "it's `weird`.name", "with space", "a\\tb"],
    )
    rows = {r["column"]: r for r in profile_completeness(df).collect()}
    assert set(rows) == {
        "plain", "it's `weird`.name", "with space", "a\\tb",
    }
    assert rows["it's `weird`.name"]["n_blank"] == 1
    assert rows["with space"]["n_null"] == 1
    # the backslash must survive the stack literal VERBATIM — with
    # default escapedStringLiterals=false an unescaped \t would parse
    # as a TAB and mislabel the audit row (judge r8 ADVICE)
    assert rows["a\\tb"]["n_null"] == 1


def test_funnel_and_weekend_guards_on_degenerate_events(spark, tmp_path):
    """A corpus with a dead funnel step (no clicks → the purchase
    step's denominator is 0) and single-row weekend/weekday segments
    must yield NULL rates/variances, not an ANSI DIVIDE_BY_ZERO
    (judge r6 ADVICE items 1–2)."""
    import datetime

    from faconne_spark.queries.bank_r7 import (
        events_funnel_ci,
        events_weekend_effect,
    )

    rows = [
        # one weekday view + one weekend view per user; zero clicks
        (1, datetime.datetime(2024, 1, 1, 10), 10, "view", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 6, 10), 10, "view", 2.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 11), 11, "purchase", 3.0, "{}"),
        (4, datetime.datetime(2024, 1, 6, 11), 11, "purchase", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")

    funnel = {r["name"]: r for r in events_funnel_ci(spark, sf).collect()}
    assert funnel["clicked_after_view"]["k"] == 0
    dead = funnel["purchased_after_click"]
    assert dead["n"] == 0
    assert dead["rate"] is None and dead["wilson_lo"] is None

    wk = {r["event_type"]: r for r in events_weekend_effect(spark, sf).collect()}
    assert wk["view"]["n_weekday"] == 1 and wk["view"]["n_weekend"] == 1
    assert wk["view"]["welch_z"] is None  # single-row segments: no variance


def test_distributed_ntile_matches_native_ntile(spark):
    """The range-partitioned two-phase ntile must assign EXACTLY the
    tiles a global-sort ntile assigns — including the N % k remainder
    distribution, ties broken by the secondary key, and N < k."""
    import random

    from pyspark.sql import Window

    from faconne_spark.operators.relational import distributed_ntile

    random.seed(7)
    for n, k in [(1, 10), (5, 10), (997, 10), (2000, 4)]:
        rows = [(random.randint(-50, 50), i) for i in range(n)]
        df = spark.createDataFrame(rows, "v long, id long")
        got = distributed_ntile(df, "v", ("v", "id"), k, n_buckets=16)
        want = df.withColumn("tile", F.ntile(k).over(Window.orderBy("v", "id")))
        a = sorted(map(tuple, got.select("v", "id", "tile").collect()))
        b = sorted(map(tuple, want.select("v", "id", "tile").collect()))
        assert a == b, (n, k)


def test_rewritten_ntile_keys_have_no_partitionless_window(spark, sf_dir):
    """The r6 watch item: the dimension-global ntile/cumulative keys
    must carry NO Window without partition keys — every
    windowspecdefinition in their executed plans leads with the bucket
    column."""
    import re

    from faconne_spark.queries import all_queries

    for key in ("orders_lorenz_curve", "ntile_custbal_deciles"):
        plan = (
            all_queries()[key](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
        assert specs, key  # the rank window is still there...
        assert all(s == "__bkt" for s in specs), (key, specs)


def test_stats_r7_partitioning_invariant(spark, sf_dir):
    """The r7 analytics wave's partition-sensitive shapes (integer
    micro log sums, DECIMAL moment folds, rank windows) must return
    identical rows under different shuffle-partition counts."""
    from faconne_spark.operators.dedup import release_caches
    from faconne_spark.queries.stats_r7 import QUERIES as SQ

    sample = [
        "events_ab_cuped", "events_hill_tail_alpha",
        "customer_segment_nation_chi2", "docs_ttr_by_source",
        "events_transition_lift", "events_autocorr_daily",
        # wave 6: the bucket-partitioned fact-scale ntile and the
        # exploded conditional-sum pass
        "orders_pareto_8020", "docs_stopword_rate_by_lang",
    ]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in sample:
                rows = sorted(
                    tuple(map(str, r))
                    for r in SQ[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
                release_caches()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b and a, f"{k} differs across partitioning"


def test_png_codec_roundtrip_all_filters():
    """Encode/decode round-trip under EACH forced filter type and the
    default r%5 cycle, RGB and RGBA — decoded pixels must equal the
    input byte-for-byte."""
    from faconne_spark.operators.multimodal import (
        png_dims,
        png_encode,
        png_pixels,
    )

    w, h = 5, 7
    rgb = bytes((r * 31 + i * 7) % 256 for r in range(h) for i in range(3 * w))
    for f in range(5):
        p = png_encode(w, h, rgb, filters=[f] * h)
        assert png_dims(p) == (w, h)
        assert png_pixels(p) == (w, h, 3, rgb)
    assert png_pixels(png_encode(w, h, rgb)) == (w, h, 3, rgb)
    rgba = bytes((r * 13 + i * 5) % 256 for r in range(h) for i in range(4 * w))
    assert png_pixels(png_encode(w, h, rgba, channels=4)) == (w, h, 4, rgba)


def test_png_filter_bytes_match_spec_vectors():
    """The ENCODED scanline bytes must match hand-computed PNG-spec
    values (round-trip alone cannot catch a symmetric encode/decode
    slip: a wrong-but-inverse predictor pair still round-trips)."""
    import struct
    import zlib

    from faconne_spark.operators.multimodal import _paeth, png_encode

    def raw_stream(payload):
        # walk chunks, inflate the IDAT
        pos, idat = 8, b""
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        return zlib.decompress(idat)

    row0 = bytes([10, 20, 30, 13, 25, 37])  # 2 RGB pixels
    row1 = bytes([12, 19, 33, 10, 30, 40])
    # Sub (1): enc[i] = raw[i] - raw[i-3]
    assert raw_stream(
        png_encode(2, 1, row0, filters=[1])
    ) == bytes([1]) + bytes([10, 20, 30, 3, 5, 7])
    # Up (2): first row predicts from zero-row; second from row above
    assert raw_stream(
        png_encode(2, 2, row0 + row1, filters=[2, 2])
    ) == bytes([2]) + row0 + bytes([2]) + bytes(
        (row1[i] - row0[i]) & 0xFF for i in range(6)
    )
    # Average (3), row 0: pred = (a + 0)//2
    want_avg = bytearray([3])
    for i in range(6):
        a = row0[i - 3] if i >= 3 else 0
        want_avg.append((row0[i] - a // 2) & 0xFF)
    assert raw_stream(png_encode(2, 1, row0, filters=[3])) == bytes(want_avg)
    # Paeth predictor spec vectors (tie-break order a, then b, then c)
    assert _paeth(3, 4, 5) == 3       # p=2: pa=1 smallest -> a
    assert _paeth(0, 4, 2) == 2       # p=2: pc=0 smallest -> c
    assert _paeth(5, 4, 2) == 5       # p=7: pa=2 = pb=3? pa<=pb -> a... pa=2, pb=3, pc=5 -> a
    assert _paeth(100, 90, 95) == 95  # p=95: pc=0 smallest -> c
    assert _paeth(4, 4, 4) == 4       # all equal: tie-break -> a


def test_png_ahash_equals_bmp_ahash_on_same_pixels():
    """A PNG and a BMP holding the SAME stored pixel rows must produce
    the identical 64-bit average hash — the cross-codec invariant that
    pins the PNG pixel path to the oracle-proven BMP path."""
    from faconne_spark.operators.multimodal import (
        ahash64_real,
        bmp_encode,
        bmp_row_stride,
        png_encode,
    )

    w, h = 9, 6
    rows = [
        bytes((r * 37 + i * 11) % 256 for i in range(3 * w))
        for r in range(h)
    ]
    stride = bmp_row_stride(w)
    bmp_px = b"".join(row + bytes(stride - 3 * w) for row in rows)
    png = png_encode(w, h, b"".join(rows))
    bmp = bmp_encode(w, h, bmp_px)
    assert ahash64_real(png) == ahash64_real(bmp)


def test_png_unsupported_layouts_fail_loudly():
    """Palette/16-bit/interlaced PNGs raise NotImplementedError toward
    the codec seam; truncated chunks raise ValueError."""
    import struct
    import zlib

    from faconne_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        png_encode,
        png_pixels,
    )

    def ihdr(depth, ctype, interlace):
        return PNG_SIG + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        ) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14)) + _png_chunk(
            b"IEND", b""
        )

    for depth, ctype, inter in [(16, 2, 0), (8, 3, 0), (8, 2, 1)]:
        with pytest.raises(NotImplementedError, match="codec= seam"):
            png_pixels(ihdr(depth, ctype, inter))
    good = png_encode(2, 2, bytes(range(12)))
    with pytest.raises(ValueError):
        png_pixels(good[:30])  # truncated mid-chunk
    with pytest.raises(ValueError, match="scanline"):
        # valid framing, wrong inflated length
        bad = PNG_SIG + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        ) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5)) + _png_chunk(
            b"IEND", b""
        )
        png_pixels(bad)


def test_png_resize_nearest_picks_expected_pixels():
    from faconne_spark.operators.multimodal import (
        png_encode,
        png_pixels,
        png_resize_nearest,
    )

    rows = [bytes([1, 1, 1, 2, 2, 2]), bytes([3, 3, 3, 4, 4, 4])]
    png = png_encode(2, 2, b"".join(rows))
    up = png_resize_nearest(png, 4, 4)
    uw, uh, uc, upx = png_pixels(up)
    assert (uw, uh, uc) == (4, 4, 3)
    assert upx[0:3] == bytes([1, 1, 1]) and upx[6:9] == bytes([2, 2, 2])
    down = png_pixels(png_resize_nearest(up, 2, 2))[3]
    assert down == b"".join(rows)


def test_decode_media_real_parses_png_dims():
    from faconne_spark.operators.multimodal import (
        decode_media_real,
        png_encode,
    )

    assert decode_media_real(png_encode(7, 3, bytes(63))) == (7, 3)


def test_round8_partitioning_invariant(spark, sf_dir):
    """The r8 wave's partition-sensitive shapes — DECIMAL moment
    folds (interarrival CV, assortativity, ANOVA), the integer
    CUSUM/changepoint windows, the micro-int Markov trajectory, the
    bit_or word merge, and the single-subtree quantile read-off —
    must return identical rows under different shuffle-partition
    counts."""
    from faconne_spark.operators.dedup import release_caches
    from faconne_spark.queries import all_queries

    qs = all_queries()
    sample = [
        "events_interarrival_cv", "copurchase_degree_assortativity",
        "customer_segment_balance_anova", "events_changepoint_binary",
        "events_markov_stationary", "dedup_bloom_merged",
        "lineitem_ship_lag_quantiles", "brand_price_volume_decomp",
        "docs_hash_uniformity_chi2", "events_dau_mann_kendall",
    ]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for k in sample:
                rows = sorted(
                    tuple(map(str, r))
                    for r in qs[k](spark, sf_dir).collect()
                )
                results.setdefault(k, []).append(rows)
                release_caches()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    for k, (a, b) in results.items():
        assert a == b and a, f"{k} differs across partitioning"


def test_markov_stationary_matches_python_replay(spark, sf_dir):
    """The 12-step integer trajectory must equal a plain-Python replay
    of the documented algorithm (half-up micro transition probs,
    exact source-marginal start vector, per-step half-up products) —
    the local guard on the unrolled-CTE oracle's equivalence."""
    from collections import defaultdict

    from faconne_spark.queries import T
    from faconne_spark.queries.round8 import (
        MARKOV_POWER_ITERS,
        events_markov_stationary,
    )

    got = {
        r["event_type"]: (r["stationary_micro"], r["l1_residual_micro"])
        for r in events_markov_stationary(spark, sf_dir).collect()
    }
    ev = sorted(
        T(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    counts = defaultdict(int)
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"]:
            counts[(a["event_type"], b["event_type"])] += 1

    def half_up(num, den):
        return (2 * num + den) // (2 * den)

    row_tot = defaultdict(int)
    for (f, t), n in counts.items():
        row_tot[f] += n
    p = {
        (f, t): half_up(1_000_000 * n, row_tot[f])
        for (f, t), n in counts.items()
    }
    n_tot = sum(counts.values())
    v = {f: half_up(1_000_000 * n, n_tot) for f, n in row_tot.items()}
    prev = None
    for _ in range(MARKOV_POWER_ITERS):
        prev = v
        nxt = defaultdict(int)
        for (f, t), pm in p.items():
            if f in v:
                nxt[t] += half_up(v[f] * pm, 1_000_000)
        v = dict(nxt)
    l1 = sum(abs(v[t] - prev[t]) for t in v if t in prev)
    want = {t: (v[t], l1) for t in v if t in prev}
    assert got == want


# ------------------------------------------------------ JPEG codec (r9)

def test_jpeg_flat_blocks_roundtrip_exactly():
    """Flat 8x8 blocks + all-ones quant tables make the lossy pipeline
    exactly invertible (DC-only DCT) — the invariant the gate oracle
    replays in closed form."""
    import hashlib

    import numpy as np

    from faconne_spark.operators.multimodal import jpeg_encode, jpeg_pixels

    d = hashlib.md5(b"gate fixture").digest()
    wb, hb = 3, 3
    vals = np.array([d[k] for k in range(wb * hb)], dtype=np.uint8)
    px = vals.reshape(hb, wb).repeat(8, 0).repeat(8, 1).tobytes()
    payload = jpeg_encode(
        8 * wb, 8 * hb, px, channels=1, quant=([1] * 64, [1] * 64)
    )
    assert jpeg_pixels(payload) == (8 * wb, 8 * hb, 1, px)


def test_jpeg_idct_matches_independent_reference():
    """The codec's numpy IDCT must agree with a from-the-formula pure
    Python IDCT on random coefficient blocks (the hypothesis-replay
    discipline: an independent implementation of the documented
    algorithm, not the codec's own matrix)."""
    import math
    import random

    import numpy as np

    from faconne_spark.operators.multimodal import _jpeg_dct_matrix

    rng = random.Random(9)
    F_ = np.array(
        [[rng.randint(-200, 200) for _ in range(8)] for _ in range(8)],
        dtype=np.float64,
    )
    C = _jpeg_dct_matrix()
    codec = np.einsum("ux,uv,vy->xy", C, F_, C)
    for x in range(8):
        for y in range(8):
            ref = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(0.5) if u == 0 else 1.0
                    cv = math.sqrt(0.5) if v == 0 else 1.0
                    ref += (
                        0.25 * cu * cv * F_[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            assert abs(codec[x, y] - ref) < 1e-9


def test_jpeg_entropy_coding_known_vector():
    """A flat single-block stream must serialize to the exact Annex K
    bit pattern (DC cat code + diff bits + EOB, 1-padded) — pins the
    Huffman tables and the differential-DC path against hand-derived
    bytes, independent of the decoder."""
    from faconne_spark.operators.multimodal import (
        _jpeg_segments,
        jpeg_encode,
    )

    payload = jpeg_encode(8, 8, bytes([94]) * 64, quant=([1] * 64, [1] * 64))
    tag, start, ln = list(_jpeg_segments(payload))[-1]
    assert tag == 0xDA
    # DC = 8*(94-128) = -272: category 9 (code 1111110), value bits
    # -272 + 511 = 239 (011101111), EOB (1010), pad 1111
    assert payload[start + ln : -2] == bytes([0xFC, 0xEF, 0xAF])


def test_jpeg_ahash_equals_bmp_and_png_on_same_pixels():
    """The same flat-block pixel content must hash identically via
    BMP (RGB), PNG (RGB) and grayscale JPEG — the cross-codec pin that
    ties the new JPEG pixel path to the oracle-proven BMP path."""
    import hashlib

    import numpy as np

    from faconne_spark.operators.multimodal import (
        ahash64_real,
        bmp_encode,
        bmp_row_stride,
        jpeg_encode,
        png_encode,
    )

    d = hashlib.md5(b"ahash pin").digest()
    wb, hb = 2, 2
    w, h = 8 * wb, 8 * hb
    gray = (
        np.array([d[k] for k in range(wb * hb)], dtype=np.uint8)
        .reshape(hb, wb).repeat(8, 0).repeat(8, 1)
    )
    rgb = np.repeat(gray[:, :, None], 3, axis=2).tobytes()
    assert bmp_row_stride(w) == 3 * w  # no padding at this width
    bmp = bmp_encode(w, h, rgb)
    png = png_encode(w, h, rgb)
    jpg = jpeg_encode(w, h, gray.tobytes(), channels=1,
                      quant=([1] * 64, [1] * 64))
    assert ahash64_real(bmp) == ahash64_real(png) == ahash64_real(jpg)


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn streams decode: predictors reset at each interval and
    the reader re-syncs on the byte-aligned marker."""
    import random

    from faconne_spark.operators.multimodal import jpeg_encode, jpeg_pixels

    rng = random.Random(4)
    w, h = 40, 24
    px = bytes(rng.randrange(256) for _ in range(w * h))
    payload = jpeg_encode(
        w, h, px, channels=1, quant=([1] * 64, [1] * 64), restart_interval=2
    )
    assert b"\xff\xd0" in payload  # at least one RST0 actually emitted
    w2, h2, ch, out = jpeg_pixels(payload)
    assert (w2, h2, ch) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2


def test_jpeg_unsupported_layouts_fail_loudly():
    """Arithmetic-coded SOF9 raises NotImplementedError toward the
    codec seam (progressive SOF2 is REAL since r10 —
    tests/test_multimodal_progressive.py); truncated and desynced
    streams raise ValueError."""
    import pytest

    from faconne_spark.operators.multimodal import jpeg_dims, jpeg_pixels

    sof9 = b"\xff\xd8\xff\xc9\x00\x08" + bytes(6)
    with pytest.raises(NotImplementedError, match="SOF0"):
        jpeg_dims(sof9)
    with pytest.raises(NotImplementedError, match="SOF0"):
        jpeg_pixels(sof9)
    with pytest.raises(ValueError):
        jpeg_pixels(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        jpeg_pixels(b"\xff\xd8\xff\xdb\x00\x43\x00" + bytes(64))  # no SOS


def test_decode_media_real_parses_jpeg_dims():
    from faconne_spark.operators.multimodal import (
        decode_media_real,
        jpeg_encode,
    )

    payload = jpeg_encode(24, 16, bytes(24 * 16), channels=1)
    assert decode_media_real(payload) == (24, 16)


def test_events_value_nonnegative_contract(sf_dir):
    """Several half-up integer divisions ((2a+b) div (2b)) assume a
    NON-NEGATIVE numerator built from event values (expected
    shortfall's tail sum, the daily mean-micro, the dow/type value
    decomposition).  Spark div truncates toward zero while DuckDB //
    floors, so a negative value column would silently split the
    engines by one micro.  This pins the data contract the idiom
    rests on; if the generator ever emits negative values, the keys
    must move to the sign-safe round-on-double form (see
    embed_anisotropy_panel and the r10 div audit)."""
    import duckdb

    lo = duckdb.sql(
        f"SELECT min(value) FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    assert lo >= 0


def test_bench_reps_comparability_refusal():
    """Judge r11 ask #7: a reps=1 bench run must label itself
    incomparable in the emitted JSON (first-rep inflation reaches 4x
    on stamp-identical plans; the min-of-N instrument needs N >= 2)."""
    import bench

    ok = bench.bench_comparability(2)
    assert ok == {"cross_round_comparable": True}
    assert bench.bench_comparability(5) == {"cross_round_comparable": True}
    bad = bench.bench_comparability(1)
    assert bad["cross_round_comparable"] is False
    assert "reps=1" in bad["incomparable_reason"]
