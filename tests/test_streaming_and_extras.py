"""Streaming path, multimodal plumbing, LSH recall, simhash sanity."""

import os

from pyspark.sql import functions as F

from syslog_loose_spark.config import PipelineConfig
from syslog_loose_spark.functions import dedup as D
from syslog_loose_spark.functions import similarity as S
from syslog_loose_spark.schema import TOKENIZED_SCHEMA
from syslog_loose_spark.sources.corpus import GOLDEN_CORPUS
from syslog_loose_spark.sources.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    fake_media,
    media_table,
)
from syslog_loose_spark.sources.tokenized import generate_tokenized
from syslog_loose_spark.streaming.stream import (
    streaming_transform,
    windowed_counts,
)


def test_streaming_windowed_counts(spark, tmp_path):
    """Micro-batch the tokenized table through the identical pipeline chain
    and check the windowed aggregate equals the batch aggregate."""
    src = str(tmp_path / "stream_src")
    generate_tokenized(spark, 200).write.parquet(src)

    stream = (spark.readStream.schema(TOKENIZED_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    parsed = streaming_transform(stream, PipelineConfig())
    agg = windowed_counts(parsed, window="1 hour", watermark="0 seconds")

    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["hour"], r["sink"], r["facility"], r["severity"]): r["n"]
           for r in spark.sql("select * from win_counts").collect()}

    batch = streaming_transform(
        generate_tokenized(spark, 200), PipelineConfig())
    # null event times cannot be windowed — streaming aggregates cover the
    # ts-bearing rows only (dead-letter/ts-less rows are routed, not windowed)
    want = {(r["hour"], r["sink"], r["facility"], r["severity"]): r["n"]
            for r in batch.where(F.col("ts").isNotNull()).groupBy(
                F.date_trunc("hour", "ts").alias("hour"),
                "sink", "facility", "severity")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want and len(got) > 3


def test_multimodal_roundtrip(spark):
    feats = extract_features(media_table(spark, 30)).collect()
    assert len(feats) == 30
    for r in feats:
        w, h = decode_image(fake_media(r["media_id"], r["kind"],
                                       16 + r["media_id"] % 5,
                                       9 + r["media_id"] % 4))
        assert (r["width"], r["height"]) == (w, h)
        assert r["checksum"] > 0


def test_multimodal_unknown_format_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG_not_a_real_signature")
    with pytest.raises(NotImplementedError):
        decode_image(b"total garbage")


def _png_bytes(w, h):
    """Minimal real PNG: signature + IHDR + IDAT + IEND (stdlib only)."""
    import binascii
    import struct as st
    import zlib

    def chunk(typ, data):
        raw = typ + data
        return (st.pack(">I", len(data)) + raw
                + st.pack(">I", binascii.crc32(raw) & 0xFFFFFFFF))

    ihdr = st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    scanlines = b"".join(b"\x00" + b"\x7f" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


def _jpeg_header_bytes(w, h):
    """SOI + APP0(JFIF) + SOF0 prefix — enough of a real JPEG stream for
    header-dimension decoding (full entropy data not needed)."""
    import struct as st

    app0 = b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" \
        + st.pack(">HH", 72, 72) + b"\x00\x00"
    sof0 = b"\xff\xc0" + st.pack(">H", 17) + b"\x08" \
        + st.pack(">HH", h, w) + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + sof0


def test_real_container_header_decode(spark):
    """PNG/JPEG/GIF/BMP dimensions decode from genuine container bytes
    with pure stdlib — through decode_image AND the Spark mapInPandas
    feature path (no Pillow in this sandbox)."""
    import struct as st

    gif = b"GIF89a" + st.pack("<HH", 40, 25) + b"\x00" * 6
    bmp = b"BM" + b"\x00" * 16 + st.pack("<ii", 33, -21) + b"\x00" * 8
    cases = [(0, _png_bytes(12, 7), (12, 7)),
             (1, _jpeg_header_bytes(640, 480), (640, 480)),
             (2, gif, (40, 25)),
             (3, bmp, (33, 21))]
    for _, payload, want in cases:
        assert decode_image(payload) == want
    df = spark.createDataFrame(
        [(i, "image", bytearray(p), len(p)) for i, p, _ in cases],
        MEDIA_SCHEMA)
    feats = {r["media_id"]: (r["width"], r["height"])
             for r in extract_features(df).collect()}
    assert feats == {i: want for i, _, want in cases}


def test_pillow_full_decode_when_available(spark):
    """Conditional: with Pillow installed the full-decode + real resize
    path must agree with the header parse (auto-skips in this sandbox)."""
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    from syslog_loose_spark.sources.multimodal import resize_payload

    png = _png_bytes(10, 6)
    assert decode_image(png) == (10, 6)
    out = resize_payload(png, 5, 3)
    import io

    with PIL.open(io.BytesIO(out)) as im:
        assert (im.width, im.height) == (5, 3)


def test_lsh_candidates_superset_of_high_jaccard(spark, tmp_path):
    """Every pair with very high n-gram Jaccard must be an LSH candidate
    (banded MinHash guarantee at jaccard → 1)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dup = docs.union(docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang",
        "source", "n_chars"))
    cands = {(r["a"], r["b"]) for r in
             D.minhash_lsh_candidates(dup, k=8, bands=4).collect()}
    # exact duplicates (jaccard == 1) must all be found
    n = docs.count()
    missing = [(i, i + 100000) for i in range(n)
               if (i, i + 100000) not in cands]
    assert not missing, f"missing {len(missing)} exact-dup pairs"


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown fox jumps"),
         (3, "completely different words entirely here")],
        "doc_id LONG, text STRING")
    rows = {r["doc_id"]: r["sh"] for r in
            df.select("doc_id", D.simhash64(F.col("text")).alias("sh"))
            .collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_brute_force_vs_lsh_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, k=3).collect()}
    planes = [[(1 if (i * 13 + j * 7) % 5 < 2 else -1) for j in range(64)]
              for i in range(2)]  # 2 planes -> 4 buckets, generous recall
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.lsh_topk(emb, q, planes, k=3).collect()}
    # sanity: the approximate path returns plausible neighbors with
    # non-trivial overlap (recall depends on bucket granularity)
    assert len(approx) > 0
    assert len(exact & approx) / len(exact) > 0.2


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: totals accumulate across micro-batches and
    converge to the batch aggregate."""
    from syslog_loose_spark.streaming.stream import running_source_totals

    src = str(tmp_path / "stateful_src")
    generate_tokenized(spark, 300).write.parquet(src)
    stream = (spark.readStream.schema(TOKENIZED_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    totals = running_source_totals(
        streaming_transform(stream, PipelineConfig()))
    q = (totals.writeStream.format("memory").queryName("runtot")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # latest state row per source == batch aggregate
    latest = spark.sql("""
        select source, max_by(total_rows, batches) as total_rows,
               max_by(total_tokens, batches) as total_tokens
        from runtot group by source""").collect()
    got = {r["source"]: (r["total_rows"], r["total_tokens"]) for r in latest}
    want = {r["source"]: (r["n"], r["t"]) for r in
            generate_tokenized(spark, 300).groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("t"))
            .collect()}
    assert got == want


def test_simhash_near_dups_finds_exact_dups(spark):
    """Exact duplicates have hamming 0 and MUST appear (pigeonhole:
    any pair with hamming < bands shares a band slice)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .where(F.col("doc_id") < 120)
    dup = docs.union(docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang",
        "source", "n_chars"))
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in D.simhash_near_dups(dup, max_hamming=3).collect()}
    n = docs.count()
    for i in range(n):
        assert pairs.get((i, i + 100000)) == 0, f"missing exact dup {i}"
    assert all(h <= 3 for h in pairs.values())


def test_simhash_near_dups_bucket_cap(spark):
    """A degenerate bucket larger than max_bucket_size is dropped rather
    than squared."""
    rows = [(i, "same text everywhere") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = D.simhash_near_dups(df, max_hamming=3, max_bucket_size=10)
    assert out.count() == 0  # every band bucket holds all 20 -> dropped


def test_lsh_multiband_recall_not_worse(spark):
    """OR-amplification: 2 bands of the same planes can only add
    candidates relative to 1 band, so recall is monotone."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, k=3).collect()}
    mk = lambda seed: [[(1 if (seed * 31 + i * 13 + j * 7) % 5 < 2 else -1)
                        for j in range(64)] for i in range(3)]
    one = {(r["query_id"], r["neighbor_id"])
           for r in S.lsh_topk(emb, q, mk(0), k=3).collect()}
    two = {(r["query_id"], r["neighbor_id"])
           for r in S.lsh_topk(emb, q, [mk(0), mk(1)], k=3).collect()}
    r1 = len(exact & one) / len(exact)
    r2 = len(exact & two) / len(exact)
    assert r2 >= r1, (r1, r2)
    assert len(two) > 0


def test_tokens_from_text_matches_batch_tokenizer(spark):
    """JVM-side tokenization == corpus.tokenize byte-for-byte, incl.
    multibyte UTF-8."""
    from syslog_loose_spark.sources.corpus import GOLDEN_CORPUS, tokenize
    from syslog_loose_spark.streaming.sources import tokens_from_text

    df = spark.createDataFrame(
        [(i, line) for i, (_, line) in enumerate(GOLDEN_CORPUS)],
        "idx INT, value STRING")
    out = df.select("idx", tokens_from_text(F.col("value")).alias("t")) \
        .orderBy("idx").collect()
    for r in out:
        assert r["t"] == tokenize(GOLDEN_CORPUS[r["idx"]][1]), r["idx"]


def test_rate_source_synthetic_stream(spark):
    """Rate source -> full parse/enrich/route chain -> memory sink; rows
    match the batch generator for the same ids (token equality)."""
    from syslog_loose_spark.streaming.sources import stream_rate_synthetic

    stream = stream_rate_synthetic(spark, rows_per_second=500)
    parsed = streaming_transform(stream, PipelineConfig())
    q = (parsed.writeStream.format("memory").queryName("ratesink")
         .outputMode("append").start())
    try:
        import time
        for _ in range(60):
            if spark.sql("select count(*) from ratesink").first()[0] >= 40:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql(
        "select doc_id, tokens, n_tok, source, protocol, parse_ok, sink "
        "from ratesink").collect()
    assert len(got) >= 40
    want = {r["doc_id"]: r for r in
            generate_tokenized(spark, 2000).collect()}
    for r in got:
        w = want[r["doc_id"]]
        assert r["tokens"] == w["tokens"], r["doc_id"]
        assert r["source"] == w["source"], r["doc_id"]


def test_socket_source_end_to_end(spark):
    """The reference server example (examples/server/main.rs): lines over
    a socket -> tokenized stream -> parse -> memory sink, verified against
    the oracle parser."""
    import socket
    import threading
    import time

    from syslog_loose_spark.oracle import parse_message
    from syslog_loose_spark.sources.corpus import GOLDEN_CORPUS
    from syslog_loose_spark.streaming.sources import stream_socket_lines

    lines = [line for _, line in GOLDEN_CORPUS[:8]
             if "\n" not in line]            # socket frames are lines

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(1)

    def serve():
        conn, _ = srv.accept()
        with conn:
            for ln in lines:
                conn.sendall((ln + "\n").encode("utf-8"))
            time.sleep(20)                   # keep open while spark reads

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = stream_socket_lines(spark, "127.0.0.1", port)
    parsed = streaming_transform(stream, PipelineConfig())
    q = (parsed.writeStream.format("memory").queryName("socksink")
         .outputMode("append").start())
    try:
        for _ in range(60):
            if (spark.sql("select count(*) from socksink").first()[0]
                    >= len(lines)):
                break
            time.sleep(0.5)
    finally:
        q.stop()
        srv.close()
    got = spark.sql("select * from socksink").collect()
    assert len(got) >= len(lines)
    by_msg = {}
    for ln in lines:
        m = parse_message(ln, PipelineConfig().parse)
        by_msg[m.msg] = m
    matched = 0
    for r in got:
        m = by_msg.get(r["msg"])
        if m is not None:
            assert r["hostname"] == m.hostname
            assert r["facility"] == m.facility
            matched += 1
    assert matched >= len(lines)


def test_resize_and_frame_sample_plumbing(spark):
    from syslog_loose_spark.sources.multimodal import (
        decode_image, media_table, resize_media, resize_payload,
        sample_frames)

    resized = resize_media(media_table(spark, 12), 8, 5).collect()
    assert len(resized) == 12
    for r in resized:
        w, h = decode_image(bytes(r["payload"]))
        assert (w, h) == (8, 5)
        assert r["n_bytes"] == 12 + 56

    frames = sample_frames(media_table(spark, 12), 4).collect()
    assert len(frames) == 48
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    from syslog_loose_spark.sources.multimodal import fake_media
    for mid, frs in by_media.items():
        body = fake_media(mid, "image", 16 + mid % 5, 9 + mid % 4)[12:]
        got = b"".join(bytes(r["frame"])
                       for r in sorted(frs, key=lambda r: r["frame_idx"]))
        assert got == body, mid  # frames reassemble the body exactly

    import pytest
    with pytest.raises(NotImplementedError):
        resize_payload(b"\x89PNG_nope", 8, 5)


def test_embedding_near_dups_recovers_planted(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .where(F.col("vec_id") < 50)
    base = emb.select("vec_id", F.expr(
        "transform(embedding, x -> cast(x as double))").alias("embedding"))
    dup = emb.select((F.col("vec_id") + 1000).alias("vec_id"), F.expr(
        "transform(embedding, x -> cast(x as double) * 2.0d)")
        .alias("embedding"))
    pairs = {(r["a"], r["b"]): r["sim"] for r in
             S.embedding_near_dups(base.union(dup), threshold=0.99)
             .collect()}
    for i in range(50):
        assert pairs.get((i, i + 1000)) == 1.0, i


def test_ivf_topk_recall_and_exactness_limit(spark):
    """IVF-Flat: with n_probe == n_cells every cell is probed, so the
    result must EQUAL brute force; with fewer probes recall is partial
    but results are always a subset of valid neighbors."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["rank"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, k=3).collect()}
    full = {(r["query_id"], r["rank"], r["neighbor_id"])
            for r in S.ivf_topk(emb, q, n_cells=8, n_probe=8, k=3)
            .collect()}
    assert full == exact
    some = {(r["query_id"], r["neighbor_id"])
            for r in S.ivf_topk(emb, q, n_cells=8, n_probe=2, k=3)
            .collect()}
    assert len(some) > 0


def test_persist_registry_bounded_and_releasable(spark):
    """ADVICE r2: near-dup operators' cached relations must not accumulate
    across many queries in a long-lived session.  The tracked registry
    keeps at most _MAX_LIVE live caches and unpersist_tracked drops all."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(30)
    D.unpersist_tracked()
    for _ in range(3):
        D.ngram_jaccard_pairs(docs, threshold=0.9).count()
        D.simhash_near_dups(docs).count()
    assert len(D._PERSISTED) <= D._MAX_LIVE
    assert D.unpersist_tracked() <= D._MAX_LIVE
    assert not D._PERSISTED
    # a second call is a no-op
    assert D.unpersist_tracked() == 0


def test_persist_registry_bounded_across_cc_calls(spark):
    """VERDICT r4 item 5: connected_components' converged labels frame
    must go through the bounded registry too — repeated CC calls in a
    long-lived session may never hold more than _MAX_LIVE live caches.
    local_threshold=0 forces the DISTRIBUTED min-label path — the small
    graph would otherwise take the driver union-find fast path, which
    persists nothing and would make this regression test vacuous
    (ADVICE r5)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["a", "b"])
    D.unpersist_tracked()
    for _ in range(4):
        D.connected_components(edges, local_threshold=0).count()
        assert len(D._PERSISTED) <= D._MAX_LIVE
    assert D.unpersist_tracked() <= D._MAX_LIVE
    assert not D._PERSISTED


def test_unresolved_auto_salting_fails_loudly(spark, tmp_path):
    """ADVICE r2: hot_sources=None ('auto') reaching the router directly
    (outside run_pipeline, e.g. a hand-built streaming writer) must raise,
    not silently disable skew protection."""
    import pytest as _pytest

    from syslog_loose_spark.operators.route import _is_hot, salted_source
    from syslog_loose_spark.streaming.stream import foreach_batch_writer

    auto = PipelineConfig(hot_sources=None)
    with _pytest.raises(ValueError, match="auto"):
        _is_hot(auto)
    with _pytest.raises(ValueError, match="auto"):
        salted_source(auto)
    with _pytest.raises(ValueError, match="auto"):
        foreach_batch_writer(str(tmp_path), auto)
    # () is the deliberate off switch and a concrete tuple still works
    assert _is_hot(PipelineConfig(hot_sources=())) is not None
    assert _is_hot(PipelineConfig(hot_sources=("nginx",))) is not None


def test_ivf_topk_scales_to_hundreds_of_cells(spark):
    """r2 VERDICT: centroids must ship as a broadcast relation, not plan
    literals (O(n_cells x dim) in the plan tree).  n_cells=256 over the
    500-vector table must run, stay a superset-consistent approximation,
    and degrade to brute-force equality at n_probe == n_cells."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["rank"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, k=3).collect()}
    full = {(r["query_id"], r["rank"], r["neighbor_id"])
            for r in S.ivf_topk(emb, q, n_cells=256, n_probe=256, k=3)
            .collect()}
    assert full == exact
    df = S.ivf_topk(emb, q, n_cells=256, n_probe=16, k=3)
    assert df.count() > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # no literal centroid blobs: the plan tree must stay small even at
    # 256 cells x 64 dims (literal arrays made it O(n_cells x dim))
    assert len(plan) < 200_000, len(plan)


def test_udp_bridge_end_to_end(spark):
    """Reference examples/server/main.rs analogue: syslog datagrams over
    UDP -> bridge -> socket stream -> parse -> memory sink, verified
    against the oracle parser."""
    import socket
    import time

    from syslog_loose_spark.oracle import parse_message
    from syslog_loose_spark.streaming.sources import (
        UdpToSocketBridge, stream_udp_datagrams)

    lines = [line for _, line in GOLDEN_CORPUS[:8] if "\n" not in line]
    by_msg = {}   # NB: several corpus lines share a msg — key on msg
    for ln in lines:
        m = parse_message(ln, PipelineConfig().parse)
        by_msg[m.msg] = m
    bridge = UdpToSocketBridge().start()
    try:
        stream = stream_udp_datagrams(spark, bridge)
        parsed = streaming_transform(stream, PipelineConfig())
        q = (parsed.writeStream.format("memory").queryName("udpsink")
             .outputMode("append").start())
        try:
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            deadline = time.time() + 40
            sent_rounds = 0
            while time.time() < deadline:
                # UDP is lossy-by-contract and the socket source only
                # receives datagrams that arrive AFTER it connects:
                # resend each poll round until the sink catches up
                for ln in lines:
                    tx.sendto(ln.encode("utf-8"),
                              ("127.0.0.1", bridge.udp_port))
                sent_rounds += 1
                time.sleep(0.5)
                if (spark.sql("select count(distinct msg) from udpsink")
                        .first()[0] >= len(by_msg)):
                    break
            tx.close()
        finally:
            q.stop()
    finally:
        bridge.stop()
    got = spark.sql("select * from udpsink").collect()
    seen = set()
    for r in got:
        m = by_msg.get(r["msg"])
        if m is not None:
            assert r["hostname"] == m.hostname
            assert r["facility"] == m.facility
            assert r["source"] == "udp"
            seen.add(r["msg"])
    assert seen == set(by_msg), (len(seen), len(by_msg), sent_rounds)


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """The sketch estimator's error must be bounded: for exact duplicates
    est == 1.0, and across candidate pairs |est - jaccard| <= 0.5 with
    k=8 components (binomial sd ~0.17 at j=0.5; 0.5 is a ~3-sigma gate)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(120)
    dup = docs.union(docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang",
        "source", "n_chars"))
    est = {(r["a"], r["b"]): r["est_jaccard"] for r in
           D.minhash_jaccard_estimate(dup, k=8, bands=4).collect()}
    exact = {(r["a"], r["b"]): r["jaccard"] for r in
             D.ngram_jaccard_pairs(dup, threshold=0.0).collect()}
    D.unpersist_tracked()
    n = docs.count()
    for i in range(n):
        assert est.get((i, i + 100000)) == 1.0, i
    checked = 0
    for pair, e in est.items():
        j = exact.get(pair, 0.0)
        assert abs(e - j) <= 0.5, (pair, e, j)
        checked += 1
    assert checked >= n


def _png_filtered_bytes(w, h, filt):
    """Real PNG with a chosen row filter — exercises the unfilter path."""
    import binascii
    import struct as st
    import zlib

    def chunk(typ, data):
        raw = typ + data
        return (st.pack(">I", len(data)) + raw
                + st.pack(">I", binascii.crc32(raw) & 0xFFFFFFFF))

    # pixel (x, y) = (x * 3 + y * 11) & 0xFF — a deterministic gradient
    px = [[(x * 3 + y * 11) & 0xFF for x in range(w)] for y in range(h)]
    rows = bytearray()
    for y in range(h):
        rows.append(filt)
        for x in range(w):
            a = px[y][x - 1] if x > 0 else 0
            b = px[y - 1][x] if y > 0 else 0
            c = px[y - 1][x - 1] if x > 0 and y > 0 else 0
            v = px[y][x]
            if filt == 0:
                enc = v
            elif filt == 1:
                enc = (v - a) & 0xFF
            elif filt == 2:
                enc = (v - b) & 0xFF
            elif filt == 3:
                enc = (v - (a + b) // 2) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc = (v - pred) & 0xFF
            rows.append(enc)
    ihdr = st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(rows)))
            + chunk(b"IEND", b"")), px


def test_real_png_resize_stdlib(spark):
    """REAL PNG resize with no Pillow: every PNG row filter (None, Sub,
    Up, Average, Paeth) unfilters correctly, and the nearest-neighbor
    resample picks the exact source pixels — verified end-to-end through
    the Spark resize_media path."""
    import struct as st
    import zlib

    from syslog_loose_spark.sources.multimodal import (
        _png_chunks, _png_unfilter, resize_media, resize_payload)

    for filt in range(5):
        png, px = _png_filtered_bytes(16, 10, filt)
        out = resize_payload(png, 8, 5)
        assert decode_image(out) == (8, 5), filt
        idat = b"".join(d for t, d in _png_chunks(out) if t == b"IDAT")
        got = _png_unfilter(zlib.decompress(idat), 8, 5)
        for y in range(5):
            for x in range(8):
                assert got[y * 8 + x] == px[y * 10 // 5][x * 16 // 8], (
                    filt, x, y)
    # through Spark: mapInPandas batch resize of real PNG payloads
    png, _ = _png_filtered_bytes(12, 6, 4)
    df = spark.createDataFrame([(0, "image", bytearray(png), len(png))],
                               MEDIA_SCHEMA)
    rows = resize_media(df, 6, 3).collect()
    assert decode_image(bytes(rows[0]["payload"])) == (6, 3)


def test_sample_frames_real_container(spark):
    """sample_frames is format-aware (r3 VERDICT item 7): only the FAKE
    container strips its 12-byte header; a real PNG chunks the ENTIRE
    payload, and the frames reassemble to the original bytes."""
    from syslog_loose_spark.sources.multimodal import (
        real_png_media, sample_frames)

    png = real_png_media(7, 9, 6)
    fake = fake_media(3, "video", 16, 9)
    df = spark.createDataFrame(
        [(0, "image", bytearray(png), len(png)),
         (1, "video", bytearray(fake), len(fake))], MEDIA_SCHEMA)
    rows = sample_frames(df, 4).collect()
    by_id = {}
    for r in sorted(rows, key=lambda r: (r["media_id"], r["frame_idx"])):
        by_id.setdefault(r["media_id"], b"")
        by_id[r["media_id"]] += bytes(r["frame"])
    assert by_id[0] == png            # real container: whole payload
    assert by_id[1] == fake[12:]      # FAKE: header stripped as before


def test_real_png_generator_all_filters(spark):
    """real_png_media emits scanline filters cycling y % 5 and decodes
    back to the pure-arithmetic pixel field — on a 7-row image every one
    of the five RFC 2083 filters round-trips."""
    import zlib as _z

    from syslog_loose_spark.sources.multimodal import (
        _png_chunks, _png_unfilter, real_media_dims, real_png_media,
        real_png_pixels, real_media_table)

    for i in (0, 5, 11):
        w, h = real_media_dims(i)
        png = real_png_media(i, w, h)
        assert decode_image(png) == (w, h)
        idat = b"".join(d for t, d in _png_chunks(png) if t == b"IDAT")
        raw = _z.decompress(idat)
        # filters present: rows y=0..h-1 carry filter byte y % 5
        assert [raw[y * (w + 1)] for y in range(h)] == [
            y % 5 for y in range(h)]
        assert bytes(_png_unfilter(raw, w, h)) == real_png_pixels(i, w, h)
    # distributed generation matches the local encoder byte-for-byte
    rows = {r["media_id"]: bytes(r["payload"])
            for r in real_media_table(spark, 6).collect()}
    for i in range(6):
        w, h = real_media_dims(i)
        assert rows[i] == real_png_media(i, w, h)


def test_real_png_color_roundtrip_and_resize(spark):
    """r4 VERDICT item 8: genuine 8-bit RGB and RGBA PNGs (stdlib encode,
    all five filters at the 3/4-byte stride) must unfilter back to the
    interleaved pixel formula; the whole-pixel nearest resample must pick
    exactly the source pixels per channel; Pillow, when present, must
    agree with the stdlib decode."""
    import zlib as _z

    from syslog_loose_spark.sources.multimodal import (
        _CHANNELS_OF_COLOR_TYPE, _png_chunks, _png_unfilter,
        real_media_channels, real_media_dims, real_media_table,
        real_png_media, real_png_pixels, resize_payload)

    for i, ch in ((0, 3), (1, 4), (8, 3), (13, 4)):
        w, h = real_media_dims(i)
        png = real_png_media(i, w, h, ch)
        assert decode_image(png) == (w, h)
        assert _CHANNELS_OF_COLOR_TYPE[png[25]] == ch
        idat = b"".join(d for t, d in _png_chunks(png) if t == b"IDAT")
        raw = _z.decompress(idat)
        assert [raw[y * (w * ch + 1)] for y in range(h)] == [
            y % 5 for y in range(h)]
        px = real_png_pixels(i, w, h, ch)
        assert bytes(_png_unfilter(raw, w, h, ch)) == px
        try:
            from PIL import Image as PILImage
            import io as _io

            im = PILImage.open(_io.BytesIO(png))
            assert im.tobytes() == px
        except ImportError:
            pass
        # whole-pixel nearest resample: channel c of out (x,y) is channel
        # c of source pixel (x*w//5, y*h//4)
        out = resize_payload(png, 5, 4)
        assert decode_image(out) == (5, 4)
        oidat = b"".join(d for t, d in _png_chunks(out) if t == b"IDAT")
        got = bytes(_png_unfilter(_z.decompress(oidat), 5, 4, ch))
        want = bytes(px[((y * h // 4) * w + (x * w // 5)) * ch + c]
                     for y in range(4) for x in range(5)
                     for c in range(ch))
        assert got == want, (i, ch)
    # distributed color generation matches the local encoder
    rows = {r["media_id"]: bytes(r["payload"])
            for r in real_media_table(spark, 4, color=True).collect()}
    for i in range(4):
        w, h = real_media_dims(i)
        assert rows[i] == real_png_media(i, w, h, real_media_channels(i))


def test_ivf_refined_centroids_recall_on_planted_clusters(spark):
    """r3 VERDICT item 5: md5-sampled seeds + one integer-exact Lloyd
    round must recover planted cluster structure — recall@5 vs brute
    force >= 0.9 at n_probe=2 of 20 cells on 20 well-separated clusters
    (the old lowest-id prefix put every seed in the first clusters and
    collapsed recall for the rest)."""
    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    dim, n_clusters, per = 16, 20, 40
    centers = [[(h32(f"c{c}-{j}") % 2000 - 1000) / 1000.0
                for j in range(dim)] for c in range(n_clusters)]
    rows = []
    for c in range(n_clusters):
        for m in range(per):
            vec = [centers[c][j]
                   + (h32(f"n{c}-{m}-{j}") % 200 - 100) / 1000.0
                   for j in range(dim)]
            rows.append((c * per + m, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") % per == 0)
    exact = {}
    for r in S.brute_force_topk(emb, q, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in S.ivf_topk(emb, q, n_cells=n_clusters, n_probe=2,
                        k=5).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[qid] & got.get(qid, set())) for qid in exact)
    total = sum(len(v) for v in exact.values())
    assert total == 5 * n_clusters
    recall = hits / total
    assert recall >= 0.9, f"recall@5 {recall:.3f} < 0.9"


def test_streaming_sessionize_parity_with_batch(spark, tmp_path):
    """r3 VERDICT item 8: the applyInPandasWithState gap sessionizer must
    assign the SAME session ids as the batch window operator when the
    fixture replays in timestamp order across micro-batches (3 chunks,
    one file per trigger, state carrying sessions over the boundaries)."""
    import os as _os

    from pyspark.sql import Window as W

    from syslog_loose_spark.operators.sessionize import sessionize
    from syslog_loose_spark.streaming.stream import streaming_sessions

    events = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .where(F.col("user_id") < 40)
              .select("user_id", "event_id", "ts"))
    n = events.count()
    assert n > 100
    src = str(tmp_path / "sess_src")
    ranked = events.withColumn(
        "rk", F.row_number().over(W.orderBy("ts", "event_id")))
    seen: set = set()
    for i in range(3):
        (ranked.where((F.col("rk") > i * n / 3)
                      & (F.col("rk") <= (i + 1) * n / 3)).drop("rk")
         .coalesce(1).write.mode("append").parquet(src))
        # file source processes oldest-mtime first: stamp chunk order on
        # the file each write just produced (part names are uuids — they
        # do NOT sort in write order)
        new = [p for p in _os.listdir(src)
               if p.startswith("part-") and p not in seen]
        assert len(new) == 1
        seen.add(new[0])
        _os.utime(_os.path.join(src, new[0]),
                  (1_700_000_000 + i * 10,) * 2)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (streaming_sessions(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sessout")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["user_id"], r["event_id"]): r["session_seq"]
           for r in spark.sql("select * from sessout").collect()}
    want = {(r["user_id"], r["event_id"]): r["session_seq"]
            for r in sessionize(events, gap_minutes=30).collect()}
    assert len(got) == n
    assert got == want


def test_stateful_streaming_restart_recovers_from_checkpoint(spark,
                                                             tmp_path):
    """VERDICT r6 item 5: applyInPandasWithState recovery from a REAL
    checkpointLocation.  Phase 1 processes half the corpus and stops;
    phase 2 appends the rest and restarts the same plan on the same
    checkpoint.  The restarted query's totals must include phase-1 rows
    (recovered state), and its `batches` counter must CONTINUE past
    phase 1's — a fresh state would restart at 1."""
    import os as _os

    from syslog_loose_spark.streaming.stream import (
        running_source_totals, streaming_transform)

    src = str(tmp_path / "rst_src")
    ckpt = str(tmp_path / "rst_ckpt")
    full = generate_tokenized(spark, 400)

    def append_chunk(df, order):
        df.coalesce(1).write.mode("append").parquet(src)
        part = [p for p in _os.listdir(src) if p.startswith("part-")
                and _os.stat(_os.path.join(src, p)).st_mtime
                > 1_600_000_000]
        newest = max(part, key=lambda p: _os.stat(
            _os.path.join(src, p)).st_mtime)
        _os.utime(_os.path.join(src, newest),
                  (1_500_000_000 + order * 10,) * 2)

    # doc_id is a 'doc-00000000' string — split on its numeric suffix
    doc_n = F.substring(F.col("doc_id"), 5, 8).cast("long")
    append_chunk(full.where(doc_n < 200), 0)

    def start(out):
        # foreachBatch, not the memory sink: memory is explicitly
        # non-recoverable ("This query does not support recovering from
        # checkpoint location") — the recoverable production shape is
        # foreachBatch + idempotent per-epoch writes
        stream = (spark.readStream.schema(TOKENIZED_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        totals = running_source_totals(
            streaming_transform(stream, PipelineConfig()))

        def sink(bdf, epoch_id):
            if not bdf.isEmpty():
                bdf.write.mode("append").parquet(out)

        return (totals.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt).start())

    out1 = str(tmp_path / "rst_out1")
    q1 = start(out1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    phase1 = {r["source"]: r for r in spark.read.parquet(out1)
              .groupBy("source")
              .agg(F.max("batches").alias("batches")).collect()}
    assert phase1, "phase 1 processed nothing"

    append_chunk(full.where(doc_n >= 200), 1)
    out2 = str(tmp_path / "rst_out2")
    q2 = start(out2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["source"]: (r["total_rows"], r["total_tokens"], r["batches"])
           for r in spark.read.parquet(out2).groupBy("source")
           .agg(F.max_by("total_rows", "batches").alias("total_rows"),
                F.max_by("total_tokens", "batches").alias("total_tokens"),
                F.max("batches").alias("batches")).collect()}
    want = {r["source"]: (r["n"], r["t"]) for r in
            full.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("t"))
            .collect()}
    # every source updated after the restart carries the FULL-corpus
    # total: phase-1 rows survive only through the recovered state
    overlap = 0
    for s, (rows, toks, batches) in got.items():
        assert (rows, toks) == want[s], s
        if s in phase1:
            overlap += 1
            assert batches > phase1[s]["batches"], (
                f"{s}: state batches counter reset across restart")
    assert overlap > 0, "fixture split never exercised state recovery"


def test_streaming_sessions_restart_parity_with_batch(spark, tmp_path):
    """Session continuity across a checkpoint restart: a user session
    SPANNING the stop/restart boundary must keep its batch-assigned
    session_seq — the union of pre- and post-restart update-mode
    emissions equals the batch sessionizer on the full corpus."""
    import os as _os

    from pyspark.sql import Window as W

    from syslog_loose_spark.operators.sessionize import sessionize
    from syslog_loose_spark.streaming.stream import streaming_sessions

    events = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .where(F.col("user_id") < 40)
              .select("user_id", "event_id", "ts"))
    n = events.count()
    src = str(tmp_path / "sessrst_src")
    ckpt = str(tmp_path / "sessrst_ckpt")
    ranked = events.withColumn(
        "rk", F.row_number().over(W.orderBy("ts", "event_id")))
    seen: set = set()

    def write_chunk(lo, hi, order):
        (ranked.where((F.col("rk") > lo) & (F.col("rk") <= hi)).drop("rk")
         .coalesce(1).write.mode("append").parquet(src))
        new = [p for p in _os.listdir(src)
               if p.startswith("part-") and p not in seen]
        assert len(new) == 1
        seen.add(new[0])
        _os.utime(_os.path.join(src, new[0]),
                  (1_700_000_000 + order * 10,) * 2)

    def start(out):
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        def sink(bdf, epoch_id):
            if not bdf.isEmpty():
                bdf.write.mode("append").parquet(out)

        return (streaming_sessions(stream, gap_minutes=30)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt).start())

    out1 = str(tmp_path / "sessrst_out1")
    out2 = str(tmp_path / "sessrst_out2")
    write_chunk(0, n / 2, 0)
    q1 = start(out1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    write_chunk(n / 2, n, 1)
    q2 = start(out2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {(r["user_id"], r["event_id"]): r["session_seq"]
           for r in spark.read.parquet(out1).collect()}
    got2 = {(r["user_id"], r["event_id"]): r["session_seq"]
            for r in spark.read.parquet(out2).collect()}
    assert got.keys().isdisjoint(got2.keys())  # each event emitted once
    got.update(got2)
    want = {(r["user_id"], r["event_id"]): r["session_seq"]
            for r in sessionize(events, gap_minutes=30).collect()}
    assert len(got) == n
    assert got == want


def test_connected_components_chain_clique_and_canonical(spark):
    """Pairs -> clusters: a 12-link chain must collapse to its minimum
    (pointer jumping, not 1-hop propagation), a clique and an isolated
    pair label correctly, and drop_near_dup_docs keeps exactly one doc
    per cluster plus all unpaired docs."""
    from syslog_loose_spark.functions.dedup import (
        connected_components, drop_near_dup_docs, unpersist_tracked)

    pairs = ([(i, i + 1) for i in range(12)]
             + [(50, 52), (52, 54), (50, 54), (80, 81)])
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    exp = ({i: 0 for i in range(13)}
           | {50: 50, 52: 50, 54: 50, 80: 80, 81: 80})
    assert got == exp
    # the distributed min-label path must produce the identical labeling
    # (local_threshold=0 forces it past the driver union-find shortcut)
    got_dist = {r["node"]: r["component"]
                for r in connected_components(df, local_threshold=0)
                .collect()}
    assert got_dist == exp
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in sorted(exp) + [999]],
        "doc_id long, text string")
    kept = sorted(r["doc_id"]
                  for r in drop_near_dup_docs(docs, df).collect())
    assert kept == [0, 50, 80, 999]
    unpersist_tracked()


def test_connected_components_nonconvergence_raises(spark):
    """max_iter too small for the diameter must raise loudly, never
    return partially-merged clusters."""
    import pytest as _pytest

    from syslog_loose_spark.functions.dedup import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(40)],
                                  "a long, b long")
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=1,
                             local_threshold=0).collect()


def test_sampling_operators_invariants(spark):
    """hash_split: complete partition, deterministic, roughly weighted;
    stratified_sample: exact quota per stratum, rerun-stable;
    pack_sequences: offsets in [0, budget), per-shard bins contiguous
    from 0, cumulative sizes consistent."""
    from syslog_loose_spark.functions.sampling import (
        hash_split, pack_sequences, stratified_sample)

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n = docs.count()

    tagged = hash_split(docs, [("train", 0.9), ("val", 0.05),
                               ("test", 0.05)])
    counts = {r["split"]: r["n"] for r in
              tagged.groupBy("split").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n
    assert counts["train"] > 0.8 * n
    assert set(counts) == {"train", "val", "test"}
    again = {r["split"]: r["n"] for r in
             hash_split(docs, [("train", 0.9), ("val", 0.05),
                               ("test", 0.05)])
             .groupBy("split").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert again == counts  # rerun-stable

    strat = stratified_sample(docs, "lang", 5).collect()
    per = {}
    for r in strat:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert all(v == 5 for v in per.values()) and len(per) == 5

    packed = pack_sequences(docs, budget=4096, n_shards=8).collect()
    assert len(packed) == n
    by_shard = {}
    for r in packed:
        assert 0 <= r["offset"] < 4096
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        bins = sorted({r["bin"] for r in rows})
        assert bins[0] == 0 and bins == list(range(bins[-1] + 1)), shard
        total = sum(r["n_chars"] for r in rows)
        last = max(rows, key=lambda r: (r["bin"], r["offset"]))
        assert last["bin"] * 4096 + last["offset"] + last["n_chars"] \
            == total


def test_decontaminate_planted_overlap(spark):
    """A corpus doc embedding an 8-gram from a benchmark doc is flagged
    and dropped; unrelated docs survive.  The eval n-gram set must enter
    the plan as a broadcast (no corpus-sized shuffle for the probe)."""
    ev = spark.createDataFrame(
        [(1000, "alpha bravo charlie delta echo foxtrot golf hotel india")],
        ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "xx alpha bravo charlie delta echo foxtrot golf hotel yy"),
         (2, "totally unrelated words that never appeared in any bench"),
         (3, "alpha bravo charlie delta but only seven words here")],
        ["doc_id", "text"])
    hits = {r["doc_id"]: r["n_hits"]
            for r in D.contamination_hits(corpus, ev, n=8).collect()}
    assert hits == {1: 1}
    kept = sorted(r["doc_id"]
                  for r in D.decontaminate(corpus, ev, n=8).collect())
    assert kept == [2, 3]
    plan = (D.contamination_hits(corpus, ev, n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan


def test_dedup_incremental_drops_seen_content(spark):
    """New docs whose NORMALIZED content matches the prior corpus are
    dropped (case/whitespace variants included); novel docs pass."""
    seen = spark.createDataFrame(
        [(1, "Hello World"), (2, "spark engine")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "hello   world"),      # normalized duplicate of 1
         (11, "SPARK ENGINE"),       # normalized duplicate of 2
         (12, "genuinely new doc")], ["doc_id", "text"])
    kept = sorted(r["doc_id"]
                  for r in D.dedup_incremental(new, seen).collect())
    assert kept == [12]
    # self-novel increments pass through untouched when seen is empty
    empty = seen.where("doc_id < 0")
    assert D.dedup_incremental(new, empty).count() == 3


def test_pii_scrub_patterns(spark):
    """Planted email/IPv4/long-number are counted and replaced with
    placeholders in fixed order; clean text is untouched."""
    from syslog_loose_spark.functions.text import pii_counts, pii_scrub
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "mail bob.smith+x@corp.example.org now"),
         (1, "from 192.168.0.1 port 443"),
         (2, "acct 123456789012 end"),
         (3, "clean text 1.2 v3 short 12345678")],
        ["doc_id", "text"])
    e, i, n = pii_counts(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", e.alias("e"), i.alias("i"), n.alias("n"),
        pii_scrub(F.col("text")).alias("s")).collect()}
    assert (rows[0]["e"], rows[0]["s"]) == (1, "mail <EMAIL> now")
    assert (rows[1]["i"], rows[1]["s"]) == (1, "from <IP> port 443")
    assert (rows[2]["n"], rows[2]["s"]) == (1, "acct <NUM> end")
    assert rows[3]["s"] == "clean text 1.2 v3 short 12345678"
    assert (rows[3]["e"], rows[3]["i"], rows[3]["n"]) == (0, 0, 0)


def test_pq_adc_recall_on_planted_clusters(spark):
    """Product quantization (r5): 16-dim vectors encoded as 4 one-byte
    codes.  Pure ADC quantizes away WITHIN-cluster detail by design
    (every member of a tight cluster gets the same codes), so its honest
    guarantee is cluster-level: >= 0.9 of each query's top-5 must come
    from the query's own planted cluster.  With the exact re-rank stage
    (rerank=30: ADC shortlist -> true-vector re-score), recall@5 vs
    brute force must reach >= 0.9."""
    import hashlib

    from syslog_loose_spark.functions.dedup import unpersist_tracked

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    dim, n_clusters, per = 16, 10, 30
    centers = [[(h32(f"pc{c}-{j}") % 2000 - 1000) / 1000.0
                for j in range(dim)] for c in range(n_clusters)]
    rows = []
    for c in range(n_clusters):
        for m in range(per):
            vec = [centers[c][j]
                   + (h32(f"pn{c}-{m}-{j}") % 100 - 50) / 1000.0
                   for j in range(dim)]
            rows.append((c * per + m, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") % per == 0)
    same_cluster = 0
    total = 0
    for r in S.pq_topk(emb, q, m=4, ks=16, k=5, dim=dim).collect():
        total += 1
        if r["neighbor_id"] // per == r["query_id"] // per:
            same_cluster += 1
    assert total == 5 * n_clusters
    prec = same_cluster / total
    assert prec >= 0.9, f"ADC cluster precision {prec:.3f} < 0.9"
    exact = {}
    for r in S.brute_force_topk(emb, q, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in S.pq_topk(emb, q, m=4, ks=16, k=5, dim=dim,
                       rerank=30).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[qid] & got.get(qid, set())) for qid in exact)
    recall = hits / (5 * n_clusters)
    assert recall >= 0.9, f"reranked recall@5 {recall:.3f} < 0.9"
    unpersist_tracked()


def test_streaming_dedup_restart_keeps_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark state recovery (VERDICT r6 item 5,
    third state mechanism after the custom-state totals and sessions):
    a key first seen BEFORE the stop/restart boundary re-arriving after
    it (within the watermark) must stay dropped — only recovered dedup
    state can know about it — while genuinely new keys still emit."""
    import time as _time
    from datetime import datetime, timedelta, timezone

    from syslog_loose_spark.streaming.stream import streaming_dedup

    src = str(tmp_path / "ddrst_src")
    ckpt = str(tmp_path / "ddrst_ckpt")
    os.makedirs(src)
    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)

    def write(chunk, ids):
        rows = [(i, t0 + timedelta(minutes=10 * chunk + n), f"p{chunk}")
                for n, i in enumerate(ids)]
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, payload string"
        ).coalesce(1).write.parquet(f"{src}/c{chunk}", mode="overwrite")
        _time.sleep(0.05)  # mtime drives file-source discovery order

    def start(out):
        stream = (spark.readStream
                  .schema("doc_id long, ts timestamp, payload string")
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/c*"))

        def sink(bdf, epoch_id):
            if not bdf.isEmpty():
                bdf.write.mode("append").parquet(out)

        return (streaming_dedup(stream).writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt).start())

    write(0, [1, 2, 3])
    write(1, [4, 3])            # in-phase cross-batch replay of 3
    out1 = str(tmp_path / "ddrst_out1")
    q1 = start(out1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert {r["doc_id"] for r in spark.read.parquet(out1).collect()} \
        == {1, 2, 3, 4}

    write(2, [2, 5])            # 2 = CROSS-RESTART replay, 5 = new
    out2 = str(tmp_path / "ddrst_out2")
    q2 = start(out2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert {r["doc_id"] for r in spark.read.parquet(out2).collect()} \
        == {5}, "cross-restart replay re-emitted: dedup state lost"


def test_streaming_dedup_drops_replays(spark, tmp_path):
    """streaming_dedup (r5): duplicate keys arriving within the
    watermark — inside one micro-batch or across batches — are dropped;
    each key's first arrival survives; output keys equal the distinct
    input keys."""
    import time as _time
    from datetime import datetime, timezone

    from syslog_loose_spark.streaming.stream import streaming_dedup

    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)

    def rows(chunk, ids):
        from datetime import timedelta

        return [(i, t0 + timedelta(minutes=10 * chunk + n), f"p{chunk}-{i}")
                for n, i in enumerate(ids)]

    chunks = [rows(0, [1, 2, 3, 2]),       # in-batch replay of 2
              rows(1, [3, 4, 5]),          # cross-batch replay of 3
              rows(2, [1, 6])]             # late replay of 1
    for c, data in enumerate(chunks):
        spark.createDataFrame(
            data, "doc_id long, ts timestamp, payload string"
        ).coalesce(1).write.parquet(f"{src}/c{c}", mode="overwrite")
        # file mtime drives discovery order (part-file uuids do not sort)
        _time.sleep(0.05)

    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, payload string")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/c*"))
    q = (streaming_dedup(stream).writeStream.format("memory")
         .queryName("dedup_out").outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("select * from dedup_out").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 2, 3, 4, 5, 6], ids
    # first arrival won: payload chunk prefix is the earliest occurrence
    by_id = {r["doc_id"]: r["payload"] for r in out}
    assert by_id[1] == "p0-1" and by_id[3] == "p0-3"


def test_ivf_pq_composed_recall_on_planted_clusters(spark):
    """The composed IVF-PQ index (r5): coarse cells restrict candidates,
    ADC codes score them.  On planted clusters, >= 0.9 of top-5 results
    must be same-cluster (ADC cluster guarantee), and with exact rerank
    the composed index must reach recall@5 >= 0.85 vs brute force (the
    cell probe may exclude a few cross-cell boundary neighbors — that is
    the documented n_probe trade)."""
    import hashlib

    from syslog_loose_spark.functions.dedup import unpersist_tracked

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    dim, n_clusters, per = 16, 10, 30
    centers = [[(h32(f"pc{c}-{j}") % 2000 - 1000) / 1000.0
                for j in range(dim)] for c in range(n_clusters)]
    rows = []
    for c in range(n_clusters):
        for mm in range(per):
            vec = [centers[c][j]
                   + (h32(f"pn{c}-{mm}-{j}") % 100 - 50) / 1000.0
                   for j in range(dim)]
            rows.append((c * per + mm, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") % per == 0)
    res = S.ivf_pq_topk(emb, q, n_cells=n_clusters, n_probe=3, m=4,
                        ks=16, k=5, dim=dim).collect()
    same = sum(1 for r in res
               if r["neighbor_id"] // per == r["query_id"] // per)
    assert len(res) == 5 * n_clusters
    assert same / len(res) >= 0.9, same / len(res)
    exact = {}
    for r in S.brute_force_topk(emb, q, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in S.ivf_pq_topk(emb, q, n_cells=n_clusters, n_probe=3, m=4,
                           ks=16, k=5, dim=dim, rerank=30).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[qid] & got.get(qid, set())) for qid in exact)
    recall = hits / (5 * n_clusters)
    assert recall >= 0.85, f"composed reranked recall@5 {recall:.3f}"
    unpersist_tracked()


def test_word_rarity_shuffle_fallback_matches(spark):
    """VERDICT r5 item 3: word_rarity_stats must not force-broadcast the
    frequent-word head (its absolute type count grows with the corpus).
    With broadcasting disabled outright the head join must fall back to
    a shuffle join AND produce identical results; the executed plan must
    actually contain the fallback join, proving the hint is gone and the
    choice is Spark's."""
    from syslog_loose_spark.functions.text import word_rarity_stats

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200)
    default = sorted(word_rarity_stats(docs).collect())
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = word_rarity_stats(docs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), plan
        fallback = sorted(df.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert default == fallback


def test_dedup_incremental_fp_matches_text_variant(spark):
    """r5 VERDICT item 6: the fingerprint-table variant must keep exactly
    the same documents as the from-text variant when the fp table is
    content_fingerprints(seen) — and the state frame itself is hashes
    only (single 'fp' column, 32 hex chars, distinct)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    seen = docs.where(F.col("doc_id") < 60)
    # plant one recrawl: doc 61 carries doc 1's text uppercased
    new = docs.where(F.col("doc_id") >= 60).unionByName(
        seen.where(F.col("doc_id") == 1)
        .withColumn("doc_id", F.lit(999).cast("long"))
        .withColumn("text", F.upper(F.col("text"))))
    fps = D.content_fingerprints(seen)
    assert fps.columns == ["fp"]
    assert fps.where(F.length("fp") != 32).count() == 0
    a = sorted(r["doc_id"] for r in
               D.dedup_incremental(new, seen).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               D.dedup_incremental_fp(new, fps).select("doc_id").collect())
    assert a == b
    assert 999 not in a  # the planted recrawl was dropped


def test_mix_sources_deterministic_thinning(spark):
    """mix_sources: ratio-0 sources vanish, ratio-1 sources are intact,
    fractional sources thin to ~ratio, and membership is rerun-stable
    AND growth-stable (a kept row stays kept when the corpus doubles)."""
    from syslog_loose_spark.functions.sampling import mix_sources

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    ratios = [("src0", 0.0), ("src1", 1.0), ("src2", 0.5)]
    mixed = mix_sources(docs, ratios)
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # pure projection+filter
    by_src = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(
                F.count(F.lit(1)).alias("n")).collect()}
    assert "src0" not in by_src
    assert by_src["src1"] == full["src1"]
    assert 0 < by_src["src2"] < full["src2"]
    a = sorted(r["doc_id"] for r in mixed.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               mix_sources(docs, ratios).select("doc_id").collect())
    assert a == b  # rerun-stable
    grown = docs.unionByName(docs.select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang",
        "source", "n_chars"))
    g = set(r["doc_id"] for r in
            mix_sources(grown, ratios).select("doc_id").collect())
    assert set(a) == {i for i in g if i < 500000}  # growth-stable


def test_remove_boilerplate_lines_planted(spark):
    """Planted chrome (cookie banner in >= min_docs docs) drops; the
    doc-unique line survives; line ORDER is preserved on reassembly."""
    from syslog_loose_spark.functions.text import remove_boilerplate_lines

    rows = [(i, "body text %d\nACCEPT COOKIES\ntail %d" % (i, i))
            for i in range(5)] + [(99, "solo doc\nunique line 99")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, min_docs=3).collect()}
    for i in range(5):
        assert out[i]["n_lines"] == 3 and out[i]["n_dropped"] == 1
        assert out[i]["text"] == "body text %d\ntail %d" % (i, i)
    assert out[99]["n_dropped"] == 0
    assert out[99]["text"] == "solo doc\nunique line 99"


def test_incremental_dedup_two_crawl_cycle(spark, tmp_path):
    """The production incremental loop end to end: crawl 1 persists its
    fingerprint table to parquet; crawl 2 dedupes against the READ-BACK
    table (never re-reading crawl-1 text), keeps only novel content, and
    appends its own fingerprints; crawl 3 then drops recrawls of BOTH
    earlier crawls.  This is the state-table cycle dedup_incremental_fp
    exists for."""
    fp_dir = str(tmp_path / "fps")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(90)
    c1 = docs.where(F.col("doc_id") < 30)
    c2 = (docs.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 60))
          .unionByName(c1.where(F.col("doc_id") == 5)
                       .withColumn("doc_id", F.lit(1005).cast("long"))))
    c3 = (docs.where(F.col("doc_id") >= 60)
          .unionByName(c1.where(F.col("doc_id") == 7)
                       .withColumn("doc_id", F.lit(1007).cast("long")))
          .unionByName(c2.where(F.col("doc_id") == 35)
                       .withColumn("doc_id", F.lit(1035).cast("long"))))

    D.content_fingerprints(c1).write.parquet(fp_dir + "/c1")
    seen = spark.read.parquet(fp_dir + "/c1")
    kept2 = D.dedup_incremental_fp(c2, seen)
    assert 1005 not in {r["doc_id"] for r in kept2.collect()}
    D.content_fingerprints(kept2).write.parquet(fp_dir + "/c2")

    seen_all = spark.read.parquet(fp_dir + "/c1").unionByName(
        spark.read.parquet(fp_dir + "/c2"))
    kept3_ids = {r["doc_id"] for r in
                 D.dedup_incremental_fp(c3, seen_all).collect()}
    assert 1007 not in kept3_ids and 1035 not in kept3_ids
    assert {r["doc_id"] for r in c3.collect()} - kept3_ids == {1007, 1035}


def test_duplicated_ngram_stats_planted(spark):
    """Docs sharing a planted 10-word template have high dup_frac; docs
    with unique bodies read 0; a doc shorter than n falls back to the
    whole-text gram (shared short docs still count as duplicated)."""
    tpl = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = ([(i, f"unique body {i} words only here now {i}")
             for i in range(4)]
            + [(10 + i, f"doc {10 + i} prefix {tpl}") for i in range(3)]
            + [(20, "tiny"), (21, "tiny")])
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in
           D.duplicated_ngram_stats(df, n=8, min_docs=2).collect()}
    for i in range(4):
        assert out[i]["n_dup"] == 0 and out[i]["dup_frac"] == 0.0
    for i in (10, 11, 12):
        # the 10-word template inside a 4-word-prefixed doc yields
        # duplicated 8-grams wholly inside the template span
        assert out[i]["n_dup"] >= 3, out[i]
        assert out[i]["dup_frac"] > 0
    assert out[20]["n_grams"] == 1 and out[20]["n_dup"] == 1
    assert out[21]["dup_frac"] == 1.0

def test_strip_duplicated_spans_planted(spark):
    """Tokens covered by a cross-doc duplicated 8-gram are excised —
    and ONLY those: the unique prefix/suffix around a planted 10-word
    template survives in order; fully-unique docs pass verbatim; docs
    shorter than n are untouched even when exactly duplicated (the
    documented no-whole-doc-fallback edge)."""
    tpl = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = ([(i, f"u{i} v{i} w{i} {tpl} x{i} y{i}") for i in range(3)]
            + [(50, "a wholly unique body with eight plus words in it")]
            + [(60, "tiny doc"), (61, "tiny doc")])
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in
           D.strip_duplicated_spans(df, n=8, min_docs=3).collect()}
    for i in range(3):
        assert out[i]["n_words"] == 15 and out[i]["n_removed"] == 10
        assert out[i]["text"] == f"u{i} v{i} w{i} x{i} y{i}"
    assert out[50]["n_removed"] == 0
    assert out[50]["text"] == "a wholly unique body with eight plus words in it"
    for i in (60, 61):
        assert out[i]["n_removed"] == 0 and out[i]["text"] == "tiny doc"


def test_unigram_logprob_hand_computed(spark):
    """Millinat quantization pinned against hand-computed values on a
    2-doc corpus (counts a=7, b=1, total=8), and the ordering contract:
    a doc holding the corpus-rare word scores strictly lower."""
    import math

    from syslog_loose_spark.functions.text import unigram_logprob_stats

    df = spark.createDataFrame([(1, "a a a a"), (2, "a a a b")],
                               "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in unigram_logprob_stats(df).collect()}
    mn_a = round(math.log(7 / 8) * 1000)   # -134
    mn_b = round(math.log(1 / 8) * 1000)   # -2079
    assert out[1]["n_words"] == 4
    assert out[1]["sum_logprob_mn"] == 4 * mn_a
    assert out[1]["mean_logprob_mn"] == round(4 * mn_a / 4, 4)
    assert out[2]["sum_logprob_mn"] == 3 * mn_a + mn_b
    assert out[2]["mean_logprob_mn"] == round((3 * mn_a + mn_b) / 4, 4)
    assert out[2]["mean_logprob_mn"] < out[1]["mean_logprob_mn"]


def test_gopher_quality_stats_hand_computed(spark):
    """Each Gopher rule pinned on a purpose-built doc: a passing prose
    doc, a bullet-list doc (bullet rule), a symbol-spam doc, and a
    stopword-free doc; counts AND the integer-exact pass flag."""
    from syslog_loose_spark.functions.text import gopher_quality_stats

    good = "the quick brown fox and the lazy dog run with that pace " * 5
    rows = [
        (1, good.strip()),                              # 55 words, passes
        (2, "- the of and one\n- two bullet line\n- three bullet line"),
        (3, "the cat sat with ### ### ### ### ### ### mat of it"),
        (4, "zebra quagga okapi tapir dugong manatee numbat wombat"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in
           gopher_quality_stats(df, min_words=8).collect()}
    r1 = out[1]
    assert r1["n_words"] == 60 and r1["passes"] == 1
    assert r1["n_stop_types"] == 4          # the, and, with, that
    assert r1["n_bullet_lines"] == 0 and r1["n_ellipsis_lines"] == 0
    r2 = out[2]                             # ALL 3 lines start with '-'
    assert r2["n_lines"] == 3 and r2["n_bullet_lines"] == 3
    assert r2["passes"] == 0                # 10*3 > 9*3 fails bullet rule
    r3 = out[3]
    assert r3["n_symbol_words"] == 6 and r3["n_words"] == 13
    assert r3["passes"] == 0                # 10*6 > 13 fails symbol rule
    r4 = out[4]
    assert r4["n_stop_types"] == 0 and r4["passes"] == 0


def test_c4_line_filter_hand_computed(spark):
    """Line keep/drop rules and the doc-level vetoes, each on its own
    planted doc; rebuilt text pins kept-line order."""
    from syslog_loose_spark.functions.text import c4_line_filter

    s1 = "this is a fine sentence."
    s2 = "another perfectly good sentence right here!"
    rows = [
        (1, f"{s1}\n{s2}\nshort one.\nno terminal punctuation here at all"),
        (2, f"{s1}\nthis line mentions JavaScript libraries today.\n{s2}"),
        (3, f"{s1}\n{s2}\nfiller lorem ipsum in this long sentence."),
        (4, f"{s1}\n{s2}\ncurly {{ brace in this long sentence."),
        (5, s1),                            # only 1 kept line -> vetoed
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in
           c4_line_filter(df, min_kept_lines=2).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 2
    assert out[1]["doc_kept"] == 1 and out[1]["text"] == f"{s1}\n{s2}"
    assert out[2]["n_kept"] == 2 and out[2]["doc_kept"] == 1
    assert out[2]["text"] == f"{s1}\n{s2}"   # js line excised, order kept
    assert out[3]["doc_kept"] == 0 and out[3]["text"] == ""   # lorem veto
    assert out[4]["doc_kept"] == 0 and out[4]["text"] == ""   # { veto
    assert out[5]["n_kept"] == 1 and out[5]["doc_kept"] == 0


def test_message_templates_hand_computed(spark):
    """Digit runs collapse to <#> (ASCII-only by design); counts and
    first-seen exemplar per (appname, template)."""
    from syslog_loose_spark.operators.aggregate import message_templates

    rows = [
        (0, "sshd", "connect from 10.1.2.3 port 51234"),
        (1, "sshd", "connect from 192.168.0.9 port 22"),
        (2, "sshd", "key exchange done"),
        (3, "cron", "job 17 finished in 42ms"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, appname STRING, msg STRING")
    out = {(r["appname"], r["template"]): r
           for r in message_templates(df).collect()}
    conn = out[("sshd", "connect from <#>.<#>.<#>.<#> port <#>")]
    assert conn["n_msgs"] == 2 and conn["first_seen_doc"] == 0
    assert out[("sshd", "key exchange done")]["n_msgs"] == 1
    assert out[("cron", "job <#> finished in <#>ms")]["first_seen_doc"] == 3
    assert len(out) == 3


def test_rate_anomalies_hand_computed(spark):
    """A planted 3x burst hour flags under factor=2; the steady hours
    do not; cross-multiplied integer predicate verified by hand."""
    import datetime as dt

    from syslog_loose_spark.operators.aggregate import rate_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    # type 'a': 2 events/hour for 4 hours, then a 9-event burst hour
    for h in range(4):
        for k in range(2):
            rows.append((dt.datetime(2024, 1, 1, h, k), "a"))
    for k in range(9):
        rows.append((dt.datetime(2024, 1, 1, 4, k), "a"))
    # type 'b': flat 3/hour for 3 hours — never anomalous
    for h in range(3):
        for k in range(3):
            rows.append((dt.datetime(2024, 1, 1, h, k), "b"))
    df = spark.createDataFrame(rows, "ts TIMESTAMP, event_type STRING")
    out = {(r["event_type"], r["hour"].hour): r
           for r in rate_anomalies(df, factor=2).collect()}
    # a: total 17 over 5 hours; burst hour 9*5=45 > 2*17=34 -> flag
    assert out[("a", 4)]["is_anomaly"] == 1
    assert out[("a", 4)]["key_total"] == 17 and out[("a", 4)]["n_hours"] == 5
    for h in range(4):
        assert out[("a", h)]["is_anomaly"] == 0   # 2*5=10 <= 34
    for h in range(3):
        assert out[("b", h)]["is_anomaly"] == 0   # 3*3=9 <= 2*9=18


def test_tfidf_top_terms_hand_computed(spark):
    """Integer millinat idf and fully-integer scores verified by hand
    on a 5-doc corpus, including the (score DESC, term ASC) tie-break
    between two equal-idf singleton terms."""
    from syslog_loose_spark.functions.text import tfidf_top_terms

    rows = [(1, "apple apple banana"), (2, "banana cherry"),
            (3, "cherry cherry cherry durian"), (4, "banana"),
            (5, "apple durian")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {(r["doc_id"], r["rank"]): r
           for r in tfidf_top_terms(df, k=2).collect()}
    # n_docs=5; df: apple 2, banana 3, cherry 2, durian 2
    # idf_mn: ln(5/2)*1000 -> 916; ln(5/3)*1000 -> 511
    assert out[(1, 1)]["term"] == "apple" and out[(1, 1)]["score"] == 1832
    assert out[(1, 2)]["term"] == "banana" and out[(1, 2)]["score"] == 511
    assert out[(2, 1)]["term"] == "cherry" and out[(2, 1)]["score"] == 916
    assert out[(3, 1)]["term"] == "cherry" and out[(3, 1)]["score"] == 2748
    assert out[(3, 2)]["term"] == "durian"
    assert out[(4, 1)]["term"] == "banana"
    # the tie: apple and durian both score 916 -> term ASC breaks it
    assert out[(5, 1)]["term"] == "apple" and out[(5, 2)]["term"] == "durian"
    assert out[(5, 1)]["idf_mn"] == 916


def test_bigram_pmi_hand_computed(spark):
    """Millinat PMI on a 2-doc corpus small enough to enumerate: counts
    a:3 b:3 c:1 (T=7), pairs (a,b):3 (b,a):1 (b,c):1 (B=5).  (a,b) and
    (b,c) tie exactly at ln(49/15) -> the (w1, w2) tie-break orders
    (a,b) first.  Expected values recomputed with math.log in the SAME
    sum-of-logs term order as both engines."""
    import math

    from syslog_loose_spark.functions.text import bigram_pmi_top

    df = spark.createDataFrame([(1, "a b a b"), (2, "a b c")],
                               "doc_id LONG, text STRING")
    out = bigram_pmi_top(df, k=3, min_count=1).collect()

    def mn(cxy, cx, cy, t=7.0, b=5.0):
        return round((math.log(cxy) + 2.0 * math.log(t) - math.log(b)
                      - math.log(cx) - math.log(cy)) * 1000)

    assert [(r["w1"], r["w2"], r["n_pair"], r["pmi_mn"]) for r in out] == [
        ("a", "b", 3, mn(3, 3, 3)),      # 1184
        ("b", "c", 1, mn(1, 3, 1)),      # 1184 (exact tie, w1 breaks)
        ("b", "a", 1, mn(1, 3, 3)),      # 85
    ]
    assert out[0]["pmi_mn"] == out[1]["pmi_mn"] == 1184


def test_heavy_hitters_matches_naive_any_partitioning(spark):
    """The two-pass MG candidates + exact recount must equal the naive
    full groupBy-HAVING regardless of partition layout (the MG candidate
    SET is arrival-order-dependent; the final output must not be), with
    a capacity small enough to force the batch-decrement eviction."""
    import random
    from pyspark.sql import functions as F
    from syslog_loose_spark.functions.text import heavy_hitter_words

    rng = random.Random(17)
    vocab = ["w%d" % i for i in range(30)]
    # two planted heavy words + a long tail
    rows = [(i, " ".join(
        (["hot", "warm"] if i % 2 == 0 else ["hot"])
        + [rng.choice(vocab) for _ in range(20)]))
        for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    thr = 40_000  # 4% of tokens
    naive_tokens = df.select(F.explode(F.split("text", " ")).alias("wd"))
    total = naive_tokens.count()
    naive = {(r["wd"], r["n"]) for r in
             naive_tokens.groupBy("wd").agg(F.count(F.lit(1)).alias("n"))
             .where(F.lit(1_000_000) * F.col("n") >= thr * F.lit(total))
             .collect()}
    assert naive, "fixture must produce at least one heavy hitter"
    for parts in (1, 7):
        got = {(r["word"], r["n"]) for r in
               heavy_hitter_words(df.repartition(parts), thr_ppm=thr,
                                  capacity=40).collect()}
        assert got == naive
    # eviction actually exercised: capacity 30 < vocab size 32, still a
    # superset guarantee because 30 >= 1e6/thr = 25
    got = {(r["word"], r["n"]) for r in
           heavy_hitter_words(df.repartition(3), thr_ppm=thr,
                              capacity=30).collect()}
    assert got == naive


def test_calibrated_quality_cut_threshold_contract(spark):
    """kept == 1 exactly for docs whose integer mean-surprisal score is
    >= T, where T is the max score keeping at least ceil(keep*n/1e6)
    docs — recomputed per-row in Python from the operator's own scores."""
    import math
    from syslog_loose_spark.functions.text import calibrated_quality_cut

    rows = [(i, " ".join(["common"] * 5 + ["rare%d" % (i * 7 + j)
                                           for j in range(i % 4)]))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = calibrated_quality_cut(df, keep_ppm=600_000).collect()
    assert len(out) == 40
    scores = sorted((r["score"] for r in out), reverse=True)
    target = math.ceil(600_000 * len(out) / 1_000_000)
    thr = scores[target - 1]
    for r in out:
        assert r["kept"] == (1 if r["score"] >= thr else 0), r
    n_kept = sum(r["kept"] for r in out)
    assert n_kept >= target  # ties may overshoot, never undershoot


def test_bpe_merge_step_greedy_semantics(spark):
    """Top pair is (count DESC, w1, w2)-deterministic; merges are greedy
    left-to-right non-overlapping: [a,a,a] merges ONCE, [a,a,a,a] twice."""
    from syslog_loose_spark.functions.text import bpe_merge_step

    rows = [(0, "a a a"), (1, "a a a a"), (2, "a a x a a"), (3, "b c")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in bpe_merge_step(df, min_count=2).collect()}
    assert out[0]["w1"] == "a" and out[0]["w2"] == "a"
    assert out[0]["n_merges"] == 1 and out[0]["n_tokens_after"] == 2
    assert out[1]["n_merges"] == 2 and out[1]["n_tokens_after"] == 2
    assert out[2]["n_merges"] == 2 and out[2]["n_tokens_after"] == 3
    assert out[3]["n_merges"] == 0 and out[3]["n_tokens_after"] == 2


def test_bpe_train_matches_python_reference(spark):
    """The n-round trainer must reproduce a straight-line Python BPE
    (greedy scan, (count DESC, w1, w2) ties) exactly: same merge table,
    same final token sequences — including merged symbols re-merging in
    later rounds."""
    from collections import Counter
    from syslog_loose_spark.functions.text import bpe_train

    texts = {0: "a b a b a b c", 1: "a b c a b c", 2: "x a b y",
             3: "c c c c", 4: "solo", 5: ""}

    def ref(docs, n_steps, min_count):
        docs = {k: v.split(" ") for k, v in docs.items()}
        merges = []
        for step in range(n_steps):
            pc = Counter()
            for d in docs.values():
                for i in range(len(d) - 1):
                    pc[(d[i], d[i + 1])] += 1
            cands = sorted(((c, w1, w2) for (w1, w2), c in pc.items()
                            if c >= min_count),
                           key=lambda t: (-t[0], t[1], t[2]))
            if not cands:
                break
            c, w1, w2 = cands[0]
            for k, d in docs.items():
                out, i = [], 0
                while i < len(d):
                    if (i + 1 < len(d) and d[i] == w1 and d[i + 1] == w2):
                        out.append(w1 + "\x1f" + w2)
                        i += 2
                    else:
                        out.append(d[i])
                        i += 1
                docs[k] = out
            merges.append((step, w1, w2, c))
        return merges, docs

    df = spark.createDataFrame(list(texts.items()),
                               "doc_id LONG, text STRING")
    for steps in (1, 4):
        exp_merges, exp_docs = ref(texts, steps, 2)
        got_merges, out = bpe_train(df, n_steps=steps, min_count=2)
        assert got_merges == exp_merges
        got_docs = {r["doc_id"]: list(r["tokens"]) for r in out.collect()}
        assert got_docs == exp_docs
        assert all(r["n_tokens"] == len(exp_docs[r["doc_id"]])
                   for r in out.collect())


def _ref_bpe_batched(texts, n_rounds, batch_max, min_count, fetch):
    """Straight-line Python replay of bpe_train_batched's contract:
    rank by (count DESC, w1, w2), cut to top ``fetch``, greedy
    symbol-disjoint selection, apply the batch left-to-right greedy."""
    from collections import Counter

    docs = {k: v.split(" ") for k, v in texts.items()}
    merges = []
    for rnd in range(n_rounds):
        pc = Counter()
        for d in docs.values():
            for i in range(len(d) - 1):
                pc[(d[i], d[i + 1])] += 1
        ranked = sorted(((c, w1, w2) for (w1, w2), c in pc.items()
                         if c >= min_count),
                        key=lambda t: (-t[0], t[1], t[2]))[:fetch]
        used, sel = set(), []
        for c, w1, w2 in ranked:
            if len(sel) >= batch_max:
                break
            if w1 in used or w2 in used:
                continue
            sel.append((w1, w2, c))
            used.update((w1, w2))
        if not sel:
            break
        for w1, w2, c in sel:
            for k, d in docs.items():
                out, i = [], 0
                while i < len(d):
                    if i + 1 < len(d) and d[i] == w1 and d[i + 1] == w2:
                        out.append(w1 + "\x1f" + w2)
                        i += 2
                    else:
                        out.append(d[i])
                        i += 1
                docs[k] = out
            merges.append((rnd, w1, w2, c))
    return merges, docs


def test_bpe_train_batched_matches_python_reference(spark):
    """Batched trainer vs a straight-line Python replay of the batched
    contract, on a fixture engineered so rounds genuinely select
    MULTIPLE pairs, the disjointness skip fires ((b,c) shares b with
    the higher-ranked (a,b)), and a merged symbol re-merges next
    round."""
    from syslog_loose_spark.functions.text import bpe_train_batched

    texts = {0: "a b a b c d c d", 1: "a b c d b c",
             2: "e f e f a b", 3: "b c b c", 4: "g", 5: ""}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id LONG, text STRING")
    for n_rounds, batch in ((1, 3), (2, 2), (3, 3)):
        fetch = 3 * batch + 8
        exp_merges, exp_docs = _ref_bpe_batched(
            texts, n_rounds, batch, 2, fetch)
        got_merges, out = bpe_train_batched(
            df, n_rounds=n_rounds, batch_max=batch, min_count=2)
        assert got_merges == exp_merges, (n_rounds, batch)
        got_docs = {r["doc_id"]: list(r["tokens"]) for r in out.collect()}
        assert got_docs == exp_docs, (n_rounds, batch)


def test_bpe_train_batched_seeded_random_corpora(spark):
    """Seeded randomized differential: 8 random corpora (small alphabet
    so pair counts collide and tie-breaks/disjointness-skips fire
    constantly) x varying (n_rounds, batch_max) vs the pure-Python
    replay of the batched contract."""
    import random

    from syslog_loose_spark.functions.text import bpe_train_batched

    rng = random.Random(11)
    alpha = ["a", "b", "c", "d", "e"]
    for trial in range(8):
        texts = {i: " ".join(rng.choice(alpha)
                             for _ in range(rng.randint(0, 24)))
                 for i in range(14)}
        n_rounds = rng.randint(1, 3)
        batch = rng.randint(1, 4)
        fetch = 3 * batch + 8
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id LONG, text STRING")
        exp_merges, exp_docs = _ref_bpe_batched(
            texts, n_rounds, batch, 2, fetch)
        got_merges, out = bpe_train_batched(
            df, n_rounds=n_rounds, batch_max=batch, min_count=2)
        assert got_merges == exp_merges, (trial, n_rounds, batch)
        got_docs = {r["doc_id"]: list(r["tokens"])
                    for r in out.collect()}
        # empty docs: Spark split('') and the replay both yield ['']
        assert got_docs == exp_docs, (trial, n_rounds, batch)


def test_bpe_train_batched_batch1_equals_exact_trainer(spark):
    """With batch_max=1 the selection rule degenerates to bpe_train's
    top-1 — merge table and final tokens must be IDENTICAL (the
    differential anchor between the batched and exact trainers)."""
    from syslog_loose_spark.functions.text import bpe_train, bpe_train_batched

    texts = {0: "a b a b a b c", 1: "a b c a b c", 2: "x a b y",
             3: "c c c c", 4: "solo", 5: ""}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id LONG, text STRING")
    exact_merges, exact_out = bpe_train(df, n_steps=4, min_count=2)
    # checkpoint_every=1 exercises lineage truncation every round; it
    # must be value-invisible (localCheckpoint cuts the plan, not data)
    got_merges, got_out = bpe_train_batched(
        df, n_rounds=4, batch_max=1, min_count=2, checkpoint_every=1)
    # exact trainer numbers merges by step; batched by round — with
    # batch 1 those coincide, so the tuples compare directly
    assert got_merges == exact_merges
    assert ({r["doc_id"]: list(r["tokens"]) for r in got_out.collect()}
            == {r["doc_id"]: list(r["tokens"])
                for r in exact_out.collect()})


def test_bpe_train_batched_one_collect_per_round(spark, monkeypatch):
    """The whole point of batching: driver round-trips scale with
    ROUNDS, not merges.  6 merges at batch_max=3 must cost exactly 2
    pair-ranking collects (vs 6 for the exact trainer)."""
    # patch the CONCRETE class (pyspark 4: pyspark.sql.DataFrame is an
    # abstract facade; instances are classic.dataframe.DataFrame)
    from pyspark.sql.classic.dataframe import DataFrame

    from syslog_loose_spark.functions.text import bpe_train_batched

    texts = {0: "a b a b c d c d e f e f", 1: "a b c d e f a b c d e f"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id LONG, text STRING")
    calls = {"n": 0}
    orig = DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting)
    merges, out = bpe_train_batched(df, n_rounds=2, batch_max=3,
                                    min_count=2)
    assert calls["n"] == 2
    # round 0 batches THREE disjoint merges in one job; round 1's
    # second candidate (cd,ef) shares cd with (ab,cd) and is skipped —
    # 4 merges for 2 driver round-trips (exact trainer: 4 jobs)
    assert merges == [(0, "a", "b", 4), (0, "c", "d", 4),
                      (0, "e", "f", 4), (1, "a\x1fb", "c\x1fd", 3)]
    monkeypatch.undo()
    out.collect()  # plan still executes after training


def test_streaming_heavy_hitters_bounded_state(spark, tmp_path):
    """Sharded streaming Misra-Gries: the planted heavy word survives
    every micro-batch with an estimate inside the MG undercount bound
    (true - shard_tokens/(capacity+1), true]; the per-shard candidate
    set never exceeds capacity even though distinct words far exceed
    it; totals accumulate across batches."""
    import time as _time

    from syslog_loose_spark.streaming.stream import streaming_heavy_hitters

    src = str(tmp_path / "hh_src")
    os.makedirs(src)
    # 3 micro-batches; "hot" appears 40x/batch, 200 tail words once each
    for c in range(3):
        rows = [(i, "hot " * 40 + " ".join(
            "t%d_%d" % (c, 50 * i + j) for j in range(50)))
            for i in range(4)]
        spark.createDataFrame(rows, "doc_id LONG, text STRING") \
            .coalesce(1).write.parquet(f"{src}/c{c}", mode="overwrite")
        _time.sleep(0.05)

    stream = (spark.readStream.schema("doc_id LONG, text STRING")
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/c*"))
    cap = 16
    q = (streaming_heavy_hitters(stream, capacity=cap, n_shards=4)
         .writeStream.format("memory").queryName("hh_out")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from hh_out").collect()
    assert rows
    last = max(r["batches"] for r in rows if r["word"] == "hot")
    assert last == 3
    final = [r for r in rows if r["word"] == "hot" and r["batches"] == 3]
    assert final, "heavy word missing from the final sketch"
    r = final[0]
    true_hot = 3 * 4 * 40   # plus the trailing-space artifact words
    assert r["est"] <= true_hot
    assert r["est"] > true_hot - r["shard_tokens"] / (cap + 1)
    # bounded state: no shard ever reports more than capacity candidates
    from collections import Counter
    per = Counter((r["shard"], r["batches"]) for r in rows)
    assert max(per.values()) <= cap


def test_semantic_dedup_planted_copies(spark):
    """SemDeDup one-shot rule: a scaled copy (cosine 1.0) with a HIGHER
    id must come back kept=0 — the scale-invariant cosine profile lands
    it in the same cell as its original (power-of-two scaling is exact
    in IEEE arithmetic, so the assignment sims are bit-identical) where
    the lower-id twin dominates it.  Every input row gets exactly one
    output row, and each cell's minimum id always survives (nothing can
    dominate it)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .where(F.col("vec_id") < 60)
    base = emb.select("vec_id", F.expr(
        "transform(embedding, x -> cast(x as double))").alias("embedding"))
    dup = base.select((F.col("vec_id") + 1000).alias("vec_id"), F.expr(
        "transform(embedding, x -> x * 2.0d)").alias("embedding"))
    out = {r["vec_id"]: (r["cell"], r["kept"])
           for r in S.semantic_dedup(base.union(dup), threshold=0.99,
                                     n_cells=4).collect()}
    assert len(out) == 120
    for i in range(60):
        assert out[i + 1000][1] == 0, i           # planted copy dropped
        assert out[i + 1000][0] == out[i][0], i   # same cell as original
    mins = {}
    for vid, (cell, _) in out.items():
        mins[cell] = min(mins.get(cell, vid), vid)
    for cell, vid in mins.items():
        assert out[vid][1] == 1, (cell, vid)


def test_nb_classifier_matches_python_reference(spark):
    """Differential vs a direct Python replay of the millinat contract:
    add-one multinomial NB on the corpus's own stopword-vote labels, ONE
    ln per model parameter quantized to integer millinats, integer score
    sums, (score, lang)-lexicographic struct-max tie-break.  The unseen
    default ln(1/(tot+V)) IS the add-one formula at c=0, so the replay
    uses one uniform expression."""
    import math
    from collections import Counter, defaultdict

    from syslog_loose_spark.functions.text import (
        DE_STOPWORDS, EN_STOPWORDS, nb_lang_classifier)

    texts = [
        "the cat sat on the mat",
        "a dog and a cat",
        "der hund und die katze hund katze hund katze",
        "das ist ein hund katze hund katze",
        "cat dog mat",              # no stopwords -> unknown label
        "hund katze maus",          # unknown label, NB re-scores as de
        "the der cat hund",         # en/de stopword tie -> unknown
        "the hund katze hund katze",  # labeled en, heavy de body -> de
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def label(t):
        w = t.lower().split(" ")
        en = sum(x in EN_STOPWORDS for x in w)
        de = sum(x in DE_STOPWORDS for x in w)
        if en > de and en > 0:
            return "en"
        if de > en and de > 0:
            return "de"
        return "unknown"

    labels = {i: label(t) for i, t in enumerate(texts)}
    cwc = defaultdict(Counter)
    for i, t in enumerate(texts):
        cwc[labels[i]].update(t.split(" "))
    vocab = len({w for c in cwc.values() for w in c})
    n = len(texts)

    def mn(x):
        return int(round(math.log(x) * 1000))

    expected = {}
    for i, t in enumerate(texts):
        scores = []
        for lang, counts in cwc.items():
            tot = sum(counts.values())
            s = mn(sum(1 for v in labels.values() if v == lang) / n)
            for w, tf in Counter(t.split(" ")).items():
                s += tf * mn((counts.get(w, 0) + 1) / (tot + vocab))
            scores.append((s, lang))
        score, pred = max(scores)
        expected[i] = (labels[i], pred, score, int(labels[i] == pred))

    got = {r["doc_id"]: (r["label_lang"], r["pred_lang"], r["score_mn"],
                         r["agree"])
           for r in nb_lang_classifier(df).collect()}
    assert got == expected
    assert {v[0] for v in expected.values()} == {"en", "de", "unknown"}
    assert any(v[3] == 0 for v in expected.values()), \
        "fixture should exercise the disagreement surface"


def test_bpe_encode_reproduces_train_tokens(spark):
    """Train->export->apply faithfulness: encoding the training corpus
    with bpe_train's own merge list (including any second-order merges)
    reproduces bpe_train's tokens_df byte-for-byte, and the chained
    replace applies merges in LIST ORDER (a later merge can consume an
    earlier merge's \\x1f symbol)."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import bpe_encode, bpe_train

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    try:
        merges, toks = bpe_train(docs, n_steps=3)
        assert merges, "fixture must discover at least one merge"
        train_out = {r["doc_id"]: (tuple(r["tokens"]), r["n_tokens"])
                     for r in toks.collect()}
    finally:
        unpersist_tracked()
    enc_out = {r["doc_id"]: (tuple(r["tokens"]), r["n_tokens"])
               for r in bpe_encode(docs, merges).collect()}
    assert enc_out == train_out

    # order sensitivity: a second-order merge consuming \x1f symbols
    df = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    two = bpe_encode(df, [("a", "b"), ("a\x1fb", "c")]).collect()[0]
    assert tuple(two["tokens"]) == ("a\x1fb\x1fc",)
    # reversed order: the second-order pattern never exists yet
    rev = bpe_encode(df, [("a\x1fb", "c"), ("a", "b")]).collect()[0]
    assert tuple(rev["tokens"]) == ("a\x1fb", "c")


def test_weighted_sample_invariants(spark):
    """Deterministic E-S sampler: (a) weight<=0 rows never selected,
    (b) n=10 selection is a prefix of n=50 (sorted-key property),
    (c) weights at/above cap saturate to identical keys, (d) rerun
    stability, (e) on a half-weight-32/half-weight-1 corpus the heavy
    rows dominate the sample (fixed md5 draws — no flakiness)."""
    from pyspark.sql import functions as F2
    from syslog_loose_spark.functions.sampling import weighted_sample

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    d = docs.withColumn("wt", F2.pmod(F2.col("n_chars"), F2.lit(7)))
    s50 = weighted_sample(d, 50, "wt").collect()
    assert len(s50) == 50
    assert all(r["wt"] >= 1 for r in s50)
    ids50 = [r["doc_id"] for r in s50]
    ids10 = [r["doc_id"] for r in weighted_sample(d, 10, "wt").collect()]
    assert set(ids10) <= set(ids50)
    assert ids50 == [r["doc_id"]
                     for r in weighted_sample(d, 50, "wt").collect()]

    capped = d.withColumn("wt", F2.when(F2.col("doc_id") % 2 == 0,
                                        F2.lit(40)).otherwise(F2.lit(32)))
    keys = {r["doc_id"]: r["sample_key"]
            for r in weighted_sample(capped, 500, "wt", cap=32).collect()}
    flat = d.withColumn("wt", F2.lit(32))
    keys_flat = {r["doc_id"]: r["sample_key"]
                 for r in weighted_sample(flat, 500, "wt", cap=32)
                 .collect()}
    assert keys == keys_flat  # 40 clamps to 32: identical draws

    skew = d.withColumn("wt", F2.when(F2.col("doc_id") % 2 == 0,
                                      F2.lit(32)).otherwise(F2.lit(1)))
    heavy = sum(1 for r in weighted_sample(skew, 50, "wt").collect()
                if r["doc_id"] % 2 == 0)
    assert heavy >= 40, heavy  # E[heavy] ~ 48.5 of 50


def test_source_kl_hand_computed(spark):
    """Two planted sources: one mirrors the corpus mixture (KL near 0),
    one concentrates on its own vocabulary (strictly larger KL); values
    replayed exactly through the millinat quantization contract."""
    import math
    from collections import Counter

    from syslog_loose_spark.functions.text import source_kl_divergence

    rows = [(1, "a a b", "mix"), (2, "b a a", "mix"),
            (3, "z z z", "zed")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, "
                                     "source STRING")
    sw = Counter()
    for _, t, s in rows:
        for w in t.split(" "):
            sw[(s, w)] += 1
    ts = Counter()
    cw = Counter()
    for (s, w), c in sw.items():
        ts[s] += c
        cw[w] += c
    t = sum(cw.values())

    def mn(x):
        return int(round(math.log(x) * 1000))

    exp = {}
    for s in ts:
        num = sum(c * (mn(c / ts[s]) - mn(cw[w] / t))
                  for (s2, w), c in sw.items() if s2 == s)
        exp[s] = (ts[s], (num - (((num % ts[s]) + ts[s]) % ts[s]))
                  // ts[s])
    got = {r["source"]: (r["n_tokens"], r["kl_mn"])
           for r in source_kl_divergence(df).collect()}
    assert got == exp
    assert got["zed"][1] > got["mix"][1] >= 0


def test_calibrated_quality_cut_by_per_group_contract(spark):
    """Stratified calibration: on a corpus where one source's docs all
    score far below the other's, the GLOBAL cut prunes the weak source
    wholesale while the per-group cut keeps >= keep_ppm of EVERY
    group; scores themselves stay corpus-global (identical to the
    global variant's)."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import (
        calibrated_quality_cut, calibrated_quality_cut_by)

    rows = [(i, "common common common words here", "good")
            for i in range(10)]
    rows += [(100 + i, f"rare{i} odd{i} gibberish{i}", "noise")
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, "
                                     "source STRING")
    try:
        by = calibrated_quality_cut_by(df, keep_ppm=600_000).collect()
        glob = {r["doc_id"]: r["score"]
                for r in calibrated_quality_cut(df, keep_ppm=600_000)
                .collect()}
    finally:
        unpersist_tracked()
    assert {r["doc_id"]: r["score"] for r in by} == glob
    for src in ("good", "noise"):
        grp = [r for r in by if r["source"] == src]
        keep = sum(r["kept"] for r in grp) / len(grp)
        assert keep >= 0.6, (src, keep)
    # the global cut at the same ppm keeps NO noise doc (scores are
    # strictly below every good doc's) — the over-pruning the
    # stratified walk exists to prevent
    noise_scores = [r["score"] for r in by if r["source"] == "noise"]
    good_scores = [r["score"] for r in by if r["source"] == "good"]
    assert max(noise_scores) < min(good_scores)


def test_dedup_inner_lines_order_and_idempotency(spark):
    """First occurrence survives in place, later repeats drop, unique
    lines (including the empty line) pass through; applying the
    operator twice is a no-op."""
    from syslog_loose_spark.functions.text import dedup_inner_lines

    text = "a\nb\na\n\nc\nb\na\n"
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    out = dedup_inner_lines(df).collect()[0]
    assert out["text"] == "a\nb\n\nc"
    assert out["n_dropped"] == 4  # a, b, a, and the trailing '' repeat
    again = dedup_inner_lines(
        spark.createDataFrame([(1, out["text"])],
                              "doc_id LONG, text STRING")).collect()[0]
    assert again["text"] == out["text"] and again["n_dropped"] == 0


def test_mix_ratios_hand_computed(spark):
    """Integer prescription: over-target source gets floor(target * T /
    T_s) ppm, under-target saturates at 1e6, untargeted keeps 1e6."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import mix_ratios_for_targets

    rows = [(1, "w " * 79 + "w", "big"),      # 80 tokens
            (2, "w " * 15 + "w", "small"),    # 16 tokens
            (3, "w w w w", "other")]          # 4 tokens
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, "
                                     "source STRING")
    try:
        got = {r["source"]: (r["n_tokens"], r["ratio_ppm"])
               for r in mix_ratios_for_targets(
                   df, [("big", 100_000), ("small", 900_000)]).collect()}
    finally:
        unpersist_tracked()
    t = 100
    assert got["big"] == (80, (100_000 * t) // 80)     # 125000
    assert got["small"] == (16, 1_000_000)             # under target
    assert got["other"] == (4, 1_000_000)              # untargeted


def test_bigram_backoff_matches_python_reference(spark):
    """Count-pruned stupid backoff vs a direct Python replay of the
    millinat contract: surviving bigrams score ln(c_vw/c_v), pruned
    transitions score the integer alpha + unigram, the first token
    scores unigram-only, and hits count positions (weighted by tf).
    The fixture covers hit, backoff, single-token, and repeated-bigram
    paths."""
    import math
    from collections import Counter

    from syslog_loose_spark.functions.text import (
        BACKOFF_ALPHA_MN, bigram_backoff_logprob)

    texts = ["a b a b c", "a b a b", "c c a", "b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING")
    got = {r["doc_id"]: (r["n_tokens"], r["n_hits"], r["sum_mn"],
                         r["mean_mn"])
           for r in bigram_backoff_logprob(df, min_count=2).collect()}

    uni, bg = Counter(), Counter()
    for t in texts:
        ws = t.split(" ")
        uni.update(ws)
        bg.update(zip(ws, ws[1:]))
    tot = sum(uni.values())

    def mn(x):
        return int(round(math.log(x) * 1000))

    mnu = {w: mn(c / tot) for w, c in uni.items()}
    mnbg = {p: mn(c / uni[p[0]]) for p, c in bg.items() if c >= 2}
    exp = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        sm, hits = mnu[ws[0]], 0
        for p in zip(ws, ws[1:]):
            if p in mnbg:
                sm += mnbg[p]
                hits += 1
            else:
                sm += BACKOFF_ALPHA_MN + mnu[p[1]]
        exp[i] = (len(ws), hits, sm, round(sm / len(ws), 4))
    assert got == exp
    assert any(v[1] == 0 for v in exp.values())   # backoff-only doc
    assert any(v[1] >= 3 for v in exp.values())   # hit-heavy doc


def test_sq8_quantize_matches_python_replay(spark):
    """Exact replay of the SQ8 contract in pure Python (IEEE doubles,
    same op order): codes, the in-range invariant, the constant-
    dimension zero-code path, and the microunit error sum."""
    rows = [(i, [float(i % 7) - 3.0, 0.5, float((i * 3) % 11)])
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    from syslog_loose_spark.functions.similarity import sq8_quantize

    got = {r["vec_id"]: (list(r["codes"]), r["sum_abs_err_um"])
           for r in sq8_quantize(df).collect()}

    import math

    def rnd(x):
        # engine ROUND is half-UP for the non-negative operand; Python's
        # round() is half-even and would diverge on exact .5 codes
        return int(math.floor(x + 0.5))

    vecs = {i: v for i, v in rows}
    dims = len(rows[0][1])
    mn = [min(v[j] for v in vecs.values()) for j in range(dims)]
    mx = [max(v[j] for v in vecs.values()) for j in range(dims)]
    exp = {}
    for i, v in vecs.items():
        codes, err = [], 0
        for j in range(dims):
            if mx[j] == mn[j]:
                codes.append(0)
                err += rnd(abs(v[j] - mn[j]) * 1000000.0)
            else:
                c = rnd((v[j] - mn[j]) * 255.0 / (mx[j] - mn[j]))
                codes.append(c)
                xhat = mn[j] + c * (mx[j] - mn[j]) / 255.0
                err += rnd(abs(v[j] - xhat) * 1000000.0)
        exp[i] = (codes, err)
    assert got == exp
    assert all(0 <= c <= 255 for cs, _ in got.values() for c in cs)
    assert all(cs[1] == 0 for cs, _ in got.values())  # constant dim


def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee: two docs sharing a run of >= w + k - 1
    tokens share at least one fingerprint — even when the copied
    passage sits inside otherwise DIFFERENT documents (the case a
    global MinHash sketch is allowed to miss).  Also: the paper's
    density bound (roughly 2/(w+1) of positions selected, here checked
    loosely) and the short-doc exclusion."""
    from syslog_loose_spark.functions.dedup import (
        unpersist_tracked, winnow_fingerprints, winnow_near_dups)

    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, "one two three " + passage + " four five six"),
        (2, "seven eight nine ten " + passage + " eleven"),
        (3, "totally unrelated words here nothing shared at all"),
        (4, "tiny doc"),  # < k + w - 1 tokens -> no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    try:
        pairs = {(r["a"], r["b"]): r["n_shared"]
                 for r in winnow_near_dups(df, k=4, w=5,
                                           min_shared=1).collect()}
        assert (1, 2) in pairs          # the guarantee
        assert not any(3 in p or 4 in p for p in pairs), pairs

        fps = winnow_fingerprints(df, k=4, w=5).collect()
        n1 = sum(1 for r in fps if r["id"] == 1)
        n_grams_1 = len(rows[0][1].split(" ")) - 4 + 1
        assert 1 <= n1 <= n_grams_1  # distinct minima, far below grams
        assert not any(r["id"] == 4 for r in fps)
    finally:
        unpersist_tracked()


def test_winnow_bucket_cap_drops_degenerate(spark):
    """A fingerprint shared by more docs than max_bucket_size drops
    WHOLE (no partial bucket), so the degenerate all-pairs blowup
    never reaches the join; distinct content is unaffected."""
    from syslog_loose_spark.functions.dedup import (
        unpersist_tracked, winnow_near_dups)

    same = "a b c d e f g h i j"
    rows = [(i, same) for i in range(20)]
    rows += [(100, "p q r s t u v w x y z " + same),
             (101, "pp qq rr ss tt uu vv ww xx yy zz " + same)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    try:
        pairs = {(r["a"], r["b"])
                 for r in winnow_near_dups(df, k=4, w=5, min_shared=1,
                                           max_bucket_size=10).collect()}
        # the 20 identical docs share every fingerprint -> buckets of
        # >= 20 > 10 -> dropped whole; no pair among them survives, and
        # none of them pairs with 100/101 either
        assert not any(a < 20 or b < 20 for a, b in pairs), pairs
        # 100/101 still pair: their differing prefixes shift the window
        # minima, selecting passage grams the identical docs did NOT
        # select — those fingerprints live in a size-2 bucket, so the
        # cap cannot (and should not) sever a genuinely shared run
        assert pairs == {(100, 101)}, pairs
    finally:
        unpersist_tracked()


def test_zipf_slope_hand_computed(spark):
    """Integer-regression replay on a constructed true-Zipf profile:
    counts 840/420/280/210 are exactly 840/r over ranks 1..4, so
    ln(freq) = ln(840) - ln(rank) and the quantized slope must land at
    -1 within quantization distance; the four sums replay exactly."""
    import math

    from syslog_loose_spark.functions.text import zipf_slope

    docs = []
    did = 0
    for w, c in (("w1", 840), ("w2", 420), ("w3", 280), ("w4", 210)):
        docs.append((did, " ".join([w] * c)))
        did += 1
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    row = zipf_slope(df, top_n=1000).collect()[0]

    mn = lambda v: int(round(math.log(v) * 1000))
    xs = [mn(r) for r in (1, 2, 3, 4)]
    ys = [mn(c) for c in (840, 420, 280, 210)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    exp_slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert (row["n_types"], row["sx"], row["sy"], row["sxy"],
            row["sxx"]) == (n, sx, sy, sxy, sxx)
    assert row["slope"] == exp_slope
    assert -1.05 < row["slope"] < -0.95  # halving counts per rank ~ -1


def test_jsonl_ingest_dead_letters_corrupt_lines(spark, tmp_path):
    """JSONL ingestion: well-formed lines land in `good` with the
    caller's exact schema; truncated/garbage lines land whole in the
    dead-letter frame (raw text intact — the untrimmed-input fallback
    contract); nothing is dropped."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from syslog_loose_spark.sources.jsonl import read_jsonl

    p = tmp_path / "in.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world"}',
        '{"doc_id": 2, "text": "ok"}',
        '{"doc_id": 3, "text": "truncat',          # cut mid-string
        'not json at all',
        '{"doc_id": 4, "text": "fine again"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    good, dead = read_jsonl(spark, str(p), schema)
    g = {r["doc_id"]: r["text"] for r in good.collect()}
    d = sorted(r["raw"] for r in dead.collect())
    assert g == {1: "hello world", 2: "ok", 4: "fine again"}
    assert d == sorted([lines[2], lines[3]])
    assert good.columns == ["doc_id", "text"]  # corrupt col pruned


def test_csv_ingest_dead_letters_bad_typed_fields(spark, tmp_path):
    """CSV ingestion: a row whose typed field fails to parse dead-
    letters with its raw text; clean rows keep their types."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from syslog_loose_spark.sources.jsonl import read_csv_logs

    p = tmp_path / "in.csv"
    p.write_text("1,alpha\nnot_a_number,beta\n3,gamma\n")
    schema = StructType([StructField("id", LongType()),
                         StructField("name", StringType())])
    good, dead = read_csv_logs(spark, str(p), schema)
    g = {r["id"]: r["name"] for r in good.collect()}
    d = [r["raw"] for r in dead.collect()]
    assert g == {1: "alpha", 3: "gamma"}
    assert d == ["not_a_number,beta"]


def test_asof_join_semantics_and_tolerance(spark):
    """Hand-checked as-of contract: latest right row at-or-before each
    left row per key; equality on the timestamp matches; keys with no
    earlier right row get NULLs; tolerance voids stale matches."""
    import datetime as dt

    from syslog_loose_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, ts(10), 7), (2, ts(30), 7), (3, ts(5), 8), (4, ts(50), 9)],
        "event_id LONG, ts TIMESTAMP, user_id LONG")
    right = spark.createDataFrame(
        [(100, ts(10), 7, 1.5), (101, ts(20), 7, 2.5),
         (102, ts(6), 8, 3.5)],
        "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE")
    out = {r["event_id"]: (r["ref_event_id"], r["ref_value"])
           for r in asof_join(left, right, right_cols=("event_id",
                                                       "value"))
           .collect()}
    assert out == {1: (100, 1.5),    # equality matches
                   2: (101, 2.5),    # latest of the two earlier rows
                   3: (None, None),  # right row is LATER -> no match
                   4: (None, None)}  # key has no right rows

    tol = {r["event_id"]: r["ref_event_id"]
           for r in asof_join(left, right, right_cols=("event_id",),
                              tolerance=300).collect()}
    assert tol == {1: 100, 2: None, 3: None, 4: None}  # 2: 10min stale


def test_range_join_binned_matches_plain_inequality(spark):
    """The binned equi-join + containment filter returns exactly the
    rows a plain BETWEEN join would, including intervals that span
    multiple bins (no duplicate emission) and bin-boundary events."""
    import datetime as dt

    from syslog_loose_spark.operators.joins import range_join_binned

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, ts(5), 7), (2, ts(25), 7), (3, ts(61), 7), (4, ts(10), 8)],
        "event_id LONG, ts TIMESTAMP, user_id LONG")
    iv = spark.createDataFrame(
        [(900, ts(0), ts(30), 7),     # spans 4 bins at 600 s
         (901, ts(60), ts(62), 7),
         (902, ts(0), ts(5), 9)],
        "window_id LONG, start TIMESTAMP, end TIMESTAMP, user_id LONG")
    got = sorted((r["event_id"], r["window_id"])
                 for r in range_join_binned(left, iv, bin_seconds=600)
                 .collect())
    assert got == [(1, 900), (2, 900), (3, 901)]
    # duplicate-free even though window 900 covers several bins
    assert len(got) == len(set(got))


def test_token_budget_cut_contract(spark):
    """Token-mass threshold contract: the kept set holds >= budget_ppm
    of corpus TOKENS (ties overshoot, never undershoot), dropping the
    threshold bin would undershoot, and on a corpus where quality
    anti-correlates with length the doc-count cut and the token cut
    genuinely disagree."""
    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.text import (
        calibrated_quality_cut, token_budget_cut)

    # 6 short HIGH-quality docs (common vocab) + 2 long LOW-quality
    rows = [(i, "common common common words") for i in range(6)]
    rows += [(10 + i, " ".join(f"junk{i}x{j}" for j in range(40)))
             for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    try:
        out = token_budget_cut(df, budget_ppm=200_000).collect()
        doc_cut = {r["doc_id"]: r["kept"]
                   for r in calibrated_quality_cut(
                       df, keep_ppm=200_000).collect()}
    finally:
        unpersist_tracked()
    total = sum(r["n_words"] for r in out)
    kept_toks = sum(r["n_words"] for r in out if r["kept"])
    assert 1_000_000 * kept_toks >= 200_000 * total
    # all six short good docs tie at the top score: the token walk must
    # take the WHOLE tie bin (24 tokens = 23% of 104) and stop there
    assert {r["doc_id"] for r in out if r["kept"]} == set(range(6))
    # the doc-count cut at the same ppm keeps the same bin here, but
    # the two walks diverge in mass: 6/8 docs vs 24/104 tokens —
    # kept-token share (23%) is far below kept-doc share (75%)
    assert sum(doc_cut.values()) == 6
    assert kept_toks * 8 < sum(doc_cut.values()) * total / 2


def test_asof_join_matches_pandas_merge_asof(spark):
    """Seeded randomized differential against pandas merge_asof
    (backward, by-key, equality-inclusive) on 400x150 rows across 12
    keys — plus the tolerance leg.  Right-side (key, ts) ties are
    dropped up front (both implementations leave that tie
    unspecified)."""
    import numpy as np
    import pandas as pd

    from syslog_loose_spark.operators.joins import asof_join

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "event_id": np.arange(n_l),
        "ts": base + pd.to_timedelta(
            rng.integers(0, 10 ** 6, n_l), unit="s"),
        "user_id": rng.integers(0, 12, n_l)})
    right = pd.DataFrame({
        "rid": np.arange(1000, 1000 + n_r),
        "ts": base + pd.to_timedelta(
            rng.integers(0, 10 ** 6, n_r), unit="s"),
        "user_id": rng.integers(0, 12, n_r),
        "value": rng.random(n_r).round(3)}) \
        .drop_duplicates(subset=["user_id", "ts"])

    def expected(tolerance=None):
        kw = {}
        if tolerance is not None:
            kw["tolerance"] = pd.Timedelta(seconds=tolerance)
        m = pd.merge_asof(left.sort_values("ts"),
                          right.sort_values("ts"),
                          on="ts", by="user_id", direction="backward",
                          **kw)
        return {int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
                for r in m.itertuples()}

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    for tol in (None, 86_400):
        for salt in (None, 8):   # salted path: same 800 comparisons
            got = {r["event_id"]: r["ref_rid"]
                   for r in asof_join(ldf, rdf, right_cols=("rid",),
                                      tolerance=tol, salt=salt)
                   .select("event_id", "ref_rid").collect()}
            assert got == expected(tol), f"tolerance={tol} salt={salt}"


def test_asof_join_salted_equals_plain_and_guards_names(spark):
    """VERDICT r6 item 6: the opt-in hot-key salt (left spread across S
    sub-partitions, right replicated to all S) must return EXACTLY the
    plain path's rows on a skewed fixture where one key dominates —
    including NULL-match rows and the tolerance leg.  Also pins the
    ADVICE r6 guard: internal staging names colliding with a left
    column raise instead of silently dropping the column."""
    import datetime as dt

    import pytest

    from syslog_loose_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)
    # key 7 dominates (180 of 200 left rows); irregular right stream
    left = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=13 * i + (i % 7)),
          7 if i % 10 else 8) for i in range(200)],
        "event_id LONG, ts TIMESTAMP, user_id LONG")
    right = spark.createDataFrame(
        [(1000 + j, t0 + dt.timedelta(seconds=97 * j), 7 if j % 5 else 8,
          float(j)) for j in range(25)],
        "rid LONG, ts TIMESTAMP, user_id LONG, value DOUBLE")

    for tol in (None, 300):
        plain = sorted(
            (r["event_id"], r["ref_rid"], r["ref_value"])
            for r in asof_join(left, right, right_cols=("rid", "value"),
                               tolerance=tol).collect())
        for s in (1, 4, 16):
            salted = sorted(
                (r["event_id"], r["ref_rid"], r["ref_value"])
                for r in asof_join(left, right,
                                   right_cols=("rid", "value"),
                                   tolerance=tol, salt=s).collect())
            assert salted == plain, f"salt={s} tolerance={tol}"
        # salted output schema carries no staging column
        cols = asof_join(left, right, right_cols=("rid",), salt=4).columns
        assert cols == ["event_id", "ts", "user_id", "ref_rid"]

    with pytest.raises(ValueError, match="_ap"):
        asof_join(left.withColumn("_ap", F.lit(1)), right,
                  right_cols=("rid",))


def test_streaming_asof_enrich_parity_with_batch(spark, tmp_path):
    """Stream-static as-of: micro-batching the event stream through
    foreachBatch asof_join produces EXACTLY the batch asof_join result
    — parity holds because the reference side is static, so a row's
    match depends only on its own timestamp."""
    from pyspark.sql import functions as F2

    from syslog_loose_spark.operators.joins import asof_join
    from syslog_loose_spark.streaming.stream import streaming_asof_enrich

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.where(F2.col("event_type") == "click")
    errors = ev.where(F2.col("event_type") == "error")

    src = str(tmp_path / "ev_src")
    clicks.repartition(4).write.parquet(src)   # 4 files -> 4 batches
    out = str(tmp_path / "asof_out")

    stream = (spark.readStream.schema(clicks.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream
         .foreachBatch(streaming_asof_enrich(stream, errors, out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted((r["event_id"], r["ref_event_id"])
                 for r in spark.read.parquet(f"{out}/epoch=*")
                 .select("event_id", "ref_event_id").collect())
    exp = sorted((r["event_id"], r["ref_event_id"])
                 for r in asof_join(clicks, errors)
                 .select("event_id", "ref_event_id").collect())
    assert got == exp and len(got) > 0


def test_sq8_topk_recall_and_rerank(spark):
    """SQ8 ADC search: 255 levels per dimension is high-fidelity, so
    pure-ADC top-5 must recover >= 0.9 of brute-force neighbors and the
    reranked path >= brute-force parity on this corpus; results are a
    subset of valid (non-self) ids either way."""
    from pyspark.sql import functions as F2

    from syslog_loose_spark.functions.dedup import unpersist_tracked
    from syslog_loose_spark.functions.similarity import (brute_force_topk,
                                                         sq8_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F2.col("vec_id") < 5)
    try:
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in brute_force_topk(emb, q, k=5).collect()}
        adc = {(r["query_id"], r["neighbor_id"])
               for r in sq8_topk(emb, q, k=5).collect()}
        rr = {(r["query_id"], r["neighbor_id"])
              for r in sq8_topk(emb, q, k=5, rerank=50).collect()}
    finally:
        unpersist_tracked()
    assert len(adc & exact) / len(exact) >= 0.9
    assert len(rr & exact) / len(exact) >= 0.9
    assert not any(a == b for a, b in adc)
