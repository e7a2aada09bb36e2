"""Multimodal plumbing tests (deterministic fake codec) and
Structured-Streaming ingestion tests (file source, availableNow)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image", bytes([i]) * 32, "image/fake", 8, 8, 3000 + i * 500)
        for i in range(6)
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int"
    )


def test_attach_media_metadata_jvm(media):
    from ligra_spark.functions.multimodal import attach_media_metadata

    out = attach_media_metadata(media).collect()
    assert all(r["payload_bytes"] == 32 for r in out)
    assert len({r["payload_sha256"] for r in out}) == 6


def test_decode_images_stub_raises(media):
    from ligra_spark.functions.multimodal import decode_images

    with pytest.raises(Exception):  # NotImplementedError inside the UDF
        decode_images(media, fake=False).collect()


def test_decode_images_fake_deterministic(media):
    from ligra_spark.functions.multimodal import decode_images

    a = {r["media_id"]: r["pixels"] for r in decode_images(media, fake=True).collect()}
    b = {r["media_id"]: r["pixels"] for r in decode_images(media, fake=True).collect()}
    assert a == b and len(a) == 6
    first = np.frombuffer(a[0], dtype=np.uint8)
    assert first.size == 8 * 8 * 3


def test_image_features_shape(media):
    from ligra_spark.functions.multimodal import image_features

    rows = image_features(media, fake=True).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["height"] == 8 and r["channels"] == 3
        assert 0 <= r["mean_r"] <= 255
        assert len(r["phash"]) == 16


def test_sample_video_frames(media):
    from ligra_spark.functions.multimodal import sample_video_frames

    rows = sample_video_frames(media, every_ms=1000, fake=True).collect()
    # media i has duration 3000+500i ms → ceil(dur/1000) frames
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["ts_ms"])
    assert sorted(by_id[0]) == [0, 1000, 2000]
    assert sorted(by_id[5]) == [0, 1000, 2000, 3000, 4000, 5000]


# ---------------------------------------------------------------- streaming
@pytest.fixture(scope="module")
def pages_stream_dir(spark, tmp_path_factory):
    from ligra_spark.fixtures import write_graph_fixture

    base = tmp_path_factory.mktemp("stream")
    fix = str(base / "fix")
    write_graph_fixture(fix, scale="tiny", with_pages=True)
    pages = spark.read.parquet(f"{fix}/pages.parquet")
    src_dir = str(base / "pages_in")
    # write as 4 separate files to exercise multi-trigger ingestion
    pages.repartition(4).write.mode("overwrite").parquet(src_dir)
    return src_dir, pages


def test_stream_pages_to_edges_matches_batch(spark, pages_stream_dir, tmp_path):
    from ligra_spark.extract import extracted_pages
    from ligra_spark.streaming import stream_pages_to_edges

    src_dir, pages = pages_stream_dir
    links = stream_pages_to_edges(spark, src_dir, max_files_per_trigger=2)
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        links.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    batch = extracted_pages(pages).select(
        "url", "warc_ts", F.explode("links").alias("href")
    )
    assert got.count() == batch.count() == 708
    assert (
        got.groupBy("url").count().join(
            batch.groupBy("url").count().withColumnRenamed("count", "c2"), "url"
        ).filter("count <> c2").count() == 0
    )


def test_windowed_link_counts(spark, pages_stream_dir, tmp_path):
    from ligra_spark.streaming import stream_pages_to_edges, windowed_link_counts

    src_dir, pages = pages_stream_dir
    links = stream_pages_to_edges(spark, src_dir)
    counts = windowed_link_counts(links, window="1 minute", watermark="5 minutes")
    ck = str(tmp_path / "wck")
    # complete-mode memory sink: append mode would hold back windows
    # newer than the watermark (correct late-data behavior, but the
    # fixture's 3-minute span never passes a 5-minute watermark)
    q = (
        counts.writeStream.format("memory")
        .queryName("wincounts")
        .option("checkpointLocation", ck)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM wincounts")
    # fixture warc_ts = epoch + page_id seconds → 128 pages span 3 minutes
    assert got.select("window_start").distinct().count() >= 2
    assert got.agg(F.sum("in_links")).first()[0] == 708


def test_incremental_degree_sink(spark, pages_stream_dir, tmp_path):
    from ligra_spark.streaming import incremental_degree_sink, stream_pages_to_edges

    src_dir, pages = pages_stream_dir
    links = stream_pages_to_edges(spark, src_dir, max_files_per_trigger=1)
    out, ck = str(tmp_path / "deg"), str(tmp_path / "dck")
    os.makedirs(out, exist_ok=True)
    q = incremental_degree_sink(links, out, ck).trigger(availableNow=True).start()
    q.awaitTermination(120)
    with open(os.path.join(out, "_CURRENT")) as fh:
        cur = spark.read.parquet(fh.read().strip())
    assert cur.agg(F.sum("out_links")).first()[0] == 708


# ---------------------------------------------------------------- audio
def test_decode_audio_stub_raises(media):
    from ligra_spark.functions.multimodal import decode_audio

    with pytest.raises(Exception):  # NotImplementedError inside the UDF
        decode_audio(media, fake=False).collect()


def test_decode_audio_fake_deterministic(media):
    from ligra_spark.functions.multimodal import decode_audio

    a = {r["media_id"]: r["pcm"] for r in decode_audio(media, fake=True).collect()}
    b = {r["media_id"]: r["pcm"] for r in decode_audio(media, fake=True).collect()}
    assert a == b and len(a) == 6
    wav = np.frombuffer(a[0], dtype="<i2")
    assert wav.size == 2048


def test_audio_features_match_numpy(media):
    """Feature math pins to a straight numpy transcription of the
    fake decoder + feature definitions."""
    import hashlib

    from ligra_spark.functions.multimodal import audio_features

    rows = {r["media_id"]: r for r in audio_features(media, fake=True).collect()}
    assert len(rows) == 6
    for i in range(6):
        payload = bytes([i]) * 32
        raw = b"".join(
            hashlib.sha256(payload + k.to_bytes(4, "little")).digest()
            for k in range(4096 // 32)
        )[:4096]
        wav = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        r = rows[i]
        assert r["n_samples"] == 2048 and r["sample_rate"] == 16000
        assert abs(r["rms"] - np.sqrt((wav**2).mean())) < 1e-9
        assert r["peak"] == np.abs(wav).max()
        assert r["zero_crossings"] == int((np.diff(np.signbit(wav)) != 0).sum())
        bands = (wav**2).reshape(16, -1).mean(axis=1)
        bits = bands > (wav**2).mean()
        val = int((bits.astype(np.int64) << np.arange(15, -1, -1)).sum())
        assert r["afp"] == f"{val:04x}"


# ------------------------------------------------- stateful streaming
def test_detect_new_hubs_stateful(spark, pages_stream_dir, tmp_path):
    """applyInPandasWithState: cumulative cross-batch in-link counts
    with emit-once threshold crossing.  Regardless of how the stream
    is batched (maxFilesPerTrigger=1 → 4 micro-batches), the emitted
    url set must equal the batch-computed set of urls with final
    in-degree >= threshold, each emitted exactly once."""
    from ligra_spark.extract import extracted_pages
    from ligra_spark.streaming import detect_new_hubs, stream_pages_to_edges

    src_dir, pages = pages_stream_dir
    links = stream_pages_to_edges(spark, src_dir, max_files_per_trigger=1)
    hubs = detect_new_hubs(links, threshold=8)
    ck = str(tmp_path / "hubck")
    q = (
        hubs.writeStream.format("memory")
        .queryName("newhubs")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM newhubs").collect()

    batch = extracted_pages(pages).select(
        "url", F.explode("links").alias("href")
    )
    final = {
        r["href"]: r["n"]
        for r in batch.groupBy("href").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    expected = {u for u, n in final.items() if n >= 8}
    emitted = [r["url"] for r in got]
    assert sorted(emitted) == sorted(expected)  # each exactly once
    for r in got:
        # crossing-time count: >= threshold, <= final total
        assert 8 <= r["in_links"] <= final[r["url"]]


def test_hub_onsets_batch_twin(spark):
    """hub_onsets is the event-granularity limit of detect_new_hubs:
    one row per key reaching the threshold, at the crossing event, with
    in_links == threshold exactly.  Deterministic under ts ties via the
    secondary order column."""
    from ligra_spark.streaming import hub_onsets

    rows = (
        [("a", t, 100 + t) for t in range(7)]          # crosses at t=4
        + [("b", t, 200 + t) for t in range(3)]        # never crosses
        + [("c", 0, 301), ("c", 0, 300), ("c", 1, 302),  # ties on ts
           ("c", 1, 303), ("c", 2, 304), ("c", 2, 305)]  # crosses at (2,304)
    )
    df = spark.createDataFrame(rows, "key string, ts int, eid int")
    out = {
        r["key"]: (r["onset_ts"], r["onset_eid"], r["in_links"])
        for r in hub_onsets(
            df, key_col="key", order_cols=("ts", "eid"), threshold=5
        ).collect()
    }
    assert out == {"a": (4, 104, 5), "c": (2, 304, 5)}

    # the set law shared with the streaming operator's test: emitted
    # keys == keys whose FINAL count reaches the threshold
    finals = {k: sum(1 for r in rows if r[0] == k) for k in "abc"}
    assert set(out) == {k for k, n in finals.items() if n >= 5}


# ---------------------------------------------------------- session windows
def test_sessionize_batch_semantics(spark):
    """Gap-based sessionization pins Spark's closed-boundary
    session_window semantics: an event exactly `gap` after the
    previous one MERGES into the session; session_end = last + gap."""
    from datetime import datetime, timedelta

    from ligra_spark.streaming import sessionize

    t0 = datetime(2024, 1, 1)
    mins = {1: [0, 3, 5, 20, 24], 2: [0, 10, 21]}  # user -> event minutes
    rows = [
        (u, t0 + timedelta(minutes=m), 1.0) for u, ms in mins.items() for m in ms
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = sessionize(df, gap="10 minutes").collect()
    sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    mk = lambda s, e: (t0 + timedelta(minutes=s), t0 + timedelta(minutes=e))
    expected = {
        # user 1: [0,3,5] merge (gaps 3,2 < 10); 20 is 15 past 5 → new; 24 joins
        (1, *mk(0, 15), 3),
        (1, *mk(20, 34), 2),
        # user 2: 10 is EXACTLY gap after 0 → MERGES (closed boundary,
        # extends end to 20); 21 is 11 past 10 → new session
        (2, *mk(0, 20), 2),
        (2, *mk(21, 31), 1),
    }
    assert sessions == expected, sessions


def test_sessionize_streaming_smoke(spark, pages_stream_dir, tmp_path):
    """The same sessionize expression runs as a streaming query under
    a watermark (session-window state store operator) and emits rows."""
    from ligra_spark.streaming import sessionize, stream_pages_to_edges

    src_dir, _ = pages_stream_dir
    links = stream_pages_to_edges(spark, src_dir, max_files_per_trigger=2)
    # short watermark: the fixture spans only ~3 minutes of event
    # time, and append mode emits a session only once the watermark
    # passes its end
    sess = sessionize(
        links.withWatermark("warc_ts", "30 seconds"),
        ts_col="warc_ts", key_col="href", gap="1 minute", value_col=None,
    )
    ck = str(tmp_path / "sessck")
    q = (
        sess.writeStream.format("memory")
        .queryName("linksessions")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM linksessions")
    # append mode emits only watermark-expired sessions; the fixture
    # spans ~3 minutes of event time, so early 1-minute-gap sessions
    # must have finalized
    assert got.count() > 0
    assert set(got.columns) == {"session_start", "session_end", "href", "n_events"}


# ------------------------------------------------- real codecs (no libs)
def _ppm_bytes(arr, comment=True):
    h, w, _ = arr.shape
    head = b"P6\n" + (b"# test comment\n" if comment else b"") + \
        f"{w} {h}\n255\n".encode()
    return head + arr.astype(np.uint8).tobytes()


def _wav_bytes(samples, rate, channels=1, bits=16):
    import struct

    if bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
    else:
        data = (np.asarray(samples, dtype=np.int64) // 256 + 128).astype(
            np.uint8
        ).tobytes()
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_ppm_p6_decoder_roundtrip():
    """Real numpy P6 codec: exact pixel round-trip, comment handling,
    non-square shapes, 16-bit rejected (compressed-codec boundary)."""
    from ligra_spark.functions.multimodal import _decode_image_bytes, _decode_ppm_p6

    rng = np.random.default_rng(5)
    for h, w in [(8, 8), (3, 7), (1, 1)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for comment in (True, False):
            got = _decode_ppm_p6(_ppm_bytes(img, comment))
            assert np.array_equal(got, img), (h, w, comment)
    # the generic entry point sniffs P6 even with fake=False
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    assert np.array_equal(_decode_image_bytes(_ppm_bytes(img), False), img)
    with pytest.raises(NotImplementedError):
        _decode_ppm_p6(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError):
        _decode_ppm_p6(b"P6\n4 4\n255\n" + b"\x00" * 5)  # truncated


def test_wav_pcm_decoder_roundtrip():
    """Real numpy WAV codec: 16-bit mono exact round-trip, stereo
    keeps channel 0, 8-bit widens to int16, non-PCM rejected."""
    from ligra_spark.functions.multimodal import _decode_audio_bytes, _decode_wav_pcm

    rng = np.random.default_rng(9)
    mono = rng.integers(-32768, 32768, 300, dtype=np.int16)
    wav, rate = _decode_wav_pcm(_wav_bytes(mono, 22050))
    assert rate == 22050 and np.array_equal(wav, mono)
    # generic entry point sniffs RIFF/WAVE even with fake=False
    wav2, _ = _decode_audio_bytes(_wav_bytes(mono, 22050), False)
    assert np.array_equal(wav2, mono)
    # stereo: interleaved L/R -> channel 0 (L)
    inter = np.empty(600, dtype=np.int16)
    inter[0::2] = mono
    inter[1::2] = rng.integers(-32768, 32768, 300, dtype=np.int16)
    wav3, _ = _decode_wav_pcm(_wav_bytes(inter, 8000, channels=2))
    assert np.array_equal(wav3, mono)
    # 8-bit: (u8 - 128) << 8
    eight = np.arange(-128, 128, dtype=np.int64) * 256
    wav4, _ = _decode_wav_pcm(_wav_bytes(eight, 8000, bits=8))
    assert np.array_equal(wav4, eight.astype(np.int16))
    # non-PCM format rejected
    import struct

    bad = _wav_bytes(mono, 8000)
    bad = bad.replace(b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 1),
                      b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 3), 1)
    with pytest.raises(NotImplementedError):
        _decode_wav_pcm(bad)


def test_real_codec_features_through_spark(spark):
    """image_features / audio_features with fake=False over REAL P6 +
    WAV payloads — the whole Arrow path runs on the native codecs."""
    from ligra_spark.functions.multimodal import audio_features, image_features

    rng = np.random.default_rng(21)
    imgs = {i: rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for i in range(4)}
    media_i = spark.createDataFrame(
        [(i, _ppm_bytes(imgs[i])) for i in imgs], "media_id long, payload binary"
    )
    feats = {r["media_id"]: r for r in image_features(media_i, fake=False).collect()}
    for i, img in imgs.items():
        assert feats[i]["height"] == 8 and feats[i]["channels"] == 3
        assert feats[i]["mean_r"] == pytest.approx(img[:, :, 0].mean())
    wavs = {i: rng.integers(-2000, 2000, 512, dtype=np.int16) for i in range(3)}
    media_a = spark.createDataFrame(
        [(i, _wav_bytes(wavs[i], 16000)) for i in wavs],
        "media_id long, payload binary",
    )
    afeats = {r["media_id"]: r for r in audio_features(media_a, fake=False).collect()}
    for i, w in wavs.items():
        assert afeats[i]["n_samples"] == 512
        assert afeats[i]["sample_rate"] == 16000
        assert afeats[i]["rms"] == pytest.approx(
            np.sqrt((w.astype(np.float64) ** 2).mean())
        )


def test_resize_images_nearest_exact(spark):
    """resize_images == the per-image numpy nearest-neighbor oracle
    (pixel-center mapping), over REAL P6 payloads of mixed shapes in
    one DataFrame (exercises the per-shape-class batching)."""
    from ligra_spark.functions.multimodal import resize_images

    rng = np.random.default_rng(7)
    shapes = [(6, 9), (6, 9), (12, 4), (3, 3)]
    arrs = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for h, w in shapes
    ]
    rows = [
        (i, "image", _ppm_bytes(a, comment=False), "image/x-portable-pixmap",
         a.shape[1], a.shape[0], 0)
        for i, a in enumerate(arrs)
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int"
    )
    th, tw = 5, 7
    got = {
        r["media_id"]: r
        for r in resize_images(media, th, tw).collect()
    }
    for i, a in enumerate(arrs):
        h, w = a.shape[0], a.shape[1]
        ri = np.minimum(((np.arange(th) + 0.5) * h / th).astype(int), h - 1)
        ci = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(int), w - 1)
        exp = a[ri[:, None], ci[None, :], :]
        r = got[i]
        assert (r["height"], r["width"], r["channels"]) == (th, tw, 3)
        out = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(th, tw, 3)
        assert np.array_equal(out, exp)


def test_resize_images_identity_and_upscale(spark):
    """Resizing to the source shape is the identity; upscale repeats
    source pixels (nearest semantics)."""
    from ligra_spark.functions.multimodal import resize_images

    a = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    media = spark.createDataFrame(
        [(0, "image", _ppm_bytes(a, comment=False), "image/x-portable-pixmap",
          2, 2, 0)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    same = resize_images(media, 2, 2).collect()[0]
    assert np.array_equal(
        np.frombuffer(bytes(same["pixels"]), dtype=np.uint8).reshape(2, 2, 3), a
    )
    up = resize_images(media, 4, 4).collect()[0]
    out = np.frombuffer(bytes(up["pixels"]), dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(out, a[np.repeat([0, 1], 2)][:, np.repeat([0, 1], 2)])


def test_stream_media_features_matches_batch(spark, tmp_path):
    """Streaming decode+features over real JPEG/PNG payloads matches
    the batch pass; a corrupt payload and a non-image (wav) payload
    are dropped by the skip policy / format routing without wedging
    the stream."""
    import hashlib
    import struct

    import pandas as pd

    from ligra_spark.functions.jpeg import encode_jpeg_baseline
    from ligra_spark.functions.multimodal import image_features
    from ligra_spark.functions.png import encode_png
    from ligra_spark.streaming import stream_media_features

    rows = []
    for i in range(6):
        d = hashlib.sha256(f"m{i}".encode()).digest()
        if i % 2 == 0:
            grid = np.frombuffer(d[:4], dtype=np.uint8).reshape(2, 2)
            payload = encode_jpeg_baseline(
                np.kron(grid, np.ones((8, 8), dtype=np.uint8)), quant=8
            )
        else:
            payload = encode_png(
                np.frombuffer((d * 2)[:64], dtype=np.uint8).reshape(8, 8)
            )
        rows.append((i, payload))
    rows.append((6, b"\xff\xd8CORRUPTED"))  # undecodable image: skipped
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    rows.append((7, b"RIFF" + struct.pack("<I", len(body)) + body))  # routed away
    pdf = pd.DataFrame(
        {"media_id": [r[0] for r in rows], "payload": [r[1] for r in rows]}
    )
    src = str(tmp_path / "media_in")
    spark.createDataFrame(pdf).repartition(3).write.mode("overwrite").parquet(src)

    feats = stream_media_features(spark, src, max_files_per_trigger=2)
    q = (
        feats.writeStream.format("memory")
        .queryName("media_feats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["media_id"]: r for r in spark.sql("SELECT * FROM media_feats").collect()
    }
    assert sorted(got) == [0, 1, 2, 3, 4, 5]  # corrupt + wav dropped
    batch = {
        r["media_id"]: r
        for r in image_features(
            spark.createDataFrame(pdf[pdf.media_id < 6]), fake=False
        ).collect()
    }
    for i in range(6):
        assert got[i]["phash"] == batch[i]["phash"]
        assert got[i]["mean_r"] == batch[i]["mean_r"]
