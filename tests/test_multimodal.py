"""Multimodal plumbing: binary round-trip through Arrow, expanding
frame-sample output, codec-boundary stub, deterministic payloads."""

import pytest

from docling_serve_spark.multimodal import media as mm


def test_encode_parse_roundtrip():
    for mid in (0, 1, 2, 37, 101):
        _, kind, blob = mm.encode_media(mid)
        k, f = mm._parse_header(blob)
        assert k == kind
        assert len(blob) == 24 + f[4]


def test_payload_deterministic():
    assert mm._payload(7, 64) == mm._payload(7, 64)
    assert mm._payload(7, 64) != mm._payload(8, 64)


def test_real_codec_jpeg_still_stubbed():
    # PNG/WAV decode for real now; formats needing PIL/pyav still raise
    with pytest.raises(NotImplementedError):
        mm._decode_real(b"\xff\xd8\xff\xe0 jpeg bytes")


def _ref_png(width, height, ch, pixels, filters):
    """Independent reference PNG builder: applies the GIVEN per-row
    filter types per RFC 2083 §6, so the decoder is tested against
    the spec, not against the module's own encoder."""
    import struct
    import zlib

    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y, ft in enumerate(filters):
        line = pixels[y * stride:(y + 1) * stride]
        enc = bytearray()
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] - a) & 0xFF
            elif ft == 2:
                v = (line[i] - b) & 0xFF
            elif ft == 3:
                v = (line[i] - (a + b) // 2) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                v = (line[i] - pr) & 0xFF
            enc.append(v)
        raw += bytes([ft]) + bytes(enc)
        prev = line

    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _ref_wav(sr=16000, channels=2, bits=16, frames=4):
    import struct

    block = channels * bits // 8
    pcm = bytes(range(frames * block))
    fmt = struct.pack("<HHIIHH", 1, channels, sr, sr * block, block, bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png_decode_every_filter_type():
    import random

    rng = random.Random(3)
    w, h, ch = 6, 5, 3
    pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
    d = mm._decode_real(_ref_png(w, h, ch, pixels, [0, 1, 2, 3, 4]))
    assert (d["kind"], d["width"], d["height"], d["channels"]) == (
        "image", 6, 5, 3)
    assert d["pixels"] == pixels


def test_wav_decode_pcm_header():
    d = mm._decode_real(_ref_wav(sr=16000, channels=2, frames=4))
    assert (d["kind"], d["sample_rate"], d["channels"], d["n_samples"]) == (
        "audio", 16000, 2, 4)


def test_real_png_and_wav_through_spark_stages(spark):
    """X8 codec boundary: a REAL PNG and a REAL WAV ride the same
    mapInPandas decode/resize stages as the FIMG/FAUD fakes — metadata
    rows come from the stdlib codecs, and resize is a genuine
    nearest-neighbor resample re-encoded as PNG."""
    w, h, ch = 8, 5, 3
    pixels = bytes((x * 37 + y * 11 + c * 5) % 256
                   for y in range(h) for x in range(w) for c in range(ch))
    png = mm._encode_png(w, h, ch, pixels)
    wav = _ref_wav(sr=22050, channels=1, frames=100)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "audio", bytearray(wav))],
        mm.MEDIA_SCHEMA,
    )
    meta = {r["media_id"]: r for r in mm.decode_metadata(media).collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["channels"],
            meta[1]["payload_len"]) == (8, 5, 3, len(png))
    assert (meta[2]["sample_rate"], meta[2]["n_samples"],
            meta[2]["payload_len"]) == (22050, 100, len(wav))
    rz = mm.image_resize(media, max_px=4).collect()
    assert len(rz) == 1  # audio rows drop, image resized
    r = rz[0]
    assert (r["width"], r["height"], r["new_width"], r["new_height"]) == (
        8, 5, 4, 2)
    d2 = mm._decode_real(bytes(r["payload"]))
    exp = bytearray()
    for y in range(2):
        for x in range(4):
            off = ((y * 5 // 2) * 8 + (x * 8 // 4)) * 3
            exp += pixels[off:off + 3]
    assert (d2["width"], d2["height"]) == (4, 2)
    assert d2["pixels"] == bytes(exp)


def test_decode_metadata_spark(spark):
    meta = mm.decode_metadata(mm.build_media_df(spark, 30)).collect()
    assert len(meta) == 30
    by_id = {r.media_id: r for r in meta}
    assert by_id[0].kind == "image" and by_id[0].width == 320
    assert by_id[1].kind == "audio" and by_id[1].sample_rate == 12000
    assert by_id[2].kind == "video" and by_id[2].n_frames == 16


def test_frame_sample_expands_rows(spark):
    frames = mm.frame_sample(mm.build_media_df(spark, 30), every_n=10)
    rows = frames.collect()
    # only video rows (ids 2,5,...) contribute; each yields >= 1 frame
    vids = {r.media_id for r in rows}
    assert vids == {i for i in range(30) if i % 3 == 2}
    assert all(len(r.frame_bytes) > 0 for r in rows)


def test_resize_caps_longest_edge(spark):
    out = mm.image_resize(mm.build_media_df(spark, 30), max_px=256).collect()
    for r in out:
        assert max(r.new_width, r.new_height) <= 256
        # aspect ratio preserved within integer truncation
        if r.width >= r.height:
            assert r.new_width == 256 or (r.width <= 256 and r.new_width == r.width)


def test_audio_features_shape(spark):
    feats = mm.audio_features(mm.build_media_df(spark, 30)).collect()
    assert {r.media_id for r in feats} == {i for i in range(30) if i % 3 == 1}
    for r in feats:
        assert len(r.features) == r.n_windows
        assert all(0.0 <= v <= 1.0 for v in r.features)


def test_media_phash_neardup_banded_hamming(spark):
    """X115: planted 64-bit codes — a Hamming-1 re-encode pair and a
    Hamming-0 byte-twin are found; a far code never pairs; blobs never
    enter the join (codes-only input)."""
    from docling_serve_spark.multimodal.media import media_phash_neardup

    base_hi, base_lo = 0x12345678, 0x0ABCDEF0
    codes = spark.createDataFrame(
        [(1, base_hi, base_lo),
         (2, base_hi, base_lo ^ 0x10),          # 1 bit: re-encode twin
         (3, base_hi, base_lo),                 # byte-identical
         (4, base_hi ^ 0xFFFF, base_lo ^ 0xFF)],  # 24 bits away
        "doc_id bigint, simhash_hi bigint, simhash_lo bigint",
    )
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in media_phash_neardup(codes, k=3).collect()}
    assert got[(1, 2)] == 1 and got[(2, 3)] == 1
    assert got[(1, 3)] == 0
    assert all(4 not in pair for pair in got)


def test_phash_codes_deterministic_and_exact_sensitive(spark):
    from docling_serve_spark.multimodal.media import (
        media_phash_neardup,
        phash_codes,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"same-bytes")), (2, bytearray(b"same-bytes")),
         (3, bytearray(b"other-bytes"))],
        "media_id bigint, payload binary",
    )
    codes = phash_codes(media)
    rows = {r["doc_id"]: (r["simhash_hi"], r["simhash_lo"])
            for r in codes.collect()}
    assert rows[1] == rows[2] != rows[3]
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32
               for hi, lo in rows.values())
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in media_phash_neardup(codes, k=3).collect()}
    assert pairs.get((1, 2)) == 0


def test_cdc_chunks_roundtrip_and_bounds():
    from docling_serve_spark.multimodal.media import _payload, cdc_chunks

    data = _payload(5, 5000)
    chunks = cdc_chunks(data)
    assert b"".join(chunks) == data
    assert all(len(c) <= 2048 for c in chunks)
    # every chunk except the tail respects the minimum
    assert all(len(c) >= 64 for c in chunks[:-1])


def test_cdc_shared_region_dedups_at_any_offset():
    # same shared segment embedded at DIFFERENT offsets in two blobs:
    # content-defined boundaries resynchronize, so interior shared
    # chunks are byte-identical across both (the LBFS property
    # fixed-size blocking lacks)
    from docling_serve_spark.multimodal.media import _payload, cdc_chunks

    shared = _payload(777, 3000)
    a = _payload(1, 137) + shared
    b = _payload(2, 901) + shared
    ca, cb = set(cdc_chunks(a)), set(cdc_chunks(b))
    common = ca & cb
    assert sum(len(c) for c in common) > 2000


def test_cdc_stats_counts_redundancy(spark):
    from docling_serve_spark.multimodal.media import _payload, cdc_chunk_stats

    blob = _payload(9, 2000)
    media = spark.createDataFrame(
        [(1, "image", bytearray(blob)), (2, "image", bytearray(blob))],
        "media_id bigint, kind string, payload binary",
    )
    r = cdc_chunk_stats(media).collect()[0]
    # two identical blobs: every chunk appears twice, half the bytes
    # are redundant
    assert r["n_chunks"] == 2 * r["n_unique"]
    assert r["bytes_total"] == 2 * r["bytes_unique"]
    assert r["dedup_bp"] == 5000
