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


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm._decode_real(b"\x89PNG")


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
