"""Multimodal codec auto-detection.

The mapInPandas plumbing is pinned by the registry oracle tests
(multimodal_* queries); these cover the codec seam: pillow is used
when importable and the payload decodes, the deterministic stub
otherwise — so the same operator serves real media and this
media-lib-free container with identical oracle rows.
"""

from __future__ import annotations

import pytest

from dungbeetle_spark.operators.multimodal import HAVE_PIL, resize_real


def test_resize_real_falls_back_on_undecodable_bytes():
    # synthetic payloads are UTF-8 text — never a decodable image, so
    # the stub path must engage whether or not pillow is installed
    assert resize_real(b"not an image at all") is None
    assert resize_real(None) is None


@pytest.mark.skipif(not HAVE_PIL, reason="pillow not installed")
def test_resize_real_thumbnails_actual_images():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (200, 100), color=(200, 10, 10)).save(buf, format="PNG")
    thumb, w, h = resize_real(buf.getvalue(), edge=64)
    assert (w, h) == (64, 32)  # aspect preserved, clamped to edge
    assert Image.open(io.BytesIO(thumb)).size == (64, 32)


def test_compressed_decode_gate_reports_pillow_clearly():
    """VERDICT r07 item 5: the environment gate must name itself. A
    compressed-format payload in this pillow-free container raises
    NotImplementedError that says exactly what is gated and why —
    and the BMP/WAV hand parsers keep working regardless."""
    from dungbeetle_spark.operators.multimodal import (
        _bmp_pixels,
        encode_bmp,
        media_features,
    )

    if HAVE_PIL:
        pytest.skip("pillow installed: the gate is open (see parity test)")
    with pytest.raises(NotImplementedError, match="pillow"):
        media_features(1, b"\x89PNG\r\n\x1a\n....", "image/png")
    # the hand-built path is NOT behind the gate
    row = media_features(42, encode_bmp(_bmp_pixels(42)), "image/bmp")
    assert row[1] == "image/bmp" and row[2] > 0


def test_all_decode_paths_share_one_feature_schema():
    """Stub-free decode (BMP, WAV, pillow) emits one row shape —
    REAL_DECODE_SCHEMA — so the registry oracle extends to compressed
    formats without a schema fork. Pinned structurally: media_features
    returns exactly len(REAL_DECODE_SCHEMA.fields) values for every
    non-gated media family."""
    from dungbeetle_spark.operators.multimodal import (
        REAL_DECODE_SCHEMA,
        _bmp_pixels,
        _wav_samples,
        encode_bmp,
        encode_wav,
        media_features,
    )

    n_fields = len(REAL_DECODE_SCHEMA.fields)
    bmp_row = media_features(4, encode_bmp(_bmp_pixels(4)), "image/bmp")
    wav_row = media_features(5, encode_wav(_wav_samples(5)), "audio/wav")
    assert len(bmp_row) == len(wav_row) == n_fields
    # audio fields are 0 sentinels on the image row and vice versa
    assert bmp_row[7:] == (0, 0, 0) and wav_row[2:7] == (0, 0, 0, 0, 0)


@pytest.mark.skipif(not HAVE_PIL, reason="pillow not installed")
def test_pillow_decode_matches_hand_parser_features():
    """Auto-flips on if pillow ever appears in the container: the SAME
    deterministic pixels, encoded losslessly as PNG via pillow and as
    BMP via the hand-built encoder, must decode — through their
    respective paths — to IDENTICAL feature rows (bar the media_type
    tag). That is the shared-contract guarantee that lets the
    multimodal_real_decode oracle extend to compressed formats."""
    import io

    from PIL import Image

    from dungbeetle_spark.operators.multimodal import (
        _bmp_pixels,
        encode_bmp,
        media_features,
    )

    px = _bmp_pixels(42)  # (h, w, 3) BGR
    buf = io.BytesIO()
    Image.fromarray(px[:, :, ::-1]).save(buf, format="PNG")  # lossless
    png_row = media_features(42, buf.getvalue(), "image/png")
    bmp_row = media_features(42, encode_bmp(px), "image/bmp")
    assert png_row[2:] == bmp_row[2:]
    assert png_row[:2] == (42, "image/png")


def test_ahash_bands_pools_and_thresholds_exactly():
    """Pin the aHash contract the DuckDB oracle replays: band bits
    come from integer cross-multiplied cell-vs-global mean tests on
    the 299/587/114 luma, cells indexed (y*8//h)*8 + x*8//w."""
    import numpy as np

    from dungbeetle_spark.operators.multimodal import (
        _PHASH_BANDS,
        _PHASH_GRID,
        ahash_bands,
        decode_bmp,
        encode_bmp,
        _bmp_pixels,
    )

    px = _bmp_pixels(42)
    bands = ahash_bands(px)
    assert len(bands) == _PHASH_BANDS
    assert all(0 <= b < (1 << 16) for b in bands)
    # roundtrip through the real codec changes nothing
    assert ahash_bands(decode_bmp(encode_bmp(px))) == bands
    # brute-force reference: per-cell integer mean test
    h, w, _ = px.shape
    g = px.astype(np.int64) @ np.array([114, 587, 299], dtype=np.int64)
    total = int(g.sum())
    expect_bits = []
    for j in range(_PHASH_GRID):
        for i in range(_PHASH_GRID):
            ys = [y for y in range(h) if y * _PHASH_GRID // h == j]
            xs = [x for x in range(w) if x * _PHASH_GRID // w == i]
            s = int(g[np.ix_(ys, xs)].sum())
            expect_bits.append(s * (w * h) >= total * len(ys) * len(xs))
    got_bits = [
        bool(bands[c // 16] >> (c % 16) & 1) for c in range(64)
    ]
    assert got_bits == expect_bits


def test_ahash_identical_pixels_identical_bands():
    """Two docs with the same closed-form base and dims hash equal;
    a one-pixel luma spike yields exactly the brute-force-recomputed
    signature of the spiked image (the spike moves the global mean,
    so ANY cell's bit may flip — the contract is exactness, not a
    locality bound)."""
    import numpy as np

    from dungbeetle_spark.operators.multimodal import (
        _PHASH_BANDS,
        _PHASH_GRID,
        ahash_bands,
        _bmp_pixels,
    )

    def brute_bands(px):
        h, w, _ = px.shape
        g = px.astype(np.int64) @ np.array([114, 587, 299], dtype=np.int64)
        total = int(g.sum())
        bits = []
        for j in range(_PHASH_GRID):
            for i in range(_PHASH_GRID):
                ys = [y for y in range(h) if y * _PHASH_GRID // h == j]
                xs = [x for x in range(w) if x * _PHASH_GRID // w == i]
                s = int(g[np.ix_(ys, xs)].sum())
                bits.append(s * (w * h) >= total * len(ys) * len(xs))
        return [
            sum(int(bits[b * 16 + k]) << k for k in range(16))
            for b in range(_PHASH_BANDS)
        ]

    a = _bmp_pixels(8)
    assert ahash_bands(a) == ahash_bands(a.copy())
    b = a.copy()
    b[0, 0, :] = 255  # spike one pixel
    assert ahash_bands(b) == brute_bands(b)
    assert ahash_bands(b) != ahash_bands(a) or brute_bands(b) == brute_bands(a)


def test_image_phash_dedup_flags_known_near_dups(spark):
    """At sf0.001 the operator output matches a brute-force recompute
    in Python over the same closed-form images: every flagged pair
    really is within the hamming threshold of its canonical, and the
    canonical is always an older (smaller-id) image."""
    from dungbeetle_spark.operators.multimodal import (
        _PHASH_HAMMING_T,
        ahash_bands,
        image_phash_dedup,
        _bmp_pixels,
    )

    rows = image_phash_dedup(spark, "/root/testdata/sf0.001").collect()
    assert rows, "fixture should contain near-dup images"
    for r in rows:
        assert r.canonical_id < r.media_id
        a = ahash_bands(_bmp_pixels(int(r.media_id)))
        b = ahash_bands(_bmp_pixels(int(r.canonical_id)))
        ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        assert ham == r.hamming and ham <= _PHASH_HAMMING_T


def test_audio_fp_bands_profiles_exactly():
    """Pin the audio fingerprint contract the DuckDB oracle replays:
    frame t*16//n, energy = sum|s|, zero-crossings on (s >= 0) sign,
    integer cross-multiplied mean tests."""
    import numpy as np

    from dungbeetle_spark.operators.multimodal import (
        _AFP_FRAMES,
        _wav_samples,
        audio_fp_bands,
        decode_wav,
        encode_wav,
    )

    s = _wav_samples(7).astype(np.int64)
    bands = audio_fp_bands(s)
    assert len(bands) == 2 and all(0 <= b < (1 << 16) for b in bands)
    # roundtrip through the real codec changes nothing
    assert audio_fp_bands(decode_wav(encode_wav(_wav_samples(7)))) == bands
    # brute-force reference
    n = s.size
    a = np.abs(s)
    zc = np.concatenate([[0], ((s[1:] >= 0) != (s[:-1] >= 0)).astype(np.int64)])
    te, tz = int(a.sum()), int(zc.sum())
    b0 = b1 = 0
    for f in range(_AFP_FRAMES):
        sel = np.arange(n) * _AFP_FRAMES // n == f
        c = int(sel.sum())
        if int(a[sel].sum()) * n >= te * c:
            b0 |= 1 << f
        if int(zc[sel].sum()) * n >= tz * c:
            b1 |= 1 << f
    assert bands == [b0, b1]


def test_audio_fingerprint_dedup_verified_pairs(spark):
    """Every flagged clip pair really is within the hamming threshold
    of its canonical, per a brute-force Python recompute."""
    from dungbeetle_spark.operators.multimodal import (
        _AFP_HAMMING_T,
        _wav_samples,
        audio_fingerprint_dedup,
        audio_fp_bands,
    )

    rows = audio_fingerprint_dedup(spark, "/root/testdata/sf0.001").collect()
    assert rows, "fixture should contain near-dup clips"
    for r in rows[:50]:
        assert r.canonical_id < r.media_id
        a = audio_fp_bands(_wav_samples(int(r.media_id)))
        b = audio_fp_bands(_wav_samples(int(r.canonical_id)))
        ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        assert ham == r.hamming and ham <= _AFP_HAMMING_T
