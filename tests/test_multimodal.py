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
