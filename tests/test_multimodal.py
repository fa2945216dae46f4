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
