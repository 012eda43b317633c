"""Native ingestion library: build, decode, demosaic, prefetch loader."""

import io
import os

import numpy as np
import pytest

from ergo_uvo_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}"
)


def _jpeg_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=95)
    return b.getvalue()


def test_decode_jpeg_gray_and_rgb():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    # smooth it so JPEG round-trips closely
    img[:] = img.mean(axis=(0, 1), keepdims=True).astype(np.uint8)
    img[:32] = 200
    data = _jpeg_bytes(img)
    rgb = native.decode_jpeg(data, gray=False)
    assert rgb.shape == (64, 96, 3)
    gray = native.decode_jpeg(data, gray=True)
    assert gray.shape == (64, 96)
    assert abs(float(gray[:30].mean()) - float(rgb[:30].mean())) < 30


def test_decode_jpeg_invalid():
    with pytest.raises(ValueError):
        native.decode_jpeg(b"not a jpeg")


def test_demosaic_bggr_flat_field():
    """A flat gray scene must demosaic back to (almost) the same flat RGB."""
    h, w = 32, 48
    flat = np.full((h, w), 128, np.uint8)
    rgb = native.demosaic_bggr(flat)
    assert rgb.shape == (h, w, 3)
    np.testing.assert_array_equal(rgb, 128)


def test_demosaic_bggr_sites():
    """Check the BGGR site layout: (0,0)=B, (0,1)=G, (1,0)=G, (1,1)=R."""
    h, w = 8, 8
    mosaic = np.zeros((h, w), np.uint8)
    mosaic[1::2, 1::2] = 200  # R sites
    rgb = native.demosaic_bggr(mosaic)
    # Interior: red ~200 everywhere, green/blue 0 (borders have the usual
    # clamped-neighbor demosaic artifact, so exclude them).
    inner = rgb[1:-1, 1:-1]
    assert inner[..., 0].mean() > 150
    assert inner[..., 1].max() == 0
    assert inner[..., 2].max() == 0


def test_jpeg_loader_prefetch(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(6):
        img = np.full((32, 40, 3), 40 * i, np.uint8)
        p = tmp_path / f"f{i}.jpg"
        p.write_bytes(_jpeg_bytes(img))
        paths.append(str(p))
    loader = native.JpegLoader(paths, threads=3, capacity=2, gray=True)
    got = dict(loader)
    loader.close()
    assert set(got.keys()) == set(range(6))
    for i, frame in got.items():
        assert frame.shape == (32, 40)
        assert abs(float(frame.mean()) - 40 * i) < 4
