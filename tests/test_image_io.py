"""PNG/HDR round-trip tests for the image I/O layer."""

import numpy as np

from vulkan_raytracer_tpu.utils.image import (
    decode_texture,
    read_hdr,
    read_png,
    write_hdr,
    write_png,
)


def test_png_roundtrip_rgb(tmp_path):
    img = np.random.default_rng(0).integers(0, 256, (33, 47, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(p, img)
    back = read_png(p.read_bytes())
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_rgba_float(tmp_path):
    img = np.random.default_rng(1).uniform(0, 1, (16, 16, 4)).astype(np.float32)
    p = tmp_path / "x.png"
    write_png(p, img)
    back = read_png(p.read_bytes())
    np.testing.assert_allclose(back / 255.0, img, atol=1 / 255.0 + 1e-6)


def test_decode_texture_promotes_channels(tmp_path):
    grey = np.random.default_rng(2).integers(0, 256, (8, 8, 1), dtype=np.uint8)
    p = tmp_path / "g.png"
    write_png(p, grey.repeat(1, axis=2))
    tex = decode_texture(p.read_bytes())
    assert tex.shape == (8, 8, 4)
    np.testing.assert_allclose(tex[..., 3], 1.0)


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 1, (9, 13, 3)) * np.exp2(rng.integers(-6, 10, (9, 13, 1)))).astype(
        np.float32
    )
    p = tmp_path / "x.hdr"
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE stores ~8 bits of mantissa per shared-exponent pixel
    scale = img.max(-1, keepdims=True)
    np.testing.assert_allclose(back / (scale + 1e-9), img / (scale + 1e-9), atol=1 / 128)
