"""EXR reader/writer roundtrip + procedural sky tests."""

import numpy as np

from raytracer2_tpu.scene.exr import load_exr, procedural_sky, write_exr


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = np.exp(rng.normal(size=(17, 33, 3))).astype(np.float32)
    p = tmp_path / "t.exr"
    write_exr(p, img)
    back = load_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_procedural_sky_shape_and_sun():
    sky = procedural_sky(height=64, sun_intensity=50.0)
    assert sky.shape == (64, 128, 3)
    assert np.all(np.isfinite(sky)) and np.all(sky >= 0)
    # sun disk is much brighter than ambient sky
    assert sky.max() > 10 * np.median(sky)


def test_sky_exr_roundtrip(tmp_path):
    sky = procedural_sky(height=32)
    p = tmp_path / "sky.exr"
    write_exr(p, sky)
    back = load_exr(p)
    np.testing.assert_allclose(back, sky, rtol=1e-6)
