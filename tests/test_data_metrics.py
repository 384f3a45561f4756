"""Dataset loader + quality metric tests."""

import os
import tempfile

import numpy as np
import pytest

from bpldenoising_tpu.data import (
    full_datasetname,
    read_png_gray,
    remotedatasets,
    testdataset as load_testdataset,
    write_png_gray,
)
from bpldenoising_tpu.metrics import l2_cost, psnr, ssim


class TestDatasets:
    def test_prefix_resolution(self):
        assert full_datasetname("circle") == "circle_128_10"
        assert full_datasetname("cameraman_128_5") == "cameraman_128_5"

    def test_fuzzy_resolution_warns(self):
        with pytest.warns(UserWarning):
            assert full_datasetname("camraman_128_5") == "cameraman_128_5"

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            full_datasetname("zzzz_nothing")

    @pytest.mark.parametrize("name,count", [
        ("circle_128_10", 1), ("faces_train_128_10", 10)])
    def test_load_shapes(self, name, count):
        true_, data = load_testdataset(name)
        assert true_.shape == (count, 128, 128)
        assert data.shape == (count, 128, 128)
        assert 0.0 <= true_.min() and true_.max() <= 1.0
        # noisy differs from clean
        assert np.abs(true_ - data).max() > 0.01

    def test_png_roundtrip(self, rng):
        img = rng.uniform(0, 1, (32, 48))
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "x.png")
            write_png_gray(path, img)
            back = read_png_gray(path)
        assert back.shape == (32, 48)
        assert np.abs(back - img).max() <= 0.5 / 255 + 1e-9


class TestMetrics:
    def test_psnr_known_value(self):
        ref = np.zeros((16, 16))
        img = np.full((16, 16), 0.1)
        assert float(psnr(ref, img)) == pytest.approx(20.0, abs=1e-6)

    def test_psnr_batch(self, rng):
        ref = rng.uniform(0, 1, (3, 16, 16))
        img = ref + 0.05
        vals = psnr(ref, img)
        assert vals.shape == (3,)

    def test_ssim_identical_is_one(self, rng):
        img = rng.uniform(0, 1, (32, 32))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-9)

    def test_ssim_degrades_with_noise(self, rng):
        img = rng.uniform(0, 1, (64, 64))
        s_small = float(ssim(img, img + 0.01 * rng.standard_normal((64, 64))))
        s_big = float(ssim(img, img + 0.2 * rng.standard_normal((64, 64))))
        assert 0.0 < s_big < s_small < 1.0

    def test_l2_cost(self, rng):
        u = rng.uniform(0, 1, (2, 8, 8))
        t = rng.uniform(0, 1, (2, 8, 8))
        assert float(l2_cost(u, t)) == pytest.approx(
            0.5 * np.sum((u - t) ** 2))


class TestMetricPrecision:
    def test_ssim_np_matches_jnp_f64(self, rng):
        from bpldenoising_tpu.metrics import ssim_np
        a = rng.uniform(0, 1, (48, 48))
        b = np.clip(a + 0.05 * rng.standard_normal((48, 48)), 0, 1)
        assert ssim_np(a, b) == pytest.approx(float(ssim(a, b)), abs=1e-10)

    def test_ssim_bounded_on_flat_f32(self):
        """Regression: float32 variance cancellation must not push SSIM
        above 1 (observed 1.119 on a stretched binary circle pair)."""
        import jax.numpy as jnp
        x = np.zeros((64, 64)); x[16:48, 16:48] = 1.0
        y = x + 1e-4 * np.sin(np.arange(64))[None, :]
        val = float(ssim(jnp.asarray(x, jnp.float32),
                         jnp.asarray(y, jnp.float32)))
        assert val <= 1.0 + 1e-6
        from bpldenoising_tpu.metrics import ssim_np
        assert ssim_np(x, y) <= 1.0

    def test_psnr_np(self):
        from bpldenoising_tpu.metrics import psnr_np
        assert psnr_np(np.zeros((8, 8)), np.full((8, 8), 0.1)) == \
            pytest.approx(20.0, abs=1e-9)
