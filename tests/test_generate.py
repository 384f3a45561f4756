"""Dataset synthesis (data/generate.py): loader-compatible output layout,
noise statistics, registry round-trip.  The reference has no dataset
creation path at all (``src/Datasets.jl`` only loads); these tests pin the
beyond-reference capability to the loader contract."""

import os

import numpy as np
import pytest

from bpldenoising_tpu.data import load_dataset
from bpldenoising_tpu.data import testdataset as _testdataset
from bpldenoising_tpu.data.generate import (add_noise, circle_phantom,
                                            make_dataset)


def test_circle_phantom_is_binary_disk():
    img = circle_phantom(64, radius=0.3)
    assert img.shape == (64, 64)
    assert set(np.unique(img)) <= {0.0, 1.0}
    # interior point on, corner off, area ≈ π r²
    assert img[32, 32] == 1.0 and img[0, 0] == 0.0
    area = img.sum() / img.size
    assert abs(area - np.pi * 0.3 ** 2) < 0.01


def test_add_noise_statistics_and_clipping():
    rng = np.random.default_rng(7)
    flat = np.full((256, 256), 0.5)
    noisy = add_noise(flat, 0.1, rng)
    assert noisy.min() >= 0.0 and noisy.max() <= 1.0
    # mid-gray at σ=0.1 barely clips: sample std ≈ σ
    assert abs((noisy - flat).std() - 0.1) < 0.005
    assert abs((noisy - flat).mean()) < 0.005
    # deterministic for an int seed
    a = add_noise(flat, 0.1, 3)
    b = add_noise(flat, 0.1, 3)
    np.testing.assert_array_equal(a, b)


def test_make_dataset_roundtrip(tmp_path):
    true_imgs = [circle_phantom(32), circle_phantom(32, radius=0.2)]
    out = make_dataset("tmpcircle_32_10", true_imgs, sigma=0.10, seed=1,
                       out_root=str(tmp_path))
    assert os.path.isfile(os.path.join(out, "filelist.txt"))
    tru, noisy = load_dataset(out)
    assert tru.shape == noisy.shape == (2, 32, 32)
    # 8-bit PNG round-trip of the binary phantom is exact
    np.testing.assert_array_equal(tru[0], true_imgs[0])
    # the data images carry the injected noise (std ≈ σ up to clipping of
    # the binary phantom: about half the pixels sit at a clip boundary,
    # which halves the one-sided std)
    resid = noisy - tru
    assert 0.04 < resid.std() < 0.11
    assert resid.std() > 0.0


def test_make_dataset_explicit_pairs_and_validation(tmp_path):
    t = [np.zeros((8, 8))]
    d = [np.full((8, 8), 0.25)]
    out = make_dataset("pairs_8_0", t, noisy_images=d,
                       out_root=str(tmp_path))
    tru, noisy = load_dataset(out)
    np.testing.assert_allclose(noisy[0], d[0], atol=1 / 255)
    with pytest.raises(ValueError, match="empty"):
        make_dataset("x", [], out_root=str(tmp_path))
    # a 3-D first image selects the color branch, which demands planar
    # (3, M, N); a 4-D one is rejected by the grayscale branch
    with pytest.raises(ValueError, match=r"planar \(3, M, N\)"):
        make_dataset("x", [np.zeros((2, 2, 2))], out_root=str(tmp_path))
    with pytest.raises(ValueError, match="2-D"):
        make_dataset("x", [np.zeros((1, 2, 2, 2))], out_root=str(tmp_path))
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        make_dataset("x", [np.full((4, 4), 2.0)], out_root=str(tmp_path))
    with pytest.raises(ValueError, match="mismatch"):
        make_dataset("x", t, noisy_images=[np.zeros((4, 4))],
                     out_root=str(tmp_path))
    with pytest.raises(ValueError, match="noisy"):
        make_dataset("x", t, noisy_images=[], out_root=str(tmp_path))


def test_registry_registration(tmp_path, monkeypatch):
    """A dataset written into dataset_dir resolves via testdataset()."""
    from bpldenoising_tpu.data import generate as gen
    from bpldenoising_tpu.data import datasets as reg
    monkeypatch.setattr(reg, "dataset_dir", str(tmp_path))
    monkeypatch.setattr(reg, "remotedatasets", list(reg.remotedatasets))
    gen.make_dataset("gentest_16_10", [circle_phantom(16)], sigma=0.1)
    assert "gentest_16_10" in reg.remotedatasets
    tru, noisy = _testdataset("gentest")   # prefix resolution
    assert tru.shape == (1, 16, 16)
    # outside dataset_dir: not registered
    gen.make_dataset("elsewhere_16_10", [circle_phantom(16)],
                     out_root=str(tmp_path / "sub"))
    assert "elsewhere_16_10" not in reg.remotedatasets


def test_affine_phantoms():
    from bpldenoising_tpu.data import affine_phantom
    for kind in ("ramp", "pyramid", "facets"):
        img = affine_phantom(24, kind=kind)
        assert img.shape == (24, 24)
        assert img.min() >= 0.0 and img.max() <= 1.0
    # ramp is exactly affine: second differences vanish
    ramp = affine_phantom(16, kind="ramp")
    assert np.allclose(np.diff(ramp, n=2, axis=1), 0.0)
    # facets are seed-reproducible and seed-sensitive
    a = affine_phantom(16, kind="facets", seed=1)
    b = affine_phantom(16, kind="facets", seed=1)
    c = affine_phantom(16, kind="facets", seed=2)
    assert np.array_equal(a, b) and not np.array_equal(a, c)
    with pytest.raises(ValueError):
        affine_phantom(16, kind="nope")


def test_tgv_beats_tv_on_affine_phantom():
    """The scientific point of shipping the TGV family: on a
    piecewise-affine image, TGV denoising beats TV at matched (swept)
    regularization strengths."""
    import jax.numpy as jnp

    from bpldenoising_tpu.data import add_noise, affine_phantom
    from bpldenoising_tpu.metrics import psnr_np
    from bpldenoising_tpu.solvers import denoise_pdps, tgv_denoise_pdps
    from bpldenoising_tpu.models import tv_model

    clean = affine_phantom(32, kind="pyramid")
    noisy = jnp.asarray(add_noise(clean, 0.1, rng=3))
    best_tv = max(
        psnr_np(clean, np.asarray(
            denoise_pdps(noisy, (a,), tv_model(), maxiter=2000)))
        for a in (0.05, 0.1, 0.2))
    best_tgv = max(
        psnr_np(clean, np.asarray(
            tgv_denoise_pdps(noisy, a1, 2.0 * a1, maxiter=2000)[0]))
        for a1 in (0.05, 0.1, 0.2))
    assert best_tgv > best_tv + 0.5   # ≥0.5 dB advantage
