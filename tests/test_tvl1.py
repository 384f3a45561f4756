"""TV-L1 (robust L1 data term) solver, noise synthesis and experiment
surface: energy descent, impulse-noise superiority over TV-L2, shift
invariance, warm starts, map weights, bundled dataset, validate/sweep
artifacts, CLI."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.data import add_impulse_noise, circle_phantom
from bpldenoising_tpu.metrics import psnr
from bpldenoising_tpu.solvers import tv_denoise, tvl1_denoise, tvl1_energy


@pytest.fixture(scope="module")
def sp():
    clean = jnp.asarray(circle_phantom(64))
    noisy = jnp.asarray(add_impulse_noise(np.asarray(clean), 0.2, 0))
    return clean, noisy


def test_energy_descends_and_beats_initial(sp):
    clean, noisy = sp
    u = tvl1_denoise(noisy, 0.8, maxiter=2000)
    assert float(tvl1_energy(u, noisy, 0.8)) \
        < 0.6 * float(tvl1_energy(noisy, noisy, 0.8))


def test_beats_tv_l2_on_impulse_noise(sp):
    """The matched data term wins by a wide margin on salt-and-pepper:
    the L2 model smears impulses into blobs, the L1 model removes them."""
    clean, noisy = sp
    best_l1 = max(float(psnr(clean, tvl1_denoise(noisy, a, maxiter=2000)))
                  for a in (0.6, 0.9, 1.3))
    best_l2 = max(float(psnr(clean, tv_denoise(noisy, (a,), maxiter=2000)))
                  for a in (0.1, 0.2, 0.4))
    assert best_l1 > best_l2 + 5.0


def test_small_alpha_is_near_identity(sp):
    """α → 0 makes the regularizer negligible: the L1 data term then pins
    u = f exactly (soft shrinkage threshold τ exceeds the tiny dual)."""
    _, noisy = sp
    u = tvl1_denoise(noisy, 1e-4, maxiter=500)
    np.testing.assert_allclose(np.asarray(u), np.asarray(noisy), atol=1e-3)


def test_shift_invariance(sp):
    """TV-L1 commutes with intensity shifts (both terms do)."""
    _, noisy = sp
    u = tvl1_denoise(noisy, 0.8, maxiter=800)
    u_shift = tvl1_denoise(noisy + 0.25, 0.8, maxiter=800)
    np.testing.assert_allclose(np.asarray(u_shift), np.asarray(u) + 0.25,
                               atol=1e-5)


def test_batched_matches_loop(sp):
    clean, noisy = sp
    f2 = jnp.stack([noisy, noisy[::-1]])
    u2 = tvl1_denoise(f2, 0.8, maxiter=400)
    u0 = tvl1_denoise(f2[0], 0.8, maxiter=400)
    u1 = tvl1_denoise(f2[1], 0.8, maxiter=400)
    np.testing.assert_allclose(np.asarray(u2[0]), np.asarray(u0),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(u2[1]), np.asarray(u1),
                               atol=1e-12)


def test_warm_start_chaining(sp):
    _, noisy = sp
    u1, st, it = tvl1_denoise(noisy, 0.8, maxiter=300, return_dual=True)
    u2 = tvl1_denoise(noisy, 0.8, maxiter=300, state0=st)
    u_long = tvl1_denoise(noisy, 0.8, maxiter=600)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u_long),
                               atol=1e-12)


def test_early_stop(sp):
    _, noisy = sp
    u_tol, _, iters = tvl1_denoise(noisy, 0.8, maxiter=5000, tol=1e-6,
                                   check_every=100, return_dual=True)
    assert int(iters) < 5000
    u_ref = tvl1_denoise(noisy, 0.8, maxiter=5000)
    np.testing.assert_allclose(np.asarray(u_tol), np.asarray(u_ref),
                               atol=5e-3)


def test_alpha_map(sp):
    """A spatially-varying weight map regularizes only where it is large."""
    _, noisy = sp
    amap = jnp.zeros((64, 64)).at[:, 32:].set(1.0)
    u = tvl1_denoise(noisy, amap, maxiter=800)
    left = np.asarray(u[:, :32]) - np.asarray(noisy[:, :32])
    assert float(np.abs(left).max()) < 1e-3      # α≈0 half: identity
    assert float(np.abs(np.asarray(u[:, 40:]) -
                        np.asarray(noisy[:, 40:])).max()) > 0.05


def test_bundled_dataset_and_validate(tmp_path, monkeypatch):
    import bpldenoising_tpu as bpl
    monkeypatch.chdir(tmp_path)
    out = bpl.validate_tvl1_parameter(0.9, dataset_name="circle_sp",
                                      inner_maxiter=800)
    assert out["mean_psnr"] > 20.0
    assert 0.0 < out["mean_ssim"] <= 1.0
    d = tmp_path / "output" / "circle_sp_128_20"
    assert any(p.name.endswith("_quality.txt") for p in d.iterdir())


def test_cost_sweep_has_interior_minimum(tmp_path, monkeypatch):
    import bpldenoising_tpu as bpl
    monkeypatch.chdir(tmp_path)
    # wide range: the left end under-cleans the impulses, the right end
    # erodes the disk itself (TV-L1 removes a radius-R disk at α ≈ R/2
    # ≈ 19 here), so the minimum plateau is interior
    rng = np.logspace(-1.0, 1.7, 9)
    costs = bpl.generate_tvl1_cost("circle_sp", rng, maxiter=400)
    k = int(np.argmin(costs))
    assert 0 < k < len(costs) - 1
    base = bpl.generate_tvl1_cost_plot("circle_sp")
    import os
    assert os.path.exists(base + ".png")


def test_cli_validate(tmp_path, monkeypatch, capsys):
    from bpldenoising_tpu.__main__ import main
    monkeypatch.chdir(tmp_path)
    main(["validate-tvl1", "0.9", "--maxiter", "400"])
    assert len(capsys.readouterr().out.split()) == 2


def test_cli_make_dataset_impulse(tmp_path, monkeypatch, capsys):
    from bpldenoising_tpu.__main__ import main
    monkeypatch.chdir(tmp_path)
    main(["make-dataset", "sp_test_64_20", "--size", "64",
          "--noise", "impulse", "--density", "0.2",
          "--out-root", str(tmp_path)])
    out = capsys.readouterr().out.strip()
    import numpy as _np
    from bpldenoising_tpu.data import load_dataset
    t, d = load_dataset(out)
    vals = _np.asarray(d)
    # impulse noise: untouched pixels keep their exact value, hit pixels
    # are exactly 0 or 1
    frac_changed = float((_np.abs(vals - _np.asarray(t)) > 1e-6).mean())
    assert 0.05 < frac_changed < 0.35
