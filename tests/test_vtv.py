"""Vectorial (color) TV tests — beyond-reference model family.

Covers: the channel-coupled model/projection algebra, PDPS solver oracles
(replicated-channel reduction to scalar TV, energy descent, coupling
actually engages on distinct channels), implicit-diff hypergradients vs
finite differences (scalar, map and patch parameterizations), the L4
learning-function contract, and the differentiable-layer wrapper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import vtv_model, tv_model
from bpldenoising_tpu.ops import proj_norm21_ball, xi
from bpldenoising_tpu.learning.vtv import (make_vtv_learning_function,
                                           vtv_learning_function)
from bpldenoising_tpu.solvers.pdps import denoise_pdps, tv_denoise, vtv_denoise
from bpldenoising_tpu.solvers.vtv import (diff_vtv_denoise,
                                          vtv_implicit_cotangents)

_VTV = vtv_model()


def color_problem(rng, n=24, C=3, O=2, sigma=0.1):
    clean = np.clip(rng.random((O, C, n, n)), 0.0, 1.0)
    noisy = clean + sigma * rng.standard_normal((O, C, n, n))
    return jnp.asarray(clean), jnp.asarray(noisy)


class TestCoupledProjection:
    def test_frobenius_ball(self, rng):
        p = jnp.asarray(rng.standard_normal((4, 3, 2, 8, 8)))
        r = 0.3
        q = proj_norm21_ball(p, r, axes=(-4, -3))
        n = xi(q, axes=(-4, -3))
        assert float(jnp.max(n)) <= r + 1e-12
        # pixels already inside the ball are untouched
        inside = xi(p, axes=(-4, -3)) <= r
        diff = jnp.abs(q - p) * inside[:, None, None]
        assert float(jnp.max(diff)) == 0.0

    def test_energy_reduction_shape(self, rng):
        u = jnp.asarray(rng.random((5, 3, 8, 8)))
        f = jnp.asarray(rng.random((5, 3, 8, 8)))
        e = _VTV.energy(u, f, 0.1)
        assert e.shape == (5,)

    def test_coupled_energy_leq_decoupled(self, rng):
        # ‖·‖_F of the stacked gradients ≤ Σ_c ‖·‖₂ per pixel
        u = jnp.asarray(rng.random((3, 8, 8)))
        g = _VTV.ops[0].apply(u)
        coupled = float(jnp.sum(xi(g, axes=(-4, -3))))
        perch = float(jnp.sum(xi(g)))
        assert coupled <= perch + 1e-12


class TestVTVSolver:
    def test_replicated_channels_reduce_to_tv(self, rng):
        """VTV(α) on C identical channels == scalar TV(α/√C): with
        u_c identical, ‖(∇u)‖_F = √C·‖∇u_single‖ while the data term
        scales by C."""
        f1 = rng.random((20, 20))
        C = 3
        f = jnp.asarray(np.stack([f1] * C))
        a = 0.12
        u_vtv = vtv_denoise(f, a, maxiter=3000)
        u_tv = tv_denoise(jnp.asarray(f1), a / np.sqrt(C), maxiter=3000)
        assert float(jnp.max(jnp.abs(u_vtv[0] - u_vtv[2]))) < 1e-12
        assert float(jnp.max(jnp.abs(u_vtv[0] - u_tv))) < 1e-8

    def test_coupling_differs_from_per_channel(self, rng):
        """On genuinely distinct channels the Frobenius coupling must NOT
        equal running scalar TV per channel at any single weight."""
        _, f = color_problem(rng, n=20, O=1)
        f = f[0]
        a = 0.15
        u_vtv = vtv_denoise(f, a, maxiter=2000)
        u_per = tv_denoise(f, a, maxiter=2000)  # channels ride batch
        assert float(jnp.max(jnp.abs(u_vtv - u_per))) > 1e-4

    def test_energy_descends_below_data(self, rng):
        clean, noisy = color_problem(rng, n=20, O=1)
        f = noisy[0]
        a = 0.1
        u = vtv_denoise(f, a, maxiter=2000)
        e_u = float(_VTV.energy(u, f, a))
        e_f = float(_VTV.energy(f, f, a))
        assert e_u < e_f

    def test_batch_matches_loop(self, rng):
        _, noisy = color_problem(rng, n=16, O=3)
        a = 0.1
        ub = vtv_denoise(noisy, a, maxiter=800)
        for o in range(3):
            uo = vtv_denoise(noisy[o], a, maxiter=800)
            np.testing.assert_allclose(np.asarray(ub[o]), np.asarray(uo),
                                       atol=1e-10)

    def test_warm_start_converges_faster(self, rng):
        _, noisy = color_problem(rng, n=16, O=1)
        f = noisy[0]
        u_cold, ys, _ = denoise_pdps(f, 0.1, _VTV, maxiter=4000,
                                     return_dual=True)
        _, _, iters_cold = denoise_pdps(
            f, 0.1005, _VTV, maxiter=4000, tol=1e-8, check_every=100,
            return_dual=True)
        u_warm, _, iters_warm = denoise_pdps(
            f, 0.1005, _VTV, maxiter=4000, tol=1e-8, check_every=100,
            state0=(u_cold, ys), return_dual=True)
        assert int(iters_warm) < int(iters_cold)
        u_ref = denoise_pdps(f, 0.1005, _VTV, maxiter=6000)
        assert float(jnp.max(jnp.abs(u_warm - u_ref))) < 1e-4


class TestVTVHypergradient:
    @pytest.mark.parametrize("shape", ["scalar", "map", "patch"])
    def test_matches_finite_differences(self, rng, shape):
        clean, noisy = color_problem(rng, n=16, O=2)
        ds = (clean, noisy)
        kw = dict(maxiter=4000, gamma=1e-5)
        if shape == "scalar":
            x0 = jnp.asarray(0.08)
            dx = jnp.asarray(1.0)
        elif shape == "map":
            x0 = jnp.full((16, 16), 0.08)
            dx = jnp.asarray(np.abs(np.asarray(
                jax.random.normal(jax.random.PRNGKey(0), (16, 16)))))
        else:
            x0 = jnp.full((2, 2), 0.08)
            dx = jnp.asarray([[1.0, 0.5], [0.25, 0.75]])
        _, c0, g0 = vtv_learning_function(x0, ds, 0.01, **kw)
        h = 1e-5
        _, cp, _ = vtv_learning_function(x0 + h * dx, ds, 0.01, **kw)
        _, cm, _ = vtv_learning_function(x0 - h * dx, ds, 0.01, **kw)
        fd = float((cp - cm) / (2 * h))
        ift = float(jnp.sum(g0 * dx))
        assert abs(ift - fd) < 2e-3 * max(1.0, abs(fd))

    def test_cotangent_warm_start(self, rng):
        clean, noisy = color_problem(rng, n=16, O=1)
        u = vtv_denoise(noisy, 0.1, maxiter=2000)
        v = u - clean
        _, da, lam = vtv_implicit_cotangents(u, jnp.asarray(0.1), v,
                                             return_lam=True)
        _, da2 = vtv_implicit_cotangents(u, jnp.asarray(0.1), v, lam0=lam)
        assert abs(float(da2) - float(da)) < 1e-8 * max(1.0, abs(float(da)))


class TestVTVLearning:
    def test_learning_function_contract(self, rng):
        clean, noisy = color_problem(rng, n=16, O=2)
        u, cost, grad = vtv_learning_function(jnp.asarray(0.1),
                                              (clean, noisy), 0.01,
                                              maxiter=500)
        assert u.shape == clean.shape
        assert jnp.ndim(cost) == 0 and jnp.ndim(grad) == 0
        assert float(cost) > 0.0

    def test_trust_region_learns(self, rng):
        """End-to-end: TR on the VTV learning function improves the cost
        and returns a positive weight."""
        from bpldenoising_tpu.bilevel import bilevel_learn
        from bpldenoising_tpu.utils.config import Params
        clean, noisy = color_problem(rng, n=16, O=2, sigma=0.15)
        lf = make_vtv_learning_function(maxiter=600, tol=1e-7)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.02, maxiter=6, tol=1e-8, verbose_iter=0)
        res = bilevel_learn((clean, noisy), lf, xinit=np.asarray(0.05),
                            params=params)
        _, c_init, _ = vtv_learning_function(jnp.asarray(0.05),
                                             (clean, noisy), 0.01,
                                             maxiter=600)
        _, c_fin, _ = vtv_learning_function(jnp.asarray(res.x),
                                            (clean, noisy), 0.01,
                                            maxiter=600)
        assert float(res.x) > 0.0
        assert float(c_fin) <= float(c_init)

    def test_diff_layer_grad_flows(self, rng):
        clean, noisy = color_problem(rng, n=12, O=1)

        def loss(a):
            u = diff_vtv_denoise(noisy[0], a, maxiter=300)
            return 0.5 * jnp.sum((u - clean[0]) ** 2)

        g = jax.grad(loss)(jnp.asarray(0.1))
        assert jnp.isfinite(g)


class TestVTVPallasKernel:
    def test_matches_jnp_oracle(self, rng):
        from bpldenoising_tpu.solvers.vtv_pallas import vtv_denoise_pdps_pallas
        _, noisy = color_problem(rng, n=24, O=2)
        f = noisy.astype(jnp.float64)
        u0 = vtv_denoise(f, 0.1, maxiter=400)
        u1 = vtv_denoise_pdps_pallas(f, 0.1, maxiter=400, interpret=True)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                                   atol=1e-12)

    def test_map_alpha_warm_earlystop(self, rng):
        from bpldenoising_tpu.solvers.vtv_pallas import vtv_denoise_pdps_pallas
        _, noisy = color_problem(rng, n=16, O=1)
        f = noisy
        am = jnp.full((16, 16), 0.1) + 0.02 * jnp.asarray(rng.random((16, 16)))
        u0 = vtv_denoise(f, am, maxiter=300)
        u1, st = vtv_denoise_pdps_pallas(f, am, maxiter=300,
                                         return_state=True, interpret=True)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                                   atol=1e-12)
        # warm + in-kernel early stop chains toward the deeper solution
        u2 = vtv_denoise_pdps_pallas(f, am, maxiter=2000, state0=st,
                                     tol=1e-8, check_every=100,
                                     interpret=True)
        u_deep = vtv_denoise(f, am, maxiter=4000)
        assert float(jnp.max(jnp.abs(u2 - u_deep))) < 1e-4

    def test_jnp_state_format_accepted(self, rng):
        from bpldenoising_tpu.solvers.vtv_pallas import vtv_denoise_pdps_pallas
        _, noisy = color_problem(rng, n=16, O=1)
        u, ys, _ = denoise_pdps(noisy, 0.1, _VTV, maxiter=200,
                                return_dual=True)
        u2 = vtv_denoise_pdps_pallas(noisy, 0.1, maxiter=100,
                                     state0=(u, ys), interpret=True)
        assert u2.shape == noisy.shape


class TestColorIO:
    def test_rgb_roundtrip_and_pil_parity(self, rng, tmp_path):
        from bpldenoising_tpu.data.png_io import (_read_pil_color,
                                                  read_png_color,
                                                  write_png_color)
        img = rng.random((3, 20, 28))
        p = str(tmp_path / "c.png")
        write_png_color(p, img)
        back = read_png_color(p)
        assert back.shape == (3, 20, 28)
        assert float(np.max(np.abs(back - img))) < 1.0 / 255.0
        np.testing.assert_allclose(back, _read_pil_color(p), atol=1e-12)

    def test_gray_file_replicates_channels(self, rng, tmp_path):
        from bpldenoising_tpu.data.png_io import (read_png_color,
                                                  write_png_gray)
        img = rng.random((12, 12))
        p = str(tmp_path / "g.png")
        write_png_gray(p, img)
        c = read_png_color(p)
        np.testing.assert_allclose(c[0], c[2], atol=0)

    def test_color_dataset_loader(self):
        from bpldenoising_tpu.data import testdataset
        t, d = testdataset("color_disks", color=True)
        assert t.ndim == 4 and t.shape[1] == 3
        assert d.shape == t.shape
        # grayscale mode of the same dataset still loads (luma)
        tg, _ = testdataset("color_disks")
        assert tg.shape == (t.shape[0],) + t.shape[2:]


class TestVTVExperiments:
    def test_scalar_learn_artifacts(self, tmp_path, monkeypatch):
        import bpldenoising_tpu as bpl
        monkeypatch.chdir(tmp_path)
        res = bpl.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                           maxiter=2, inner_maxiter=150,
                                           num_samples=1)
        out = tmp_path / "output" / "color_disks_128_10"
        assert (out / "vtv_optimal_parameter_scalar_color_disks_128_10"
                      "_quality.txt").exists()
        reco = out / ("vtv_optimal_parameter_scalar_color_disks_128_10"
                      "_reco_1.png")
        assert reco.exists()
        from bpldenoising_tpu.data.png_io import read_png_color
        img = read_png_color(str(reco))
        assert img.shape[0] == 3
        assert float(res.x) > 0.0

    def test_validate_writes_quality(self, tmp_path, monkeypatch):
        import bpldenoising_tpu as bpl
        monkeypatch.chdir(tmp_path)
        out = bpl.validate_vtv_parameter(0.1, dataset_name="color_disks",
                                         inner_maxiter=100)
        assert 0.0 < out["mean_ssim"] <= 1.0
        assert out["mean_psnr"] > 10.0

    def test_method_guard(self):
        import bpldenoising_tpu as bpl
        import pytest as _pytest
        with _pytest.raises(ValueError, match="method"):
            bpl.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                         method="bogus", maxiter=1,
                                         inner_maxiter=50)

    def test_tr_fused_method_runs(self, tmp_path, monkeypatch):
        import bpldenoising_tpu as bpl
        monkeypatch.chdir(tmp_path)
        res = bpl.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                           method="tr_fused", maxiter=2,
                                           inner_maxiter=50)
        assert float(res.x) > 0.0


class TestFusedVTV:
    def test_parity_with_host_loop(self, rng):
        from bpldenoising_tpu.bilevel import (bilevel_learn,
                                              bilevel_learn_vtv_fused)
        from bpldenoising_tpu.learning.vtv import make_vtv_learning_function
        from bpldenoising_tpu.utils.config import Params
        clean, noisy = color_problem(rng, n=16, O=2, sigma=0.15)
        ds = (clean, noisy)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.02, maxiter=5, tol=1e-8, verbose_iter=0)
        host = bilevel_learn(ds, make_vtv_learning_function(maxiter=300),
                             xinit=np.asarray(0.05), params=params)
        fused = bilevel_learn_vtv_fused(ds, xinit=np.asarray(0.05),
                                        params=params, inner_maxiter=300,
                                        inner_tol=None, backend="jnp")
        # inner_tol=None: every fused evaluation is the same computation as
        # the host learning function → identical trajectory
        assert float(host.x) == float(fused.x)
        assert float(host.cost) == float(fused.cost)

    def test_pallas_interpret_and_warm(self, rng):
        from bpldenoising_tpu.bilevel import bilevel_learn_vtv_fused
        from bpldenoising_tpu.utils.config import Params
        clean, noisy = color_problem(rng, n=16, O=2, sigma=0.15)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.02, maxiter=5, tol=1e-8, verbose_iter=0)
        ref = bilevel_learn_vtv_fused((clean, noisy), xinit=np.asarray(0.05),
                                      params=params, inner_maxiter=2000,
                                      inner_tol=None, backend="jnp")
        warm = bilevel_learn_vtv_fused(
            (clean, noisy), xinit=np.asarray(0.05), params=params,
            inner_maxiter=2000, inner_tol=1e-8, backend="pallas",
            interpret=True)
        # warm-started early-stopped evaluations land in the same valley
        assert abs(float(warm.x) - float(ref.x)) < 2e-3

    def test_patch_grid_and_mesh(self, rng):
        from bpldenoising_tpu.bilevel import bilevel_learn_vtv_fused
        from bpldenoising_tpu.parallel import make_batch_mesh
        from bpldenoising_tpu.utils.config import Params
        clean, noisy = color_problem(rng, n=16, O=8, sigma=0.15)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.02, maxiter=3, tol=1e-8, verbose_iter=0)
        # patch grid parameter through the fused loop
        pres = bilevel_learn_vtv_fused(
            (clean, noisy), xinit=0.05 * jnp.ones((2, 2)), params=params,
            inner_maxiter=200, inner_tol=None, backend="jnp")
        assert pres.x.shape == (2, 2)
        assert np.isfinite(float(pres.cost))
        # data-parallel: same loop, one dispatch, sharded batch
        mesh = make_batch_mesh()
        sres = bilevel_learn_vtv_fused(
            (clean, noisy), xinit=np.asarray(0.05), params=params,
            inner_maxiter=200, inner_tol=None, backend="jnp", mesh=mesh)
        ures = bilevel_learn_vtv_fused(
            (clean, noisy), xinit=np.asarray(0.05), params=params,
            inner_maxiter=200, inner_tol=None, backend="jnp")
        np.testing.assert_allclose(float(sres.x), float(ures.x), rtol=1e-6)

    def test_experiment_front_end(self, tmp_path, monkeypatch):
        import bpldenoising_tpu as bpl
        monkeypatch.chdir(tmp_path)
        res = bpl.scalar_bilevel_vtv_learn(dataset_name="color_disks",
                                           maxiter=2, inner_maxiter=100,
                                           num_samples=1, method="tr_fused",
                                           log_every=1, checkpoint=True)
        out = tmp_path / "output" / "color_disks_128_10"
        assert (out / "vtv_optimal_parameter_scalar_color_disks_128_10"
                      "_ckpt.npz").exists()
        assert float(res.x) > 0.0
