"""Experiment-API smoke tests: every exported entry point runs end-to-end
(reduced budgets) and produces the reference's output artifacts
(``output/<dataset>/<prefix>{.txt,_quality.txt,*.png}``)."""

import os

import numpy as np
import pytest

import bpldenoising_tpu.experiments.api as api


@pytest.fixture(autouse=True)
def out_in_tmpdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    yield tmp_path


FAST = dict(inner_maxiter=300, maxiter=3, dataset_name="circle",
            num_samples=1)


def artifacts(ds="circle_128_10"):
    d = os.path.join("output", ds)
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


class TestBilevelExperiments:
    def test_scalar_tv_learn(self):
        res = api.scalar_bilevel_tv_learn(**FAST)
        files = artifacts()
        assert any(f.endswith("_quality.txt") for f in files)
        assert any("reco" in f for f in files)
        assert any(f.endswith(".txt") and "quality" not in f for f in files)
        assert float(res.x) > 0

    def test_patch_tv_learn(self):
        res = api.patch_bilevel_tv_learn(
            alpha0=1e-4 * np.ones((2, 2)), delta0=1e-4, **FAST)
        assert res.x.shape == (2, 2)
        assert any("_par.png" in f for f in artifacts())

    def test_scalar_sumregs_learn(self):
        res = api.scalar_bilevel_sumregs_learn(**FAST)
        assert res.x.shape == (3,)

    def test_patch_sumregs_learn(self):
        res = api.patch_bilevel_sumregs_learn(
            alpha0=1e-3 * np.ones((2, 2, 3)), **FAST)
        assert res.x.shape == (2, 2, 3)
        files = artifacts()
        assert sum("_par_" in f for f in files) == 3

    def test_checkpoint_written(self):
        api.scalar_bilevel_tv_learn(checkpoint=True, **FAST)
        assert any(f.endswith("_ckpt.npz") for f in artifacts())


class TestValidateAndSweeps:
    def test_validate_tv_parameter(self):
        out = api.validate_tv_parameter(0.1, dataset_name="circle")
        assert out["cost"] > 0
        assert 0 < out["mean_ssim"] <= 1
        files = artifacts()
        assert any(f.startswith("val_tv") and f.endswith("_quality.txt")
                   for f in files)

    def test_validate_sumregs_parameter(self):
        out = api.validate_sumregs_parameter(
            np.array([0.05, 0.02, 0.01]), dataset_name="circle")
        assert out["cost"] > 0

    def test_cost_sweep_and_plot(self):
        costs = api.generate_scalar_tv_cost(
            "circle_128_10", np.logspace(-3, 0, 5), maxiter=300)
        assert costs.shape == (5,)
        base = api.generate_cost_plot("circle_128_10")
        assert os.path.exists(base + ".png")

    def test_2d_cost_sweep_and_plot(self):
        costs = api.generate_2d_tv_cost(
            "circle_128_10", np.logspace(-3, -1, 3),
            np.logspace(-3, -1, 3), maxiter=200)
        assert costs.shape == (3, 3)
        base = api.generate_2d_cost_plot("circle_128_10")
        assert os.path.exists(base + ".png")

    def test_sweep_has_interior_minimum(self):
        """The de-facto correctness oracle the reference authors used
        (SURVEY.md §4): the cost curve over α has an interior valley."""
        alphas = np.logspace(-3, 0.5, 9)
        costs = api.generate_scalar_tv_cost(
            "circle_128_10", alphas, maxiter=2000)
        k = int(np.argmin(costs))
        assert 0 < k < len(alphas) - 1


class TestTVDenoiseAPI:
    def test_scalar(self):
        from bpldenoising_tpu.data import testdataset as load
        true_, noisy = load("circle")
        u = np.asarray(api.TVDenoise(noisy, 0.1, maxiter=500))
        assert u.shape == noisy.shape
        assert np.mean((u - true_) ** 2) < np.mean((noisy - true_) ** 2)

    def test_patch(self):
        from bpldenoising_tpu.data import testdataset as load
        _, noisy = load("circle")
        u = np.asarray(api.TVDenoise(noisy, 0.1 * np.ones((2, 2)),
                                     maxiter=300))
        assert u.shape == noisy.shape


class TestSaveIterations:
    def test_per_iteration_pngs(self):
        api.scalar_bilevel_tv_learn(save_iterations=True, **FAST)
        files = artifacts()
        assert any("_iter_" in f and f.endswith(".png") for f in files)


class TestPaperWorkflow:
    def test_learn_then_validate_cross_dataset(self):
        """The reference's end-to-end research workflow: learn α on a train
        set, validate on the held-out set, denoising must beat the noisy
        input on both (SURVEY.md §4 oracle #2)."""
        res = api.scalar_bilevel_tv_learn(
            dataset_name="faces_train", num_samples=3, maxiter=6,
            inner_maxiter=800)
        alpha = float(res.x)
        out = api.validate_tv_parameter(alpha, dataset_name="faces_val")
        # quality table row means: denoised beats noisy on the val set
        import re
        files = artifacts("faces_val_128_10")
        qfile = [f for f in files if f.startswith("val_tv")
                 and f.endswith("_quality.txt")][0]
        with open(os.path.join("output", "faces_val_128_10", qfile)) as fh:
            rows = [l.split() for l in fh.readlines()[1:-1]]
        noisy_psnr = np.mean([float(r[2]) for r in rows])
        out_psnr = np.mean([float(r[4]) for r in rows])
        assert out_psnr > noisy_psnr


class TestSingleLoopMethod:
    def test_scalar_tv_single_loop(self):
        res = api.scalar_bilevel_tv_learn(
            method="single_loop", sl_outer=40, sl_inner=20, sl_adj=5,
            dataset_name="circle", num_samples=1)
        assert float(np.asarray(res.x)) > 0
        files = artifacts()
        assert any(f.endswith("_quality.txt") for f in files)
        # real telemetry in the perf log (VERDICT r3 #6): non-zero monotone
        # wall-clock, real cost values and gradient norms — not the zeroed
        # placeholder entries of earlier rounds
        perf = [f for f in files if f.endswith(".txt")
                and "quality" not in f]
        assert perf
        path = os.path.join("output", "circle_128_10", perf[0])
        rows = [ln.split("\t") for ln in open(path)
                if ln.strip() and not ln.startswith("#")]
        times = np.array([float(r[1]) for r in rows])
        fvals = np.array([float(r[2]) for r in rows])
        gnorms = np.array([float(r[3]) for r in rows])
        assert len(rows) >= 10
        assert np.all(times > 0) and np.all(np.diff(times) >= 0)
        assert np.all(fvals > 0) and np.all(np.isfinite(gnorms))
        assert np.any(gnorms > 0)

    def test_sumregs_single_loop(self):
        res = api.scalar_bilevel_sumregs_learn(
            method="single_loop", sl_outer=30, sl_inner=15, sl_adj=4,
            dataset_name="circle", num_samples=1)
        assert np.asarray(res.x).shape == (3,)


class TestReviewRegressions:
    def test_validate_sumregs_patch_parameter(self):
        """Regression: patch (m,n,3) parameters must upsample before the
        dual projection (previously crashed with a broadcast error)."""
        out = api.validate_sumregs_parameter(
            1e-2 * np.ones((2, 2, 3)), dataset_name="circle")
        assert out["cost"] > 0

    def test_learning_function_2d_dataset(self):
        """Regression: unbatched 2-D datasets promote to a batch of one."""
        from bpldenoising_tpu.learning import tv_learning_function
        from bpldenoising_tpu.data import testdataset as load
        true_, noisy = load("circle")
        import jax.numpy as jnp
        u, cost, g = tv_learning_function(
            0.08, (jnp.asarray(true_[0]), jnp.asarray(noisy[0])), 0.1,
            maxiter=200)
        assert u.shape == (128, 128)
        assert np.isfinite(float(g))

    def test_single_loop_rejects_checkpoint(self):
        with pytest.raises(ValueError):
            api.scalar_bilevel_tv_learn(method="single_loop",
                                        checkpoint=True,
                                        dataset_name="circle")


class TestFusedMethod:
    def test_scalar_tv_tr_fused_matches_tr(self):
        res_f = api.scalar_bilevel_tv_learn(method="tr_fused", **FAST)
        files = artifacts()
        assert any(f.endswith("_quality.txt") for f in files)
        assert any("reco" in f for f in files)
        res_h = api.scalar_bilevel_tv_learn(**FAST)
        np.testing.assert_allclose(float(res_f.x), float(res_h.x),
                                   rtol=1e-3)
        assert len(res_f.state.log) == res_f.iterations

    def test_sumregs_tr_fused(self):
        res = api.scalar_bilevel_sumregs_learn(method="tr_fused", **FAST)
        assert res.x.shape == (3,)
        assert np.isfinite(res.cost)

    def test_tr_fused_with_inner_tol(self):
        res = api.scalar_bilevel_tv_learn(method="tr_fused", inner_tol=1e-7,
                                          **FAST)
        assert float(res.x) > 0

    def test_tr_fused_checkpoint_and_log_times(self):
        """checkpoint=True on tr_fused switches to chunked dispatch: the
        ckpt.npz exists and the per-iteration log carries real (monotone)
        wall times (VERDICT r2 item 5)."""
        res = api.scalar_bilevel_tv_learn(method="tr_fused", checkpoint=True,
                                          log_every=2, **FAST)
        assert any(f.endswith("_ckpt.npz") for f in artifacts())
        times = [e.time for e in res.state.log]
        assert len(times) == res.iterations
        assert all(t > 0 for t in times)
        assert all(b >= a for a, b in zip(times, times[1:]))

    def test_tr_fused_save_iterations(self):
        api.scalar_bilevel_tv_learn(method="tr_fused", save_iterations=True,
                                    log_every=2, **FAST)
        assert any("_iter_" in f and f.endswith(".png")
                   for f in artifacts())

    def test_tr_fused_resume_continues(self):
        """Interrupt after 2 iterations (maxiter=2 + checkpoint), resume
        with the full budget: the resumed run continues iteration
        numbering and lands where an uninterrupted run lands."""
        kw = dict(FAST, maxiter=4)
        full = api.scalar_bilevel_tv_learn(method="tr_fused", **kw)
        api.scalar_bilevel_tv_learn(method="tr_fused", checkpoint=True,
                                    log_every=2, **dict(kw, maxiter=2))
        res = api.scalar_bilevel_tv_learn(method="tr_fused", resume=True,
                                          log_every=2, **kw)
        assert res.iterations >= 3
        iters = [e.iter for e in res.state.log]
        assert iters == sorted(iters) and len(set(iters)) == len(iters)
        np.testing.assert_allclose(float(res.x), float(full.x), rtol=5e-2)
