"""Fine-grid spatially-varying α: hypergradient FD oracle + L-BFGS path
(VERDICT r3 #2 — the ``n > lbfgs_threshold`` machinery previously had only
a 16×16-image unit test; scripts/fine_grid.py runs the 128²/256–1024-param
workloads end-to-end, these tests pin the numerics at oracle precision).

Ref: the reference's patch pullback ``calc_adjoint(pOp, ·)``
(``src/TVLearningFunctionVec.jl:163-254``) with its 2×2 defaults
(``src/BPLDenoising.jl:350-357``); the fine grids exercise the same code
at 256+ parameters.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.learning import make_tv_learning_function
from bpldenoising_tpu.utils.config import Params


def problem(rng, n=32, sigma=0.1):
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    clean = ((x - n / 2) ** 2 + (y - n / 2) ** 2
             < (n / 3) ** 2).astype(np.float64)
    noisy = clean + sigma * rng.standard_normal((n, n))
    return (jnp.asarray(clean)[None], jnp.asarray(noisy)[None])


class TestFineGridHypergradFD:
    """f64 directional finite differences against the patch hypergradient
    on a 16×16 grid (256 parameters — above ``lbfgs_threshold``; the
    gradient itself is model-independent, so this validates exactly what
    the L-BFGS trust region consumes at fine resolution)."""

    MAXITER = 20000   # converge the inner problem hard so FD is meaningful

    @pytest.mark.parametrize("delta,rtol", [(0.1, 2e-4), (1e-12, 2e-4)])
    def test_directional_fd(self, rng, delta, rtol):
        # delta > delta_t exercises the exact (AL) branch, delta <= delta_t
        # the γ-regularized branch — both must agree with FD at fine grids
        ds = problem(rng)
        lf = make_tv_learning_function(maxiter=self.MAXITER)
        x = jnp.full((16, 16), 0.05)
        _, J0, g = lf(x, ds, delta)
        g = np.asarray(g)
        assert g.shape == (16, 16) and np.all(np.isfinite(g))
        h = 1e-6
        for seed in range(3):
            v = np.random.default_rng(seed).standard_normal((16, 16))
            v /= np.linalg.norm(v)
            _, Jp, _ = lf(x + h * v, ds, delta)
            _, Jm, _ = lf(x - h * v, ds, delta)
            fd = (float(Jp) - float(Jm)) / (2 * h)
            an = float(np.sum(g * v))
            assert an == pytest.approx(fd, rel=rtol), (
                f"direction {seed}: analytic {an} vs FD {fd}")

    def test_gradient_is_spatially_structured(self, rng):
        """On a piecewise-constant circle the fine-grid hypergradient must
        differ between interior (flat: more smoothing helps) and edge
        patches — a uniform gradient would mean the pullback collapsed."""
        ds = problem(rng)
        lf = make_tv_learning_function(maxiter=5000)
        _, _, g = lf(jnp.full((16, 16), 0.05), ds, 0.1)
        g = np.asarray(g)
        assert g.std() > 0.1 * np.abs(g).max()


class TestFineGridLBFGS:
    """End-to-end fused trust region on a fine grid through the L-BFGS
    model (n = 144 > lbfgs_threshold = 64)."""

    def test_fused_lbfgs_improves_on_uniform(self, rng):
        from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
        ds = problem(rng, n=24)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.0125, maxiter=10, tol=1e-8,
                        verbose_iter=0)
        res = bilevel_learn_fused(ds, xinit=jnp.full((12, 12), 0.05),
                                  params=params, inner_maxiter=2000,
                                  inner_tol=None, backend="jnp")
        log = np.asarray(res.log)
        k = int(res.iterations)
        assert k >= 2
        costs = log[:k, 0]
        assert costs[-1] < costs[0]          # TR made progress
        xg = np.asarray(res.x)
        assert xg.shape == (12, 12) and np.all(xg > 0)
        assert xg.std() > 1e-4               # learned map is non-uniform

    def test_host_lbfgs_matches_fused(self, rng):
        """Host L-BFGS TR and fused L-BFGS TR agree at inner_tol=None on a
        fine grid (the 2×2 parity test of test_fused.py, at 144 params)."""
        from bpldenoising_tpu.bilevel import bilevel_learn
        from bpldenoising_tpu.bilevel.fused import bilevel_learn_fused
        ds = problem(rng, n=24)
        params = Params(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9,
                        delta0=0.0125, maxiter=5, tol=1e-8, verbose_iter=0)
        x0 = jnp.full((12, 12), 0.05)
        lf = make_tv_learning_function(maxiter=800)
        host = bilevel_learn(ds, lf, xinit=x0, params=params)
        fused = bilevel_learn_fused(ds, xinit=x0, params=params,
                                    inner_maxiter=800, inner_tol=None,
                                    backend="jnp")
        np.testing.assert_allclose(np.asarray(fused.x),
                                   np.asarray(host.x), rtol=1e-7)
        assert float(fused.cost) == pytest.approx(float(host.cost),
                                                  rel=1e-9)
