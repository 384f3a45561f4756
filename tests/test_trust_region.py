"""Trust-region optimizer tests.

Oracle problems mirror the reference's own sanity check (Rosenbrock at
``src/ConsTR.jl:122-125``) plus analytic quadratics and the positivity box.
"""

import numpy as np
import pytest

from bpldenoising_tpu.bilevel import TRModel, bilevel_learn, dogleg_box
from bpldenoising_tpu.bilevel.trust_region import (
    get_bounds,
    in_bounds,
    step_to_bound,
)
from bpldenoising_tpu.utils.config import Params

DUMMY_U = np.zeros((1, 2, 2))


def tr_params(**kw):
    base = dict(eta1=0.25, eta2=0.75, beta1=0.25, beta2=1.9, delta0=0.1,
                maxiter=100, tol=1e-8, verbose_iter=0)
    base.update(kw)
    return Params(**base)


def wrap(f_grad):
    def lf(x, ds, delta):
        fx, gx = f_grad(np.asarray(x, dtype=np.float64))
        return DUMMY_U, fx, gx
    return lf


class TestPieces:
    def test_bounds_keep_positive(self):
        lb, ub = get_bounds(np.array([0.05]), 0.1)
        assert lb[0] == pytest.approx(-0.05, abs=1e-12)
        assert ub[0] == 0.1

    def test_step_to_bound(self):
        lb = np.array([-1.0, -2.0])
        ub = np.array([1.0, 2.0])
        t = step_to_bound(np.array([2.0, 1.0]), lb, ub)
        assert t == pytest.approx(0.5)
        assert in_bounds(np.array([2.0, 1.0]) * t, lb, ub)

    def test_dogleg_newton_inside(self):
        m = TRModel(2, init_scale=1.0)
        g = np.array([0.01, 0.02])
        p = dogleg_box(np.array([1.0, 1.0]), g, m, delta=1.0)
        np.testing.assert_allclose(p, -g)  # Newton step −B⁻¹g with B=I

    def test_dogleg_respects_box(self):
        m = TRModel(2, init_scale=1.0)
        x = np.array([0.5, 0.5])
        g = np.array([10.0, -3.0])
        delta = 0.2
        p = dogleg_box(x, g, m, delta)
        lb, ub = get_bounds(x, delta)
        assert in_bounds(p, lb, ub)


class TestConvergence:
    def test_scalar_quadratic(self):
        lf = wrap(lambda x: (float((x - 0.3) ** 2), 2 * (x - 0.3)))
        res = bilevel_learn((None, None), lf, xinit=0.05,
                            params=tr_params(delta0=0.05, maxiter=200))
        assert res.x == pytest.approx(0.3, abs=1e-6)

    def test_rosenbrock_in_box(self):
        # min (1−x₁)² + 100(x₂−x₁²)²  from (2, 2); optimum (1, 1)
        def fg(x):
            a, b = x
            f = (1 - a) ** 2 + 100 * (b - a * a) ** 2
            g = np.array([-2 * (1 - a) - 400 * a * (b - a * a),
                          200 * (b - a * a)])
            return f, g
        res = bilevel_learn((None, None), wrap(fg), xinit=np.array([2.0, 2.0]),
                            params=tr_params(delta0=0.5, maxiter=500, tol=1e-12))
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-4)

    def test_positivity_never_violated(self):
        # unconstrained minimum at −1; the box must keep iterates > 0
        seen = []

        def fg(x):
            v = float(x)
            seen.append(v)
            return (v + 1.0) ** 2, np.asarray(2 * (v + 1.0))

        res = bilevel_learn((None, None), wrap(fg), xinit=0.5,
                            params=tr_params(delta0=0.2, maxiter=60))
        assert all(s > 0 for s in seen)
        assert res.x[()] > 0
        assert res.x[()] < 1e-4  # pushed to the boundary

    def test_delta_tol_stops(self):
        calls = []

        def fg(x):
            calls.append(1)
            # always-increasing cost ⇒ every step rejected ⇒ Δ shrinks
            return float(np.sum(x ** 2)) + 1.0 * (len(calls) > 1), \
                2 * np.asarray(x)

        res = bilevel_learn((None, None), wrap(fg), xinit=np.array([5.0]),
                            params=tr_params(delta0=0.1, maxiter=1000, tol=1e-5,
                                             verbose_iter=1))
        assert res.iterations < 1000  # stopped early via Δ < tol

    def test_log_populated(self):
        lf = wrap(lambda x: (float(np.sum((x - 0.3) ** 2)),
                             2 * (x - 0.3)))
        res = bilevel_learn((None, None), lf, xinit=np.array([0.1, 0.1]),
                            params=tr_params(maxiter=30, verbose_iter=1))
        assert len(res.state.log) > 0
        entry = res.state.log[-1]
        assert entry.function_value == pytest.approx(res.cost, abs=1e-12)


class TestTRModel:
    def test_bfgs_learns_quadratic(self):
        # B should approximate the Hessian diag(2, 8) after updates
        H = np.diag([2.0, 8.0])
        m = TRModel(2, init_scale=1.0)
        rng = np.random.default_rng(0)
        for _ in range(30):
            s = rng.standard_normal(2) * 0.1
            m.update(H @ s, s)
        np.testing.assert_allclose(m.B, H, atol=1e-6)

    def test_update_skips_negative_curvature(self):
        m = TRModel(2, init_scale=1.0)
        B0 = m.B.copy()
        m.update(np.array([-1.0, 0.0]), np.array([1.0, 0.0]))  # sᵀy < 0
        np.testing.assert_array_equal(m.B, B0)
