"""Unit tests for the operator substrate (SURVEY.md §4 test pyramid, level 1).

Checks the adjoint identity ⟨Gx, y⟩ = ⟨x, Gᵀy⟩ for every stencil, dense-matrix
equivalence against jax.linear_transpose oracles, operator-norm bounds, and
PatchOp upsample/adjoint behavior (reference semantics:
``VariationalImaging.GradientOps``, used at ``src/TVLearningFunctionVec.jl:106``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.ops import (
    BwdGradientOp,
    CenteredGradientOp,
    FwdGradientOp,
    PatchOp,
    proj_norm21_ball,
    xi,
)

OPS = [FwdGradientOp(), BwdGradientOp(), CenteredGradientOp()]


@pytest.mark.parametrize("op", OPS, ids=lambda o: type(o).__name__)
@pytest.mark.parametrize("shape", [(8, 8), (5, 9), (16, 16)])
def test_adjoint_identity(op, shape, rng):
    x = jnp.asarray(rng.standard_normal(shape))
    y = jnp.asarray(rng.standard_normal((2,) + shape))
    lhs = jnp.vdot(op.apply(x), y)
    rhs = jnp.vdot(x, op.apply_adjoint(y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("op", OPS, ids=lambda o: type(o).__name__)
def test_adjoint_matches_linear_transpose(op, rng):
    shape = (6, 7)
    y = jnp.asarray(rng.standard_normal((2,) + shape))
    f = lambda u: op.apply(u)
    transpose = jax.linear_transpose(f, jnp.zeros(shape))
    (expected,) = transpose(y)
    np.testing.assert_allclose(op.apply_adjoint(y), expected, rtol=1e-12)


@pytest.mark.parametrize("op", OPS, ids=lambda o: type(o).__name__)
def test_opnorm_bound(op):
    est = float(op.opnorm_estimate(jnp.zeros((16, 16)), iters=100))
    assert est <= op.opnorm_bound() + 1e-6
    # the bound should be tight-ish for fwd/bwd on decent-sized grids
    assert est > 0.5 * op.opnorm_bound()


@pytest.mark.parametrize("op", OPS, ids=lambda o: type(o).__name__)
def test_batched_apply_consistent(op, rng):
    batch = jnp.asarray(rng.standard_normal((3, 8, 8)))
    out = op.apply(batch)
    assert out.shape == (3, 2, 8, 8)
    for i in range(3):
        np.testing.assert_allclose(out[i], op.apply(batch[i]), rtol=1e-12)


def test_fwd_gradient_values():
    u = jnp.arange(9.0).reshape(3, 3)
    g = FwdGradientOp().apply(u)
    # rows differ by 3, cols by 1; zero at trailing boundary
    np.testing.assert_allclose(g[0], [[3, 3, 3], [3, 3, 3], [0, 0, 0]])
    np.testing.assert_allclose(g[1], [[1, 1, 0], [1, 1, 0], [1, 1, 0]])


def test_constant_image_has_zero_gradient():
    u = jnp.full((12, 12), 3.14)
    for op in OPS:
        assert float(jnp.abs(op.apply(u)).max()) == 0.0


class TestPatchOp:
    def test_apply_replicates(self):
        p = PatchOp((2, 2), (4, 4))
        x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        y = p.apply(x)
        np.testing.assert_allclose(y[:2, :2], 1.0)
        np.testing.assert_allclose(y[:2, 2:], 2.0)
        np.testing.assert_allclose(y[2:, :2], 3.0)
        np.testing.assert_allclose(y[2:, 2:], 4.0)

    def test_adjoint_identity(self, rng):
        p = PatchOp((2, 4), (8, 16))
        x = jnp.asarray(rng.standard_normal((2, 4)))
        y = jnp.asarray(rng.standard_normal((8, 16)))
        np.testing.assert_allclose(
            jnp.vdot(p.apply(x), y), jnp.vdot(x, p.apply_adjoint(y)), rtol=1e-12)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            PatchOp((3, 3), (8, 8))

    def test_for_image(self):
        p = PatchOp.for_image(jnp.zeros((2, 2)), jnp.zeros((128, 128)))
        assert p.block == (64, 64)

    def test_opnorm(self):
        p = PatchOp((2, 2), (8, 8))
        assert float(p.opnorm_estimate()) == 4.0


class TestFieldOps:
    def test_xi(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 5, 5)))
        np.testing.assert_allclose(
            xi(p), np.sqrt(np.asarray(p[0]) ** 2 + np.asarray(p[1]) ** 2))

    def test_projection_inside_ball_noop(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 6, 6))) * 0.01
        np.testing.assert_allclose(proj_norm21_ball(p, 1.0), p)

    def test_projection_clamps_norm(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 6, 6))) * 10.0
        q = proj_norm21_ball(p, 0.5)
        assert float(xi(q).max()) <= 0.5 + 1e-10
        # direction preserved
        cos = jnp.sum(p * q, axis=0) / (xi(p) * xi(q))
        np.testing.assert_allclose(cos, 1.0, rtol=1e-6)

    def test_projection_spatial_radius(self, rng):
        p = jnp.asarray(rng.standard_normal((2, 4, 4))) * 10.0
        r = jnp.asarray(rng.uniform(0.1, 1.0, (4, 4)))
        q = proj_norm21_ball(p, r)
        assert bool(jnp.all(xi(q) <= r + 1e-10))
