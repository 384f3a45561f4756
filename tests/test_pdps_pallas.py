"""Pallas fused-PDPS kernel vs the jnp oracle (interpret mode on CPU;
the same kernel compiles via Mosaic on real TPU — exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpldenoising_tpu.models import sumregs_model, tv_model
from bpldenoising_tpu.solvers import denoise_pdps
from bpldenoising_tpu.solvers.pdps_pallas import denoise_pdps_pallas

ITERS = 200


def noisy(rng, shape=(16, 16), sigma=0.1):
    x, y = np.meshgrid(np.arange(shape[-1]), np.arange(shape[-2]))
    clean = ((x - shape[-1] / 2) ** 2 + (y - shape[-2] / 2) ** 2
             < (shape[-2] / 3) ** 2).astype(np.float64)
    return jnp.asarray(clean + sigma * rng.standard_normal(shape))


@pytest.mark.parametrize("model_fn,alphas", [
    (tv_model, (0.1,)),
    (sumregs_model, (0.05, 0.03, 0.02)),
], ids=["tv", "sumregs"])
def test_matches_jnp_oracle(rng, model_fn, alphas):
    model = model_fn()
    f = noisy(rng)
    u_ref = denoise_pdps(f, alphas, model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, alphas, model, maxiter=ITERS,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_batch_matches(rng):
    model = tv_model()
    f = jnp.stack([noisy(rng), noisy(rng), noisy(rng)])
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                interpret=True)
    assert u_pal.shape == f.shape
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_alpha_map_matches(rng):
    model = tv_model()
    f = noisy(rng)
    amap = jnp.asarray(rng.uniform(0.01, 0.2, (16, 16)))
    u_ref = denoise_pdps(f, (amap,), model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, (amap,), model, maxiter=ITERS,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_unaccelerated(rng):
    model = tv_model()
    f = noisy(rng)
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS, accel=False)
    u_pal = denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                accel=False, interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_multi_grid_steps(rng, monkeypatch):
    """Batch larger than the VMEM chunk exercises grid>1 + padding."""
    import bpldenoising_tpu.solvers.pdps_pallas as pp
    monkeypatch.setattr(pp, "_vmem_chunk",
                        lambda O, M, N, K, sz, **kw: 2)
    model = tv_model()
    f = jnp.stack([noisy(rng) for _ in range(5)])  # 5 images, chunk 2 → grid 3
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS)
    u_pal = pp.denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                   interpret=True)
    assert u_pal.shape == f.shape
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)


def test_non_square_image(rng):
    model = tv_model()
    f = noisy(rng, shape=(24, 16))
    u_ref = denoise_pdps(f, (0.1,), model, maxiter=ITERS)
    u_pal = denoise_pdps_pallas(f, (0.1,), model, maxiter=ITERS,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref),
                               atol=1e-10)
