"""TV learning function: inner solve + upper-level cost + hypergradient.

Equivalent of ``tv_op_learning_function`` (``src/TVLearningFunctionVec.jl:14-27``)
for scalar and patch parameters, satisfying the L4 contract
``f(x, ds, Δ) -> (u, cost, grad)`` consumed by the trust-region loop
(``src/TRBox.jl:227``).

TPU-first differences from the reference:
* the inner PDPS solve runs on the whole (O, M, N) stack at once (batched,
  single compiled loop) instead of per-image;
* per-image hypergradients are ``vmap``-ed and summed instead of the
  sequential Julia loop (``src/TVLearningFunctionVec.jl:72-83``);
* the Δ > Δt exact/regularized gradient switch (``:21-25``, Δt = 1e-6) is a
  host-side branch between two compiled paths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import tv_model
from ..ops import PatchOp
from ..solvers.hypergrad import HypergradConfig, exact_hypergrad, reg_hypergrad
from ..solvers.pdps import denoise_pdps
from ..solvers.pdps_pallas import denoise_pdps_pallas

__all__ = ["tv_learning_function", "make_tv_learning_function"]

_MODEL = tv_model()


def _batched_hypergrad(u, utrue, alpha_img, method: str,
                       cfg: HypergradConfig, want_maps: bool):
    fn = exact_hypergrad if method == "exact" else reg_hypergrad
    per_image = jax.vmap(
        lambda ui, ti: fn(ui, ti, (alpha_img,), _MODEL, cfg, want_maps)[0][0])
    g = per_image(u, utrue)          # (O,) scalars or (O, M, N) maps
    return jnp.sum(g, axis=0)


def tv_learning_function(x, ds, delta, *, delta_t: float = 1e-6,
                         maxiter: int = 5000,
                         cfg: HypergradConfig = HypergradConfig(),
                         backend: str = "jnp",
                         solver_kwargs: Optional[dict] = None):
    """L4 learning function for TV denoising.

    Args:
      x: parameter — scalar or (m, n) patch grid.
      ds: ``(true_images, noisy_images)`` stacks of shape (O, M, N).
      delta: current trust-region radius Δ; selects exact vs regularized
        gradient via ``delta > delta_t`` (ref ``:21-25``).

    Returns:
      ``(u, cost, grad)`` with ``u`` (O, M, N), scalar cost
      ½Σ‖u−ū‖² and ``grad`` shaped like ``x``.
    """
    utrue = jnp.asarray(ds[0])
    f = jnp.asarray(ds[1], utrue.dtype)
    x = jnp.asarray(x, utrue.dtype)
    method = "exact" if float(delta) > delta_t else "reg"
    kwargs = solver_kwargs or {}
    solve = denoise_pdps_pallas if backend == "pallas" else denoise_pdps

    if x.ndim == 0:
        alpha_img = x
        u = solve(f, (alpha_img,), _MODEL, maxiter=maxiter, **kwargs)
        grad = _batched_hypergrad(u, utrue, alpha_img, method, cfg,
                                  want_maps=False)
    elif x.ndim == 2:
        pop = PatchOp.for_image(x, f[0] if f.ndim == 3 else f)
        alpha_img = pop.apply(x)
        u = solve(f, (alpha_img,), _MODEL, maxiter=maxiter, **kwargs)
        gmap = _batched_hypergrad(u, utrue, alpha_img, method, cfg,
                                  want_maps=True)
        grad = pop.apply_adjoint(gmap)  # ref calc_adjoint pullback (:214,253)
    else:
        raise ValueError(f"TV parameter must be scalar or 2-D, got {x.shape}")

    cost = 0.5 * jnp.sum((u - utrue) ** 2)
    return u, cost, grad


def make_tv_learning_function(**defaults):
    """Bind configuration, returning the bare L4 contract ``f(x, ds, Δ)``."""
    return functools.partial(tv_learning_function, **defaults)
