"""Accelerated primal–dual (Chambolle–Pock / PDPS) denoising solver.

TPU-native replacement for ``VariationalImaging.OpDenoise.op_denoise_pdps``
and ``SumRegsDenoise.sumregs_denoise_pdps`` (reference call sites:
``src/TVLearningFunctionVec.jl:52``, ``src/SumRegsLearningFunction.jl:57``;
defaults τ₀=5, σ₀=0.99/5, accel=true, maxiter=5000 at
``src/TVLearningFunctionVec.jl:33-43``).

Solves, for K regularizer blocks,

    min_u  ½‖u − f‖² + Σₖ ‖αₖ Gₖ u‖_{2,1}

with the strongly-convex-accelerated primal–dual iteration
(Chambolle & Pock 2011, Alg. 2; γ = 1 from the quadratic data term):

    u⁺   = (u − τ(Σₖ Gₖᵀ yₖ − f)) / (1 + τ)
    ω    = 1/√(1 + 2γτ);   τ ← τω;   σ ← σ/ω
    ū    = (1 + ω) u⁺ − ω u
    yₖ⁺  = Π_{|·|₂ ≤ αₖ}(yₖ + σ Gₖ ū)

Design notes (TPU-first):

* The whole iteration is a ``lax.fori_loop`` under one ``jit`` — a single
  XLA computation; per-iteration work is fused elementwise/stencil VPU code.
  No data-dependent Python control flow; static shapes throughout.
* The batch dimension (the reference's image-stack dim O,
  ``src/TVLearningFunctionVec.jl:52``) rides leading axes by broadcasting:
  all stencils and the projection are shape-polymorphic, so ``(O, M, N)``
  stacks need no vmap and XLA sees one big fusible loop body.
* Optional early stopping (``tol``) runs chunks of ``check_every`` iterations
  inside a ``lax.while_loop`` — convergence checks cost one extra reduction
  per chunk, not per iteration.  Default matches reference semantics (fixed
  budget, no early exit — the reference disables its checks via
  ``verbose_iter = maxiter+1``).
* A fused Pallas kernel with VMEM-resident state is available in
  :mod:`bpldenoising_tpu.solvers.pdps_pallas`; this module is the jnp
  reference/fallback path and the numerics oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..models import DenoiseModel, tv_model, sumregs_model, vtv_model
from ..ops import proj_norm21_ball

__all__ = ["denoise_pdps", "tv_denoise", "sumregs_denoise", "vtv_denoise",
           "PDPS_DEFAULTS"]

PDPS_DEFAULTS = dict(
    tau0=5.0,
    sigma0=0.99 / 5.0,
    accel=True,
    gamma=1.0,
    maxiter=5000,
)


def _pdps_step(model: DenoiseModel, f, alphas, accel: bool, gamma: float, state):
    u, ys, tau, sigma = state
    div = None
    for op, y in zip(model.ops, ys):
        d = op.apply_adjoint(y)
        div = d if div is None else div + d
    u_new = (u - tau * (div - f)) / (1.0 + tau)
    if accel:
        omega = 1.0 / jnp.sqrt(1.0 + 2.0 * gamma * tau)
        tau = tau * omega
        sigma = sigma / omega
    else:
        omega = jnp.asarray(1.0, dtype=u.dtype)
    ubar = (1.0 + omega) * u_new - omega * u
    ys_new = tuple(
        proj_norm21_ball(y + sigma * op.apply(ubar), a, axes=model.norm_axes)
        for op, y, a in zip(model.ops, ys, alphas))
    return (u_new, ys_new, tau, sigma)


@functools.partial(
    jax.jit,
    static_argnames=("model", "maxiter", "accel", "check_every", "return_dual"))
def _denoise_pdps_impl(f, alphas, state0=None, *, model: DenoiseModel, tau0,
                       sigma0, gamma, maxiter: int, accel: bool, tol,
                       check_every: int, return_dual: bool):
    dtype = f.dtype
    L = jnp.sqrt(jnp.asarray(model.opnorm_sq(), dtype=dtype))
    tau = jnp.asarray(tau0, dtype) / L
    sigma = jnp.asarray(sigma0, dtype) / L

    if state0 is not None:
        # warm start from a previous solve's (u, ys) — trust-region
        # evaluations at nearby α converge in a fraction of the cold budget
        u0, ys0 = state0
    else:
        u0 = f
        # 0·f (not a zeros constant) so the duals carry the same
        # varying-across-mesh type as the data when traced inside shard_map
        # (the new shard_map's vma tracking rejects replicated→varying carries).
        zero_like_data = 0.0 * f[..., None, :, :]
        ys0 = tuple(
            jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype)
            + zero_like_data
            for _ in range(model.K))
    state = (u0, ys0, tau, sigma)

    step = functools.partial(_pdps_step, model, f, alphas, accel, gamma)

    if tol is None:
        state = lax.fori_loop(0, maxiter, lambda k, s: step(s), state)
        iters = jnp.asarray(maxiter)
    else:
        tol = jnp.asarray(tol, dtype)

        def chunk(carry):
            state, it, _ = carry
            u_prev = state[0]
            # clamp the chunk so the total never exceeds maxiter
            n_steps = jnp.minimum(check_every, maxiter - it)
            state = lax.fori_loop(0, n_steps, lambda k, s: step(s), state)
            delta = jnp.max(
                jnp.linalg.norm(
                    (state[0] - u_prev).reshape(u_prev.shape[:-2] + (-1,)),
                    axis=-1)
                / jnp.maximum(
                    jnp.linalg.norm(
                        state[0].reshape(u_prev.shape[:-2] + (-1,)), axis=-1),
                    1e-12))
            return (state, it + n_steps, delta)

        def cond(carry):
            _, it, delta = carry
            return jnp.logical_and(it < maxiter, delta > tol)

        state, iters, _ = lax.while_loop(
            cond, chunk, (state, jnp.asarray(0), jnp.asarray(jnp.inf, dtype)))

    u, ys, _, _ = state
    if return_dual:
        return u, ys, iters
    return u


def denoise_pdps(f, alphas, model: DenoiseModel, *, tau0=5.0,
                 sigma0=0.99 / 5.0, gamma=1.0, maxiter=5000, accel=True,
                 tol=None, check_every=500, state0=None, return_dual=False):
    """Solve the K-block denoising problem for an image or batch ``f``.

    Args:
      f: noisy data, shape ``(M, N)`` or ``(O, M, N)``.
      alphas: regularization weights — any form accepted by
        :meth:`DenoiseModel.canonical_alphas`.
      model: the :class:`DenoiseModel` (static under jit).
      tol: optional early-stop tolerance on relative change per
        ``check_every`` iterations; ``None`` reproduces the reference's fixed
        iteration budget.
      state0: optional ``(u0, ys0)`` warm start (e.g. a previous solve's
        ``return_dual`` output at nearby α).
    Returns:
      Denoised ``u`` (same shape as ``f``), or ``(u, ys, iters)`` if
      ``return_dual``.
    """
    f = jnp.asarray(f)
    alphas = tuple(jnp.asarray(a, f.dtype)
                   for a in model.canonical_alphas(alphas))
    return _denoise_pdps_impl(
        f, alphas, state0, model=model, tau0=tau0, sigma0=sigma0, gamma=gamma,
        maxiter=int(maxiter), accel=bool(accel), tol=tol,
        check_every=int(check_every), return_dual=bool(return_dual))


_TV = tv_model()
_SUMREGS = sumregs_model()


def tv_denoise(f, alpha, **kwargs):
    """TV denoising (reference ``TVDenoise``/``denoise``,
    ``src/BPLDenoising.jl:41-59``, ``src/TVLearningFunctionVec.jl:45-70``).

    ``alpha`` is a scalar or a full-image ``(M, N)`` map (patch parameters
    are upsampled by the caller via :class:`~bpldenoising_tpu.ops.PatchOp`).
    """
    return denoise_pdps(f, alpha, _TV, **kwargs)


def sumregs_denoise(f, alphas, **kwargs):
    """Three-regularizer denoising (reference ``sumregs_denoise_pdps``,
    ``src/SumRegsLearningFunction.jl:38-85``)."""
    return denoise_pdps(f, alphas, _SUMREGS, **kwargs)


_VTV = vtv_model()


def vtv_denoise(f, alpha, **kwargs):
    """Vectorial (color) TV denoising of an ``(..., C, M, N)`` stack —
    channels coupled through the per-pixel Frobenius dual ball.
    Beyond-reference family (the reference is grayscale-only); ``alpha``
    is a scalar or an (M, N) map."""
    return denoise_pdps(f, alpha, _VTV, **kwargs)
