"""Single-loop first-order vectorial-TV bilevel learning — on device.

The color companion of :mod:`.first_order` / :mod:`.first_order_tgv`
(single-loop idea cf. Suonperä & Valkonen, arXiv:2408.08123): instead of
solving the channel-coupled lower-level problem to convergence per outer
evaluation (the VTV trust-region paths), the inner (u, y) primal–dual
state, the adjoint multiplier λ and the coupling weight are advanced
*together*:

    per outer step:
      1. ``n_inner`` unaccelerated CP iterations at the current α with the
         coupled Frobenius dual projection (warm-started state);
      2. ``n_adj`` Jacobi-CG iterations on the γ-Huber smoothed coupled
         system H = I + ∇ᵀ(α Dψ)∇ at the current iterate (warm-started λ;
         PER-IMAGE inner products via :func:`..solvers.krylov.cg_batched`,
         so the trajectory is independent of batch grouping and
         data-parallel shards reproduce the joint run exactly);
      3. an Adam step on log α (positivity by construction) using the
         approximate hypergradient g = +⟨ψ_γ(∇u), ∇λ⟩ per pixel
         (λ solves H λ = ū − u, which flips the chain-rule minus sign —
         same convention as :mod:`.first_order_tgv`).

The whole loop is one ``lax.scan`` under one ``jit`` — no host round trips
until the final result.  Supports the scalar and (m, n) patch-grid
parameterizations and a 1-D batch mesh (shard_map; the only collectives
are the per-step psum of the gradient reduction and the cost).

Lives in its own module (rather than channel-generalizing
:mod:`.first_order`) so the pinned flagship executables' trace path is
untouched — the compilation-cache key is call-site-sensitive
(BASELINE.md "Deterministic walltime").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import PatchOp, proj_norm21_ball, scalarprod
from ..ops.grad import FwdGradientOp
from ..models import vtv_model
from ..solvers.krylov import cg_batched
from ..solvers.vtv import _dpsi_coupled
from .first_order import (SingleLoopResult, _check_positive_x0,
                          drive_single_loop)

__all__ = ["single_loop_vtv_learn", "vtv_param_layout"]

_GRAD = FwdGradientOp()
_VTV = vtv_model()
_AXES = (-4, -3)   # (channel, component) — the Frobenius coupling


def vtv_param_layout(x0, image_shape) -> Optional[PatchOp]:
    """Scalar α → None; (m, n) patch grid → its PatchOp.  Shared rule for
    every VTV entry point (cf. :func:`.first_order_tgv.tgv_param_layout`)."""
    if x0.ndim == 0:
        return None
    if x0.ndim == 2:
        return PatchOp(tuple(x0.shape), tuple(image_shape))
    raise ValueError(f"VTV parameter must be a scalar or an (m, n) patch "
                     f"grid, got shape {x0.shape}")


@functools.partial(
    jax.jit,
    static_argnames=("outer", "n_inner", "n_adj", "pop", "param_shape",
                     "axis_name", "optimizer", "return_carry"))
def _single_loop_vtv_impl(utrue, f, x0, *, outer: int, n_inner: int,
                          n_adj: int, pop: Optional[PatchOp],
                          param_shape: tuple, lr, gamma, tau0, sigma0,
                          beta1, beta2, eps,
                          axis_name: Optional[str] = None, optimizer=None,
                          carry0=None, return_carry: bool = False):
    dtype = f.dtype
    L = jnp.sqrt(jnp.asarray(_VTV.opnorm_sq(), dtype))
    tau = jnp.asarray(tau0, dtype) / L
    sigma = jnp.asarray(sigma0, dtype) / L
    gamma = jnp.asarray(gamma, dtype)

    def alpha_of(x):
        return pop.apply(x) if pop is not None else x

    def pullback(g_map):
        """Per-pixel sensitivity map (summed over the local batch) →
        parameter shape; psum over the mesh first so every device sees the
        replicated gradient."""
        if axis_name is not None:
            g_map = lax.psum(g_map, axis_name)
        if pop is None:
            return jnp.sum(g_map)
        return pop.apply_adjoint(jnp.sum(g_map, axis=0))

    def pd_step(a, carry):
        # fixed-step (unaccelerated) CP with the coupled Frobenius
        # projection — the warm-started single-loop analogue of
        # solvers.pdps._pdps_step on vtv_model
        u, y = carry
        u_new = (u - tau * (_GRAD.apply_adjoint(y) - f)) / (1.0 + tau)
        ubar = 2.0 * u_new - u
        y_new = proj_norm21_ball(y + sigma * _GRAD.apply(ubar), a,
                                 axes=_AXES)
        return u_new, y_new

    def outer_step(carry, _):
        u, y, lam, z, opt_state, t = carry
        x = jnp.exp(z)
        a = alpha_of(x)
        u, y = lax.fori_loop(0, n_inner, lambda k, c: pd_step(a, c), (u, y))
        g = _GRAD.apply(u)
        psi, s, Dj = _dpsi_coupled(g, gamma)

        def H(v):
            return v + _GRAD.apply_adjoint(a * Dj(_GRAD.apply(v)))

        a_s = a * s
        diag = (1.0 + _GRAD.gram_diag(jnp.stack([a_s, a_s], axis=-3))
                )[..., None, :, :]
        # fixed n_adj Jacobi-CG steps, PER-IMAGE inner products (item =
        # one (C, M, N) image): the adjoint trajectory is independent of
        # batch grouping, so mesh runs match joint runs bit-for-bit
        lam, _ = cg_batched(H, utrue - u, x0=lam, tol=0.0, maxiter=n_adj,
                            M=lambda r: r / diag, item_ndim=3)
        g_map = scalarprod(psi, _GRAD.apply(lam), axes=_AXES)  # (O, M, N)
        g_x = pullback(g_map)
        g_z = g_x * x                    # chain rule through x = exp(z)
        t = t + 1
        if optimizer is not None:
            updates, opt_state = optimizer.update(g_z, opt_state, z)
            z_new = z + updates
        else:
            m, v = opt_state
            m = beta1 * m + (1 - beta1) * g_z
            v = beta2 * v + (1 - beta2) * g_z ** 2
            mhat = m / (1 - beta1 ** t)
            vhat = v / (1 - beta2 ** t)
            z_new = z - lr * mhat / (jnp.sqrt(vhat) + eps)
            opt_state = (m, v)
        cost = 0.5 * jnp.sum((u - utrue) ** 2)
        if axis_name is not None:
            cost = lax.psum(cost, axis_name)
        gnorm = jnp.sqrt(jnp.sum(g_x ** 2))
        return (u, y, lam, z_new, opt_state, t), (x, cost, gnorm)

    if carry0 is None:
        carry0 = _vtv_init_carry(f, x0, param_shape=param_shape,
                                 optimizer=optimizer)

    carry, (alphas_traj, costs, gnorms) = lax.scan(outer_step, carry0,
                                                   None, length=outer)
    u, _, _, z, _, _ = carry
    final_cost = 0.5 * jnp.sum((u - utrue) ** 2)
    if axis_name is not None:
        final_cost = lax.psum(final_cost, axis_name)
    res = SingleLoopResult(alpha=jnp.exp(z), u=u, cost=final_cost,
                           alpha_trajectory=alphas_traj,
                           cost_trajectory=costs,
                           gnorm_trajectory=gnorms)
    if return_carry:
        return res, carry
    return res


def _vtv_init_carry(f, x0, *, param_shape: tuple, optimizer=None):
    """Initial scan carry: CP state (u, y), adjoint λ, log α, optimizer
    state, step counter.  Cold start (0·f keeps the mesh-varying type, as
    in solvers.pdps)."""
    dtype = f.dtype
    zero_like = 0.0 * f[..., None, :, :]
    y0 = jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype) + zero_like
    lam0 = jnp.zeros_like(f)
    z0 = jnp.log(jnp.asarray(x0, dtype))
    if optimizer is not None:
        opt_state0 = optimizer.init(z0)
    else:
        opt_state0 = (jnp.zeros(param_shape, dtype),
                      jnp.zeros(param_shape, dtype))
    return (f, y0, lam0, z0, opt_state0, jnp.zeros((), dtype))


def single_loop_vtv_learn(utrue, f, x0, *, outer: int = 300,
                          n_inner: int = 40, n_adj: int = 10,
                          lr: float = 0.05, gamma: float = 1e-4,
                          tau0: float = 5.0, sigma0: float = 0.99 / 5.0,
                          beta1: float = 0.9, beta2: float = 0.999,
                          eps: float = 1e-8, mesh=None,
                          optimizer=None, log_every=None,
                          segment_callback=None) -> SingleLoopResult:
    """Single-loop vectorial-TV bilevel learning on (O, C, M, N) /
    (C, M, N) color stacks.

    ``x0``: strictly positive scalar α or (m, n) patch grid (the parameter
    lives in log space).  ``optimizer``: optional optax transformation on
    log α (same caveats as :func:`.first_order.single_loop_learn`).
    ``mesh``: optional 1-D batch mesh; zero-padded images contribute
    exactly nothing (their solve of f = 0 is 0 = ū, so λ and the gradient
    map vanish).  ``gamma`` is the Huber width of the smoothed coupled
    system (:mod:`..solvers.vtv` convention, NOT the reference's large-γ
    convention).
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    squeeze = f.ndim == 3
    if squeeze:
        utrue, f = utrue[None], f[None]
    if f.ndim != 4:
        raise ValueError(f"expected (O, C, M, N) or (C, M, N) color "
                         f"stacks, got shape {f.shape}")
    x0 = jnp.asarray(x0, utrue.dtype)
    _check_positive_x0(x0)
    pop = vtv_param_layout(x0, f.shape[-2:])
    kw = dict(outer=int(outer), n_inner=int(n_inner), n_adj=int(n_adj),
              pop=pop, param_shape=tuple(x0.shape), lr=lr, gamma=gamma,
              tau0=tau0, sigma0=sigma0, beta1=beta1, beta2=beta2, eps=eps,
              optimizer=optimizer)
    make_carry0 = functools.partial(_vtv_init_carry, x0=x0,
                                    param_shape=tuple(x0.shape),
                                    optimizer=optimizer)

    def carry_spec_fn(carry, b, r):
        u, y, lam, z, opt_state, t = carry
        return (b, b, b, r, jax.tree.map(lambda _: r, opt_state), r)

    res = drive_single_loop(_single_loop_vtv_impl, utrue, f, x0, kw,
                            make_carry0=make_carry0,
                            carry_spec_fn=carry_spec_fn, mesh=mesh,
                            log_every=log_every,
                            segment_callback=segment_callback)
    if squeeze:
        res = res._replace(u=res.u[0])
    return res
