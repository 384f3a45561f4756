"""Single-loop first-order TV-L1 bilevel learning — entirely on device.

The impulse-noise companion of :mod:`.first_order` /
:mod:`.first_order_tgv` / :mod:`.first_order_vtv` (single-loop idea cf.
Suonperä & Valkonen, arXiv:2408.08123) for the Huber-smoothed TV-L1 model
(:mod:`..solvers.tvl1_huber`): instead of solving the smoothed lower-level
problem to convergence per outer evaluation (the TV-L1 trust-region
paths), the inner (u, y) primal–dual state, the adjoint multiplier p and
the weight are advanced *together*:

    per outer step:
      1. ``n_inner`` Huber-smoothed PD iterations at the current α
         (Huber data prox + scaled dual projection, warm-started state);
      2. ``n_adj`` Jacobi-CG iterations on the smoothed adjoint system
         H = D + ∇ᵀ(α W)∇ at the current iterate, D the Huber data
         Hessian diag(γ_d·1{|u−f| ≤ 1/γ_d}) (warm-started p; PER-IMAGE
         inner products via :func:`..solvers.krylov.cg_batched`, so the
         trajectory is independent of batch grouping and data-parallel
         shards reproduce the joint run exactly);
      3. an Adam step on log α (positivity by construction) using the
         approximate hypergradient g = +⟨∇p, ψ'_{γr}(∇u)⟩ per pixel
         (p solves H p = ū − u — the host hypergradient's sign
         convention, :func:`..solvers.tvl1_huber.tvl1_huber_hypergrad`).

Unlike the TV-L2 single loop (:mod:`.first_order`, whose adjoint system
carries an identity data block), the Huber data Hessian D vanishes on
outlier pixels, so while the warm-started state is still far from its
fixed point the adjoint system is near-singular and the approximate
hypergradient transiently explodes (|g| ~ 1e6 on the first steps).  Raw
Adam never recovers: the second moment decays at β₂ = 0.999, so one such
transient freezes the step size for ~1/(1−β₂) outer iterations and the
parameter stalls far from the minimizer.  The gradient on log α is
therefore clipped elementwise (``clip``, default 1.0) before the moment
updates — near the physical scale the true |∂J/∂ log α| is O(1) here, so
the clip only removes the unconverged-state artifacts (Adam normalizes
per-parameter scale anyway; only the poisoning of v matters).

The whole loop is one ``lax.scan`` under one ``jit``.  Supports the scalar
and (m, n) patch-grid parameterizations and a 1-D batch mesh (shard_map;
the only collectives are the per-step psum of the gradient reduction and
the cost).  Lives in its own module so the pinned flagship executables'
trace paths are untouched (call-site-sensitive compilation-cache key).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..models import tv_model
from ..ops import PatchOp, proj_norm21_ball, scalarprod
from ..solvers.hypergrad import build_reg_system
from ..solvers.krylov import cg_batched
from ..solvers.tvl1_huber import _huber_prox
from .first_order import (SingleLoopResult, _check_positive_x0,
                          drive_single_loop)
from .fused_tvl1 import tvl1_param_layout

__all__ = ["single_loop_tvl1_learn"]

_TV = tv_model()
_GRAD = _TV.ops[0]


@functools.partial(
    jax.jit,
    static_argnames=("outer", "n_inner", "n_adj", "pop", "param_shape",
                     "axis_name", "optimizer", "return_carry"))
def _single_loop_tvl1_impl(utrue, f, x0, *, outer: int, n_inner: int,
                           n_adj: int, pop: Optional[PatchOp],
                           param_shape: tuple, lr, gamma_d, gamma_r, tau0,
                           sigma0, beta1, beta2, eps, clip,
                           axis_name: Optional[str] = None,
                           optimizer=None, carry0=None,
                           return_carry: bool = False):
    dtype = f.dtype
    L = jnp.sqrt(jnp.asarray(_TV.opnorm_sq(), dtype))
    tau = jnp.asarray(tau0, dtype) / L
    sigma = jnp.asarray(sigma0, dtype) / L
    gamma_d = jnp.asarray(gamma_d, dtype)
    gamma_r = jnp.asarray(gamma_r, dtype)

    def alpha_of(x):
        return pop.apply(x) if pop is not None else x

    def pullback(g_map):
        """Per-pixel sensitivity map (O, M, N) → parameter shape; psum
        over the mesh first so every device sees the replicated
        gradient."""
        if axis_name is not None:
            g_map = lax.psum(g_map, axis_name)
        if pop is None:
            return jnp.sum(g_map)
        return pop.apply_adjoint(jnp.sum(g_map, axis=0))

    def pd_step(a, scale, carry):
        # Huber-smoothed TV-L1 CP step, identical body to
        # solvers.tvl1_huber._tvl1_huber_impl.step
        u, y = carry
        v = u - tau * _GRAD.apply_adjoint(y)
        u_new = f + _huber_prox(v - f, tau, gamma_d)
        ubar = 2.0 * u_new - u
        y_new = proj_norm21_ball(scale * (y + sigma * _GRAD.apply(ubar)), a)
        return u_new, y_new

    def outer_step(carry, _):
        u, y, p, z, opt_state, t = carry
        x = jnp.exp(z)
        a = alpha_of(x)
        a_safe = jnp.maximum(jnp.asarray(a, dtype),
                             jnp.asarray(1e-12, dtype))
        scale = 1.0 / (1.0 + sigma / (a_safe * gamma_r))
        if jnp.ndim(a) >= 2:
            scale = scale[..., None, :, :]
        u, y = lax.fori_loop(0, n_inner,
                             lambda k, c: pd_step(a, scale, c), (u, y))
        # smoothed adjoint system: swap the identity data block of the
        # TV-L2 system for the Huber data Hessian D
        M0, inv_diag0, fields = build_reg_system(u, (a,), _TV, gamma_r)
        d = jnp.where(jnp.abs(u - f) <= 1.0 / gamma_d, gamma_d,
                      jnp.asarray(0.0, dtype))

        def H(v):
            return M0(v) + (d - 1.0) * v

        diag = jnp.maximum(1.0 / inv_diag0 + (d - 1.0),
                           jnp.asarray(1e-12, dtype))
        # fixed n_adj Jacobi-CG steps, PER-IMAGE inner products: the
        # adjoint trajectory is independent of batch grouping, so mesh
        # runs match joint runs bit-for-bit
        p, _ = cg_batched(H, utrue - u, x0=p, tol=0.0, maxiter=n_adj,
                          M=lambda r: r / diag, item_ndim=2)
        g_map = scalarprod(_GRAD.apply(p), fields[0])   # (O, M, N)
        g_x = pullback(g_map)
        g_z = g_x * x                    # chain rule through x = exp(z)
        # kill unconverged-state transients before they poison the moments
        # (module docstring; applied after the psum, so shards agree)
        g_z = jnp.clip(g_z, -clip, clip)
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
        return (u, y, p, z_new, opt_state, t), (x, cost, gnorm)

    if carry0 is None:
        carry0 = _tvl1_init_carry(f, x0, param_shape=param_shape,
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


def _tvl1_init_carry(f, x0, *, param_shape: tuple, optimizer=None):
    """Initial scan carry: CP state (u, y), adjoint p, log α, optimizer
    state, step counter.  Cold start (0·f keeps the mesh-varying type, as
    in solvers.pdps)."""
    dtype = f.dtype
    zero_like = 0.0 * f[..., None, :, :]
    y0 = jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype) + zero_like
    p0 = jnp.zeros_like(f)
    z0 = jnp.log(jnp.asarray(x0, dtype))
    if optimizer is not None:
        opt_state0 = optimizer.init(z0)
    else:
        opt_state0 = (jnp.zeros(param_shape, dtype),
                      jnp.zeros(param_shape, dtype))
    return (f, y0, p0, z0, opt_state0, jnp.zeros((), dtype))


def single_loop_tvl1_learn(utrue, f, x0, *, outer: int = 300,
                           n_inner: int = 40, n_adj: int = 10,
                           lr: float = 0.05, gamma_d: float = 100.0,
                           gamma: float = 1000.0, tau0: float = 0.99,
                           sigma0: float = 0.99, beta1: float = 0.9,
                           beta2: float = 0.999, eps: float = 1e-8,
                           clip: float = 1.0, mesh=None,
                           optimizer=None, log_every=None,
                           segment_callback=None) -> SingleLoopResult:
    """Single-loop Huber-smoothed TV-L1 bilevel learning on (O, M, N) /
    (M, N) stacks.

    ``x0``: strictly positive scalar α or (m, n) patch grid (the parameter
    lives in log space).  ``gamma_d`` / ``gamma``: data / regularizer
    Huber slopes (:mod:`..solvers.tvl1_huber` convention — defaults match
    ``tvl1_bilevel_params``).  ``clip``: elementwise bound on the log-α
    gradient fed to the optimizer (module docstring — required for raw
    Adam to survive the early near-singular-adjoint transients; it also
    applies ahead of a user ``optimizer``).  ``optimizer``: optional optax
    transformation on log α (same caveats as
    :func:`.first_order.single_loop_learn`).  ``mesh``: optional 1-D
    batch mesh; zero-padded images contribute exactly nothing (their
    smoothed solve of f = 0 is 0 = ū, so p and the gradient map vanish).
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    x0 = jnp.asarray(x0, utrue.dtype)
    _check_positive_x0(x0)
    pop = tvl1_param_layout(x0, f.shape[-2:])
    kw = dict(outer=int(outer), n_inner=int(n_inner), n_adj=int(n_adj),
              pop=pop, param_shape=tuple(x0.shape), lr=lr,
              gamma_d=gamma_d, gamma_r=gamma, tau0=tau0, sigma0=sigma0,
              beta1=beta1, beta2=beta2, eps=eps, clip=float(clip),
              optimizer=optimizer)
    make_carry0 = functools.partial(_tvl1_init_carry, x0=x0,
                                    param_shape=tuple(x0.shape),
                                    optimizer=optimizer)

    def carry_spec_fn(carry, b, r):
        u, y, p, z, opt_state, t = carry
        return (b, b, b, r, jax.tree.map(lambda _: r, opt_state), r)

    res = drive_single_loop(_single_loop_tvl1_impl, utrue, f, x0, kw,
                            make_carry0=make_carry0,
                            carry_spec_fn=carry_spec_fn, mesh=mesh,
                            log_every=log_every,
                            segment_callback=segment_callback)
    if squeeze:
        res = res._replace(u=res.u[0])
    return res
