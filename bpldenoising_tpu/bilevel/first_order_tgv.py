"""Single-loop first-order TGV² bilevel learning — entirely on device.

The TGV analogue of :mod:`.first_order` (same single-loop idea, cf.
Suonperä & Valkonen, arXiv:2408.08123): instead of solving the joint-primal
Chambolle–Pock problem to convergence per outer evaluation (the
trust-region paths), the inner (u, w, p, q) state, the adjoint multiplier
λ and the weights are advanced *together*:

    per outer step:
      1. ``n_inner`` joint-CP iterations at the current (α₁, α₀)
         (warm-started state, :func:`..solvers.tgv._step`);
      2. ``n_adj`` Jacobi-CG iterations on the γ-Huber smoothed joint
         system at the current iterate (warm-started λ; PER-IMAGE inner
         products, so the trajectory is independent of batch grouping and
         data-parallel shards reproduce the joint run exactly);
      3. an Adam step on log(α₁, α₀) (positivity by construction) using
         the approximate hypergradient
         g₁ = −⟨ψ_γ(∇u−w), ∇λᵤ−λ_w⟩, g₀ = −⟨ψ_γ(Ew), Eλ_w⟩.

The whole loop is one ``lax.scan`` under one ``jit`` — no host round trips
until the final result.  Supports the 2-vector and (m, n, 2) patch-grid
parameterizations and a 1-D batch mesh (shard_map; the only collectives
are the per-step psum of the two gradient reductions and the cost).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import PatchOp, scalarprod
from ..ops.grad import FwdGradientOp
from ..ops.tgv import TGV_OPNORM_SQ, sym_grad
from ..solvers.krylov import cg_batched
from ..solvers.tgv import _build_joint_system, _step
from .first_order import (SingleLoopResult, _check_positive_x0,
                          drive_single_loop)

__all__ = ["single_loop_tgv_learn", "tgv_param_layout"]

_GRAD = FwdGradientOp()


def tgv_param_layout(x0, image_shape) -> Optional[PatchOp]:
    """(2,) weight vector → None; (m, n, 2) patch stack → its PatchOp.
    Shared by every TGV entry point so the parameterization rule cannot
    drift between them."""
    if x0.shape == (2,):
        return None
    if x0.ndim == 3 and x0.shape[-1] == 2:
        return PatchOp(tuple(x0.shape[:2]), tuple(image_shape))
    raise ValueError(f"TGV parameter must be a length-2 vector "
                     f"[alpha1, alpha0] or an (m, n, 2) patch stack, "
                     f"got shape {x0.shape}")


@functools.partial(
    jax.jit,
    static_argnames=("outer", "n_inner", "n_adj", "pop", "param_shape",
                     "axis_name", "optimizer", "return_carry"))
def _single_loop_tgv_impl(utrue, f, x0, *, outer: int, n_inner: int,
                          n_adj: int, pop: Optional[PatchOp],
                          param_shape: tuple, lr, gamma, tau0, sigma0,
                          beta1, beta2, eps,
                          axis_name: Optional[str] = None, optimizer=None,
                          carry0=None, return_carry: bool = False):
    dtype = f.dtype
    L = jnp.sqrt(jnp.asarray(TGV_OPNORM_SQ, dtype))
    tau = jnp.asarray(tau0, dtype) / L
    sigma = jnp.asarray(sigma0, dtype) / L
    gamma = jnp.asarray(gamma, dtype)

    def alphas_of(x):
        if pop is None:
            return x[0], x[1]
        return pop.apply(x[..., 0]), pop.apply(x[..., 1])

    def pullback(g1, g0):
        """Per-pixel sensitivity maps (summed over the local batch) →
        parameter shape; psum over the mesh first so every device sees the
        replicated gradient."""
        if axis_name is not None:
            g1 = lax.psum(g1, axis_name)
            g0 = lax.psum(g0, axis_name)
        if pop is None:
            return jnp.stack([jnp.sum(g1), jnp.sum(g0)])
        return jnp.stack([pop.apply_adjoint(jnp.sum(g1, axis=0)),
                          pop.apply_adjoint(jnp.sum(g0, axis=0))], axis=-1)

    def cg_steps(H, diag, b, lam):
        # fixed n_adj Jacobi-CG steps with PER-IMAGE inner products
        # (cg_batched, tol=0): each image's adjoint iteration is
        # independent of batch grouping, so mesh runs match joint runs
        lam, _ = cg_batched(H, b, x0=lam, tol=0.0, maxiter=n_adj,
                            M=lambda r: r / diag, item_ndim=3)
        return lam

    def outer_step(carry, _):
        state, lam, z, opt_state, t = carry
        x = jnp.exp(z)
        a1, a0 = alphas_of(x)
        step = functools.partial(_step, f, a1, a0, tau, sigma)
        state = lax.fori_loop(0, n_inner, lambda k, s: step(s), state)
        u, w = state[0], state[1]
        H, diag, psi_y, psi_z = _build_joint_system(u, w, a1, a0, gamma)
        rhs = jnp.concatenate([(utrue - u)[..., None, :, :],
                               jnp.zeros_like(w)], axis=-3)
        lam = cg_steps(H, diag, rhs, lam)
        lu = lam[..., 0, :, :]
        lw = lam[..., 1:3, :, :]
        # λ solves H λ = ū − u (NOT u − ū like the exact-solve learning
        # function), so the chain-rule minus signs cancel: g = +⟨ψ, ·⟩
        g1 = scalarprod(psi_y, _GRAD.apply(lu) - lw)
        g0 = scalarprod(psi_z, sym_grad(lw))
        g_x = pullback(g1, g0)
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
        return (state, lam, z_new, opt_state, t), (x, cost, gnorm)

    if carry0 is None:
        carry0 = _tgv_init_carry(f, x0, param_shape=param_shape,
                                 optimizer=optimizer)

    carry, (alphas_traj, costs, gnorms) = lax.scan(outer_step, carry0,
                                                   None, length=outer)
    state, _, z, _, _ = carry
    u = state[0]
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


def _tgv_init_carry(f, x0, *, param_shape: tuple, optimizer=None):
    """Initial scan carry: joint-CP state (u, w, p, q), adjoint λ, log α,
    optimizer state, step counter.  Cold start (0·f keeps the mesh-varying
    type, as in solvers.tgv)."""
    dtype = f.dtype
    zf = 0.0 * f[..., None, :, :]
    vec = jnp.zeros(f.shape[:-2] + (2,) + f.shape[-2:], dtype) + zf
    ten = jnp.zeros(f.shape[:-2] + (3,) + f.shape[-2:], dtype) + zf
    state0 = (f, vec, vec, ten)
    lam0 = jnp.zeros(f.shape[:-2] + (3,) + f.shape[-2:], dtype) + zf
    z0 = jnp.log(jnp.asarray(x0, dtype))
    if optimizer is not None:
        opt_state0 = optimizer.init(z0)
    else:
        opt_state0 = (jnp.zeros(param_shape, dtype),
                      jnp.zeros(param_shape, dtype))
    return (state0, lam0, z0, opt_state0, jnp.zeros((), dtype))


def single_loop_tgv_learn(utrue, f, x0, *, outer: int = 300,
                          n_inner: int = 40, n_adj: int = 10,
                          lr: float = 0.02, gamma: float = 1e-4,
                          tau0: float = 0.99, sigma0: float = 0.99,
                          beta1: float = 0.9, beta2: float = 0.999,
                          eps: float = 1e-8, mesh=None,
                          optimizer=None, log_every: Optional[int] = None,
                          segment_callback=None) -> SingleLoopResult:
    """Single-loop TGV² bilevel learning.

    ``x0``: strictly positive ``[α₁, α₀]`` 2-vector or (m, n, 2) patch
    stack (the parameter lives in log space).  ``optimizer``: optional
    optax transformation on log α (same caveats as
    :func:`.first_order.single_loop_learn`).  ``mesh``: optional 1-D batch
    mesh; zero-padded images contribute exactly nothing (their solve of
    f = 0 is 0 = ū, so λ and both gradient maps vanish).

    ``lr`` defaults to 0.02 (below the TV families' 0.05): the TGV cost
    is nearly flat in α₀ far from the optimum, and a faster log-space
    walk can outrun the fixed ``n_inner`` budget there and diverge
    (measured on pyramid_128_10 — FIDELITY.md "TGV method agreement");
    raise ``n_inner`` if you raise ``lr``.
    """
    utrue = jnp.asarray(utrue)
    f = jnp.asarray(f, utrue.dtype)
    squeeze = f.ndim == 2
    if squeeze:
        utrue, f = utrue[None], f[None]
    x0 = jnp.asarray(x0, utrue.dtype)
    _check_positive_x0(x0)
    pop = tgv_param_layout(x0, f.shape[-2:])
    kw = dict(outer=int(outer), n_inner=int(n_inner), n_adj=int(n_adj),
              pop=pop, param_shape=tuple(x0.shape), lr=lr, gamma=gamma,
              tau0=tau0, sigma0=sigma0, beta1=beta1, beta2=beta2, eps=eps,
              optimizer=optimizer)
    make_carry0 = functools.partial(_tgv_init_carry, x0=x0,
                                    param_shape=tuple(x0.shape),
                                    optimizer=optimizer)

    def carry_spec_fn(carry, b, r):
        state, lam, z, opt_state, t = carry
        return (jax.tree.map(lambda _: b, state), b, r,
                jax.tree.map(lambda _: r, opt_state), r)

    res = drive_single_loop(_single_loop_tgv_impl, utrue, f, x0, kw,
                            make_carry0=make_carry0,
                            carry_spec_fn=carry_spec_fn, mesh=mesh,
                            log_every=log_every,
                            segment_callback=segment_callback)
    if squeeze:
        res = res._replace(u=res.u[0])
    return res
