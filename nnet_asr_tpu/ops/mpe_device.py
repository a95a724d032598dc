"""Device-side MPE within-arc recursions (lax.scan over frames).

The SURVEY §7 step-8 design: the alpha/beta recursions run as ``lax.scan``
over the frame axis, batched over all arcs of a (length, n_states) bucket
— static shapes, no data-dependent control flow, jitted once per bucket
shape. Produces exactly the same log-likelihoods and occupancies as the
host engine (train/mpe.py arc_forward_backward_batch), which remains the
default on CPU; MpeComputer(engine="jax") switches to this path so the
arc-level math stays on the accelerator next to the NN forward pass.

The lattice-level node recursions stay host-side: they are a sequential
graph walk over a few hundred nodes (microseconds) — the reference also
ran its whole decoder on the host.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

LOG_ZERO = -1e30


def _lse(x, axis):
    m = jnp.max(x, axis=axis)
    good = m > LOG_ZERO / 2
    out = m + jnp.log(jnp.sum(jnp.exp(x - jnp.expand_dims(m, axis)),
                              axis=axis) + 1e-300)
    return jnp.where(good, out, LOG_ZERO)


@functools.partial(jax.jit, static_argnums=())
def arc_fb_device(log_obs: jnp.ndarray, lt: jnp.ndarray):
    """Batched within-arc forward-backward on device.

    log_obs: (A, L, S) emission log-probs; lt: (A, S+2, S+2) log transitions.
    Returns (log_like (A,), occupancy (A, L, S)).
    """
    A, L, S = log_obs.shape
    inner = lt[:, 1:S + 1, 1:S + 1]                     # (A, S, S)

    alpha0 = lt[:, 0, 1:S + 1] + log_obs[:, 0]          # (A, S)

    def fwd(carry, obs_t):
        prev = carry[:, :, None] + inner                # (A, S_from, S_to)
        a = _lse(prev, axis=1) + obs_t
        return a, a

    _, alphas = jax.lax.scan(fwd, alpha0,
                             jnp.moveaxis(log_obs[:, 1:], 1, 0))
    alpha = jnp.concatenate([alpha0[None], alphas], axis=0)   # (L, A, S)

    exit_scores = alpha[L - 1] + lt[:, 1:S + 1, S + 1]
    log_like = _lse(exit_scores, axis=1)

    betaL = lt[:, 1:S + 1, S + 1]                       # (A, S)

    def bwd(carry, obs_t):
        nxt = inner + (obs_t + carry)[:, None, :]
        b = _lse(nxt, axis=2)
        return b, b

    _, betas = jax.lax.scan(bwd, betaL,
                            jnp.moveaxis(log_obs[:, 1:], 1, 0),
                            reverse=True)
    beta = jnp.concatenate([betas, betaL[None]], axis=0)      # (L, A, S)

    ok = log_like > LOG_ZERO / 2
    occ = jnp.exp(jnp.clip(
        jnp.moveaxis(alpha + beta, 0, 1) - log_like[:, None, None], -700, 0))
    occ = jnp.where(ok[:, None, None], occ, 0.0)
    sums = jnp.sum(occ, axis=2, keepdims=True)
    occ = jnp.where(sums > 0, occ / jnp.where(sums > 0, sums, 1.0), 0.0)
    return jnp.where(ok, log_like, LOG_ZERO), occ


def arc_forward_backward_batch_jax(log_obs: np.ndarray, lt: np.ndarray):
    """Host-array wrapper matching train.mpe.arc_forward_backward_batch."""
    ll, occ = arc_fb_device(jnp.asarray(log_obs, jnp.float32),
                            jnp.asarray(lt, jnp.float32))
    return np.asarray(ll, dtype=np.float64), np.asarray(occ, dtype=np.float64)


@jax.jit
def arc_fwd_device(log_obs: jnp.ndarray, lt: jnp.ndarray):
    """Forward-only arc scoring (no occupancies) — the cheap pass of the
    prune-then-occupancy path (train.mpe.arc_forward_batch)."""
    A, L, S = log_obs.shape
    inner = lt[:, 1:S + 1, 1:S + 1]
    alpha0 = lt[:, 0, 1:S + 1] + log_obs[:, 0]

    def fwd(carry, obs_t):
        a = _lse(carry[:, :, None] + inner, axis=1) + obs_t
        return a, None

    alphaT, _ = jax.lax.scan(fwd, alpha0,
                             jnp.moveaxis(log_obs[:, 1:], 1, 0))
    log_like = _lse(alphaT + lt[:, 1:S + 1, S + 1], axis=1)
    return jnp.where(log_like > LOG_ZERO / 2, log_like, LOG_ZERO)


def arc_forward_batch_jax(log_obs: np.ndarray, lt: np.ndarray):
    """Host-array wrapper matching train.mpe.arc_forward_batch."""
    ll = arc_fwd_device(jnp.asarray(log_obs, jnp.float32),
                        jnp.asarray(lt, jnp.float32))
    return np.asarray(ll, dtype=np.float64)
