"""Fused affine+activation Pallas matmul: y = act(x @ W + b).

The hidden-layer hot loop (BiasedLinearity→Sigmoid,
TNetLib/BiasedLinearity.cc:9-23 + Activation.cc:7-14) as one MXU kernel:
K-blocked accumulation in an f32 VMEM scratch, bias+sigmoid epilogue on the
last K step — logits never round-trip to HBM. Backward is two plain GEMMs
(XLA-optimal already) over the saved activation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interpret():
    import jax
    return jax.default_backend() != "tpu"

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, y_ref, acc_ref, *, act, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        z = acc_ref[:] + b_ref[:]
        if act == "sigmoid":
            z = jax.nn.sigmoid(z)
        elif act == "none":
            pass
        else:
            raise ValueError(act)
        y_ref[:] = z.astype(y_ref.dtype)


def _pad_to(x, row_mult, col_mult):
    r = -(-x.shape[0] // row_mult) * row_mult
    c = -(-x.shape[1] // col_mult) * col_mult
    if (r, c) == x.shape:
        return x
    return jnp.pad(x, ((0, r - x.shape[0]), (0, c - x.shape[1])))


def matmul_act(x, w, b, act: str = "sigmoid",
               bm: int = 256, bk: int = 512, bn: int = 256):
    """Pallas fused act(x @ w + b); x (M,K) f32/bf16, w (K,N), b (N,)."""
    M, K = x.shape
    K2, N = w.shape
    assert K == K2

    def pick(dim, pref, mult):
        # choose a block size <= pref (multiple of `mult`) minimizing padding
        best, best_pad = mult, None
        for cand in range(mult, pref + 1, mult):
            pad = -(-dim // cand) * cand - dim
            if best_pad is None or pad <= best_pad:
                best, best_pad = cand, pad
        return best

    bm = pick(M, bm, 8)
    bn = pick(N, bn, 128)
    # single K block when it fits comfortably in VMEM (K <= 1024)
    kp = -(-K // 128) * 128
    bk = kp if kp <= max(bk, 1024) else pick(K, bk, 128)
    xp = _pad_to(x, bm, bk)
    wp = _pad_to(w, bk, bn)
    bp = _pad_to(b[None, :], 1, bn)
    Mp, Kp = xp.shape
    _, Np = wp.shape
    n_k = Kp // bk

    grid = (Mp // bm, Np // bn, n_k)
    y = pl.pallas_call(
        functools.partial(_kernel, act=act, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=(Mp * Kp + Kp * Np + Mp * Np) * 4,
            transcendentals=Mp * Np if act == "sigmoid" else 0),
        interpret=_interpret(),
    )(xp, wp, bp)
    return y[:M, :N]


@jax.custom_vjp
def affine_sigmoid(x, w, b):
    """y = sigmoid(x @ w + b) with fused Pallas forward."""
    return matmul_act(x, w, b, act="sigmoid")


def _fwd(x, w, b):
    y = matmul_act(x, w, b, act="sigmoid")
    return y, (x, w, y)


def _bwd(res, g):
    x, w, y = res
    yf = y.astype(jnp.float32)
    dz = g.astype(jnp.float32) * yf * (1.0 - yf)
    dzc = dz.astype(x.dtype)
    dx = jnp.dot(dzc, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.dot(x.T, dzc, preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(dz, axis=0).astype(x.dtype)
    return dx, dw, db


affine_sigmoid.defvjp(_fwd, _bwd)
