"""Fused weight-gradient + momentum-SGD Pallas kernel.

The reference's GPU trainer runs ONE fused ``Update()`` per layer that
computes the weight gradient and applies momentum + learning rate in a
single pass over the parameter (cuBiasedLinearity.cc:44-63). XLA fuses
the momentum-0 ``p -= lr*g`` into the wgrad GEMM epilogue on its own,
but with momentum the ``v_new = g + m*v → p_new = p - a*v_new`` chain is
scheduled as a post-backward tail: the slope-timed A/B in docs/KERNELS.md
measured the momentum drain at 68.7% of bf16 peak vs 83.2% momentum-0,
and bf16-stored velocity (halving the v stream) recovered only 0.06 ms —
the gap is serialization, not bandwidth.

This kernel is the TPU analog of the reference's fused update: the wgrad
``g = x^T @ e`` accumulates K-blocked in a VMEM scratch (MXU), and the
final K step applies the momentum update in the epilogue — the velocity
and parameter tiles stream through VMEM *during* the GEMM's grid, and the
gradient never exists in HBM at all:

    g     = x^T @ e                 (sum over the bunch, X^T E convention)
    corr  = g + m * v
    v_new = corr                    (stored at v's dtype; math in f32)
    p_new = p - a * corr            (a = lr/N, runtime SMEM scalar)

Used by the ``mom9_fused`` probe config (scripts/mfu_drain_ab.py) only —
the production momentum path stays on XLA because this kernel measured
SLOWER at every compilable block config (a pallas_call is opaque to the
latency-hiding scheduler; docs/KERNELS.md momentum table). Kept for
re-measurement on future XLA/Mosaic releases; semantics identical to
train/sgd.py apply_updates (momentum branch) — asserted in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def _kernel(a_ref, x_ref, e_ref, p_ref, v_ref, p_out, v_out, acc_ref,
            *, m, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # x tile (bk, bm), e tile (bk, bn): contract the bunch dim of both
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], e_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        corr = acc_ref[:] + m * v_ref[:].astype(jnp.float32)
        v_out[:] = corr.astype(v_out.dtype)
        p_out[:] = (p_ref[:].astype(jnp.float32)
                    - a_ref[0] * corr).astype(p_out.dtype)


def _pad_to(x, row_mult, col_mult):
    r = -(-x.shape[0] // row_mult) * row_mult
    c = -(-x.shape[1] // col_mult) * col_mult
    if (r, c) == x.shape:
        return x
    return jnp.pad(x, ((0, r - x.shape[0]), (0, c - x.shape[1])))


def wgrad_momentum_update(x, e, p, v, a, m: float,
                          bm: int = 256, bn: int = 256, bk: int = 512):
    """(p_new, v_new) from one fused wgrad+momentum pass.

    x (B, In) activations, e (B, Out) error signal (both f32),
    p (In, Out) f32 weights, v (In, Out) velocity (f32 or bf16),
    a runtime scalar = lr/N (SgdConfig semantics), m static momentum.
    """
    B, In = x.shape
    B2, Out = e.shape
    assert B == B2 and p.shape == (In, Out) and v.shape == (In, Out)

    # bm is the LANE dim of the x tile (bk, bm): Mosaic requires lane dims
    # that are multiples of 128 (width-8 was interpret-mode-only and failed
    # to compile on real TPUs for In like 130 — ADVICE r3)
    bm = min(bm, -(-In // 128) * 128)
    bn = min(bn, -(-Out // 128) * 128)
    bk = min(bk, -(-B // 8) * 8)
    xp = _pad_to(x, bk, bm)
    ep = _pad_to(e, bk, bn)
    pp = _pad_to(p, bm, bn)
    vp = _pad_to(v, bm, bn)
    Bp, Inp = xp.shape
    _, Outp = ep.shape
    n_k = Bp // bk
    a_arr = jnp.asarray(a, jnp.float32).reshape(1)

    grid = (Inp // bm, Outp // bn, n_k)
    p_new, v_new = pl.pallas_call(
        functools.partial(_kernel, m=float(m), n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bk, bm), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Inp, Outp), p.dtype),
            jax.ShapeDtypeStruct((Inp, Outp), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Inp * Outp * Bp,
            bytes_accessed=(Bp * Inp + Bp * Outp + 4 * Inp * Outp) * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(a_arr, xp, ep, pp, vp)
    return p_new[:In, :Out], v_new[:In, :Out]
