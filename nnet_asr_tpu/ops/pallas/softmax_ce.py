"""Fused softmax + cross-entropy + gradient Pallas kernel.

One pass over the logits computes, per 8/16-sublane tile:
  - the CE gradient ``err = softmax(logits) - onehot(labels)`` (the
    reference's fused global gradient, ObjFun.cc:93-96 / Activation.cc:49-52)
  - the clamped Xent sum and the frame-correct count (ObjFun.cc:100-127)

versus the XLA decomposition this reads the logits from HBM once and writes
the gradient once — no intermediate softmax round-trip — and the backward
pass is a free elementwise scale of the stored gradient.

The class-dimension must be padded to a lane multiple with ``-1e30`` so
padding never wins max/sum; ``fused_softmax_xent`` below handles that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interpret():
    import jax
    return jax.default_backend() != "tpu"

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

NEG_FILL = -1e30


def _kernel(logits_ref, labels_ref, err_ref, xent_ref, corr_ref):
    # all intermediates stay 2-D (BT, C) or (BT, 1); scalar reductions go
    # straight from 2-D to SMEM (Mosaic rejects 1-D vector layouts here)
    i = pl.program_id(0)

    x = logits_ref[:]                      # (BT, C)
    labels = labels_ref[:, :1]             # (BT, 1) int32
    BT, C = x.shape
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = e / s

    col = jax.lax.broadcasted_iota(jnp.int32, (BT, C), 1)
    hit = col == labels                    # (BT, C) one-hot positions
    err_ref[:] = p - hit.astype(x.dtype)

    # per-row stats; rows with label < 0 are padding rows
    valid = labels >= 0                    # (BT, 1)
    logp = x - m - jnp.log(s)              # (BT, C)
    picked = jnp.sum(jnp.where(hit, jnp.maximum(logp, -1e10), 0.0),
                     axis=1, keepdims=True)
    xent_t = -jnp.sum(jnp.where(valid, picked, 0.0))
    # first-max-wins argmax (FindMaxId): lowest col index achieving max
    first_max = jnp.min(jnp.where(x >= m, col, C), axis=1, keepdims=True)
    corr_t = jnp.sum(jnp.where(valid & (first_max == labels), 1, 0))

    @pl.when(i == 0)
    def _():
        xent_ref[0, 0] = 0.0
        corr_ref[0, 0] = 0

    xent_ref[0, 0] += xent_t
    corr_ref[0, 0] += corr_t


def _pad_cols(x, mult=128, fill=NEG_FILL):
    C = x.shape[1]
    Cp = -(-C // mult) * mult
    if Cp == C:
        return x
    return jnp.pad(x, ((0, 0), (0, Cp - C)), constant_values=fill)


def _pad_rows(x, mult, fill):
    B = x.shape[0]
    Bp = -(-B // mult) * mult
    if Bp == B:
        return x
    pad = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_softmax_xent(logits, labels, block_rows: int = 256):
    """loss (sum over rows of -log softmax[label]) + stats, Pallas-fused.

    Returns (loss, {"xent", "correct", "frames"}). d loss/d logits is the
    fused ``err`` computed in the same kernel pass.
    """
    loss, stats, _ = _fwd_impl(logits, labels, block_rows)
    return loss, stats


def _fwd_impl(logits, labels, block_rows):
    B, C = logits.shape
    xp = _pad_cols(logits.astype(jnp.float32))
    xp = _pad_rows(xp, block_rows, 0.0)
    # labels as a (B, 128) lane-aligned block (value broadcast; col 0 used)
    lp = _pad_rows(labels.astype(jnp.int32), block_rows, -1)
    lp = jnp.broadcast_to(lp[:, None], (lp.shape[0], 128))
    Bp, Cp = xp.shape

    grid = (Bp // block_rows,)
    err, xent, corr = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, Cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, Cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(xp, lp)
    err = err[:B, :C]
    loss = xent[0, 0]   # == sum(-logp) since labels are one-hot picks
    stats = {"xent": xent[0, 0], "correct": corr[0, 0],
             "frames": jnp.asarray(B, jnp.int32)}
    return loss, stats, err


def _fwd(logits, labels, block_rows):
    loss, stats, err = _fwd_impl(logits, labels, block_rows)
    return (loss, stats), err


def _bwd(block_rows, err, g):
    g_loss, _ = g
    return (err * g_loss, None)


fused_softmax_xent.defvjp(_fwd, _bwd)
