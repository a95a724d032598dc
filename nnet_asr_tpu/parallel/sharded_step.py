"""Sharded training step: data parallelism × senone-sharded output layer.

TPU-native replacement for the reference's two parallelism mechanisms
(SURVEY.md §2.9):

  * Platform's N trainer threads with shared weights + row-striped fp64
    gradient reduction (Platform.h:143-391, BiasedLinearity.cc:88-178)
    → the ``data`` mesh axis: per-device batch shards, gradient ``psum``
    over ICI, identical replicated update on every device.
  * The embryonic column-block output structure (BlockSoftmax /
    CuDiscreteLinearity) → the ``model`` mesh axis: the senone output
    layer's weight columns live sharded, the softmax normalizer is a
    ``psum``/``pmax`` over the model axis, and each shard updates only its
    own column stripe — the exact TPU analog of the reference's
    "each thread updates a disjoint row stripe".

Built on ``shard_map`` so the collective placement is explicit; XLA lowers
psum/pmax to ICI all-reduces.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.components import BiasedLinearity, Softmax
from ..models.network import Network
from ..train.sgd import SgdConfig, apply_updates, layer_lr_factors


@dataclass
class ShardedTrainState:
    params: List[dict]
    velocity: List[dict]
    param_specs: List[dict]   # PartitionSpec pytree matching params

    def to_device(self, mesh: Mesh):
        """Place params/velocity with their shardings."""
        def put(tree, specs):
            return [
                {k: jax.device_put(v, NamedSharding(mesh, specs[i][k]))
                 for k, v in p.items()}
                for i, p in enumerate(tree)]
        self.params = put(self.params, self.param_specs)
        self.velocity = put(self.velocity, self.param_specs)
        return self


def _find_output_layer(net: Network) -> int:
    """Index of the senone-producing BiasedLinearity (expects a terminal
    Softmax behind it)."""
    if not (len(net.specs) >= 2 and isinstance(net.specs[-1], Softmax)
            and isinstance(net.specs[-2], BiasedLinearity)):
        raise ValueError(
            "sharded step expects ... -> <biasedlinearity> -> <softmax>")
    return len(net.specs) - 2


def make_sharded_train_step(net: Network, sgd_cfg: SgdConfig, mesh: Mesh):
    """Build (state, step_fn, eval_fn) for CE training on a (data, model) mesh.

    step_fn(params, velocity, acc, feats, labels) -> (params, velocity, acc)
    with feats sharded P('data', None), labels P('data'); gradient semantics
    identical to the single-chip trainer (sums over the global bunch).
    """
    out_idx = _find_output_layer(net)
    body_specs = net.specs[:out_idx]
    out_spec_comp = net.specs[out_idx]
    n_out = out_spec_comp.n_outputs
    m_size = mesh.shape["model"]
    d_size = mesh.shape["data"]
    if n_out % m_size:
        raise ValueError(f"output dim {n_out} not divisible by model={m_size}")
    factors = tuple(layer_lr_factors(net, sgd_cfg))

    # ---- parameter partition specs -----------------------------------
    param_specs: List[dict] = []
    for i, (spec, p) in enumerate(zip(net.specs, net.params)):
        if i == out_idx:
            param_specs.append({"weight": P(None, "model"), "bias": P("model")})
        else:
            param_specs.append({k: P() for k in p})

    state = ShardedTrainState(
        params=[dict(p) for p in net.params],
        velocity=[{k: jnp.zeros_like(v) for k, v in p.items()
                   if k in s.trainable_keys}
                  for s, p in zip(net.specs, net.params)],
        param_specs=param_specs)

    # ---- local (per-shard) loss --------------------------------------
    def local_loss(params, feats, labels):
        h = feats
        for spec, p in zip(body_specs, params[:out_idx]):
            h = spec.apply(p, h)
        logits = h @ params[out_idx]["weight"] + params[out_idx]["bias"]
        out_loc = n_out // m_size

        # distributed log-softmax over the model axis
        m = jax.lax.pmax(jnp.max(jax.lax.stop_gradient(logits), axis=1), "model")
        s = jax.lax.psum(jnp.sum(jnp.exp(logits - m[:, None]), axis=1), "model")
        off = jax.lax.axis_index("model") * out_loc
        # one-hot contraction (a gather's VJP is a TPU-hostile scatter);
        # labels outside this shard's span give all-zero one-hot rows, so
        # non-owning shards contribute 0 to the psum automatically
        oh_loc = jax.nn.one_hot(labels - off, out_loc, dtype=logits.dtype)
        picked_loc = jnp.sum(logits * oh_loc, axis=1)
        picked = jax.lax.psum(picked_loc, "model")
        logp = picked - m - jnp.log(s)
        # each model shard computes the same loss copy redundantly; scale by
        # 1/m so psum'ing the relayed cotangents counts the loss exactly once
        loss = -jnp.sum(logp) / m_size

        # distributed argmax with first-max-wins tie-break (FindMaxId analog)
        local_max = jnp.max(jax.lax.stop_gradient(logits), axis=1)
        local_arg = jnp.argmax(jax.lax.stop_gradient(logits), axis=1) + off
        gmax = jax.lax.pmax(local_max, "model")
        cand = jnp.where(local_max >= gmax, local_arg, n_out)
        pred = jax.lax.pmin(cand, "model")
        stats = {
            "xent": -jnp.sum(jnp.maximum(jax.lax.stop_gradient(logp), -1e10)),
            "correct": jnp.sum((pred == labels).astype(jnp.int32)),
            "frames": jnp.asarray(labels.shape[0], jnp.int32),
        }
        return loss, stats

    def _shard_step(params, velocity, acc, feats, labels):
        (_, stats), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, feats, labels)
        # replicated params: partial grads per (data, model) cell
        # sharded output layer: partial only over data
        for i in range(len(grads)):
            axes = ("data",) if i == out_idx else ("data", "model")
            grads[i] = {k: jax.lax.psum(v, axes) for k, v in grads[i].items()}
        global_frames = labels.shape[0] * d_size
        params, velocity = apply_updates(
            net, params, velocity, grads, sgd_cfg, global_frames, factors)
        stats = {k: jax.lax.psum(v, "data") for k, v in stats.items()}
        acc = {k: acc[k] + stats[k] for k in acc}
        return params, velocity, acc

    def _shard_eval(params, acc, feats, labels):
        _, stats = local_loss(params, feats, labels)
        stats = {k: jax.lax.psum(v, "data") for k, v in stats.items()}
        return {k: acc[k] + stats[k] for k in acc}

    vel_specs = [{k: param_specs[i][k] for k in v}
                 for i, v in enumerate(state.velocity)]
    acc_spec = {"xent": P(), "correct": P(), "frames": P()}

    step = shard_map(
        _shard_step, mesh=mesh,
        in_specs=(param_specs, vel_specs, acc_spec, P("data", None), P("data")),
        out_specs=(param_specs, vel_specs, acc_spec),
        check_vma=False)
    evalf = shard_map(
        _shard_eval, mesh=mesh,
        in_specs=(param_specs, acc_spec, P("data", None), P("data")),
        out_specs=acc_spec,
        check_vma=False)

    # whole-cache drains: lax.scan over stacked bunches (nb, bunch, ...)
    # sharded P(None, 'data', ...) — one XLA program per cache, as in the
    # single-chip trainer
    def _drain_train_body(params, velocity, acc, feats_all, labels_all):
        def body(carry, batch):
            p, v, a = carry
            p, v, a = _shard_step(p, v, a, batch[0], batch[1])
            return (p, v, a), None
        (params, velocity, acc), _ = jax.lax.scan(
            body, (params, velocity, acc), (feats_all, labels_all))
        return params, velocity, acc

    def _drain_eval_body(params, acc, feats_all, labels_all):
        def body(a, batch):
            return _shard_eval(params, a, batch[0], batch[1]), None
        acc, _ = jax.lax.scan(body, acc, (feats_all, labels_all))
        return acc

    drain_train = shard_map(
        _drain_train_body, mesh=mesh,
        in_specs=(param_specs, vel_specs, acc_spec,
                  P(None, "data", None), P(None, "data")),
        out_specs=(param_specs, vel_specs, acc_spec),
        check_vma=False)
    drain_eval = shard_map(
        _drain_eval_body, mesh=mesh,
        in_specs=(param_specs, acc_spec,
                  P(None, "data", None), P(None, "data")),
        out_specs=acc_spec,
        check_vma=False)

    fns = {
        "step": jax.jit(step, donate_argnums=(0, 1, 2)),
        "eval": jax.jit(evalf, donate_argnums=(1,)),
        "drain_train": jax.jit(drain_train, donate_argnums=(0, 1, 2)),
        "drain_eval": jax.jit(drain_eval, donate_argnums=(1,)),
    }
    return state, fns["step"], fns["eval"], fns


def zero_acc():
    return {"xent": jnp.zeros((), jnp.float32),
            "correct": jnp.zeros((), jnp.int32),
            "frames": jnp.zeros((), jnp.int32)}
