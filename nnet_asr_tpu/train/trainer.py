"""Single-chip frame-level trainer (TNet/TNetCu equivalent).

The epoch loop mirrors TNetCu.cc:376-442 — fill the device cache through the
transform pipeline, shuffle, iterate fixed-size bunches through one jitted
train step (forward + CE/MSE + backward + SGD update fused into a single XLA
program) — with the CPU tool's crossvalidate mode (TNet.cc:96-231) as a
forward-only variant. Objective statistics accumulate on device within a
cache and merge into float64 host totals at cache boundaries, preserving the
reference's double-precision reporting (ObjFun.h:16-54).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.components import BlockSoftmax, Softmax
from ..models.network import Network
from ..ops.objectives import (MseStats, XentStats, mse_loss_and_stats,
                              softmax_identity_backward, xent_loss_and_stats)
from .cache import FrameCache
from .pipeline import TransformPipeline
from .sgd import SgdConfig, apply_updates, init_momentum, layer_lr_factors


@dataclass
class TrainerConfig:
    bunchsize: int = 256
    cachesize: int = 12800
    seed: int = 0
    randomize: bool = True
    crossvalidate: bool = False
    objective: str = "xent"          # 'xent' | 'mse'
    sgd: SgdConfig = field(default_factory=SgdConfig)
    trace: int = 0


class Trainer:
    def __init__(self, net: Network, cfg: TrainerConfig,
                 transform: Optional[Network] = None,
                 start_frm_ext: int = 0, end_frm_ext: int = 0):
        net.check_dims()
        self.net = net
        self.cfg = cfg
        self.pipeline = TransformPipeline(transform, start_frm_ext, end_frm_ext)
        self.factors = tuple(layer_lr_factors(net, cfg.sgd))
        self.params = [dict(p) for p in net.params]
        self.velocity = init_momentum(net)
        self.stats = XentStats() if cfg.objective == "xent" else MseStats()
        self._build_steps()
        self.total_frames = 0
        self.wall = 0.0

    # ------------------------------------------------------------------
    def _split_head(self):
        """Separate a terminal (Block)Softmax for the fused-CE path."""
        specs = self.net.specs
        if specs and isinstance(specs[-1], Softmax):
            return specs[:-1], None, True
        if specs and isinstance(specs[-1], BlockSoftmax):
            return specs[:-1], specs[-1].dims, True
        return specs, None, False

    def _build_steps(self):
        cfg = self.cfg
        body_specs, block_dims, has_softmax = self._split_head()
        n_out = self.net.n_outputs

        def forward_logits(params, x):
            for spec, p in zip(body_specs, params):
                x = spec.apply(p, x)
            return x

        def loss_fn(params, feats, labels):
            logits = forward_logits(params, feats)
            if cfg.objective == "xent":
                if not has_softmax:
                    raise ValueError("CE objective expects a softmax output layer")
                return xent_loss_and_stats(logits, labels, block_dims)
            # MSE against one-hot targets; reference backprops err=y-t
            # through a terminal softmax unchanged (identity backward)
            y = softmax_identity_backward(logits) if has_softmax else logits
            targets = jax.nn.one_hot(labels, n_out, dtype=y.dtype)
            return mse_loss_and_stats(y, targets)

        factors = self.factors
        net = self.net
        sgd_cfg = cfg.sgd

        def train_step(params, velocity, acc, feats, labels):
            (_, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, feats, labels)
            params, velocity = apply_updates(
                net, params, velocity, grads, sgd_cfg,
                feats.shape[0], factors)
            acc = {k: acc[k] + stats[k] for k in acc}
            return params, velocity, acc

        def eval_step(acc, params, feats, labels):
            _, stats = loss_fn(params, feats, labels)
            return {k: acc[k] + stats[k] for k in acc}

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._eval_step = jax.jit(eval_step, donate_argnums=(0,))

    def _zero_acc(self):
        if self.cfg.objective == "xent":
            return {"xent": jnp.zeros((), jnp.float32),
                    "correct": jnp.zeros((), jnp.int32),
                    "frames": jnp.zeros((), jnp.int32)}
        return {"mse": jnp.zeros((), jnp.float32),
                "frames": jnp.zeros((), jnp.int32)}

    def _merge_acc(self, acc):
        if self.cfg.objective == "xent":
            self.stats.add(float(acc["xent"]), int(acc["frames"]), int(acc["correct"]))
        else:
            self.stats.add(float(acc["mse"]), int(acc["frames"]))

    # ------------------------------------------------------------------
    def _drain_cache(self, cache: FrameCache) -> None:
        acc = self._zero_acc()
        for feats, labels in cache.bunches():
            if self.cfg.crossvalidate:
                acc = self._eval_step(acc, self.params, feats, labels)
            else:
                self.params, self.velocity, acc = self._train_step(
                    self.params, self.velocity, acc, feats, labels)
        self._merge_acc(acc)

    def run_epoch(self, utterances: Iterable[Tuple[np.ndarray, np.ndarray]],
                  batch_utts: int = 32) -> None:
        """Train/evaluate one epoch.

        ``utterances`` yields (ext_feats (T+ext, D_in) float32, labels (T,) int32).
        ``batch_utts`` utterances are transformed together per pipeline call.
        """
        t0 = time.time()
        cache = FrameCache(self.cfg.cachesize, self.cfg.bunchsize,
                           self.cfg.seed, self.cfg.randomize)
        pend_feats, pend_labels = [], []

        def flush_pending():
            if not pend_feats:
                return
            outs = self.pipeline(pend_feats)
            for f, l in zip(outs, pend_labels):
                cache.add(f, l)
                self.total_frames += l.shape[0]
                if cache.full:
                    self._drain_cache(cache)
                while cache.has_leftover:
                    # leftover seeds the next fill; drain again if the
                    # leftover alone fills the cache (long utterance)
                    cache._take_leftover()
                    if cache.full:
                        self._drain_cache(cache)
                    else:
                        break
            pend_feats.clear()
            pend_labels.clear()

        for ext_feats, labels in utterances:
            pend_feats.append(np.asarray(ext_feats, dtype=np.float32))
            pend_labels.append(np.asarray(labels, dtype=np.int32))
            if len(pend_feats) >= batch_utts:
                flush_pending()
        flush_pending()
        # last (partial) cache
        if cache.rows > 0:
            self._drain_cache(cache)
        self.wall += time.time() - t0

    # ------------------------------------------------------------------
    def updated_network(self) -> Network:
        host = [{k: np.asarray(v) for k, v in p.items()} for p in self.params]
        return Network(self.net.specs, host)

    def report(self) -> str:
        return self.stats.report()

    def throughput_report(self) -> str:
        fps = self.total_frames / max(self.wall, 1e-9)
        rt = fps / 100.0
        return (f"Done {self.total_frames} frames in {self.wall:.2f}s"
                f" [FPS:{fps:.1f},RT:{rt:.4f}]\n")
