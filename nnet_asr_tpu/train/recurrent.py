"""Recurrent-network trainer with truncated BPTT (TRecurrentCu path).

The reference trains frame-serially: per frame forward, CE, then a
truncated BPTT-of-order-K walk over the input history with an immediate
weight update (TRecurrentCu.cc:355-371, cuRecurrent.cc:86-153). A
frame-serial Python loop would be the worst possible TPU program, so the
TPU-native design scans *segments* of K frames: one ``lax.scan`` per
utterance carries (params, velocity, hidden state) across segments, the
gradient is truncated at segment boundaries (``stop_gradient`` on the
carried state), and the update applies per segment instead of per frame.
This changes the optimization trajectory slightly (documented deviation —
SURVEY.md §7 "frame-serial recurrent parity"); verify on loss curves, not
bits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..models.components import Recurrent, Softmax
from ..models.network import Network
from ..ops.objectives import XentStats
from .sgd import SgdConfig, apply_updates, init_momentum, layer_lr_factors


@dataclass
class RecurrentTrainerConfig:
    bptt_order: int = 4              # TRecurrentCu.cc:194 default
    crossvalidate: bool = False
    sgd: SgdConfig = field(default_factory=SgdConfig)


class RecurrentTrainer:
    def __init__(self, net: Network, cfg: RecurrentTrainerConfig):
        net.check_dims()
        self.net = net
        self.cfg = cfg
        self.params = [dict(p) for p in net.params]
        self.velocity = init_momentum(net, cfg.sgd.momentum)
        self.factors = tuple(layer_lr_factors(net, cfg.sgd))
        self.stats = XentStats()
        self.rec_idx = [i for i, s in enumerate(net.specs)
                        if isinstance(s, Recurrent)]
        self._utt_fns = {}
        self._build()

    def _forward_seg(self, params, x_seg, h_list):
        """Forward a (B, K, D) segment batch; recurrent layers scan time
        per utterance (vmapped over the batch)."""
        import jax

        h_out = list(h_list)
        h = x_seg
        ri = 0
        logits = None
        for i, spec in enumerate(self.net.specs):
            if isinstance(spec, Recurrent):
                h, h_last = jax.vmap(
                    lambda xs, h0, p=params[i], s=spec:
                        s.apply_with_state(p, xs, h0))(h, h_list[ri])
                h_out[ri] = h_last
                ri += 1
            elif isinstance(spec, Softmax) and i == len(self.net.specs) - 1:
                logits = h
            else:
                h = spec.apply(params[i], h)
        if logits is None:
            logits = h
        return logits, h_out

    def _build(self):
        cfg = self.cfg
        net = self.net
        factors = self.factors
        has_softmax = isinstance(net.specs[-1], Softmax)
        if not has_softmax:
            raise ValueError("recurrent trainer expects terminal <softmax>")
        n_out = net.n_outputs

        def seg_loss(params, x_seg, labels_seg, mask_seg, h_list):
            # x_seg (B, K, D), labels/mask (B, K)
            logits, h_new = self._forward_seg(params, x_seg, h_list)
            lp = jax.nn.log_softmax(logits, axis=-1)
            # one-hot contraction: take_along_axis's VJP is a scatter,
            # which serializes on TPU
            picked = jnp.sum(
                lp * jax.nn.one_hot(labels_seg, n_out, dtype=lp.dtype),
                axis=-1)
            loss = -jnp.sum(jnp.where(mask_seg, picked, 0.0))
            pred = jnp.argmax(logits, axis=-1)
            stats = {
                "xent": -jnp.sum(jnp.where(
                    mask_seg, jnp.maximum(jax.lax.stop_gradient(picked), -1e10),
                    0.0)),
                "correct": jnp.sum(jnp.where(mask_seg, pred == labels_seg,
                                             False).astype(jnp.int32)),
                "frames": jnp.sum(mask_seg.astype(jnp.int32)),
            }
            return loss, (stats, h_new)

        def utt_step(params, velocity, acc, feats, labels, mask):
            """feats (n_seg, B, K, D); scan segments, truncating grads at
            boundaries via stop_gradient on the carried state."""
            B = feats.shape[1]
            h_init = [jnp.zeros((B, net.specs[i].n_outputs), jnp.float32)
                      for i in self.rec_idx]

            def body(carry, seg):
                params, velocity, acc, h_list = carry
                x_seg, l_seg, m_seg = seg
                h_list = [jax.lax.stop_gradient(h) for h in h_list]
                if cfg.crossvalidate:
                    _, (stats, h_new) = seg_loss(params, x_seg, l_seg,
                                                 m_seg, h_list)
                else:
                    (_, (stats, h_new)), grads = jax.value_and_grad(
                        seg_loss, has_aux=True)(params, x_seg, l_seg,
                                                m_seg, h_list)
                    params, velocity = apply_updates(
                        net, params, velocity, grads, cfg.sgd,
                        jnp.maximum(stats["frames"], 1), factors)
                acc = {k: acc[k] + stats[k] for k in acc}
                return (params, velocity, acc, h_new), None

            (params, velocity, acc, _), _ = jax.lax.scan(
                body, (params, velocity, acc, h_init), (feats, labels, mask))
            return params, velocity, acc

        self._utt_step = jax.jit(utt_step, donate_argnums=(0, 1, 2))

    def _zero_acc(self):
        return {"xent": jnp.zeros((), jnp.float32),
                "correct": jnp.zeros((), jnp.int32),
                "frames": jnp.zeros((), jnp.int32)}

    def train_utterance(self, feats: np.ndarray, labels: np.ndarray) -> None:
        self.train_batch([feats], [labels])

    def train_batch(self, feats_list, labels_list) -> None:
        """Train a batch of utterances together (TPU-native mode).

        Utterances are padded to a common segment grid and scanned as one
        program; each segment step updates once with the summed gradient
        over the batch — batched truncated BPTT. With a single utterance
        this reduces to the utterance-serial behavior.
        """
        K = self.cfg.bptt_order
        B = len(feats_list)
        D = feats_list[0].shape[1]
        T_max = max(f.shape[0] for f in feats_list)
        n_seg = -(-T_max // K)
        F = np.zeros((B, n_seg * K, D), np.float32)
        L = np.zeros((B, n_seg * K), np.int32)
        M = np.zeros((B, n_seg * K), bool)
        for b, (f, l) in enumerate(zip(feats_list, labels_list)):
            T = f.shape[0]
            F[b, :T] = f
            L[b, :T] = l
            M[b, :T] = True
        # (n_seg, B, K, ...) so lax.scan walks segments
        F = np.moveaxis(F.reshape(B, n_seg, K, D), 0, 1)
        L = np.moveaxis(L.reshape(B, n_seg, K), 0, 1)
        M = np.moveaxis(M.reshape(B, n_seg, K), 0, 1)
        acc = self._zero_acc()
        self.params, self.velocity, acc = self._utt_step(
            self.params, self.velocity, acc,
            jnp.asarray(F), jnp.asarray(L), jnp.asarray(M))
        self.stats.add(float(acc["xent"]), int(acc["frames"]),
                       int(acc["correct"]))

    def run_epoch(self, utterances, batch_utts: int = 1) -> None:
        pend_f, pend_l = [], []
        for feats, labels in utterances:
            pend_f.append(np.asarray(feats, np.float32))
            pend_l.append(np.asarray(labels, np.int32))
            if len(pend_f) >= batch_utts:
                self.train_batch(pend_f, pend_l)
                pend_f, pend_l = [], []
        if pend_f:
            self.train_batch(pend_f, pend_l)

    def updated_network(self) -> Network:
        host = [{k: np.asarray(v) for k, v in p.items()} for p in self.params]
        return Network(self.net.specs, host)

    def report(self) -> str:
        return self.stats.report()
