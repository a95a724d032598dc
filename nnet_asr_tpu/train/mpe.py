"""MPE / sMBR lattice forward-backward sequence training (TMpeCu path).

Architecture mirrors the reference's split (TMpeCu.cc:461-672): the NN
forward runs on the accelerator, log posteriors come to the host, the
lattice recursions run host-side (STK's token-passing decoder was also
host code), and the resulting ``err = -kappa * gamma_mpe`` matrix goes back
to the device for backprop through the softmax-identity path.

The recursions re-implement Decoder::GetMpeGamma's math
(Decoder.tcc:2443-2578 forward-backward, 3136-3266 gamma scatter) on
phone-arc lattices in a dense, vectorizable form:

  * within-arc state-level forward-backward over the phone HMM's emitting
    states (left-to-right with <TRANSP> probabilities), emissions =
    kappa-scaled senone log posteriors — yields the arc acoustic
    log-likelihood and per-frame state occupancies;
  * lattice-level log-space alpha/beta over nodes → arc posteriors
    gamma_q;
  * MPE accuracy statistics (AlphaBetaMPE analog): per-arc raw accuracy
    against the reference phone segmentation using Povey's approximate
    phone accuracy, accuracy-weighted alpha_acc/beta_acc means, and
    gamma_mpe_q = gamma_q * (alpha_acc + c_q + beta_acc - c_avg);
  * scatter into the (frame, senone) gamma matrix through the within-arc
    occupancies. ``--MLGAMMA`` mode accumulates plain occupancies instead
    (TMpeCu.cc:564-566).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io.htk_hmm import Hmm
from ..io.slf import Lattice

LOG_ZERO = -1e30


def _logsumexp(a: np.ndarray) -> float:
    m = np.max(a)
    if m <= LOG_ZERO:
        return LOG_ZERO
    return float(m + np.log(np.sum(np.exp(a - m))))


@dataclass
class MpeConfig:
    lm_scale: float = 1.0
    outprb_scale: float = 1.0          # kappa (acoustic/posterior scale)
    ml_gamma: bool = False             # plain ML occupancy accumulation
    frame_rate: float = 100.0
    pron_scale: float = 1.0            # PRONUNSCALE (TMpeCu.cc:265)
    word_penalty: float = 0.0          # WORDPENALTY (TMpeCu.cc:256)
    # RESPECTPRONVARS (TMpeCu.cc:274): True expands only the lattice's
    # variant; False (ref default) expands every dictionary variant
    respect_pronun_var: bool = False
    # lattice beam (log domain): nodes whose alpha falls more than this
    # below the best alpha at the same node time are deactivated, as
    # STK's token-passing state pruning (Decoder mPruningThresh,
    # TMpeCu.cc:559: 0 means no pruning / -LOG_0)
    pruning: float = 0.0
    # word-lattice expansion: integrate over ALL intra-word phone
    # segmentations (STK-exact, Decoder.tcc:2443-2578) instead of the MAP
    # Viterbi boundaries; exact_window=W restricts boundary times to ±W
    # frames of the MAP boundary (None = fully exact). Closes
    # docs/DEVIATIONS.md §3a at O(k·span²) arcs per word arc.
    exact_segmentation: bool = False
    exact_window: Optional[int] = None
    # TRANSPSCALE (TMpeCu.cc:266 → decoder.mTranScale, Decoder.tcc:1962):
    # multiplies the LOG transition probabilities in the within-arc FB
    transp_scale: float = 1.0
    # MODELPENALTY (TMpeCu.cc:257 → decoder.mMPenalty, Decoder.tcc:1713):
    # additive log penalty per model (= per phone arc) entry
    model_penalty: float = 0.0
    # OCCUPPSCALE (TMpeCu.cc:267 → decoder.mOcpScale, Decoder.tcc:2732):
    # exponent on the occupancy part of every gamma contribution,
    # exp(s·(α+β−P)) == (γ_q·occ)^s in the factorized engine
    occup_scale: float = 1.0
    # STARTTIMESHIFT/ENDTIMESHIFT (TMpeCu.cc:294-296, in_net_fmt): shift
    # every arc's start/end time by these SECONDS when reading lattices
    start_time_shift: float = 0.0
    end_time_shift: float = 0.0


@dataclass
class ArcInfo:
    start: int
    end: int
    t0: int
    t1: int                            # exclusive
    phone: str
    senones: List[int]
    log_like: float = LOG_ZERO
    occupancy: Optional[np.ndarray] = None   # (t1-t0, n_emitting)
    score: float = LOG_ZERO            # log_like + lm contribution
    accuracy: float = 0.0


def arc_forward_backward(log_obs: np.ndarray, transp: np.ndarray):
    """State-level FB within one arc.

    ``log_obs``: (T, S) kappa-scaled emission log-probs for the S emitting
    states; ``transp``: (S+2, S+2) HTK transition probabilities (entry row
    0, exit col S+1). Returns (log_likelihood, occupancy (T, S)).
    """
    T, S = log_obs.shape
    with np.errstate(divide="ignore"):
        lt = np.where(transp > 0, np.log(np.maximum(transp, 1e-300)), LOG_ZERO)
    # alpha over emitting states 1..S (matrix indices 1..S)
    alpha = np.full((T, S), LOG_ZERO)
    alpha[0] = lt[0, 1:S + 1] + log_obs[0]
    for t in range(1, T):
        # logsumexp over predecessor states
        prev = alpha[t - 1][:, None] + lt[1:S + 1, 1:S + 1]
        m = prev.max(axis=0)
        good = m > LOG_ZERO / 2
        acc = np.where(good,
                       m + np.log(np.sum(np.exp(prev - m[None, :]), axis=0)
                                  + 1e-300),
                       LOG_ZERO)
        alpha[t] = acc + log_obs[t]
    exit_scores = alpha[T - 1] + lt[1:S + 1, S + 1]
    log_like = _logsumexp(exit_scores)
    if log_like <= LOG_ZERO / 2:
        return LOG_ZERO, np.zeros((T, S))

    beta = np.full((T, S), LOG_ZERO)
    beta[T - 1] = lt[1:S + 1, S + 1]
    for t in range(T - 2, -1, -1):
        nxt = lt[1:S + 1, 1:S + 1] + (log_obs[t + 1] + beta[t + 1])[None, :]
        m = nxt.max(axis=1)
        good = m > LOG_ZERO / 2
        beta[t] = np.where(good,
                           m + np.log(np.sum(np.exp(nxt - m[:, None]), axis=1)
                                      + 1e-300),
                           LOG_ZERO)
    occ = np.exp(np.clip(alpha + beta - log_like, -700, 0))
    occ[occ < 1e-300] = 0.0
    # normalize tiny numeric drift per frame
    sums = occ.sum(axis=1, keepdims=True)
    occ = np.divide(occ, sums, out=np.zeros_like(occ), where=sums > 0)
    return log_like, occ


def arc_forward_backward_batch(log_obs: np.ndarray, lt: np.ndarray):
    """Vectorized within-arc FB over a bucket of same-shape arcs.

    ``log_obs``: (A, L, S) emissions; ``lt``: (A, S+2, S+2) log transitions.
    Returns (log_like (A,), occupancy (A, L, S)). Same math as
    arc_forward_backward, batched over arcs to kill the per-arc Python
    overhead (the T-decode hot loop).
    """
    A, L, S = log_obs.shape
    inner = lt[:, 1:S + 1, 1:S + 1]                  # (A, S, S)
    alpha = np.full((A, L, S), LOG_ZERO)
    alpha[:, 0] = lt[:, 0, 1:S + 1] + log_obs[:, 0]

    def lse(x, axis):
        m = np.max(x, axis=axis)
        good = m > LOG_ZERO / 2
        with np.errstate(over="ignore"):
            out = m + np.log(np.sum(np.exp(x - np.expand_dims(m, axis)),
                                    axis=axis) + 1e-300)
        return np.where(good, out, LOG_ZERO)

    for t in range(1, L):
        prev = alpha[:, t - 1][:, :, None] + inner    # (A, S_from, S_to)
        alpha[:, t] = lse(prev, axis=1) + log_obs[:, t]
    exit_scores = alpha[:, L - 1] + lt[:, 1:S + 1, S + 1]
    log_like = lse(exit_scores, axis=1)               # (A,)

    beta = np.full((A, L, S), LOG_ZERO)
    beta[:, L - 1] = lt[:, 1:S + 1, S + 1]
    for t in range(L - 2, -1, -1):
        nxt = inner + (log_obs[:, t + 1] + beta[:, t + 1])[:, None, :]
        beta[:, t] = lse(nxt, axis=2)

    ok = log_like > LOG_ZERO / 2
    occ = np.exp(np.clip(alpha + beta - log_like[:, None, None], -700, 0))
    occ[~ok] = 0.0
    sums = occ.sum(axis=2, keepdims=True)
    occ = np.divide(occ, sums, out=np.zeros_like(occ), where=sums > 0)
    return np.where(ok, log_like, LOG_ZERO), occ


def arc_forward_batch(log_obs: np.ndarray, lt: np.ndarray) -> np.ndarray:
    """Forward-only half of ``arc_forward_backward_batch``: arc acoustic
    log-likelihoods without materializing occupancies.  This is the cheap
    scoring pass of the prune-then-occupancy path — occupancies are filled
    in later only for arcs that survive the lattice beam."""
    A, L, S = log_obs.shape
    inner = lt[:, 1:S + 1, 1:S + 1]

    def lse(x, axis):
        m = np.max(x, axis=axis)
        good = m > LOG_ZERO / 2
        with np.errstate(over="ignore"):
            out = m + np.log(np.sum(np.exp(x - np.expand_dims(m, axis)),
                                    axis=axis) + 1e-300)
        return np.where(good, out, LOG_ZERO)

    alpha = lt[:, 0, 1:S + 1] + log_obs[:, 0]
    for t in range(1, L):
        prev = alpha[:, :, None] + inner
        alpha = lse(prev, axis=1) + log_obs[:, t]
    log_like = lse(alpha + lt[:, 1:S + 1, S + 1], axis=1)
    return np.where(log_like > LOG_ZERO / 2, log_like, LOG_ZERO)


def povey_phone_accuracy(phone: str, t0: int, t1: int,
                         ref: Sequence[Tuple[int, int, str]]) -> float:
    """Approximate raw phone accuracy (Povey 2002):
    max over ref phones z of (-1 + 2e) if same phone else (-1 + e),
    e = overlap(q, z) / len(z)."""
    best = -1.0
    for (r0, r1, rp) in ref:
        if r1 <= t0 or r0 >= t1:
            continue
        e = (min(t1, r1) - max(t0, r0)) / max(r1 - r0, 1)
        acc = -1.0 + (2.0 * e if rp == phone else e)
        best = max(best, acc)
    return best


def labels_to_phone_segments(frame_labels: np.ndarray,
                             label_names: Sequence[str]):
    """Collapse per-frame state labels into (start, end, phone) segments;
    phone = state tag with the trailing ``_sN`` stripped."""
    import re

    segs = []
    prev = None
    start = 0
    phones = [re.sub(r"_s\d+$", "", label_names[l]) for l in frame_labels]
    for i, p in enumerate(phones):
        if p != prev:
            if prev is not None:
                segs.append((start, i, prev))
            prev, start = p, i
    if prev is not None:
        segs.append((start, len(phones), prev))
    return segs


class MpeComputer:
    def __init__(self, hmms: Dict[str, Hmm], label_map: Dict[str, int],
                 cfg: MpeConfig, engine: str = "numpy",
                 dictionary: Optional[dict] = None):
        self.hmms = hmms
        self.label_map = label_map
        self.cfg = cfg
        self.expander = None
        if dictionary:
            # word lattices: expand word arcs to timed phone chains
            # against the same kappa-scaled posteriors (TMpeCu.cc:535-544
            # ExpansionsAndOptimizations analog — train/lattice_expand.py)
            from .lattice_expand import LatticeExpander
            self.expander = LatticeExpander(
                hmms, label_map, dictionary,
                outprb_scale=cfg.outprb_scale, pron_scale=cfg.pron_scale,
                word_penalty=cfg.word_penalty, frame_rate=cfg.frame_rate,
                multiple_pronun=not cfg.respect_pronun_var,
                segmentation="exact" if cfg.exact_segmentation else "map",
                exact_window=cfg.exact_window,
                transp_scale=cfg.transp_scale)
        self._padded = engine == "jax"
        if self._padded:
            # bucket-padded masked kernels: ONE device call per utterance
            # and a bounded program count (exact shapes would compile one
            # XLA program per distinct (n_arcs, length) — hundreds per
            # corpus, ruinous on remote-compile backends)
            from ..ops.mpe_device import arc_fb_padded_jax, arc_fwd_padded_jax
            self._arc_fb_padded = arc_fb_padded_jax
            self._arc_fwd_padded = arc_fwd_padded_jax
        self._arc_fb_batch = arc_forward_backward_batch
        self._arc_fwd_batch = arc_forward_batch
        self._senone_cache = {
            name: h.senone_ids(label_map) for name, h in hmms.items()}
        with np.errstate(divide="ignore"):
            # TRANSPSCALE multiplies the log transitions (STK stores log
            # probs in mpMatrixO; Decoder.tcc:1962 scales them by
            # mTranScale when building the recognition net)
            self._log_tp = {
                name: cfg.transp_scale * np.where(
                    h.transp > 0,
                    np.log(np.maximum(h.transp, 1e-300)), LOG_ZERO)
                for name, h in hmms.items()}

    # ------------------------------------------------------------------
    def _build_arcs(self, lat: Lattice, log_post: np.ndarray):
        T = log_post.shape[0]
        # STARTTIMESHIFT/ENDTIMESHIFT: per-arc start/end shift in frames
        sh0 = int(round(self.cfg.start_time_shift * self.cfg.frame_rate))
        sh1 = int(round(self.cfg.end_time_shift * self.cfg.frame_rate))
        arcs: List[ArcInfo] = []
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for a in lat.arcs:
            phone = lat.arc_word(a)
            t0 = min(max(lat.frame(a.start, self.cfg.frame_rate) + sh0, 0), T)
            t1 = min(max(lat.frame(a.end, self.cfg.frame_rate) + sh1, 0), T)
            if phone is None or phone in ("!NULL", "<s>", "</s>"):
                arcs.append(ArcInfo(a.start, a.end, t0, t1, phone or "!NULL",
                                    [], log_like=0.0,
                                    score=self.cfg.lm_scale * a.lm + a.prior))
                continue
            if phone not in self.hmms:
                raise KeyError(f"Phone '{phone}' not in HMM set")
            ids = self._senone_cache[phone]
            if t1 <= t0:
                raise ValueError(f"Zero-length arc for phone {phone}")
            # MODELPENALTY enters each model's (= phone arc's) score once
            info = ArcInfo(a.start, a.end, t0, t1, phone, list(ids),
                           score=(self.cfg.lm_scale * a.lm + a.prior
                                  + self.cfg.model_penalty))
            buckets.setdefault((t1 - t0, len(ids)), []).append(len(arcs))
            arcs.append(info)
        return arcs, buckets

    def _bucket_inputs(self, arcs, idxs, L, S, log_post):
        obs = np.empty((len(idxs), L, S))
        lt = np.empty((len(idxs), S + 2, S + 2))
        for j, i in enumerate(idxs):
            a = arcs[i]
            obs[j] = self.cfg.outprb_scale * log_post[a.t0:a.t1][:, a.senones]
            lt[j] = self._log_tp[a.phone]
        return obs, lt

    def _obs_lt_lists(self, arcs, idxs, log_post):
        obs_list, lt_list = [], []
        for i in idxs:
            a = arcs[i]
            obs_list.append(
                self.cfg.outprb_scale * log_post[a.t0:a.t1][:, a.senones])
            lt_list.append(self._log_tp[a.phone])
        return obs_list, lt_list

    def _group_by_states(self, arcs, idxs):
        groups: Dict[int, List[int]] = {}
        for i in idxs:
            groups.setdefault(len(arcs[i].senones), []).append(i)
        return groups

    def _prepare_arcs(self, lat: Lattice, log_post: np.ndarray) -> List[ArcInfo]:
        """Full pass: arc scores AND occupancies (no-pruning fast path —
        one batched FB per (length, n_states) bucket; padded engine: one
        masked call per n_states group)."""
        arcs, buckets = self._build_arcs(lat, log_post)
        if self._padded:
            all_idxs = [i for idxs in buckets.values() for i in idxs]
            for _, idxs in self._group_by_states(arcs, all_idxs).items():
                obs_l, lt_l = self._obs_lt_lists(arcs, idxs, log_post)
                lls, occs = self._arc_fb_padded(obs_l, lt_l)
                for j, i in enumerate(idxs):
                    arcs[i].log_like = lls[j]
                    arcs[i].occupancy = occs[j]
                    arcs[i].score += lls[j]
            return arcs, buckets
        for (L, S), idxs in buckets.items():
            obs, lt = self._bucket_inputs(arcs, idxs, L, S, log_post)
            lls, occs = self._arc_fb_batch(obs, lt)
            for j, i in enumerate(idxs):
                arcs[i].log_like = float(lls[j])
                arcs[i].occupancy = occs[j]
                arcs[i].score += float(lls[j])
        return arcs, buckets

    def _score_arcs(self, lat: Lattice, log_post: np.ndarray):
        """Scoring-only pass (forward recursions, no occupancies) — used
        when a lattice beam is active so occupancies are computed only for
        surviving arcs."""
        arcs, buckets = self._build_arcs(lat, log_post)
        if self._padded:
            all_idxs = [i for idxs in buckets.values() for i in idxs]
            for _, idxs in self._group_by_states(arcs, all_idxs).items():
                obs_l, lt_l = self._obs_lt_lists(arcs, idxs, log_post)
                lls = self._arc_fwd_padded(obs_l, lt_l)
                for j, i in enumerate(idxs):
                    arcs[i].log_like = lls[j]
                    arcs[i].score += lls[j]
            return arcs, buckets
        for (L, S), idxs in buckets.items():
            obs, lt = self._bucket_inputs(arcs, idxs, L, S, log_post)
            lls = self._arc_fwd_batch(obs, lt)
            for j, i in enumerate(idxs):
                arcs[i].log_like = float(lls[j])
                arcs[i].score += float(lls[j])
        return arcs, buckets

    def _fill_occupancies(self, arcs, idxs, log_post):
        """Occupancy FB for the given (surviving) arc indices."""
        if self._padded:
            if not idxs:
                return
            for _, ids in self._group_by_states(arcs, idxs).items():
                obs_l, lt_l = self._obs_lt_lists(arcs, ids, log_post)
                _, occs = self._arc_fb_padded(obs_l, lt_l)
                for j, i in enumerate(ids):
                    arcs[i].occupancy = occs[j]
            return
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for i in idxs:
            a = arcs[i]
            buckets.setdefault((a.t1 - a.t0, len(a.senones)), []).append(i)
        for (L, S), ids in buckets.items():
            obs, lt = self._bucket_inputs(arcs, ids, L, S, log_post)
            _, occs = self._arc_fb_batch(obs, lt)
            for j, i in enumerate(ids):
                arcs[i].occupancy = occs[j]

    # ------------------------------------------------------------------
    def compute(self, lat: Lattice, log_post: np.ndarray,
                ref_segments: Sequence[Tuple[int, int, str]],
                utt_weight: float = 1.0,
                frame_weights: Optional[np.ndarray] = None,
                pruning: Optional[float] = None):
        """Returns (gammas (T, C), avg_accuracy, log_prob).

        ``pruning`` overrides cfg.pruning for this utterance (the
        widen-and-retry loop of TMpeCu.cc:587-609 passes successively
        wider beams). Raises FloatingPointError on forward-backward
        underflow — overpruning or bad data.
        """
        T, C = log_post.shape
        if self.expander is not None and self.expander.needs_expansion(lat):
            lat = self.expander.expand(lat, log_post)
        beam = self.cfg.pruning if pruning is None else pruning
        beam = beam if beam > 0.0 else None     # 0 => -LOG_0, TMpeCu.cc:559
        if beam is None:
            arcs, _ = self._prepare_arcs(lat, log_post)
        else:
            arcs, _ = self._score_arcs(lat, log_post)
        n = len(lat.nodes)

        in_arcs: List[List[int]] = [[] for _ in range(n)]
        out_arcs: List[List[int]] = [[] for _ in range(n)]
        for i, a in enumerate(arcs):
            in_arcs[a.end].append(i)
            out_arcs[a.start].append(i)

        order = sorted(range(n), key=lambda i: (lat.nodes[i].time, i))
        start_nodes = [i for i in range(n) if not in_arcs[i]]
        end_nodes = [i for i in range(n) if not out_arcs[i]]

        # node recursions run in scalar Python float math: in-degrees are
        # tiny (2-50), where numpy's per-call overhead dominates by 10x
        from math import exp as _exp, log as _log

        def _lse_list(vals):
            m = max(vals)
            if m <= LOG_ZERO / 2:
                return LOG_ZERO
            return m + _log(sum(_exp(v - m) for v in vals))

        arc_start = [a.start for a in arcs]
        arc_end = [a.end for a in arcs]
        arc_score = [a.score for a in arcs]

        # ---- alpha/beta over nodes -----------------------------------
        # With a beam, nodes are processed in time groups and any node
        # whose alpha falls more than ``beam`` below the group's best is
        # deactivated (alpha := LOG_ZERO) — the lattice analog of STK's
        # per-frame token beam (Decoder mPruningThresh). Overpruning can
        # kill every path; compute() then underflows and the caller widens
        # the beam (TMpeCu.cc:587-609).
        alpha = [LOG_ZERO] * n
        for i in start_nodes:
            alpha[i] = 0.0
        group: List[int] = []
        group_time = None
        pruned: set = set()

        def _apply_beam():
            if beam is None or not group:
                return
            best = max(alpha[j] for j in group)
            if best <= LOG_ZERO / 2:
                return
            for j in group:
                if alpha[j] < best - beam:
                    alpha[j] = LOG_ZERO
                    pruned.add(j)
            group.clear()

        for i in order:
            if beam is not None and lat.nodes[i].time != group_time:
                _apply_beam()
                group_time = lat.nodes[i].time
                group = []
            if in_arcs[i]:
                alpha[i] = _lse_list(
                    [alpha[arc_start[q]] + arc_score[q] for q in in_arcs[i]])
            if beam is not None:
                group.append(i)
        _apply_beam()
        beta = [LOG_ZERO] * n
        for i in end_nodes:
            if i not in pruned:
                beta[i] = 0.0
        for i in reversed(order):
            if i in pruned:
                continue            # dead node: paths through it stay dead
            if out_arcs[i]:
                beta[i] = _lse_list(
                    [arc_score[q] + beta[arc_end[q]] for q in out_arcs[i]])
        logZ = _lse_list([alpha[i] for i in end_nodes])
        if logZ <= LOG_ZERO / 2:
            raise FloatingPointError("lattice forward-backward underflow "
                                     "(overpruning?)")

        gamma_q = np.exp(np.clip(
            np.asarray(alpha)[arc_start] + np.asarray(arc_score)
            + np.asarray(beta)[arc_end] - logZ, -700, 0))

        # ---- MPE accuracy (vectorized over arcs x ref segments) ------
        seg_t0 = np.asarray([s[0] for s in ref_segments], dtype=np.float64)
        seg_t1 = np.asarray([s[1] for s in ref_segments], dtype=np.float64)
        seg_ph = [s[2] for s in ref_segments]
        a_t0 = np.asarray([a.t0 for a in arcs], dtype=np.float64)
        a_t1 = np.asarray([a.t1 for a in arcs], dtype=np.float64)
        overlap = (np.minimum(a_t1[:, None], seg_t1[None, :])
                   - np.maximum(a_t0[:, None], seg_t0[None, :]))
        e = np.clip(overlap, 0, None) / np.maximum(seg_t1 - seg_t0, 1)[None, :]
        same = np.asarray([[a.phone == p for p in seg_ph] for a in arcs])
        acc_mat = np.where(same, -1.0 + 2.0 * e, -1.0 + e)
        acc_mat = np.where(e > 0, acc_mat, -1.0)
        arc_acc = np.max(acc_mat, axis=1, initial=-1.0)
        for i, a in enumerate(arcs):
            a.accuracy = float(arc_acc[i]) if a.senones else 0.0

        alpha_acc = [0.0] * n
        for i in order:
            if in_arcs[i]:
                ws = [alpha[arc_start[q]] + arc_score[q] for q in in_arcs[i]]
                z = _lse_list(ws)
                if z <= LOG_ZERO / 2:
                    continue        # all predecessors pruned/unreachable
                alpha_acc[i] = sum(
                    _exp(w - z) * (alpha_acc[arc_start[q]] + arcs[q].accuracy)
                    for w, q in zip(ws, in_arcs[i]))
        beta_acc = [0.0] * n
        for i in reversed(order):
            if out_arcs[i]:
                ws = [arc_score[q] + beta[arc_end[q]] for q in out_arcs[i]]
                z = _lse_list(ws)
                if z <= LOG_ZERO / 2:
                    continue
                beta_acc[i] = sum(
                    _exp(w - z) * (arcs[q].accuracy + beta_acc[arc_end[q]])
                    for w, q in zip(ws, out_arcs[i]))

        c_avg = sum(_exp(alpha[i] - logZ) * alpha_acc[i] for i in end_nodes)

        # ---- scatter into (frame, senone) ----------------------------
        # OCCUPPSCALE: exponent on the occupancy part of each gamma
        # contribution, exp(s·(α+β−P)) per (state, frame) — the analog of
        # Decoder.tcc:2732/2835 applying mOcpScale to the log occupancy
        # while the MPE accuracy coefficient stays linear. Factorized:
        # (γ_q·occ)^s = γ_q^s · occ^s.
        ocp = self.cfg.occup_scale

        def _coef(gq, a):
            gq_s = gq if ocp == 1.0 else gq ** ocp
            if self.cfg.ml_gamma:
                return gq_s
            return gq_s * (alpha_acc[a.start] + a.accuracy
                           + beta_acc[a.end] - c_avg)

        if beam is not None:
            # occupancies were deferred; compute them only for arcs that
            # survived the beam and actually contribute
            needed = [i for i, a in enumerate(arcs)
                      if a.senones and a.occupancy is None
                      and _coef(gamma_q[i], a) != 0.0]
            self._fill_occupancies(arcs, needed, log_post)

        gammas = np.zeros((T, C), dtype=np.float64)
        fw = frame_weights if frame_weights is not None else np.ones(T)
        for gq, a in zip(gamma_q, arcs):
            if not a.senones or a.occupancy is None:
                continue
            coef = _coef(gq, a)
            if coef == 0.0:
                continue
            occ = a.occupancy if ocp == 1.0 else a.occupancy ** ocp
            seg = (coef * utt_weight) * occ \
                * fw[a.t0:a.t1][:, None]
            for j, sid in enumerate(a.senones):
                gammas[a.t0:a.t1, sid] += seg[:, j]
        return gammas.astype(np.float32), c_avg, logZ
