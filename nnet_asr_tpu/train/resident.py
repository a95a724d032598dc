"""Device-resident newbob training: the persistent-worker fast path.

The reference scheduler restarts a TNet process per epoch; even our
in-process scheduler re-reads and re-transforms every feature file each
iteration, and on a remote-compile TPU tunnel most of an epoch's wall time
is that intake, not compute (BASELINE_MEASURED.md). Because TNet fixes
the shuffle seed per epoch (--SEED is constant across scheduler
iterations, run_test.CPU.sh:55-70), every epoch trains on the IDENTICAL
bunch sequence — so the epoch-1 stacked bunches can live in HBM and every
later epoch is nothing but the fused drain scans:

    read + transform + shuffle ONCE  →  (nb, bunch, D) stacks in HBM
    per epoch: reload params from the newbob-selected MMF, reset momentum
    (the reference's per-process optimizer state), run drain_train over
    the cached stacks with the epoch's learning rate as a RUNTIME scalar
    (no recompiles across newbob halving), write the epoch MMF.

Bit-equivalence with the streaming path holds because the MMF writer
round-trips float32 exactly (9 significant digits, docs/DEVIATIONS.md §4)
and the drain programs are the same XLA computations.

Memory bound: the whole (transformed) training set must fit in HBM —
131 MB for example-01; fall back to the streaming scheduler for corpora
beyond device memory.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.network import Network
from ..ops.objectives import XentStats
from .cache import DeviceFrameCache
from .pipeline import TransformPipeline
from .sgd import SgdConfig, init_momentum
from .trainer import Trainer, TrainerConfig


class ResidentNewbob:
    """Builds newbob train/crossvalidate closures over HBM-cached bunches."""

    def __init__(self, nn_init: str, transform: Optional[Network],
                 reader, labels_repo, cfg: TrainerConfig,
                 frm_ext: int = 0):
        self.reader = reader
        self.labels_repo = labels_repo
        self.cfg = cfg
        self.frm_ext = frm_ext
        self.pipeline = TransformPipeline(transform, frm_ext, frm_ext)
        net0 = Network.read(nn_init)
        self.trainer = Trainer(net0, cfg, transform, frm_ext, frm_ext)
        self.net_specs = net0.specs
        self._train_stacks = None
        self._cv_stacks = None
        self.train_frames = 0
        self.cv_frames = 0

    # -- one-time intake ------------------------------------------------
    def _collect(self, scp_entries, randomize: bool,
                 batch_utts: int = 32, labels_repo=None) -> Tuple[List, int]:
        """Read+transform+shuffle once; return stacked device bunches.

        Reproduces Trainer.run_epoch's intake exactly (same seed, same
        utterance order, same cache boundaries) so the cached bunch
        sequence is identical to what every streaming epoch would see.
        """
        cache = DeviceFrameCache(self.cfg.cachesize, self.cfg.bunchsize,
                                 self.cfg.seed, randomize)
        stacks = []
        total = 0
        pend_f, pend_l = [], []

        def flush():
            nonlocal total
            if not pend_f:
                return
            rows, valid = self.pipeline.transform_block(pend_f)
            labels_block = np.concatenate(pend_l)
            total += valid
            cache.add_block(rows, valid, labels_block)
            while cache.full:
                stacked = cache.take_stacked()
                if stacked is not None:
                    stacks.append(stacked)
            pend_f.clear()
            pend_l.clear()

        labels_repo = labels_repo or self.labels_repo
        for e in scp_entries:
            feats = self.reader.read(e.physical, e.logical)
            n_real = feats.shape[0] - 2 * self.frm_ext
            labs = labels_repo.get_frame_labels(
                n_real, self.reader.last_header.sample_period, e.logical)
            pend_f.append(np.asarray(feats, np.float32))
            pend_l.append(np.asarray(labs, np.int32))
            if len(pend_f) >= batch_utts:
                flush()
        flush()
        if cache.rows > 0:
            stacked = cache.take_stacked()
            if stacked is not None:
                stacks.append(stacked)
        return stacks, total

    def prepare(self, train_entries, cv_entries,
                cv_labels_repo=None) -> None:
        self._train_stacks, self.train_frames = self._collect(
            train_entries, randomize=self.cfg.randomize)
        self._cv_stacks, self.cv_frames = self._collect(
            cv_entries, randomize=False, labels_repo=cv_labels_repo)

    # -- per-epoch closures ----------------------------------------------
    def _load_params(self, mmf: str):
        net = Network.read(mmf)
        return [{k: jnp.asarray(v) for k, v in p.items()}
                for p in net.params]

    def train_epoch(self, src: str, lrate: float, dst: str) -> float:
        import time

        t0 = time.time()
        tr = self.trainer
        tr.params = self._load_params(src)
        # fresh momentum per epoch: the reference's optimizer state lives
        # and dies within an epoch process (SURVEY.md §5)
        tr.velocity = init_momentum(Network(self.net_specs, tr.params),
                                    self.cfg.sgd.momentum)
        tr.set_learning_rate(lrate)
        tr.stats = XentStats()
        acc_total = None
        for feats_all, labels_all in self._train_stacks:
            acc = tr._zero_acc()
            tr.params, tr.velocity, acc = tr._drain_train(
                tr.params, tr.velocity, acc, feats_all, labels_all, tr._lr)
            tr._merge_acc(acc)
        host = [{k: np.asarray(v) for k, v in p.items()} for p in tr.params]
        Network(self.net_specs, host).write(dst)
        stats = tr.stats
        print(stats.report(), end="")
        fps = self.train_frames / max(time.time() - t0, 1e-9)
        print(f"Done {self.train_frames} frames in {time.time() - t0:.2f}s"
              f" [FPS:{fps:.1f},RT:{fps / 100.0:.4f}] (resident)")
        return stats.accuracy

    def crossvalidate(self, mmf: str) -> float:
        import time

        t0 = time.time()
        tr = self.trainer
        params = self._load_params(mmf)
        stats = XentStats()
        for feats_all, labels_all in self._cv_stacks:
            acc = tr._zero_acc()
            acc = tr._drain_eval(params, acc, feats_all, labels_all)
            stats.add(float(acc["xent"]), int(acc["frames"]),
                      int(acc["correct"]))
        print(stats.report(), end="")
        fps = self.cv_frames / max(time.time() - t0, 1e-9)
        print(f"Done {self.cv_frames} frames in {time.time() - t0:.2f}s"
              f" [FPS:{fps:.1f},RT:{fps / 100.0:.4f}] (resident)")
        return stats.accuracy
