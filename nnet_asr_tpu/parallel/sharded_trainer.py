"""Multi-device trainer: the Trainer epoch loop over the sharded step.

Drop-in for train.Trainer when more than one device is visible (a pod
slice, or the virtual CPU mesh in tests): batches shard over the ``data``
axis, gradients psum over ICI, the senone output layer lives column-
sharded over ``model``. Multi-host runs use the same code after
``jax.distributed.initialize()`` — each host feeds its addressable shard
(jax.make_array_from_process_local_data below handles both cases).
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.network import Network
from ..ops.objectives import XentStats
from ..train.cache import DeviceFrameCache
from ..train.pipeline import TransformPipeline
from ..train.trainer import TrainerConfig
from .sharded_step import make_sharded_train_step, zero_acc


class ShardedTrainer:
    """Epoch driver matching train.Trainer's interface on a device mesh."""

    def __init__(self, net: Network, cfg: TrainerConfig, mesh: Mesh,
                 transform: Optional[Network] = None,
                 start_frm_ext: int = 0, end_frm_ext: int = 0):
        if cfg.objective != "xent":
            raise ValueError("sharded trainer supports the CE objective")
        net.check_dims()
        self.net = net
        self.cfg = cfg
        self.mesh = mesh
        self.pipeline = TransformPipeline(transform, start_frm_ext, end_frm_ext)
        self.state, self._step, self._eval, self._fns = \
            make_sharded_train_step(net, cfg.sgd, mesh)
        self.state.to_device(mesh)
        self.stats = XentStats()
        self._data_sharding = NamedSharding(mesh, P("data", None))
        self._label_sharding = NamedSharding(mesh, P("data"))
        self.total_frames = 0
        self.wall = 0.0
        self._accs = []
        d = mesh.shape["data"]
        if cfg.bunchsize % d:
            raise ValueError(
                f"bunchsize {cfg.bunchsize} not divisible by data axis {d}")

    @property
    def params(self):
        return self.state.params

    def _put(self, feats: jnp.ndarray, labels: np.ndarray):
        if jax.process_count() > 1:
            # multi-host: every process holds the full global batch here
            # (each host read the same SCP shard layout); hand JAX the
            # addressable slice of the global array
            f = jax.make_array_from_process_local_data(
                self._data_sharding, np.asarray(feats))
            l = jax.make_array_from_process_local_data(
                self._label_sharding, np.asarray(labels))
        else:
            f = jax.device_put(feats, self._data_sharding)
            l = jax.device_put(jnp.asarray(labels), self._label_sharding)
        return f, l

    def _drain_cache(self, cache: DeviceFrameCache) -> None:
        stacked = cache.take_stacked()
        if stacked is None:
            return
        feats_all, labels_all = stacked
        from jax.sharding import PartitionSpec as P

        fsh = jax.device_put(feats_all, jax.NamedSharding(
            self.mesh, P(None, "data", None)))
        lsh = jax.device_put(labels_all, jax.NamedSharding(
            self.mesh, P(None, "data")))
        acc = zero_acc()
        if self.cfg.crossvalidate:
            acc = self._fns["drain_eval"](self.state.params, acc, fsh, lsh)
        else:
            self.state.params, self.state.velocity, acc = \
                self._fns["drain_train"](self.state.params,
                                         self.state.velocity, acc, fsh, lsh)
        # per-cache stats stay on device until epoch end (no mid-epoch
        # host sync); merged per cache in f64, like train.Trainer
        self._accs.append(acc)

    def _flush_acc(self) -> None:
        for acc in self._accs:
            self.stats.add(float(acc["xent"]), int(acc["frames"]),
                           int(acc["correct"]))
        self._accs = []

    def run_epoch(self, utterances: Iterable[Tuple[np.ndarray, np.ndarray]],
                  batch_utts: int = 32) -> None:
        import time

        t0 = time.time()
        cache = DeviceFrameCache(self.cfg.cachesize, self.cfg.bunchsize,
                                 self.cfg.seed, self.cfg.randomize)
        pend_f, pend_l = [], []

        def flush():
            if not pend_f:
                return
            # shape-stable intake (see train.Trainer.run_epoch)
            rows, valid = self.pipeline.transform_block(pend_f)
            labels_block = np.concatenate(pend_l)
            self.total_frames += valid
            cache.add_block(rows, valid, labels_block)
            while cache.full:
                self._drain_cache(cache)
            pend_f.clear()
            pend_l.clear()

        for feats, labels in utterances:
            pend_f.append(np.asarray(feats, np.float32))
            pend_l.append(np.asarray(labels, np.int32))
            if len(pend_f) >= batch_utts:
                flush()
        flush()
        if cache.rows > 0:
            self._drain_cache(cache)
        self._flush_acc()
        self.wall += time.time() - t0

    def updated_network(self) -> Network:
        host = [{k: np.asarray(v) for k, v in p.items()}
                for p in self.state.params]
        return Network(self.net.specs, host)

    def report(self) -> str:
        return self.stats.report()

    def throughput_report(self) -> str:
        fps = self.total_frames / max(self.wall, 1e-9)
        return (f"Done {self.total_frames} frames in {self.wall:.2f}s"
                f" [FPS:{fps:.1f},RT:{fps / 100.0:.4f}]"
                f" mesh=data:{self.mesh.shape['data']}"
                f"xmodel:{self.mesh.shape['model']}\n")
