"""ShardedTrainer end-to-end on the virtual mesh vs the single-chip Trainer."""

import numpy as np
import pytest

from nnet_asr_tpu.models import BiasedLinearity, Network, Sigmoid, Softmax
from nnet_asr_tpu.parallel.mesh import make_mesh
from nnet_asr_tpu.parallel.sharded_trainer import ShardedTrainer
from nnet_asr_tpu.train.sgd import SgdConfig
from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig


def _net(rng, din=12, dh=24, dout=15):
    specs = (BiasedLinearity(din, dh), Sigmoid(dh, dh),
             BiasedLinearity(dh, dout), Softmax(dout, dout))
    params = [
        {"weight": (0.1 * rng.standard_normal((din, dh))).astype(np.float32),
         "bias": np.zeros(dh, np.float32)}, {},
        {"weight": (0.1 * rng.standard_normal((dh, dout))).astype(np.float32),
         "bias": np.zeros(dout, np.float32)}, {},
    ]
    return Network(specs, params)


def _utts(rng, n=12):
    out = []
    for _ in range(n):
        T = int(rng.integers(20, 50))
        out.append((rng.standard_normal((T, 12)).astype(np.float32),
                    rng.integers(0, 15, T).astype(np.int32)))
    return out


@pytest.mark.parametrize("data,model", [(4, 1), (2, 3)])
def test_sharded_trainer_matches_single(data, model):
    rng = np.random.default_rng(0)
    net = _net(rng)
    utts = _utts(rng)
    cfg = TrainerConfig(bunchsize=32, cachesize=128, seed=7, randomize=True,
                        sgd=SgdConfig(learning_rate=0.1, momentum=0.5,
                                      grad_div_frm=True))

    single = Trainer(Network(net.specs, [dict(p) for p in net.params]), cfg)
    single.run_epoch(iter(utts))

    mesh = make_mesh(data=data, model=model)
    import jax
    with jax.default_matmul_precision("highest"):
        sharded = ShardedTrainer(
            Network(net.specs, [dict(p) for p in net.params]), cfg, mesh)
        sharded.run_epoch(iter(utts))

    # identical shuffle (same seed) → identical stats and close params
    assert sharded.stats.frames == single.stats.frames
    assert abs(sharded.stats.corr - single.stats.corr) <= 2
    assert abs(sharded.stats.error - single.stats.error) < 0.5
    for i in (0, 2):
        np.testing.assert_allclose(
            np.asarray(sharded.updated_network().params[i]["weight"]),
            np.asarray(single.params[i]["weight"]), rtol=5e-3, atol=1e-5)


def test_sharded_trainer_crossvalidate():
    rng = np.random.default_rng(1)
    net = _net(rng)
    utts = _utts(rng, n=4)
    cfg = TrainerConfig(bunchsize=32, cachesize=64, randomize=False,
                        crossvalidate=True)
    mesh = make_mesh(data=4, model=1)
    tr = ShardedTrainer(net, cfg, mesh)
    tr.run_epoch(iter(utts))
    assert tr.stats.frames > 0
    np.testing.assert_allclose(
        np.asarray(tr.state.params[0]["weight"]),
        np.asarray(net.params[0]["weight"]))
