"""Confusion-matrix accumulation parity with the ObjFun.cc semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from nnet_asr_tpu.models import BiasedLinearity, Network, Sigmoid, Softmax
from nnet_asr_tpu.train.sgd import SgdConfig
from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig


def _net(rng, din=6, dout=5):
    specs = (BiasedLinearity(din, dout), Softmax(dout, dout))
    params = [
        {"weight": (0.3 * rng.standard_normal((din, dout))).astype(np.float32),
         "bias": np.zeros(dout, np.float32)}, {}]
    return Network(specs, params)


@pytest.mark.parametrize("mode", ["max", "soft", "dmax", "dsoft"])
def test_confusion_modes_match_oracle(mode):
    rng = np.random.default_rng(0)
    net = _net(rng)
    X = rng.standard_normal((40, 6)).astype(np.float32)
    labels = rng.integers(0, 5, 40).astype(np.int32)

    cfg = TrainerConfig(bunchsize=40, cachesize=40, randomize=False,
                        crossvalidate=True, confusion_mode=mode)
    tr = Trainer(net, cfg)
    tr.run_epoch(iter([(X, labels)]))

    # oracle (ObjFun.cc:132-155)
    y = oracle.forward_network(net, X)
    pred = y.argmax(axis=1)
    conf = np.zeros((5, 5))
    diag = np.zeros(5)
    count = np.zeros(5)
    for r in range(40):
        t, h = labels[r], pred[r]
        if mode == "max":
            conf[t, h] += 1
        elif mode == "soft":
            conf[t] += y[r]
        elif mode == "dmax":
            diag[t] += 1 if t == h else 0
        elif mode == "dsoft":
            diag[t] += y[r, t]
        count[t] += 1

    np.testing.assert_allclose(tr.stats.confusion_count, count)
    if mode in ("max", "soft"):
        np.testing.assert_allclose(tr.stats.confusion, conf, atol=1e-4)
    else:
        np.testing.assert_allclose(tr.stats.diag_confusion, diag, atol=1e-4)


def test_confusion_report_format(tmp_path):
    rng = np.random.default_rng(1)
    net = _net(rng)
    X = rng.standard_normal((20, 6)).astype(np.float32)
    labels = rng.integers(0, 5, 20).astype(np.int32)
    lm = tmp_path / "map"
    lm.write_text("c0 c1 c2 c3 c4")
    cfg = TrainerConfig(bunchsize=20, cachesize=20, randomize=False,
                        crossvalidate=True, confusion_mode="max")
    tr = Trainer(net, cfg)
    tr.stats.label_map_file = str(lm)
    tr.run_epoch(iter([(X, labels)]))
    rep = tr.report()
    assert "Row:label Col:hyp" in rep
    assert "c0" in rep and "%" in rep
