"""Training-state checkpoint/resume round trip."""

import numpy as np

from nnet_asr_tpu.models import BiasedLinearity, Network, Sigmoid, Softmax
from nnet_asr_tpu.train.sgd import SgdConfig
from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    specs = (BiasedLinearity(6, 8), Sigmoid(8, 8),
             BiasedLinearity(8, 4), Softmax(4, 4))
    P = [{"weight": (0.2 * rng.standard_normal((6, 8))).astype(np.float32),
          "bias": np.zeros(8, np.float32)}, {},
         {"weight": (0.2 * rng.standard_normal((8, 4))).astype(np.float32),
          "bias": np.zeros(4, np.float32)}, {}]
    cfg = TrainerConfig(bunchsize=16, cachesize=32, randomize=False,
                        sgd=SgdConfig(learning_rate=0.1, momentum=0.5))
    tr = Trainer(Network(specs, [dict(p) for p in P]), cfg)
    X = rng.standard_normal((32, 6)).astype(np.float32)
    y = rng.integers(0, 4, 32).astype(np.int32)
    tr.run_epoch(iter([(X, y)]))
    state = str(tmp_path / "state.npz")
    tr.save_state(state)

    tr2 = Trainer(Network(specs, [dict(p) for p in P]), cfg)
    tr2.load_state(state)
    for i in (0, 2):
        np.testing.assert_array_equal(np.asarray(tr.params[i]["weight"]),
                                      np.asarray(tr2.params[i]["weight"]))
        np.testing.assert_array_equal(np.asarray(tr.velocity[i]["weight"]),
                                      np.asarray(tr2.velocity[i]["weight"]))
    assert tr2.stats.frames == tr.stats.frames

    # continued training from restored state == continuing the original
    tr.run_epoch(iter([(X, y)]))
    tr2.run_epoch(iter([(X, y)]))
    np.testing.assert_allclose(np.asarray(tr.params[0]["weight"]),
                               np.asarray(tr2.params[0]["weight"]), rtol=1e-6)
