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


def test_checkpoint_interop_single_chip_and_mesh(tmp_path):
    """--SAVESTATE/--RESUMESTATE under --MESH: states round-trip through
    the sharded trainer AND interoperate with the single-chip trainer
    (senone padding stripped on save, re-applied on load)."""
    import jax

    from nnet_asr_tpu.parallel.mesh import make_mesh
    from nnet_asr_tpu.parallel.sharded_trainer import ShardedTrainer

    rng = np.random.default_rng(1)
    n_out = 5                                # 5 % 2 != 0 -> padded on mesh
    specs = (BiasedLinearity(6, 8), Sigmoid(8, 8),
             BiasedLinearity(8, n_out), Softmax(n_out, n_out))
    P = [{"weight": (0.2 * rng.standard_normal((6, 8))).astype(np.float32),
          "bias": np.zeros(8, np.float32)}, {},
         {"weight": (0.2 * rng.standard_normal((8, n_out))).astype(np.float32),
          "bias": np.zeros(n_out, np.float32)}, {}]
    cfg = TrainerConfig(bunchsize=16, cachesize=32, randomize=False,
                        sgd=SgdConfig(learning_rate=0.1, momentum=0.5))
    X = rng.standard_normal((32, 6)).astype(np.float32)
    y = rng.integers(0, n_out, 32).astype(np.int32)

    mesh = make_mesh(data=4, model=2)
    with jax.default_matmul_precision("highest"):
        sh = ShardedTrainer(Network(specs, [dict(p) for p in P]), cfg, mesh)
        sh.run_epoch(iter([(X, y)]))
        state = str(tmp_path / "mesh_state.npz")
        sh.save_state(state)

        # mesh -> mesh round trip, continued training matches
        sh2 = ShardedTrainer(Network(specs, [dict(p) for p in P]), cfg, mesh)
        sh2.load_state(state)
        assert sh2.stats.frames == sh.stats.frames
        sh.run_epoch(iter([(X, y)]))
        sh2.run_epoch(iter([(X, y)]))
        a = sh.updated_network().params
        b = sh2.updated_network().params
        np.testing.assert_array_equal(a[2]["weight"], b[2]["weight"])

        # mesh state resumes in the SINGLE-CHIP trainer (unpadded shapes)
        tr = Trainer(Network(specs, [dict(p) for p in P]), cfg)
        tr.load_state(state)
        np.testing.assert_array_equal(
            np.asarray(tr.velocity[2]["weight"]).shape, (8, n_out))
        # and a single-chip state resumes on the mesh
        tr_state = str(tmp_path / "single_state.npz")
        tr.save_state(tr_state)
        sh3 = ShardedTrainer(Network(specs, [dict(p) for p in P]), cfg, mesh)
        sh3.load_state(tr_state)
        w = np.asarray(
            jax.device_get(sh3.state.params[2]["weight"]))
        assert w.shape[1] == sh3.state.n_out_pad
        assert not w[:, n_out:].any()        # padding restored as zeros


def test_checkpoint_roundtrip_bf16_velocity(tmp_path):
    """velocity_dtype='bf16': npz can't hold bf16, so save_state stores
    velocity as f32 and load_state recasts to the live dtype — the
    restored trainer must continue bit-identically to the original."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    specs = (BiasedLinearity(6, 8), Sigmoid(8, 8),
             BiasedLinearity(8, 4), Softmax(4, 4))
    P = [{"weight": (0.2 * rng.standard_normal((6, 8))).astype(np.float32),
          "bias": np.zeros(8, np.float32)}, {},
         {"weight": (0.2 * rng.standard_normal((8, 4))).astype(np.float32),
          "bias": np.zeros(4, np.float32)}, {}]
    cfg = TrainerConfig(bunchsize=16, cachesize=32, randomize=False,
                        sgd=SgdConfig(learning_rate=0.1, momentum=0.5,
                                      velocity_dtype="bf16"))
    tr = Trainer(Network(specs, [dict(p) for p in P]), cfg)
    X = rng.standard_normal((32, 6)).astype(np.float32)
    y = rng.integers(0, 4, 32).astype(np.int32)
    tr.run_epoch(iter([(X, y)]))
    assert tr.velocity[0]["weight"].dtype == jnp.bfloat16
    state = str(tmp_path / "state.npz")
    tr.save_state(state)

    tr2 = Trainer(Network(specs, [dict(p) for p in P]), cfg)
    tr2.load_state(state)
    assert tr2.velocity[0]["weight"].dtype == jnp.bfloat16
    # f32-roundtripped bf16 is exact (bf16 -> f32 -> bf16 is lossless)
    for i in (0, 2):
        np.testing.assert_array_equal(
            np.asarray(tr.velocity[i]["weight"], np.float32),
            np.asarray(tr2.velocity[i]["weight"], np.float32))
    tr.run_epoch(iter([(X, y)]))
    tr2.run_epoch(iter([(X, y)]))
    np.testing.assert_array_equal(np.asarray(tr.params[0]["weight"]),
                                  np.asarray(tr2.params[0]["weight"]))
