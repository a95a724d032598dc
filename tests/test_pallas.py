"""Pallas kernel correctness tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nnet_asr_tpu.ops.pallas.matmul_act import affine_sigmoid, matmul_act
from nnet_asr_tpu.ops.pallas.softmax_ce import fused_softmax_xent
from nnet_asr_tpu.ops.fold_affine import fold_transform
from nnet_asr_tpu.models import Network


def test_matmul_act_forward():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 70)).astype(np.float32)
    w = rng.standard_normal((70, 50)).astype(np.float32)
    b = rng.standard_normal(50).astype(np.float32)
    y = np.asarray(matmul_act(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = 1 / (1 + np.exp(-(x @ w + b)))
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)


def test_matmul_act_multi_k_blocks():
    rng = np.random.default_rng(1)
    x = (0.05 * rng.standard_normal((64, 700))).astype(np.float32)
    w = rng.standard_normal((700, 130)).astype(np.float32)
    b = np.zeros(130, np.float32)
    y = np.asarray(matmul_act(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                              bk=256))
    want = 1 / (1 + np.exp(-(x @ w)))
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def test_affine_sigmoid_grad():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((32, 24)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(16).astype(np.float32))

    def loss_pallas(x, w, b):
        return jnp.sum(affine_sigmoid(x, w, b) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(jax.nn.sigmoid(x @ w + b) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_fused_softmax_xent_matches_reference():
    rng = np.random.default_rng(3)
    B, C = 100, 135
    logits = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 3)
    labels = jnp.asarray(rng.integers(0, C, B).astype(np.int32))

    loss, stats = fused_softmax_xent(logits, labels, 64)
    lp = jax.nn.log_softmax(logits, axis=-1)
    want_loss = -jnp.sum(lp[jnp.arange(B), labels])
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    want_corr = int(jnp.sum(jnp.argmax(logits, axis=1) == labels))
    assert int(stats["correct"]) == want_corr
    assert int(stats["frames"]) == B

    # gradient == softmax - onehot
    g = jax.grad(lambda l: fused_softmax_xent(l, labels, 64)[0])(logits)
    want_g = jax.nn.softmax(logits, axis=-1) - jax.nn.one_hot(labels, C)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want_g),
                               rtol=1e-5, atol=1e-6)


def test_fold_affine_matches_layered(example01):
    net = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    folded = fold_transform(net)
    assert folded is not None
    sa, M, c = folded
    assert sa.offsets == tuple(range(-25, 26))
    assert M.shape == (1173, 598)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((80, 23)).astype(np.float32)
    got = np.asarray(sa.apply(M, c, jnp.asarray(x)))
    want = np.asarray(net.forward(x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fold_affine_rejects_nonlinear():
    from nnet_asr_tpu.models import Sigmoid, BiasedLinearity
    net = Network((BiasedLinearity(4, 4), Sigmoid(4, 4)),
                  [{"weight": np.eye(4, dtype=np.float32),
                    "bias": np.zeros(4, np.float32)}, {}])
    assert fold_transform(net) is None


@pytest.mark.parametrize("vdt", [np.float32, "bf16"])
def test_wgrad_momentum_update_matches_sgd(vdt):
    """Fused wgrad+momentum kernel == apply_updates' momentum branch:
    g = x^T e; v_new = g + m*v; p_new = p - a*(g + m*v)."""
    from nnet_asr_tpu.ops.pallas.sgd_fused import wgrad_momentum_update

    rng = np.random.default_rng(9)
    B, In, Out = 96, 130, 70
    x = (0.1 * rng.standard_normal((B, In))).astype(np.float32)
    e = (0.1 * rng.standard_normal((B, Out))).astype(np.float32)
    p = (0.2 * rng.standard_normal((In, Out))).astype(np.float32)
    v0 = (0.05 * rng.standard_normal((In, Out))).astype(np.float32)
    m, a = 0.9, 0.003
    v = jnp.asarray(v0, jnp.bfloat16) if vdt == "bf16" else jnp.asarray(v0)

    p_new, v_new = wgrad_momentum_update(
        jnp.asarray(x), jnp.asarray(e), jnp.asarray(p), v, a, m,
        bm=64, bn=128, bk=32)

    g = x.T @ e
    corr = g + m * np.asarray(v, np.float32)
    np.testing.assert_allclose(np.asarray(v_new, np.float32), corr,
                               rtol=2e-2 if vdt == "bf16" else 1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_new), p - a * corr,
                               rtol=1e-4, atol=1e-5)
    assert v_new.dtype == v.dtype and p_new.dtype == jnp.float32


def test_int8_fake_quant_training_mode():
    """TrainerConfig(compute_dtype='int8') trains through the fake-quant
    STE forward: gradients are nonzero (straight-through), params move,
    and one step stays close to the f32 step (int8 has ~2 decimal
    digits). Convergence head-to-head on example-01 is in
    docs/KERNELS.md (CV 30.82% int8 vs 30.79% f32 after 1 epoch)."""
    from nnet_asr_tpu.train.sgd import SgdConfig
    from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(2)
    from nnet_asr_tpu.models import BiasedLinearity, Sigmoid, Softmax
    specs = (BiasedLinearity(10, 16), Sigmoid(16, 16),
             BiasedLinearity(16, 6), Softmax(6, 6))
    P = [{"weight": (0.3 * rng.standard_normal((10, 16))).astype(np.float32),
          "bias": np.zeros(16, np.float32)}, {},
         {"weight": (0.3 * rng.standard_normal((16, 6))).astype(np.float32),
          "bias": np.zeros(6, np.float32)}, {}]
    X = rng.standard_normal((64, 10)).astype(np.float32)
    y = rng.integers(0, 6, 64).astype(np.int32)

    outs = {}
    for dt in (None, "int8"):
        cfg = TrainerConfig(bunchsize=32, cachesize=64, randomize=False,
                            sgd=SgdConfig(learning_rate=0.05),
                            compute_dtype=dt)
        tr = Trainer(Network(specs, [dict(p) for p in P]), cfg)
        tr.run_epoch(iter([(X, y)]))
        outs[dt] = np.asarray(tr.params[0]["weight"])
    # params moved under int8 (STE gradient is not zero)
    assert np.abs(outs["int8"] - P[0]["weight"]).max() > 1e-5
    # and the step tracks the f32 step to quantization precision
    step_f32 = np.abs(outs[None] - P[0]["weight"]).max()
    diff = np.abs(outs["int8"] - outs[None]).max()
    assert diff < 20 * step_f32


def test_int8pfsr_stochastic_rounding_mode():
    """compute_dtype='int8pfsr' (QAT ladder rung 2, docs/KERNELS.md):
    stochastic rounding on the per-frame activation quantizer during
    training. Training must (a) differ from deterministic int8pf, (b) be
    reproducible for a fixed seed, (c) advance the noise stream across
    caches, and (d) keep evaluation deterministic (round-to-nearest)."""
    from nnet_asr_tpu.train.sgd import SgdConfig
    from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(5)
    from nnet_asr_tpu.models import BiasedLinearity, Sigmoid, Softmax
    specs = (BiasedLinearity(10, 16), Sigmoid(16, 16),
             BiasedLinearity(16, 6), Softmax(6, 6))
    P = [{"weight": (0.3 * rng.standard_normal((10, 16))).astype(np.float32),
          "bias": np.zeros(16, np.float32)}, {},
         {"weight": (0.3 * rng.standard_normal((16, 6))).astype(np.float32),
          "bias": np.zeros(6, np.float32)}, {}]
    X = rng.standard_normal((64, 10)).astype(np.float32)
    y = rng.integers(0, 6, 64).astype(np.int32)

    def run(dt, seed=9):
        cfg = TrainerConfig(bunchsize=32, cachesize=64, randomize=False,
                            seed=seed, sgd=SgdConfig(learning_rate=0.05),
                            compute_dtype=dt)
        tr = Trainer(Network(specs, [dict(p) for p in P]), cfg)
        # two caches: the SR key must advance across drains
        tr.run_epoch(iter([(X, y), (X, y)]))
        return tr

    w_pf = np.asarray(run("int8pf").params[0]["weight"])
    tr_sr = run("int8pfsr")
    w_sr = np.asarray(tr_sr.params[0]["weight"])
    w_sr2 = np.asarray(run("int8pfsr").params[0]["weight"])

    assert not np.array_equal(w_sr, w_pf)          # SR actually fired
    np.testing.assert_array_equal(w_sr, w_sr2)     # seeded reproducible
    # noise advanced across the two caches: key changed from the seed
    import jax.random
    k0 = jax.random.PRNGKey(9)
    assert not np.array_equal(np.asarray(tr_sr._sr_key), np.asarray(k0))
    # SR stays close to the deterministic trajectory (unbiased rounding)
    assert np.abs(w_sr - w_pf).max() < 0.05

    # evaluation is deterministic: same crossval twice, identical stats
    cfg_cv = TrainerConfig(bunchsize=32, cachesize=64, randomize=False,
                           crossvalidate=True, compute_dtype="int8pfsr")
    evals = []
    for _ in range(2):
        tr = Trainer(Network(specs, [dict(p) for p in tr_sr.params]),
                     cfg_cv)
        tr.run_epoch(iter([(X, y)]))
        evals.append((tr.stats.error, tr.stats.corr))
    assert evals[0] == evals[1]

    # resident-style interleaving: a TRAIN trainer's eval drains consume
    # donated accs that carry the SR key — the key must survive repeated
    # _zero_acc/_drain_eval rounds (regression: 'Array has been deleted')
    import jax.numpy as jnp
    fa = jnp.asarray(np.stack([X[:32], X[32:]]))
    la = jnp.asarray(np.stack([y[:32], y[32:]]))
    for _ in range(3):
        acc = tr_sr._zero_acc()
        acc = tr_sr._drain_eval(tr_sr.params, acc, fa, la)
    acc = tr_sr._zero_acc()
    tr_sr.params, tr_sr.velocity, acc = tr_sr._drain_train(
        tr_sr.params, tr_sr.velocity, acc, fa, la, tr_sr._lr)
    assert np.isfinite(float(acc["xent"]))
