"""Training-core tests: rand48, cache semantics, SGD parity vs NumPy oracle."""

import numpy as np
import pytest

import oracle
from nnet_asr_tpu.models import Network
from nnet_asr_tpu.train.cache import FrameCache
from nnet_asr_tpu.train.pipeline import TransformPipeline
from nnet_asr_tpu.train.sgd import SgdConfig
from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig
from nnet_asr_tpu.utils.rand48 import Rand48


def test_rand48_values():
    # validated against glibc srand48(123); lrand48()
    r = Rand48(123)
    assert [r.lrand48() for _ in range(5)] == [
        600247453, 890194426, 1986800006, 278150694, 266650488]


def test_permutation_is_fisher_yates():
    r = Rand48(7)
    p = r.permutation(100)
    assert sorted(p.tolist()) == list(range(100))
    # oracle: replay with a fresh generator
    r2 = Rand48(7)
    idx = list(range(100))
    for i in range(1, 100):
        j = r2.lrand48() % (i + 1)
        idx[i], idx[j] = idx[j], idx[i]
    assert p.tolist() == idx


def test_cache_fill_and_bunches():
    cache = FrameCache(cachesize=12, bunchsize=4, seed=5, randomize=False)
    f1 = np.arange(10, dtype=np.float32).reshape(10, 1)
    f2 = np.arange(10, 20, dtype=np.float32).reshape(10, 1)
    import jax.numpy as jnp
    cache.add(jnp.asarray(f1), np.arange(10, dtype=np.int32))
    assert not cache.full
    cache.add(jnp.asarray(f2), np.arange(10, 20, dtype=np.int32))
    assert cache.full and cache.has_leftover
    bunches = list(cache.bunches())
    assert len(bunches) == 3
    got = np.concatenate([np.asarray(b[0]) for b in bunches]).ravel()
    np.testing.assert_array_equal(got, np.arange(12, dtype=np.float32))
    # leftover (rows 12..19) seeds the next fill
    cache.add(jnp.asarray(f1[:4]), np.arange(4, dtype=np.int32))
    assert cache.full
    b2 = list(cache.bunches())
    got2 = np.concatenate([np.asarray(b[0]) for b in b2]).ravel()
    np.testing.assert_array_equal(got2, np.concatenate([np.arange(12, 20), np.arange(4)]))


def test_cache_shuffle_matches_rand48():
    cache = FrameCache(cachesize=8, bunchsize=4, seed=42, randomize=True)
    import jax.numpy as jnp
    cache.add(jnp.arange(8, dtype=jnp.float32).reshape(8, 1),
              np.arange(8, dtype=np.int32))
    feats = np.concatenate([np.asarray(b[0]) for b in cache.bunches()]).ravel()
    perm = Rand48(42).permutation(8)
    np.testing.assert_array_equal(feats, perm.astype(np.float32))


def test_pipeline_matches_per_utterance(example01):
    net = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    rng = np.random.default_rng(0)
    utts = [rng.standard_normal((T + 50, 23)).astype(np.float32)
            for T in (64, 130, 37)]
    pipe = TransformPipeline(net, 25, 25, chunk=128)
    outs = pipe(utts)
    for u, out in zip(utts, outs):
        want = np.asarray(net.forward(u))[25:-25]
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-5)


def _tiny_mlp(rng, din=6, dh=8, dout=5):
    w1 = (0.1 * rng.standard_normal((din, dh))).astype(np.float32)
    b1 = np.zeros(dh, np.float32)
    w2 = (0.1 * rng.standard_normal((dh, dout))).astype(np.float32)
    b2 = np.zeros(dout, np.float32)
    from nnet_asr_tpu.models import BiasedLinearity, Sigmoid, Softmax
    specs = (BiasedLinearity(din, dh), Sigmoid(dh, dh),
             BiasedLinearity(dh, dout), Softmax(dout, dout))
    params = [{"weight": w1, "bias": b1}, {}, {"weight": w2, "bias": b2}, {}]
    return Network(specs, params)


def _oracle_sgd_epoch(net, bunches, lr, momentum=0.0, weightcost=0.0,
                      grad_div_frm=False):
    """NumPy replay of the reference update (cuBiasedLinearity.cc:44-63)."""
    w1 = np.asarray(net.params[0]["weight"]).copy()
    b1 = np.asarray(net.params[0]["bias"]).copy()
    w2 = np.asarray(net.params[2]["weight"]).copy()
    b2 = np.asarray(net.params[2]["bias"]).copy()
    vw1 = np.zeros_like(w1); vb1 = np.zeros_like(b1)
    vw2 = np.zeros_like(w2); vb2 = np.zeros_like(b2)
    xent = 0.0; corr = 0
    for X, labels in bunches:
        T = np.eye(w2.shape[1], dtype=np.float32)[labels]
        h_pre = X @ w1 + b1
        h = oracle.sigmoid(h_pre)
        y = oracle.softmax(h @ w2 + b2)
        err, xe, c = oracle.cross_entropy_eval(y, T)
        xent += xe; corr += c
        # backward
        g_w2 = h.T @ err
        g_b2 = err.sum(axis=0)
        e_h = (err @ w2.T) * h * (1 - h)
        g_w1 = X.T @ e_h
        g_b1 = e_h.sum(axis=0)
        N = X.shape[0] if grad_div_frm else 1.0
        if momentum != 0.0:
            N = N / (1.0 - momentum)
        for w, v, g in ((w1, vw1, g_w1), (b1, vb1, g_b1),
                        (w2, vw2, g_w2), (b2, vb2, g_b2)):
            v *= momentum; v += g
            w -= lr / N * v
        if weightcost != 0.0:
            dec = lr * weightcost * (1.0 if grad_div_frm else X.shape[0])
            w1 -= dec * w1
            w2 -= dec * w2
    return (w1, b1, w2, b2), xent, corr


@pytest.mark.parametrize("momentum,weightcost,gdf", [
    (0.0, 0.0, False),
    (0.5, 0.0, True),
    (0.9, 1e-4, False),
])
def test_sgd_matches_oracle(momentum, weightcost, gdf):
    rng = np.random.default_rng(1)
    net = _tiny_mlp(rng)
    bunches = []
    for _ in range(4):
        X = rng.standard_normal((16, 6)).astype(np.float32)
        labels = rng.integers(0, 5, 16).astype(np.int32)
        bunches.append((X, labels))

    cfg = TrainerConfig(
        bunchsize=16, cachesize=64, seed=3, randomize=False,
        sgd=SgdConfig(learning_rate=0.05, momentum=momentum,
                      weightcost=weightcost, grad_div_frm=gdf))
    tr = Trainer(net, cfg)
    import jax.numpy as jnp
    for X, labels in bunches:
        acc = tr._zero_acc()
        tr.params, tr.velocity, acc = tr._train_step(
            tr.params, tr.velocity, acc, jnp.asarray(X), jnp.asarray(labels))
        tr._merge_acc(acc)

    (w1, b1, w2, b2), xent, corr = _oracle_sgd_epoch(
        net, bunches, 0.05, momentum, weightcost, gdf)
    np.testing.assert_allclose(np.asarray(tr.params[0]["weight"]), w1, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr.params[0]["bias"]), b1, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr.params[2]["weight"]), w2, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr.params[2]["bias"]), b2, rtol=2e-4, atol=1e-6)
    assert tr.stats.corr == corr
    assert abs(tr.stats.error - xent) < 1e-2 * max(1.0, abs(xent))


def test_run_epoch_end_to_end():
    rng = np.random.default_rng(2)
    net = _tiny_mlp(rng)
    cfg = TrainerConfig(bunchsize=8, cachesize=32, seed=9, randomize=True,
                        sgd=SgdConfig(learning_rate=0.1))
    tr = Trainer(net, cfg)
    utts = []
    for _ in range(10):
        T = int(rng.integers(5, 20))
        utts.append((rng.standard_normal((T, 6)).astype(np.float32),
                     rng.integers(0, 5, T).astype(np.int32)))
    tr.run_epoch(iter(utts))
    assert tr.stats.frames > 0
    assert np.isfinite(tr.stats.error)
    out = tr.report()
    assert out.startswith("Xent:") and "correct[" in out
    # params actually moved
    assert not np.allclose(np.asarray(tr.params[0]["weight"]),
                           np.asarray(net.params[0]["weight"]))


def test_crossvalidate_mode():
    rng = np.random.default_rng(3)
    net = _tiny_mlp(rng)
    cfg = TrainerConfig(bunchsize=8, cachesize=32, seed=9, randomize=False,
                        crossvalidate=True)
    tr = Trainer(net, cfg)
    utts = [(rng.standard_normal((16, 6)).astype(np.float32),
             rng.integers(0, 5, 16).astype(np.int32)) for _ in range(4)]
    tr.run_epoch(iter(utts))
    np.testing.assert_allclose(np.asarray(tr.params[0]["weight"]),
                               np.asarray(net.params[0]["weight"]))
    assert tr.stats.frames == 64


def test_mse_objective():
    rng = np.random.default_rng(4)
    net = _tiny_mlp(rng)
    cfg = TrainerConfig(bunchsize=8, cachesize=32, seed=1, randomize=False,
                        objective="mse", sgd=SgdConfig(learning_rate=0.1))
    tr = Trainer(net, cfg)
    utts = [(rng.standard_normal((16, 6)).astype(np.float32),
             rng.integers(0, 5, 16).astype(np.int32)) for _ in range(2)]
    tr.run_epoch(iter(utts))
    assert tr.stats.frames == 32
    assert tr.report().startswith("Mse:")


def test_device_cache_matches_framecache():
    """DeviceFrameCache (fixed-buffer, shape-stable) must yield the exact
    bunch sequence of FrameCache given the same block intake + seed —
    including the boundary-crossing carry-over and tail discard."""
    import jax.numpy as jnp
    from nnet_asr_tpu.train.cache import DeviceFrameCache

    rng = np.random.default_rng(3)
    blocks = []  # (bucket-padded feats, valid, labels) like transform_block
    lab_base = 0
    for valid in (7, 13, 2, 29, 5, 11):
        pad = -(-valid // 8) * 8           # tiny bucket quantum for the test
        f = np.zeros((pad, 3), np.float32)
        f[:valid] = rng.standard_normal((valid, 3)).astype(np.float32)
        l = np.arange(lab_base, lab_base + valid, dtype=np.int32)
        lab_base += valid
        blocks.append((f, valid, l))

    def run(cache_cls, block_api):
        cache = cache_cls(cachesize=16, bunchsize=4, seed=99, randomize=True)
        got = []

        def drain():
            stacked = cache.take_stacked()
            if stacked is not None:
                fa, la = stacked
                got.append((np.asarray(fa), np.asarray(la)))

        for f, valid, l in blocks:
            if block_api:
                cache.add_block(jnp.asarray(f), valid, l)
            else:
                cache.add_block(jnp.asarray(f[:valid]), l)
            if block_api:
                while cache.full:
                    drain()
            else:
                if cache.full:
                    drain()
                while cache.has_leftover and cache.absorb_leftover():
                    drain()
        if cache.rows > 0:
            drain()
        return got

    ref = run(FrameCache, block_api=False)
    dev = run(DeviceFrameCache, block_api=True)
    assert len(ref) == len(dev)
    for (rf, rl), (df, dl) in zip(ref, dev):
        np.testing.assert_array_equal(rl, dl)
        np.testing.assert_array_equal(rf, df)


def test_device_cache_norandomize_and_discard():
    import jax.numpy as jnp
    from nnet_asr_tpu.train.cache import DeviceFrameCache

    cache = DeviceFrameCache(cachesize=8, bunchsize=4, seed=1, randomize=False)
    f = np.arange(10, dtype=np.float32).reshape(10, 1)
    pad = np.zeros((16, 1), np.float32)
    pad[:10] = f
    cache.add_block(jnp.asarray(pad), 10, np.arange(10, dtype=np.int32))
    assert cache.full
    fa, la = cache.take_stacked()
    np.testing.assert_array_equal(
        np.asarray(fa).ravel(), np.arange(8, dtype=np.float32))
    assert cache.rows == 2
    # final partial: 2 rows < bunchsize -> discarded
    assert cache.take_stacked() is None
    assert cache.discarded == 2
    assert cache.rows == 0


def test_transform_block_matches_call(example01):
    net = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    rng = np.random.default_rng(1)
    utts = [rng.standard_normal((T + 50, 23)).astype(np.float32)
            for T in (64, 130, 37)]
    pipe = TransformPipeline(net, 25, 25, chunk=128)
    rows, valid = pipe.transform_block(utts)
    assert valid == 64 + 130 + 37
    want = np.concatenate([np.asarray(net.forward(u))[25:-25] for u in utts])
    np.testing.assert_allclose(np.asarray(rows)[:valid], want,
                               rtol=2e-5, atol=2e-5)
