"""TPU throughput of the auxiliary trainers: RBM CD-1 and the recurrent
segment-scan (VERDICT r3 #6 — every training path gets a measured TPU
number, not just frame-CE).

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_aux.py

Slope timing per CLAUDE.md: two on-device window sizes of ONE compiled
program (runtime trip count), best-of-N; the ~28ms tunnel RTT and
dispatch cost cancel in the difference.

Workloads:
  * RBM CD-1, gauss-bern 598->1024, bunch 960 (the example-01 RBM
    pretraining shape, TRbmCu.cc:291-357) + a 1024->1024 bern-bern stack
    layer — frames/s and effective TFLOP/s over the 5 CD-1 GEMMs
    (prop, reconstruct, re-prop, 2 correlation outer products).
  * Recurrent truncated-BPTT segment scan (train/recurrent.py utt_step):
    368 -> 500 sigmoid -> recurrent(500) -> 39 softmax, 32 utterances x
    512 frames, BPTT order 4 — frames/s (the reference trains this
    frame-serially on one GPU, TRecurrentCu.cc:290-371; the scan is the
    TPU-native redesign).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _sync(x):
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "ravel")][0]
    float(leaf.ravel()[0] if leaf.ndim else leaf)


def best_of(call, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(call())
        best = min(best, time.perf_counter() - t0)
    return best


def bench_rbm(vis, hid, vis_type, hid_type, bunch=960, M1=64, M2=256):
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.models import Rbm
    from nnet_asr_tpu.models.components import BERNOULLI, GAUSSIAN
    from nnet_asr_tpu.train.rbm import (RbmTrainConfig, apply_rbm_update,
                                        init_rbm_state, sample_hidden)

    spec = Rbm(vis, hid, vis_type=vis_type, hid_type=hid_type)
    cfg = RbmTrainConfig()
    rng = np.random.default_rng(0)
    params = {
        "weight": jnp.asarray(0.05 * rng.standard_normal((vis, hid)),
                              jnp.float32),
        "vis_bias": jnp.zeros(vis, jnp.float32),
        "hid_bias": jnp.zeros(hid, jnp.float32)}
    state = init_rbm_state(spec, params, cfg)
    x = jnp.asarray(0.3 * rng.standard_normal((bunch, vis)), jnp.float32)

    def mega(params, state, key, m):
        def body(_, c):
            p, s, k = c
            k, sub = jax.random.split(k)
            pos_hid = spec.apply(p, x)
            neg_vis = spec.reconstruct(p, sample_hidden(spec, sub, pos_hid))
            neg_hid = spec.apply(p, neg_vis)
            p, s = apply_rbm_update(spec, cfg, p, s, x, pos_hid,
                                    neg_vis, neg_hid)
            return p, s, k
        return jax.lax.fori_loop(0, m, body,
                                 (params, state, jax.random.PRNGKey(0)))

    jf = jax.jit(mega, donate_argnums=(0, 1))
    st = (params, state, None)
    st = jf(st[0], st[1], None, jnp.int32(2))
    _sync(st)

    def timed(m):
        nonlocal st
        def call():
            nonlocal st
            st = jf(st[0], st[1], None, jnp.int32(m))
            return st
        return best_of(call)

    t1, t2 = timed(M1), timed(M2)
    per = (t2 - t1) / (M2 - M1)
    fps = bunch / per
    flops = 5 * 2 * vis * hid * bunch      # 3 props + 2 corr GEMMs
    print(f"rbm {vis}->{hid} {vis_type}-{hid_type} bunch={bunch}: "
          f"{per * 1e6:8.1f} us/step  {fps / 1e6:7.2f}M frames/s  "
          f"{flops / per / 1e12:6.1f} TFLOP/s", flush=True)
    return fps


def bench_recurrent(B=32, T=512, K=4, M1=4, M2=16):
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.models import (BiasedLinearity, Network, Recurrent,
                                     Sigmoid, Softmax)
    from nnet_asr_tpu.train.recurrent import (RecurrentTrainer,
                                              RecurrentTrainerConfig)
    from nnet_asr_tpu.train.sgd import SgdConfig

    rng = np.random.default_rng(1)
    din, dr, dout = 368, 500, 39
    net = Network(
        (BiasedLinearity(din, dr), Sigmoid(dr, dr), Recurrent(dr, dr),
         BiasedLinearity(dr, dout), Softmax(dout, dout)),
        [{"weight": (0.05 * rng.standard_normal((din, dr))).astype(np.float32),
          "bias": np.zeros(dr, np.float32)}, {},
         {"weight": (0.05 * rng.standard_normal((2 * dr, dr))).astype(np.float32),
          "bias": np.zeros(dr, np.float32)},
         {"weight": (0.05 * rng.standard_normal((dr, dout))).astype(np.float32),
          "bias": np.zeros(dout, np.float32)}, {}])
    tr = RecurrentTrainer(net, RecurrentTrainerConfig(
        bptt_order=K, sgd=SgdConfig(learning_rate=0.01)))

    n_seg = T // K
    F = jnp.asarray(0.3 * rng.standard_normal((n_seg, B, K, din)),
                    jnp.float32)
    L = jnp.asarray(rng.integers(0, dout, (n_seg, B, K)), jnp.int32)
    Mk = jnp.ones((n_seg, B, K), bool)

    utt_step = tr._utt_step      # jitted, donates (params, velocity, acc)

    # the step already scans n_seg=128 segments internally (~0.5s+ of
    # chip work per call), so slope over CALL counts suffices — the RTT
    # cancels between the M1- and M2-call windows
    params = [dict(p) for p in tr.params]
    velocity = [dict(v) for v in tr.velocity]
    acc = tr._zero_acc()
    params, velocity, acc = utt_step(params, velocity, acc, F, L, Mk)
    _sync(params)

    def run_n(n):
        nonlocal params, velocity, acc
        def call():
            nonlocal params, velocity, acc
            for _ in range(n):
                params, velocity, acc = utt_step(params, velocity, acc,
                                                 F, L, Mk)
            return params
        return best_of(call)

    t1, t2 = run_n(M1), run_n(M2)
    per = (t2 - t1) / (M2 - M1)
    fps = B * T / per
    print(f"recurrent {din}->{dr}r->{dout} B={B} T={T} K={K}: "
          f"{per * 1e3:8.2f} ms/batch  {fps / 1e6:7.3f}M frames/s",
          flush=True)
    return fps


if __name__ == "__main__":
    from nnet_asr_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    print(f"backend: {jax.default_backend()}", flush=True)
    bench_rbm(598, 1024, "gauss", "bern")
    bench_rbm(1024, 1024, "bern", "bern")
    bench_recurrent()
