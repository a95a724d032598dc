"""Recurrent segment-scan saturation sweep + serialization roofline
(VERDICT r4 #6).

Sweeps the utterance batch B to saturation and the BPTT order K at
fixed B on the real chip, and prints the serialization floor each
config implies: a batch is n_seg = T/K sequential segment steps, each
with (a) K sequential recurrent sub-steps of a (B, 2R)x(2R, R) GEMM,
(b) the segment's input/output GEMMs, and (c) a full parameter+velocity
update (the reference updates per segment too — TRecurrentCu.cc's
per-frame updates are even finer), whose HBM traffic is the small-B
bound.

Slope timing per CLAUDE.md (call-count slope; each call scans n_seg
segments = ms of chip work).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/recurrent_roofline.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BF16_PEAK = 197e12
HBM_BW = 819e9


def _sync(x):
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x)
            if hasattr(l, "ravel")][0]
    float(leaf.ravel()[0] if leaf.ndim else leaf)


def best_of(call, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(call())
        best = min(best, time.perf_counter() - t0)
    return best


def bench(B, T, K, M1=2, M2=8):
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
    utt_step = tr._utt_step

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

    # serialization floor: fwd+bwd GEMM FLOPs (3x fwd for the backward
    # pass rule-of-thumb) + per-segment update traffic
    n_par = din * dr + 2 * dr * dr + dr * dout + 2 * dr + dout
    flops = 3 * 2 * B * T * (din * dr + 2 * dr * dr + dr * dout)
    upd_bytes = n_seg * 4 * n_par * 4          # w r/w + vel r/w per segment
    mxu_t = flops / BF16_PEAK
    upd_t = upd_bytes / HBM_BW
    print(f"B={B:5d} T={T} K={K:2d} (n_seg={n_seg:3d}): "
          f"{per * 1e3:8.2f} ms/batch  {fps / 1e6:8.3f}M frames/s  "
          f"| floor: mxu {mxu_t*1e3:.2f}ms + upd-traffic {upd_t*1e3:.2f}ms",
          flush=True)
    return fps, per


if __name__ == "__main__":
    from nnet_asr_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    print(f"backend: {jax.default_backend()}", flush=True)
    print("-- B sweep (K=4, T=512) --", flush=True)
    prev = 0.0
    for B in (32, 128, 512, 1024, 2048):
        fps, _ = bench(B, 512, 4)
        if prev and fps < prev * 1.1:
            print(f"   saturation: B={B} gains <10% over previous",
                  flush=True)
        prev = fps
    print("-- K sweep (B=128, T=512) --", flush=True)
    for K in (2, 4, 8, 16):
        bench(128, 512, K)
