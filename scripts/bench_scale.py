"""Production-scale throughput benchmarks (reproduces BASELINE_MEASURED.md
"Production-shaped models" and the int8 inference numbers).

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scale.py

Round 3: timing is slope-based (two call counts per measurement; the
~28ms tunnel RTT cancels) — the round-1 fixed-window numbers carried the
RTT as bias (docs/KERNELS.md). bench.py remains the canonical MLP3
number; this script is for the big shapes.

Measures, per model shape:
  - full train drain (fwd+bwd+SGD+CE, f32 master params) via the
    on-device fori_loop (one scalar fetch per window)
  - inference forward in f32 vs int8 (per-channel weight quant + dynamic
    activation quant, int32 accumulate)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build(dims, seed=0):
    from nnet_asr_tpu.models import BiasedLinearity, Network, Sigmoid, Softmax

    rng = np.random.default_rng(seed)
    specs, params = [], []
    for i in range(len(dims) - 1):
        specs.append(BiasedLinearity(dims[i], dims[i + 1]))
        params.append({
            "weight": (0.05 * rng.standard_normal(
                (dims[i], dims[i + 1]))).astype(np.float32),
            "bias": np.zeros(dims[i + 1], np.float32)})
        if i < len(dims) - 2:
            specs.append(Sigmoid(dims[i + 1], dims[i + 1]))
            params.append({})
    specs.append(Softmax(dims[-1], dims[-1]))
    params.append({})
    return Network(tuple(specs), params)


def bench_train(dims, bunch=1024, nb=8, M=16):
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.train.sgd import SgdConfig
    from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig

    net = build(dims)
    cfg = TrainerConfig(bunchsize=bunch, cachesize=bunch * nb, seed=1,
                        randomize=False, sgd=SgdConfig(learning_rate=0.01))
    tr = Trainer(net, cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray((0.1 * rng.standard_normal(
        (nb, bunch, dims[0]))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, dims[-1], (nb, bunch)).astype(np.int32))
    drain = tr._drain_train

    def mega(params, velocity, acc, M):
        def body(_, c):
            p, v, a = c
            return drain(p, v, a, feats, labels)
        return jax.lax.fori_loop(0, M, body, (params, velocity, acc))

    mega = jax.jit(mega, static_argnums=(3,), donate_argnums=(0, 1, 2))
    acc = tr._zero_acc()
    tr.params, tr.velocity, acc = mega(tr.params, tr.velocity, acc, M)
    float(tr.params[0]["weight"][0, 0])

    # slope over call count: each window pays ONE ~28ms tunnel RTT,
    # (t(k2)-t(k1))/(k2-k1) cancels it (docs/KERNELS.md round-3 note)
    def window(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(k):
                tr.params, tr.velocity, _ = mega(tr.params, tr.velocity,
                                                 tr._zero_acc(), M)
            float(tr.params[0]["weight"][0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    best = (window(5) - window(1)) / (4 * M * nb)
    fl = sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1)) * 2 * 3
    print(f"train {dims}: {best * 1e6:.0f}us/bunch "
          f"{bunch / best / 1e6:.2f}M frames/s  "
          f"~{fl * bunch / best / 1e12:.1f} TFLOP/s")


def bench_infer(dims, bunch=1024):
    import jax
    import jax.numpy as jnp

    net = build(dims)
    Ws = [jnp.asarray(p["weight"]) for p in net.params if "weight" in p]
    bs = [jnp.asarray(p["bias"]) for p in net.params if "bias" in p]

    def fwd_f32(Ws, bs, x):
        for i, (W, b) in enumerate(zip(Ws, bs)):
            x = x @ W + b
            if i < len(Ws) - 1:
                x = jax.nn.sigmoid(x)
        return jax.nn.softmax(x, axis=-1)

    def quant(W):
        s = jnp.max(jnp.abs(W), axis=0) / 127.0 + 1e-12
        return jnp.clip(jnp.round(W / s), -127, 127).astype(jnp.int8), s

    Wq, ss = zip(*[quant(w) for w in Ws])

    def fwd_int8(Wq, ss, bs, x):
        for i, (wq, s, b) in enumerate(zip(Wq, ss, bs)):
            sx = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
            xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            x = acc.astype(jnp.float32) * (sx * s)[None, :] + b
            if i < len(Wq) - 1:
                x = jax.nn.sigmoid(x)
        return jax.nn.softmax(x, axis=-1)

    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (bunch, dims[0])).astype(np.float32))
    fl = sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1)) * 2 * bunch
    for name, jf, args in [("f32", jax.jit(fwd_f32), (Ws, bs, x)),
                           ("int8", jax.jit(fwd_int8),
                            (list(Wq), list(ss), bs, x))]:
        y = jf(*args)
        float(y[0, 0])

        def window(n):
            t0 = time.perf_counter()
            yy = None
            for _ in range(n):
                yy = jf(*args)
            float(yy[0, 0])
            return time.perf_counter() - t0

        window(50)                        # warm
        dt = (window(200) - window(50)) / 150
        print(f"infer {name} {dims}: {dt * 1e6:.0f}us/bunch "
              f"{fl / dt / 1e12:.1f} T(FL)OP/s")


if __name__ == "__main__":
    from nnet_asr_tpu import enable_compilation_cache
    enable_compilation_cache()
    bench_train([598, 1024, 135], bunch=960)
    bench_train([598, 2048, 2048, 2048, 8192])
    bench_train([1024, 4096, 4096, 4096, 4096, 8192])
    bench_infer([1024, 4096, 4096, 4096, 4096, 8192])
