"""Steady-state drain throughput A/B at production shapes (VERDICT #3).

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/mfu_drain_ab.py \
      --config unroll8

Measures the REAL production path — Trainer._drain_train over stacked
bunches, donated state, fori_loop mega-window on device, one scalar
fetch per window — for one named configuration per invocation (each is
a fresh process so XLA programs don't accumulate HBM).

Configs: unroll1 unroll4 unroll8 unroll16 pallas (fused affine+sigmoid
+ fused softmax-CE at 8192 senones) bf16 mom9 (momentum 0.9 velocity
traffic) mom9_bf16v (momentum 0.9 with bf16-stored velocity — halves
the velocity HBM stream, SgdConfig.velocity_dtype).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

PEAK_BF16 = 197e12
DIMS = [1024, 4096, 4096, 4096, 4096, 8192]


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


def run_fused(config, bunch=1024, nb=8, M=8):
    """mom9_fused: manual per-layer backward with the Pallas fused
    wgrad+momentum kernel (ops/pallas/sgd_fused.py) — each layer's
    velocity/param streams ride the wgrad GEMM's grid instead of
    scheduling as a post-backward tail. Same math as apply_updates'
    momentum branch (grad_div_frm + mmt_gain semantics)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.ops.pallas.sgd_fused import wgrad_momentum_update

    mom, lr = 0.9, 0.01
    use_kernel = config != "mom9_manual"
    import os
    bm = int(os.environ.get("FUSED_BM", 256))
    bn = int(os.environ.get("FUSED_BN", 256))
    bk = int(os.environ.get("FUSED_BK", 512))
    vdt = jnp.bfloat16 if config == "mom9_fused_bf16v" else jnp.float32
    rng = np.random.default_rng(0)
    Ws = [jnp.asarray((0.05 * rng.standard_normal(
              (DIMS[i], DIMS[i + 1]))).astype(np.float32))
          for i in range(len(DIMS) - 1)]
    Bs = [jnp.zeros((DIMS[i + 1],), jnp.float32)
          for i in range(len(DIMS) - 1)]
    Vw = [jnp.zeros_like(w, dtype=vdt) for w in Ws]
    Vb = [jnp.zeros_like(b, dtype=vdt) for b in Bs]
    rng = np.random.default_rng(1)
    feats = jnp.asarray((0.1 * rng.standard_normal(
        (nb, bunch, DIMS[0]))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, DIMS[-1], (nb, bunch)).astype(np.int32))
    a = lr / (bunch * (1.0 / (1.0 - mom)))   # lr/N, GRADDIVFRM + mmt_gain

    def step(state, x, y):
        ws, bs, vw, vb, acc = state
        hs = [x]
        for l in range(len(ws) - 1):
            hs.append(jax.nn.sigmoid(hs[-1] @ ws[l] + bs[l]))
        z = hs[-1] @ ws[-1] + bs[-1]
        logp = jax.nn.log_softmax(z, axis=-1)
        oh = jax.nn.one_hot(y, DIMS[-1], dtype=jnp.float32)
        acc = {"xent": acc["xent"] - jnp.sum(logp * oh),
               "correct": acc["correct"] + jnp.sum(
                   (jnp.argmax(z, -1) == y).astype(jnp.int32)),
               "frames": acc["frames"] + y.shape[0]}
        e = jnp.exp(logp) - oh
        nws, nbs, nvw, nvb = list(ws), list(bs), list(vw), list(vb)
        for l in range(len(ws) - 1, -1, -1):
            if l > 0:
                h = hs[l]
                e_prev = (e @ ws[l].T) * h * (1.0 - h)
            if use_kernel:
                nws[l], nvw[l] = wgrad_momentum_update(
                    hs[l], e, ws[l], vw[l], a, mom, bm=bm, bn=bn, bk=bk)
            else:
                corr_w = hs[l].T @ e + mom * vw[l].astype(jnp.float32)
                nvw[l] = corr_w.astype(vdt)
                nws[l] = ws[l] - a * corr_w
            gb = jnp.sum(e, axis=0)
            corr = gb + mom * vb[l].astype(jnp.float32)
            nvb[l] = corr.astype(vdt)
            nbs[l] = bs[l] - a * corr
            if l > 0:
                e = e_prev
        return (nws, nbs, nvw, nvb, acc)

    def drain(state, feats, labels):
        def body(c, batch):
            return step(c, batch[0], batch[1]), None
        state, _ = jax.lax.scan(body, state, (feats, labels), unroll=8)
        return state

    def mega(state, M):
        return jax.lax.fori_loop(
            0, M, lambda _, c: drain(c, feats, labels), state)

    mega = jax.jit(mega, static_argnums=(1,), donate_argnums=(0,))

    def mk_zero():
        return {"xent": jnp.zeros((), jnp.float32),
                "correct": jnp.zeros((), jnp.int32),
                "frames": jnp.zeros((), jnp.int32)}

    state = (Ws, Bs, Vw, Vb, mk_zero())
    t0 = _time.perf_counter()
    state = mega(state, M)
    float(state[0][0][0, 0])
    print(f"[compile+warm {_time.perf_counter()-t0:.1f}s]", flush=True)

    def window(k):
        best = float("inf")
        nonlocal state
        for _ in range(4):
            t0 = _time.perf_counter()
            for _ in range(k):
                state = mega((state[0], state[1], state[2], state[3],
                              mk_zero()), M)
            float(state[0][0][0, 0])
            best = min(best, _time.perf_counter() - t0)
        return best

    k1, k2 = 1, 5
    best = (window(k2) - window(k1)) / ((k2 - k1) * M * nb)
    n_params = sum(DIMS[i] * DIMS[i + 1] for i in range(len(DIMS) - 1))
    fl = 3 * 2 * n_params * bunch
    print(f"{config:10s} bunch={bunch}: {best*1e6:6.0f}us/bunch  "
          f"{fl/best/1e12:6.1f} TFLOP/s ({fl/best/PEAK_BF16*100:4.1f}% "
          f"of bf16 peak)", flush=True)


def run_int8(config, bunch=1024, nb=8, M=8):
    """int8 training experiment (ROUND_NOTES round-4 #3): per-step
    per-output-channel weight quantization + dynamic per-tensor
    activation quantization on the int8 MXU, f32 master params and
    straight-through-estimator backward. ``int8fwd`` quantizes only the
    forward GEMMs (1/3 of the step FLOPs); ``int8all`` also runs dgrad
    (eq @ Wq^T) and wgrad (hq^T @ eq) on the int8 MXU. Throughput probe
    only — convergence under quantization is NOT validated here."""
    import time as _time

    import jax
    import jax.numpy as jnp

    lr = 0.01
    all_int8 = config == "int8all"
    rng = np.random.default_rng(0)
    Ws = [jnp.asarray((0.05 * rng.standard_normal(
              (DIMS[i], DIMS[i + 1]))).astype(np.float32))
          for i in range(len(DIMS) - 1)]
    Bs = [jnp.zeros((DIMS[i + 1],), jnp.float32)
          for i in range(len(DIMS) - 1)]
    rng = np.random.default_rng(1)
    feats = jnp.asarray((0.1 * rng.standard_normal(
        (nb, bunch, DIMS[0]))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, DIMS[-1], (nb, bunch)).astype(np.int32))
    a = lr / bunch

    def qw(w):
        s = jnp.max(jnp.abs(w), axis=0) / 127.0 + 1e-12
        return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s

    def qx(x):
        # per-frame (row) scales — the int8pf scheme that holds
        # convergence (docs/KERNELS.md); rows factor out of the dot
        s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0 + 1e-12
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s

    def i8mm(xq, sx, wq, sw, dims):
        acc = jax.lax.dot_general(xq, wq, (dims, ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * sw

    def step(state, x, y):
        ws, bs, acc = state
        wqs = [qw(w) for w in ws]
        hs, hqs = [x], []
        for l in range(len(ws) - 1):
            hq, sh = qx(hs[-1])
            hqs.append((hq, sh))
            wq, sw = wqs[l]
            z = i8mm(hq, sh, wq, sw[None, :], (((1,), (0,)))) + bs[l]
            hs.append(jax.nn.sigmoid(z))
        hq, sh = qx(hs[-1])
        hqs.append((hq, sh))
        wq, sw = wqs[-1]
        z = i8mm(hq, sh, wq, sw[None, :], (((1,), (0,)))) + bs[-1]
        logp = jax.nn.log_softmax(z, axis=-1)
        oh = jax.nn.one_hot(y, DIMS[-1], dtype=jnp.float32)
        acc = {"xent": acc["xent"] - jnp.sum(logp * oh),
               "correct": acc["correct"] + jnp.sum(
                   (jnp.argmax(z, -1) == y).astype(jnp.int32)),
               "frames": acc["frames"] + y.shape[0]}
        e = jnp.exp(logp) - oh
        nws, nbs = list(ws), list(bs)
        for l in range(len(ws) - 1, -1, -1):
            if l > 0:
                h = hs[l]
                if all_int8:
                    eq, se = qx(e)
                    wq, sw = wqs[l]
                    # dgrad: e @ W^T contracts the OUT dim of both;
                    # per-channel weight scales fold into eq's columns
                    # only approximately — this probe uses the max scale
                    # (throughput-faithful, numerics are STE-approximate)
                    d = i8mm(eq, se, wq.T, jnp.max(sw), (((1,), (0,))))
                else:
                    d = e @ ws[l].T
                e_prev = d * h * (1.0 - h)
            if all_int8:
                # wgrad contracts the bunch dim, so per-frame scales do
                # NOT factor out — quantize per-tensor for this GEMM
                se_t = jnp.max(jnp.abs(e)) / 127.0 + 1e-12
                eq = jnp.clip(jnp.round(e / se_t), -127, 127).astype(jnp.int8)
                h = hs[l]
                sh_t = jnp.max(jnp.abs(h)) / 127.0 + 1e-12
                hq = jnp.clip(jnp.round(h / sh_t), -127, 127).astype(jnp.int8)
                g = i8mm(hq.T, sh_t, eq, se_t, (((1,), (0,))))
            else:
                g = hs[l].T @ e
            nws[l] = ws[l] - a * g
            nbs[l] = bs[l] - a * jnp.sum(e, axis=0)
            if l > 0:
                e = e_prev
        return (nws, nbs, acc)

    def drain(state, feats, labels):
        def body(c, batch):
            return step(c, batch[0], batch[1]), None
        state, _ = jax.lax.scan(body, state, (feats, labels), unroll=8)
        return state

    def mega(state, M):
        return jax.lax.fori_loop(
            0, M, lambda _, c: drain(c, feats, labels), state)

    mega = jax.jit(mega, static_argnums=(1,), donate_argnums=(0,))

    def mk_zero():
        return {"xent": jnp.zeros((), jnp.float32),
                "correct": jnp.zeros((), jnp.int32),
                "frames": jnp.zeros((), jnp.int32)}

    state = (Ws, Bs, mk_zero())
    t0 = _time.perf_counter()
    state = mega(state, M)
    float(state[0][0][0, 0])
    print(f"[compile+warm {_time.perf_counter()-t0:.1f}s]", flush=True)

    def window(k):
        best = float("inf")
        nonlocal state
        for _ in range(4):
            t0 = _time.perf_counter()
            for _ in range(k):
                state = mega((state[0], state[1], mk_zero()), M)
            float(state[0][0][0, 0])
            best = min(best, _time.perf_counter() - t0)
        return best

    k1, k2 = 1, 5
    best = (window(k2) - window(k1)) / ((k2 - k1) * M * nb)
    n_params = sum(DIMS[i] * DIMS[i + 1] for i in range(len(DIMS) - 1))
    fl = 3 * 2 * n_params * bunch
    print(f"{config:10s} bunch={bunch}: {best*1e6:6.0f}us/bunch  "
          f"{fl/best/1e12:6.1f} effective-TFLOP/s "
          f"({fl/best/PEAK_BF16*100:4.1f}% of bf16 peak equivalent)",
          flush=True)


def run_split(bunch=1024, nb=8, M=8):
    """mom9_split: the momentum step as TWO XLA programs per bunch —
    grads in one, the v→p momentum chain in the other — probing whether
    program-boundary scheduling beats the single program's post-backward
    tail (VERDICT r3 #4). The host loop dispatches asynchronously; slope
    over call counts cancels RTT+dispatch constants (but NOT the
    per-call dispatch itself, which is a real cost of the split)."""
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.ops.objectives import xent_loss_and_stats
    from nnet_asr_tpu.train.sgd import SgdConfig, apply_updates, \
        init_momentum, layer_lr_factors

    net = build(DIMS)
    sgd = SgdConfig(learning_rate=0.01, momentum=0.9)
    factors = tuple(layer_lr_factors(net, sgd))
    rng = np.random.default_rng(1)
    x = jnp.asarray((0.1 * rng.standard_normal(
        (bunch, DIMS[0]))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, DIMS[-1], bunch).astype(np.int32))
    specs = net.specs

    def loss_fn(params, xx, lab):
        for spec, p in zip(specs[:-1], params[:-1]):
            xx = spec.apply(p, xx)
        loss, _ = xent_loss_and_stats(xx, lab)
        return loss

    grad_j = jax.jit(jax.grad(loss_fn))

    def upd(params, velocity, grads):
        return apply_updates(net, params, velocity, grads, sgd, bunch,
                             factors)

    upd_j = jax.jit(upd, donate_argnums=(0, 1, 2))

    params = jax.device_put(
        [{k: jnp.asarray(v) for k, v in p.items()} for p in net.params])
    velocity = jax.device_put(init_momentum(net, 0.9, None))
    t0 = time.perf_counter()
    g = grad_j(params, x, labels)
    params, velocity = upd_j(params, velocity, g)
    jax.block_until_ready(params)
    print(f"[compile+warm {time.perf_counter()-t0:.1f}s]", flush=True)

    def window(k):
        nonlocal params, velocity
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(k):
                g = grad_j(params, x, labels)
                params, velocity = upd_j(params, velocity, g)
            float(params[0]["weight"][0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = nb * M, 4 * nb * M
    best = (window(k2) - window(k1)) / (k2 - k1)
    n_params = sum(DIMS[i] * DIMS[i + 1] for i in range(len(DIMS) - 1))
    fl = 3 * 2 * n_params * bunch
    print(f"mom9_split bunch={bunch}: {best*1e6:6.0f}us/bunch  "
          f"{fl/best/1e12:6.1f} TFLOP/s ({fl/best/PEAK_BF16*100:4.1f}% "
          f"of bf16 peak)", flush=True)


def run(config, bunch=1024, nb=8, M=8):
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.train.sgd import SgdConfig
    from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig

    if config == "mom9_split":
        return run_split(bunch=bunch, nb=nb, M=M)
    if config.startswith("mom9_fused") or config == "mom9_manual":
        return run_fused(config, bunch=bunch, nb=nb, M=M)
    if config.startswith("int8"):
        return run_int8(config, bunch=bunch, nb=nb, M=M)

    unroll = {"unroll1": 1, "unroll4": 4, "unroll16": 16}.get(config, 8)
    cfg = TrainerConfig(
        bunchsize=bunch, cachesize=bunch * nb, seed=1, randomize=False,
        sgd=SgdConfig(learning_rate=0.01,
                      momentum=0.9 if config.startswith("mom9") else 0.0,
                      velocity_dtype="bf16" if config == "mom9_bf16v"
                      else None),
        use_pallas=(config == "pallas"),
        compute_dtype="bf16" if config == "bf16" else None,
        scan_unroll=unroll)
    net = build(DIMS)
    tr = Trainer(net, cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray((0.1 * rng.standard_normal(
        (nb, bunch, DIMS[0]))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, DIMS[-1], (nb, bunch)).astype(np.int32))
    drain = tr._drain_train

    def mega(params, velocity, acc, M):
        def body(_, c):
            p, v, a = c
            return drain(p, v, a, feats, labels)
        return jax.lax.fori_loop(0, M, body, (params, velocity, acc))

    mega = jax.jit(mega, static_argnums=(3,), donate_argnums=(0, 1, 2))
    acc = tr._zero_acc()
    t0 = time.perf_counter()
    tr.params, tr.velocity, acc = mega(tr.params, tr.velocity, acc, M)
    float(tr.params[0]["weight"][0, 0])
    print(f"[compile+warm {time.perf_counter()-t0:.1f}s]", flush=True)

    # slope timing over CALL COUNT of one compiled program: a window of k
    # back-to-back mega() calls pays ONE ~28ms scalar-fetch RTT through
    # the axon tunnel; (t(k2)-t(k1))/(k2-k1) cancels it exactly (the
    # round-2 version divided a single window by M — RTT-inflated).
    # One program only: the 4*M-window variant took >10min remote compile.
    def window(k):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(k):
                tr.params, tr.velocity, acc = mega(tr.params, tr.velocity,
                                                   tr._zero_acc(), M)
            float(tr.params[0]["weight"][0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = 1, 5
    best = (window(k2) - window(k1)) / ((k2 - k1) * M * nb)
    n_params = sum(DIMS[i] * DIMS[i + 1] for i in range(len(DIMS) - 1))
    fl = 3 * 2 * n_params * bunch
    print(f"{config:10s} bunch={bunch}: {best*1e6:6.0f}us/bunch  "
          f"{fl/best/1e12:6.1f} TFLOP/s ({fl/best/PEAK_BF16*100:4.1f}% "
          f"of bf16 peak)", flush=True)


if __name__ == "__main__":
    from nnet_asr_tpu import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="unroll8",
                    choices=["unroll1", "unroll4", "unroll8", "unroll16",
                             "pallas", "bf16", "mom9", "mom9_bf16v",
                             "mom9_fused", "mom9_fused_bf16v", "mom9_manual",
                             "mom9_split", "int8fwd", "int8all"])
    ap.add_argument("--bunch", type=int, default=1024)
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--M", type=int, default=8)
    a = ap.parse_args()
    run(a.config, bunch=a.bunch, nb=a.nb, M=a.M)
