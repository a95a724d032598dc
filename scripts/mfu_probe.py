"""MFU decomposition probe for the production-shaped train step.

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/mfu_probe.py

Times, at [1024, 4096x4, 8192] (and configurable bunch):
  - forward only (5 GEMMs; full logits consumed so XLA cannot
    slice-propagate the batch away)
  - forward+backward (all weight grads consumed)
  - full train step, donated buffers (the production drain path)
  - full train step, NO donation (shows the copy-on-preserve cost)
each as an on-device fori_loop/scan window.  Timing is SLOPE-BASED:
every window pays one scalar fetch through the axon tunnel (~28ms RTT,
measured), so per-step time is (t_window(M2) - t_window(M1)) / (M2-M1)
— the constant RTT+dispatch term cancels exactly.  (The round-2 version
divided a single M=16 window by M; at ~1-5ms/step the RTT was 30-60% of
the window and every number was inflated — hence the stale "78% of
peak".)  The deltas locate the non-GEMM cost vs bf16 MXU peak.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

PEAK_BF16 = 197e12   # v5e MXU peak


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


def _sync(out):
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ravel")][0]
    # fetch ONE element (a full-leaf np.asarray would drag MBs through the
    # ~30ms-RTT tunnel and dominate the timing window)
    float(leaf.ravel()[0] if leaf.ndim else leaf)


def best_of(call, reps=4):
    """call() -> out; times reps, returns best seconds."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = call()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def slope_time(make_call, m1, m2, reps=4):
    """Per-iteration seconds via two window sizes; RTT+dispatch cancels."""
    t1 = best_of(make_call(m1), reps)
    t2 = best_of(make_call(m2), reps)
    return (t2 - t1) / (m2 - m1)


def probe(dims, bunch, M=32, momentum=0.0):
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.train.sgd import SgdConfig, apply_updates
    from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig

    net = build(dims)
    cfg = TrainerConfig(bunchsize=bunch, cachesize=bunch, seed=1,
                        randomize=False,
                        sgd=SgdConfig(learning_rate=0.01, momentum=momentum))
    tr = Trainer(net, cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray((0.1 * rng.standard_normal(
        (bunch, dims[0]))).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, dims[-1], bunch).astype(np.int32))

    # move params/velocity on device ONCE (Trainer init leaves host numpy;
    # re-transferring 350MB per timed call would measure the tunnel) —
    # later donate variants take cheap ON-DEVICE copies of this upload
    t0 = time.perf_counter()
    params0 = jax.device_put(tr.params)
    velocity0 = jax.device_put(tr.velocity)
    jax.block_until_ready(params0)
    print(f"[device_put params: {time.perf_counter()-t0:.1f}s]", flush=True)
    devcopy = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

    n_params = sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    fl_fwd = 2 * n_params * bunch
    specs = tr.net.specs

    def fwd_logits(params, xx):
        for spec, p in zip(specs[:-1], params[:-1]):
            xx = spec.apply(p, xx)
        return xx

    from nnet_asr_tpu.ops.objectives import xent_loss_and_stats

    def loss_fn(params, xx, lab):
        logits = fwd_logits(params, xx)
        loss, stats = xent_loss_and_stats(logits, lab)
        return loss, stats

    M1, M2 = M, 4 * M

    # --- forward only: consume the FULL logits (sum) so nothing DCEs ------
    @functools.partial(jax.jit, static_argnums=2)
    def mega_fwd(params, xx, m):
        def body(_, s):
            logits = fwd_logits(params, xx * (1.0 + s * 1e-20))
            return jnp.sum(logits) * 1e-20
        return jax.lax.fori_loop(0, m, body, jnp.float32(0))

    for m in (M1, M2):
        _sync(mega_fwd(params0, x, m))    # compile both window sizes
    t_fwd = slope_time(
        lambda m: (lambda: mega_fwd(params0, x, m)), M1, M2)
    print(f"fwd                {t_fwd*1e3:8.3f} ms  "
          f"{fl_fwd/t_fwd/1e12:6.1f} TFLOP/s "
          f"({fl_fwd/t_fwd/PEAK_BF16*100:4.1f}% peak on 1x GEMM flops)",
          flush=True)

    # --- forward+backward: consume EVERY grad leaf ------------------------
    @functools.partial(jax.jit, static_argnums=3)
    def mega_grad(params, xx, lab, m):
        def body(_, s):
            (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, xx * (1.0 + s * 1e-20), lab)
            tot = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return tot * 1e-20
        return jax.lax.fori_loop(0, m, body, jnp.float32(0))

    for m in (M1, M2):
        _sync(mega_grad(params0, x, labels, m))
    t_grad = slope_time(
        lambda m: (lambda: mega_grad(params0, x, labels, m)), M1, M2)
    print(f"fwd+bwd            {t_grad*1e3:8.3f} ms  "
          f"{3*fl_fwd/t_grad/1e12:6.1f} TFLOP/s "
          f"({3*fl_fwd/t_grad/PEAK_BF16*100:4.1f}% peak)   "
          f"[bwd +{(t_grad-t_fwd)*1e3:.3f} ms]", flush=True)

    # --- full train step ----------------------------------------------------
    def mega_step(params, velocity, acc, xx, lab, m):
        def body(c, _):
            p, v, a = c
            (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, xx, lab)
            p, v = apply_updates(net, p, v, grads, cfg.sgd, xx.shape[0],
                                 tr.factors)
            a = {k: a[k] + stats[k] for k in a}
            return (p, v, a), None
        (p, v, a), _ = jax.lax.scan(body, (params, velocity, acc),
                                    jnp.arange(m))
        return p, v, a

    for name, donate in (("full step (donate)", True),
                         ("full step (copy)  ", False)):
        jf = jax.jit(mega_step, static_argnums=5,
                     donate_argnums=(0, 1, 2) if donate else ())

        def timed_window(m, jf=jf):
            # fresh state per call so donation doesn't consume the probe's
            # master copies; the devcopy cost rides inside the constant
            # term only if done OUTSIDE the timed call — so copy first
            def call():
                return jf(devcopy(params0), devcopy(velocity0),
                          tr._zero_acc(), x, labels, m)
            return call

        for m in (M1, M2):
            _sync(timed_window(m)())      # compile + warmup
        # NOTE: the devcopy inside the window is per-WINDOW (constant),
        # so it cancels in the slope like the RTT does
        t = slope_time(timed_window, M1, M2)
        extra = f"[vs fwd+bwd +{(t-t_grad)*1e3:.3f} ms]"
        print(f"{name} {t*1e3:8.3f} ms  {3*fl_fwd/t/1e12:6.1f} TFLOP/s "
              f"({3*fl_fwd/t/PEAK_BF16*100:4.1f}% peak)   {extra}"
              f"  (momentum={momentum})", flush=True)
    return t


if __name__ == "__main__":
    import argparse

    from nnet_asr_tpu import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--bunch", type=int, default=1024)
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--momentum", type=float, default=0.0)
    a = ap.parse_args()
    DIMS = [1024, 4096, 4096, 4096, 4096, 8192]
    print(f"=== dims={DIMS} bunch={a.bunch} momentum={a.momentum} ===",
          flush=True)
    probe(DIMS, a.bunch, M=a.M, momentum=a.momentum)
