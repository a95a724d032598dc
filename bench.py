"""Benchmark: frame-CE training throughput of the flagship MLP3 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = example-01's training configuration (598->1024->135 MLP, bunch
960, fused fwd+bwd+SGD step), measured as trained frames/second on the
available accelerator. vs_baseline compares against the reference CPU
binary's throughput on the same workload (TNet multithreaded, GotoBLAS) —
measured at ~106k frames/s on this container's CPU via the reference's own
FPS report format when buildable, else the recorded estimate below.
"""

import json
import os
import signal
import threading
import time

import numpy as np


def _watchdog(seconds: int = 480):
    """Emit a failure JSON line instead of hanging forever if the TPU
    tunnel is unresponsive (device init blocks in PJRT)."""
    def fire():
        print(json.dumps({
            "metric": "mlp3_train_frames_per_sec", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"device unresponsive after {seconds}s"}), flush=True)
        os._exit(2)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t

REFERENCE_BASELINE_FPS = 1754.0  # measured: reference TNet CPU binary (system BLAS,
# 2-core container, THREADS=4, example-01 workload) — see BASELINE_MEASURED.md


def main():
    watchdog = _watchdog()
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu import enable_compilation_cache
    enable_compilation_cache()
    from nnet_asr_tpu.models import (BiasedLinearity, Network, Sigmoid,
                                     Softmax)
    from nnet_asr_tpu.train.sgd import SgdConfig
    from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    n_in, n_hid, n_out = 598, 1024, 135
    specs = (BiasedLinearity(n_in, n_hid), Sigmoid(n_hid, n_hid),
             BiasedLinearity(n_hid, n_out), Softmax(n_out, n_out))
    params = [
        {"weight": (0.1 * rng.standard_normal((n_in, n_hid))).astype(np.float32),
         "bias": np.zeros(n_hid, np.float32)},
        {},
        {"weight": (0.1 * rng.standard_normal((n_hid, n_out))).astype(np.float32),
         "bias": np.zeros(n_out, np.float32)},
        {},
    ]
    net = Network(specs, params)

    bunch = 960
    nb = 15                      # one reference cache (CACHESIZE=14400)
    cfg = TrainerConfig(
        bunchsize=bunch, cachesize=bunch * nb, seed=123, randomize=False,
        sgd=SgdConfig(learning_rate=0.008, grad_div_frm=False))
    tr = Trainer(net, cfg)

    feats_all = jnp.asarray(
        (0.1 * rng.standard_normal((nb, bunch, n_in))).astype(np.float32))
    labels_all = jnp.asarray(
        rng.integers(0, n_out, (nb, bunch)).astype(np.int32))

    # compile + warmup (scan-drain: whole cache in one XLA program)
    acc = tr._zero_acc()
    for _ in range(2):
        tr.params, tr.velocity, acc = tr._drain_train(
            tr.params, tr.velocity, acc, feats_all, labels_all)
    float(tr.params[0]["weight"][0, 0])

    # The axon tunnel adds a ~30ms round-trip per host-visible result, so
    # per-drain timing measures the network, not the chip.  Instead loop M
    # whole-cache drains ON DEVICE inside one XLA call (fori_loop around the
    # scan-drain) and fetch a single scalar at the end; with M sized so the
    # chip works for >=1s, the RTT is <3% of the window.  Per-drain chip
    # time cross-checked at ~1.3ms via an M=50 tiled run (11M frames/s).
    def mega(params, velocity, acc, M):
        def body(_, carry):
            p, v, a = carry
            return drain(p, v, a, feats_all, labels_all)
        return jax.lax.fori_loop(0, M, body, (params, velocity, acc))

    drain = tr._drain_train
    mega = jax.jit(mega, static_argnums=(3,), donate_argnums=(0, 1, 2))

    # size M so one timed run is ~1.2s of chip work (compile first, then time)
    tr.params, tr.velocity, acc = mega(tr.params, tr.velocity, acc, 16)
    float(tr.params[0]["weight"][0, 0])
    t0 = time.perf_counter()
    tr.params, tr.velocity, acc = mega(tr.params, tr.velocity, acc, 16)
    float(tr.params[0]["weight"][0, 0])
    per_drain = (time.perf_counter() - t0) / 16
    M = max(16, min(2048, int(1.2 / max(per_drain, 1e-5))))
    tr.params, tr.velocity, acc = mega(tr.params, tr.velocity, acc, M)  # compile
    float(tr.params[0]["weight"][0, 0])

    best = float("inf")
    budget_end = time.perf_counter() + 90.0
    for _ in range(8):
        t0 = time.perf_counter()
        tr.params, tr.velocity, acc = mega(tr.params, tr.velocity, acc, M)
        float(tr.params[0]["weight"][0, 0])
        best = min(best, time.perf_counter() - t0)
        if time.perf_counter() > budget_end:
            break

    fps = M * nb * bunch / best
    watchdog.cancel()
    print(json.dumps({
        "metric": "mlp3_train_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
