"""RBM CD-1 close-or-prove decomposition (VERDICT r4 #4).

Ablates one CD-1 step into its cost components on the real chip so the
38-61%-of-peak observation becomes a roofline argument:

  props3   — the 3 propagation GEMMs only.  CAVEAT: unmeasurable in
             isolation — any weight-invariant variant gets its GEMM
             chain hoisted out of the fori_loop by XLA (numbers read
             >100% of peak); kept for the demonstration, use gemms5 as
             the honest floor
  gemms5   — 3 props + 2 correlation outer products with the weight
             loop-carried, mean-field (no sampling), trivial update
  nosample — full CD-1 update chain, mean-field negative phase
             (isolates the PRNG + threshold cost when diffed vs full)
  full     — the production CD-1 step (bench_aux.py's workload)
  full_rbg — full CD-1 with the RBG counter PRNG instead of threefry
             (jax.random's default threefry2x32 is VPU-expensive on TPU;
             rbg is the hardware-friendly alternative — statistically a
             different but equally valid stream, same semantics)

Slope timing per CLAUDE.md: one fori_loop program, runtime trip count,
two window sizes, best-of-N; the tunnel RTT cancels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/rbm_roofline.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BF16_PEAK = 197e12          # v5e MXU
HBM_BW = 819e9


def _sync(x):
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x)
            if hasattr(l, "ravel")][0]
    float(leaf.ravel()[0] if leaf.ndim else leaf)


def best_of(call, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(call())
        best = min(best, time.perf_counter() - t0)
    return best


def bench_variant(name, vis, hid, bunch, variant, M1=64, M2=256):
    import jax
    import jax.numpy as jnp

    from nnet_asr_tpu.models import Rbm
    from nnet_asr_tpu.models.components import BERNOULLI, GAUSSIAN
    from nnet_asr_tpu.train.rbm import (RbmTrainConfig, apply_rbm_update,
                                        init_rbm_state, sample_hidden)

    spec = Rbm(vis, hid, vis_type=GAUSSIAN, hid_type=BERNOULLI)
    cfg = RbmTrainConfig()
    rng = np.random.default_rng(0)
    params = {
        "weight": jnp.asarray(0.05 * rng.standard_normal((vis, hid)),
                              jnp.float32),
        "vis_bias": jnp.zeros(vis, jnp.float32),
        "hid_bias": jnp.zeros(hid, jnp.float32)}
    state = init_rbm_state(spec, params, cfg)
    x = jnp.asarray(0.3 * rng.standard_normal((bunch, vis)), jnp.float32)

    rbg = variant in ("full_rbg", "noise_rbg")
    key0 = (jax.random.key(0, impl="rbg") if rbg
            else jax.random.PRNGKey(0))

    def mega(params, state, m):
        def body(_, c):
            p, s, k = c
            if variant in ("full", "full_rbg", "nosample"):
                k, sub = jax.random.split(k)
                pos_hid = spec.apply(p, x)
                if variant == "nosample":
                    hs = pos_hid                  # mean-field
                else:
                    hs = sample_hidden(spec, sub, pos_hid)
                neg_vis = spec.reconstruct(p, hs)
                neg_hid = spec.apply(p, neg_vis)
                p, s = apply_rbm_update(spec, cfg, p, s, x, pos_hid,
                                        neg_vis, neg_hid)
            elif variant == "gemms5":
                pos_hid = spec.apply(p, x)
                neg_vis = spec.reconstruct(p, pos_hid)
                neg_hid = spec.apply(p, neg_vis)
                vh = x.T @ pos_hid - neg_vis.T @ neg_hid
                p = dict(p, weight=p["weight"] + 1e-12 * vh)
            elif variant == "props3":
                pos_hid = spec.apply(p, x)
                neg_vis = spec.reconstruct(p, pos_hid)
                neg_hid = spec.apply(p, neg_vis)
                # weight must be loop-carried or XLA hoists the (weight-
                # invariant) GEMM chain out of the fori_loop entirely
                p = dict(p, weight=p["weight"] * (1.0 + 1e-30),
                         hid_bias=p["hid_bias"]
                         + 1e-12 * jnp.sum(neg_hid, 0))
            elif variant == "noise":
                k, sub = jax.random.split(k)
                u = jax.random.uniform(sub, (bunch, hid))
                p = dict(p, hid_bias=p["hid_bias"] + 1e-12 * jnp.sum(u, 0))
            elif variant == "noise_rbg":
                k, sub = jax.random.split(k)
                u = jax.random.uniform(sub, (bunch, hid))
                p = dict(p, hid_bias=p["hid_bias"] + 1e-12 * jnp.sum(u, 0))
            return p, s, k
        return jax.lax.fori_loop(0, m, body, (params, state, key0))

    jf = jax.jit(mega, donate_argnums=(0, 1))
    st = jf(params, state, jnp.int32(2))
    _sync(st)

    def timed(m):
        nonlocal st
        def call():
            nonlocal st
            st = jf(st[0], st[1], jnp.int32(m))
            return st
        return best_of(call)

    t1, t2 = timed(M1), timed(M2)
    per = (t2 - t1) / (M2 - M1)
    flops = 5 * 2 * vis * hid * bunch
    print(f"{name:26s} bunch={bunch:5d}: {per * 1e6:8.1f} us/step  "
          f"{bunch / per / 1e6:7.2f}M frames/s  "
          f"{flops / per / 1e12:6.1f} TFLOP/s  "
          f"({flops / per / BF16_PEAK * 100:4.1f}% bf16 peak)",
          flush=True)
    return per


if __name__ == "__main__":
    from nnet_asr_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    print(f"backend: {jax.default_backend()}", flush=True)
    V, H = 598, 1024
    for bunch in (960, 4096):
        # small shapes need bigger slope windows through the tunnel
        m1, m2 = (256, 1024) if bunch <= 1024 else (64, 256)
        t = {}
        for v in ("props3", "gemms5", "nosample", "full", "full_rbg",
                  "noise", "noise_rbg"):
            t[v] = bench_variant(v, V, H, bunch, v, M1=m1, M2=m2)
        mxu = 5 * 2 * V * H * bunch / BF16_PEAK
        print(f"  -> decomposition @ bunch {bunch}: "
              f"MXU-ideal {mxu*1e6:.1f}us | props3 {t['props3']*1e6:.1f} | "
              f"+corr {((t['gemms5']-t['props3'])*1e6):.1f} | "
              f"+update {((t['nosample']-t['gemms5'])*1e6):.1f} | "
              f"+sampling {((t['full']-t['nosample'])*1e6):.1f} "
              f"(rbg saves {((t['full']-t['full_rbg'])*1e6):.1f}; "
              f"noise alone {t['noise']*1e6:.1f})", flush=True)
    # bunch saturation sweep on the full step
    for bunch in (2048, 8192, 16384):
        bench_variant("full", V, H, bunch, "full",
                      M1=32, M2=128)
