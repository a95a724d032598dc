"""nnet_asr_tpu — a TPU-native hybrid NN/HMM ASR training framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
troylee/nnet-asr (TNet v1.8 fork): HTK feature pipelines, MLP frame
classifiers with cross-entropy/MSE training, RBM CD-1 pretraining,
recurrent nets with truncated BPTT, and MPE lattice sequence training,
plus the HTK/STK interop surface (HTK features, MLFs, ASCII MMF models)
so the reference decode pipeline (HVite GMM-bypass) validates outputs.

Layer map (TPU-native):
  io/        host-side formats: HTK features, MLF, SCP, label maps, MMF text
  ops/       jittable array ops + Pallas TPU kernels for the hot loops
  models/    components + networks as pure functions over pytrees
  train/     caches, SGD semantics, trainers, newbob scheduling
  parallel/  mesh construction, data-parallel & senone-sharded steps
  utils/     HTK-style config system, timing/profiling, logging
  tools/     CLI entry points mirroring the reference binaries
"""

__version__ = "0.1.0"


def enable_compilation_cache():
    """Persistent XLA compilation cache (measured 147s -> 3.3s for the
    transform program on a remote-compile TPU tunnel). Opt out with
    NNET_ASR_TPU_NO_COMPILE_CACHE=1; an explicit user setting
    (JAX_COMPILATION_CACHE_DIR or jax.config) wins.

    Called by the CLI entry points (tools/*.py main) and bench.py — NOT at
    package import: mutating global jax config (and creating a cache dir,
    and persisting every tiny program for the whole process) is too
    intrusive a side effect for processes that import nnet_asr_tpu as a
    library."""
    import os

    if os.environ.get("NNET_ASR_TPU_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "nnet_asr_tpu", "xla")
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            # persist even fast-compiling programs: on a remote-compile
            # backend every miss costs a ~0.4s round-trip, and the tiny
            # eager-op programs (slice/take/convert) all compile in <1s
            # so the default threshold would never persist them
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass          # cache is an optimization; never block startup
