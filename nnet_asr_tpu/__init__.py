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
