"""Subprocess driver for the 2-process jax.distributed test.

Run as: python multihost_driver.py <process_id> <coordinator_port> <outdir>
        [data] [model]

Each process gets 4 virtual CPU devices (XLA_FLAGS set by the parent), so
the fleet is an 8-device (data × model) mesh across 2 processes. The
driver trains one ShardedTrainer epoch with PER-HOST input sharding: this
process reads only utterances [pid::2] of the deterministic synthetic
corpus — the multi-host analog of each host reading its own SCP shard.
Saves final params + stats for the parent to compare against a
single-process oracle replay.
"""

import json
import os
import sys


def synth_corpus(n_utts=13, din=12, dout=15, seed=0):
    """Deterministic synthetic utterances with uneven lengths (so the
    2-host shards are unbalanced and the drain negotiation + tail-drop
    paths execute)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    utts = []
    for _ in range(n_utts):
        T = int(rng.integers(20, 60))
        utts.append((rng.standard_normal((T, din)).astype(np.float32),
                     rng.integers(0, dout, T).astype(np.int32)))
    return utts


def build_net(din=12, dh=24, dout=15, seed=3):
    import numpy as np

    from nnet_asr_tpu.models import (BiasedLinearity, Network, Sigmoid,
                                     Softmax)

    rng = np.random.default_rng(seed)
    specs = (BiasedLinearity(din, dh), Sigmoid(dh, dh),
             BiasedLinearity(dh, dout), Softmax(dout, dout))
    params = [
        {"weight": (0.1 * rng.standard_normal((din, dh))).astype(np.float32),
         "bias": np.zeros(dh, np.float32)}, {},
        {"weight": (0.1 * rng.standard_normal((dh, dout))).astype(np.float32),
         "bias": np.zeros(dout, np.float32)}, {},
    ]
    return Network(specs, params)


def trainer_config():
    from nnet_asr_tpu.train.sgd import SgdConfig
    from nnet_asr_tpu.train.trainer import TrainerConfig

    return TrainerConfig(
        bunchsize=32, cachesize=128, seed=7, randomize=True,
        sgd=SgdConfig(learning_rate=0.1, momentum=0.5, weightcost=1e-4,
                      grad_div_frm=True))


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]
    data = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    model = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    jax.config.update("jax_default_matmul_precision", "highest")
    assert jax.process_count() == 2
    assert jax.device_count() == 8, jax.devices()
    assert jax.local_device_count() == 4

    import numpy as np

    from nnet_asr_tpu.parallel.mesh import make_mesh
    from nnet_asr_tpu.parallel.sharded_trainer import ShardedTrainer

    net = build_net()
    cfg = trainer_config()
    mesh = make_mesh(data=data, model=model)
    trainer = ShardedTrainer(net, cfg, mesh)
    assert trainer.local_bunch == cfg.bunchsize // 2
    assert trainer.local_cache == cfg.cachesize // 2

    # PER-HOST shard: this process reads only its own slice of the corpus
    utts = synth_corpus()
    local = utts[pid::2]
    trainer.run_epoch(iter(local))

    host = trainer.state.host_params()
    result = {
        "frames": trainer.stats.frames,
        "corr": trainer.stats.corr,
        "xent": trainer.stats.error,
        "local_frames_read": trainer.total_frames,
    }
    np.savez(os.path.join(outdir, f"params_p{pid}.npz"),
             w0=host[0]["weight"], b0=host[0]["bias"],
             w2=host[2]["weight"], b2=host[2]["bias"])
    with open(os.path.join(outdir, f"stats_p{pid}.json"), "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()
    print(f"driver p{pid} OK", flush=True)


if __name__ == "__main__":
    main()
