"""Subprocess driver for the 2-process MULTI-HOST RESIDENT newbob test.

Run as: python multihost_resident_driver.py <pid> <port> <corpusdir> <outdir>

Each process (4 virtual CPU devices; the fleet is a 4x2 mesh) reads only
its own SCP shard. It runs the SAME newbob schedule twice:

  * resident: ResidentNewbob(mesh) — local stacks through the lockstep
    drain negotiation, assembled device-side into global sharded arrays
    ONCE, every epoch just the sharded drains + proc-0 MMF writes behind
    barriers;
  * streaming: a fresh ShardedTrainer per epoch re-reading the shard
    (what tools.scheduler does without --resident).

and asserts identical newbob histories and byte-identical accepted
weights — the multi-host generalization of
tests/test_resident.py::test_resident_mesh_matches_streaming_mesh.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    corpus = sys.argv[3]
    outdir = sys.argv[4]

    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    jax.config.update("jax_default_matmul_precision", "highest")
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    from jax.experimental import multihost_utils

    from nnet_asr_tpu.io.htk import FeatureReader
    from nnet_asr_tpu.io.labels import LabelRepository
    from nnet_asr_tpu.io.scp import read_scp
    from nnet_asr_tpu.models.network import Network
    from nnet_asr_tpu.parallel.mesh import make_mesh
    from nnet_asr_tpu.parallel.sharded_trainer import ShardedTrainer
    from nnet_asr_tpu.train.newbob import NewbobConfig, run_newbob
    from nnet_asr_tpu.train.resident import ResidentNewbob
    from nnet_asr_tpu.train.sgd import SgdConfig
    from nnet_asr_tpu.train.trainer import TrainerConfig

    def barrier():
        multihost_utils.sync_global_devices("newbob_fs")

    mesh = make_mesh(data=4, model=2)
    cfg = TrainerConfig(bunchsize=32, cachesize=128, seed=7, randomize=True,
                        sgd=SgdConfig(learning_rate=0.5, momentum=0.4,
                                      weightcost=1e-5))
    nb_cfg = NewbobConfig(learning_rate=0.5, max_iter=3)
    reader = FeatureReader()
    labels_repo = LabelRepository(os.path.join(corpus, "labels.mlf"),
                                  os.path.join(corpus, "phones.map"),
                                  "*/", "lab")
    entries = read_scp(os.path.join(corpus, "train.scp"))[pid::2]
    cv_entries = read_scp(os.path.join(corpus, "cv.scp"))[pid::2]
    init = os.path.join(corpus, "init.mmf")

    # ---- resident run ---------------------------------------------------
    res = ResidentNewbob(init, None, reader, labels_repo, cfg, 0, mesh=mesh)
    res.prepare(entries, cv_entries)
    best_r, st_r = run_newbob(
        nb_cfg, init, os.path.join(outdir, "w_res"),
        res.train_epoch, res.crossvalidate,
        fs_ops=pid == 0, barrier=barrier)

    # ---- streaming comparator (fresh trainer + re-read per epoch) -------
    def utts(ents):
        for e in ents:
            feats = reader.read(e.physical, e.logical)
            labs = labels_repo.get_frame_labels(
                feats.shape[0], reader.last_header.sample_period, e.logical)
            yield feats, labs

    def stream_train(src, lrate, dst):
        net = Network.read(src)
        tr = ShardedTrainer(net, cfg, mesh)
        tr.set_learning_rate(lrate)
        tr.run_epoch(utts(entries))
        if pid == 0:
            Network(net.specs, tr.state.host_params()).write(dst)
        barrier()
        print(tr.report(), end="")
        return tr.stats.accuracy

    def stream_cv(mmf):
        net = Network.read(mmf)
        ccfg = TrainerConfig(bunchsize=32, cachesize=128, seed=7,
                             randomize=False, crossvalidate=True,
                             sgd=cfg.sgd)
        tr = ShardedTrainer(net, ccfg, mesh)
        tr.run_epoch(utts(cv_entries))
        print(tr.report(), end="")
        return tr.stats.accuracy

    best_s, st_s = run_newbob(
        nb_cfg, init, os.path.join(outdir, "w_str"),
        stream_train, stream_cv, fs_ops=pid == 0, barrier=barrier)

    hist_r = [(h["iter"], round(h["tr"], 8), round(h["cv"], 8))
              for h in st_r.history]
    hist_s = [(h["iter"], round(h["tr"], 8), round(h["cv"], 8))
              for h in st_s.history]
    assert hist_r == hist_s, f"p{pid}: {hist_r} != {hist_s}"
    if pid == 0:
        names_r = sorted(os.listdir(os.path.join(outdir, "w_res")))
        names_s = sorted(os.listdir(os.path.join(outdir, "w_str")))
        assert names_r == names_s, (names_r, names_s)
        for n in names_r:
            a = open(os.path.join(outdir, "w_res", n)).read()
            b = open(os.path.join(outdir, "w_str", n)).read()
            assert a == b, f"weights differ: {n}"
        with open(os.path.join(outdir, "histories_ok"), "w") as f:
            f.write(repr(hist_r))
    jax.distributed.shutdown()
    print(f"resident driver p{pid} OK", flush=True)


if __name__ == "__main__":
    main()
