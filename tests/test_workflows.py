"""Workflow integration tests covering the BASELINE.json configs:
RBM-pretrain→fine-tune composition, BlockSoftmax multi-task training,
recurrent CLI round trip."""

import contextlib
import io
import os

import numpy as np
import pytest

from nnet_asr_tpu.io import htk
from nnet_asr_tpu.io.mlf import MlfWriter
from nnet_asr_tpu.models import (BiasedLinearity, BlockSoftmax, Network,
                                 Rbm, Sigmoid, Softmax)
from nnet_asr_tpu.train.sgd import SgdConfig
from nnet_asr_tpu.train.trainer import Trainer, TrainerConfig


def test_rbm_pretrain_then_finetune(tmp_path):
    """TRbmCu → rbm2mlplayer → TNet composition (deep-MLP config)."""
    rng = np.random.default_rng(0)
    dim, hid, classes = 10, 16, 4

    # data: 4 clusters of binary patterns; label = cluster
    protos = (rng.random((classes, dim)) > 0.5).astype(np.float32)
    X = []
    y = []
    for _ in range(600):
        c = rng.integers(0, classes)
        x = protos[c].copy()
        flip = rng.random(dim) < 0.05
        x[flip] = 1 - x[flip]
        X.append(x)
        y.append(c)
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.int32)

    # 1) CD-1 pretrain an RBM on the features
    from nnet_asr_tpu.train.rbm import (RbmTrainConfig, RbmTrainer)
    spec = Rbm(dim, hid)
    params = {
        "weight": (0.1 * rng.standard_normal((dim, hid))).astype(np.float32),
        "vis_bias": np.zeros(dim, np.float32),
        "hid_bias": np.zeros(hid, np.float32)}
    rt = RbmTrainer(spec, params, RbmTrainConfig(learning_rate=0.1),
                    bunchsize=100, cachesize=600, seed=3)
    for _ in range(15):
        rt.run_epoch(iter([X]))

    # 2) rbm2mlplayer conversion via the MMF text path
    rbm_net = Network((spec,), [
        {k: np.asarray(v) for k, v in rt.params.items()}])
    src = tmp_path / "rbm.mmf"
    rbm_net.write(str(src))
    dst = tmp_path / "mlp_layer.mmf"
    from nnet_asr_tpu.tools import generators
    generators.main(["rbm2mlplayer", str(src), str(dst)])
    pre = Network.read(str(dst))

    # 3) stack a softmax classifier on top and fine-tune with CE
    out_w = (0.1 * rng.standard_normal((hid, classes))).astype(np.float32)
    net = Network(
        tuple(pre.specs) + (BiasedLinearity(hid, classes),
                            Softmax(classes, classes)),
        pre.params + [{"weight": out_w,
                       "bias": np.zeros(classes, np.float32)}, {}])
    cfg = TrainerConfig(bunchsize=100, cachesize=600, seed=5,
                        sgd=SgdConfig(learning_rate=0.5, grad_div_frm=True))
    tr = Trainer(net, cfg)
    for _ in range(5):
        tr.stats = type(tr.stats)()
        tr.run_epoch(iter([(X, y)]))
    assert tr.stats.accuracy > 90.0, tr.stats.accuracy


def test_blocksoftmax_multitask_training():
    """Multi-task: two softmax blocks; labels land in one block per task."""
    rng = np.random.default_rng(1)
    din, d1, d2 = 8, 3, 4
    specs = (BiasedLinearity(din, 16), Sigmoid(16, 16),
             BiasedLinearity(16, d1 + d2),
             BlockSoftmax(d1 + d2, d1 + d2, dims=(d1, d2)))
    params = [
        {"weight": (0.2 * rng.standard_normal((din, 16))).astype(np.float32),
         "bias": np.zeros(16, np.float32)}, {},
        {"weight": (0.2 * rng.standard_normal((16, d1 + d2))).astype(np.float32),
         "bias": np.zeros(d1 + d2, np.float32)}, {}]
    net = Network(specs, params)

    # task-1 samples use labels [0,3), task-2 labels [3,7)
    X, y = [], []
    for _ in range(400):
        if rng.random() < 0.5:
            c = rng.integers(0, d1)
            x = np.zeros(din, np.float32); x[c] = 1.0
            y.append(c)
        else:
            c = rng.integers(0, d2)
            x = np.zeros(din, np.float32); x[4 + c] = 1.0
            y.append(d1 + c)
        X.append(x + 0.1 * rng.standard_normal(din).astype(np.float32))
    X = np.asarray(X, np.float32); y = np.asarray(y, np.int32)

    cfg = TrainerConfig(bunchsize=100, cachesize=400, seed=2,
                        sgd=SgdConfig(learning_rate=1.0, grad_div_frm=True))
    tr = Trainer(net, cfg)
    for _ in range(15):
        tr.stats = type(tr.stats)()
        tr.run_epoch(iter([(X, y)]))
    assert tr.stats.accuracy > 60.0, tr.stats.accuracy


def test_lr_factors_freeze_layer():
    rng = np.random.default_rng(2)
    specs = (BiasedLinearity(6, 8), Sigmoid(8, 8),
             BiasedLinearity(8, 4), Softmax(4, 4))
    params = [
        {"weight": (0.2 * rng.standard_normal((6, 8))).astype(np.float32),
         "bias": np.zeros(8, np.float32)}, {},
        {"weight": (0.2 * rng.standard_normal((8, 4))).astype(np.float32),
         "bias": np.zeros(4, np.float32)}, {}]
    net = Network(specs, params)
    cfg = TrainerConfig(bunchsize=32, cachesize=64, randomize=False,
                        sgd=SgdConfig(learning_rate=0.5,
                                      lr_factors=(0.0, 1.0)))
    tr = Trainer(net, cfg)
    X = rng.standard_normal((64, 6)).astype(np.float32)
    y = rng.integers(0, 4, 64).astype(np.int32)
    tr.run_epoch(iter([(X, y)]))
    # layer 0 frozen, layer 2 trained
    np.testing.assert_array_equal(np.asarray(tr.params[0]["weight"]),
                                  params[0]["weight"])
    assert not np.allclose(np.asarray(tr.params[2]["weight"]),
                           params[2]["weight"])


def test_trecurrent_cli(tmp_path):
    """tools.trecurrent round trip on synthetic data."""
    rng = np.random.default_rng(3)
    din, dh, dout = 3, 6, 3
    # init via the generator
    import contextlib, io as _io
    from nnet_asr_tpu.tools import generators
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        generators.main(["recurrent_init", f"--dim={din}:{dh}", "--gauss",
                         "--seed=4"])
    text = buf.getvalue()
    text += f"<biasedlinearity> {dout} {dh}\nm {dout} {dh}\n"
    w = 0.3 * rng.standard_normal((dout, dh))
    text += "\n".join(" ".join(repr(float(v)) for v in row) for row in w)
    text += f"\nv {dout}\n" + " ".join(["0.0"] * dout) + "\n"
    text += f"<softmax> {dout} {dout}\n"
    init = tmp_path / "rec.mmf"
    init.write_text(text)

    # data: label = previous frame's active channel
    os.makedirs(tmp_path / "feats", exist_ok=True)
    mlf = MlfWriter(str(tmp_path / "labs.mlf"))
    scp = []
    for u in range(12):
        T = 40
        ch = rng.integers(0, dout, T)
        x = np.zeros((T, din), np.float32)
        x[np.arange(T), ch] = 1.0
        labels = np.roll(ch, 1); labels[0] = ch[0]
        p = str(tmp_path / "feats" / f"u{u}.fea")
        htk.write_htk_file(p, x, htk.PARMKIND_USER)
        mlf.write_record(f"*/u{u}.lab", [
            f"{i * 100000} {(i + 1) * 100000} c{labels[i]}" for i in range(T)])
        scp.append(p)
    mlf.close()
    (tmp_path / "map").write_text("c0 c1 c2")
    (tmp_path / "train.scp").write_text("\n".join(scp) + "\n")

    from nnet_asr_tpu.tools import trecurrent
    out = tmp_path / "rec_trained.mmf"
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        for it in range(10):
            src = str(init) if it == 0 else str(out)
            trecurrent.main([
                "trec", "-H", src, "-I", str(tmp_path / "labs.mlf"),
                "-L", "*/", "-X", "lab", "-S", str(tmp_path / "train.scp"),
                "-m", str(tmp_path / "map"), "-n", "0.3", "--BPTT=4",
                "--TARGETMMF=" + str(out)])
    log = buf.getvalue()
    import re
    accs = [float(a) for a in re.findall(r"correct\[([\d.]+)%\]", log)]
    assert accs[-1] > accs[0] + 4, accs
    assert out.exists()
    net = Network.read(str(out))
    assert net.has_recurrent()
