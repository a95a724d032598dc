"""Aux tool tests: generators, tjoiner, tsegmenter, gmm-bypass, schedulers."""

import contextlib
import io
import os

import numpy as np
import pytest

from nnet_asr_tpu.io import htk
from nnet_asr_tpu.io.scp import read_scp
from nnet_asr_tpu.models import Network
from nnet_asr_tpu.tools import generators, gen_gmmbypass, tjoiner, tsegmenter


def _run_gen(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        generators.main(args)
    return buf.getvalue()


def test_rbm_init_parses():
    text = _run_gen(["rbm_init", "--dim=10:8", "--gauss", "--seed=1"])
    net = Network.read(text)
    assert net.specs[0].tag == "<rbm>"
    assert net.specs[0].n_inputs == 10 and net.specs[0].n_outputs == 8


def test_recurrent_init_parses():
    text = _run_gen(["recurrent_init", "--dim=6:4", "--gauss", "--seed=2"])
    net = Network.read(text)
    assert net.specs[0].tag == "<recurrent>"
    assert net.params[0]["weight"].shape == (10, 4)


def test_sharedlinearity_init_parses():
    text = _run_gen(["sharedlinearity_init", "--dim=8:6", "--inst=2",
                     "--gauss", "--seed=3"])
    net = Network.read(text)
    assert net.specs[0].tag == "<sharedlinearity>"
    assert net.specs[1].tag == "<sigmoid>"


def test_discretelinearity_init_parses():
    text = _run_gen(["discretelinearity_init", "--dim=8:6", "--blocks=2",
                     "--gauss", "--seed=4"])
    net = Network.read(text)
    assert net.specs[0].tag == "<discretelinearity>"


def test_hamm_dct_matches_reference_transform(example01):
    """Our generator with example-01's geometry reproduces the bundled
    transform's expand/transpose/window/blocklinearity blocks."""
    text = _run_gen(["hamm_dct", "--dimIn=23", "--startFrmExt=25",
                     "--endFrmExt=25", "--dctBaseCnt=26"])
    ours = Network.read(text)
    ref = Network.read(str(example01 / "lib" / "Hamm_dct_norm"))
    # same structure for the first 4 components (ref adds bias+window norm)
    assert [s.tag for s in ours.specs] == [s.tag for s in ref.specs[:4]]
    assert ours.specs[0].offsets == ref.specs[0].offsets
    np.testing.assert_allclose(np.asarray(ours.params[2]["window"]),
                               np.asarray(ref.params[2]["window"]), rtol=1e-6)
    # the bundled file predates the sqrt(2/N) DCT normalization the
    # current tools/transform/gen_hamm_dct.py (which we port) applies
    scale = np.sqrt(2.0 / 51.0)
    np.testing.assert_allclose(np.asarray(ours.params[3]["block"]),
                               scale * np.asarray(ref.params[3]["block"]),
                               rtol=1e-5, atol=1e-6)


def test_splice_and_empty():
    t1 = _run_gen(["splice", "--dimIn=5", "--startFrmExt=2", "--endFrmExt=2"])
    n1 = Network.read(t1)
    assert n1.specs[0].offsets == (-2, -1, 0, 1, 2)
    t2 = _run_gen(["empty", "--dimIn=5"])
    n2 = Network.read(t2)
    assert n2.specs[0].offsets == (0,)


def test_rbm2mlplayer(tmp_path):
    rbm_text = _run_gen(["rbm_init", "--dim=6:4", "--gauss", "--seed=5"])
    src = tmp_path / "rbm.mmf"
    src.write_text(rbm_text)
    dst = tmp_path / "mlp.mmf"
    generators.main(["rbm2mlplayer", str(src), str(dst)])
    net = Network.read(str(dst))
    assert [s.tag for s in net.specs] == ["<biasedlinearity>", "<sigmoid>"]
    rbm_net = Network.read(rbm_text)
    np.testing.assert_array_equal(np.asarray(net.params[0]["weight"]),
                                  np.asarray(rbm_net.params[0]["weight"]))
    np.testing.assert_array_equal(np.asarray(net.params[0]["bias"]),
                                  np.asarray(rbm_net.params[0]["hid_bias"]))


def test_tjoiner_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    scp_lines = []
    data = {}
    for i in range(5):
        x = rng.standard_normal((10 + i, 4)).astype(np.float32)
        p = str(tmp_path / f"u{i}.fea")
        htk.write_htk_file(p, x, htk.PARMKIND_USER)
        scp_lines.append(p)
        data[p] = x
    scp = tmp_path / "in.scp"
    scp.write_text("\n".join(scp_lines) + "\n")
    outscp = tmp_path / "out.scp"
    tjoiner.main(["tjoiner", "-S", str(scp),
                  "--TARGETPARAMDIR=" + str(tmp_path / "joined"),
                  "--TARGETSCRIPT=" + str(outscp)])
    entries = read_scp(str(outscp))
    assert len(entries) == 5
    rd = htk.FeatureReader()
    for e, p in zip(entries, scp_lines):
        got = rd.read(e.physical, e.logical)
        np.testing.assert_allclose(got, data[p], rtol=1e-6)


def test_tsegmenter(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((30, 3)).astype(np.float32)
    p = str(tmp_path / "u.fea")
    htk.write_htk_file(p, x, htk.PARMKIND_USER)
    scp = tmp_path / "in.scp"
    scp.write_text(f"{p}[5,14]\n")
    outscp = tmp_path / "out.scp"
    tsegmenter.main(["tsegmenter", "-S", str(scp),
                     "--TARGETPARAMDIR=" + str(tmp_path / "local"),
                     "--TARGETSCRIPT=" + str(outscp)])
    e = read_scp(str(outscp))[0]
    got, _ = htk.read_htk_file(e.physical)
    np.testing.assert_allclose(got, x[5:15], rtol=1e-6)


def test_gen_gmmbypass(tmp_path):
    d = tmp_path / "states"
    d.write_text("aa_s2\naa_s3\nbb_s2\n")
    out = tmp_path / "hmmdefs"
    gen_gmmbypass.main([str(d), str(out), "--state-sep=_s"])
    text = out.read_text()
    assert "<VecSize> 3" in text
    assert '~s "aa_s2"' in text and '~h "aa"' in text and '~h "bb"' in text
    # our HTK HMM parser can read it back
    from nnet_asr_tpu.io.htk_hmm import parse_mmf
    hmms = parse_mmf(str(out))
    assert hmms["aa"].n_emitting == 2
    assert hmms["aa"].state_names == ["aa_s2", "aa_s3"]


def test_rbm_scheduler_decisions(tmp_path):
    from nnet_asr_tpu.train.rbm_scheduler import (RbmSchedulerConfig,
                                                  run_rbm_schedule)
    mmf = tmp_path / "rbm.mmf"
    mmf.write_text("x")
    calls = []

    def train_iter(path, lrate, momentum, wc):
        calls.append((round(lrate, 6), round(momentum, 2)))

    cfg = RbmSchedulerConfig(iters=8, savepoints=4)
    run_rbm_schedule(cfg, str(mmf), train_iter, has_gaussian_units=False,
                     log=lambda s: None)
    assert len(calls) == 8
    assert calls[0] == (0.1, 0.5)
    assert calls[4] == (0.1, 0.5)     # switch happens AFTER iter 5
    assert calls[5] == (0.1, 0.9)
    assert os.path.exists(str(mmf) + "_iter2")
    # gaussian: low lr, more iters
    calls.clear()
    run_rbm_schedule(cfg, str(mmf), train_iter, has_gaussian_units=True,
                     log=lambda s: None)
    assert len(calls) == 20
    assert calls[0][0] == 0.001


def test_lcrc_and_rasta_generators():
    t = _run_gen(["lcrc_hamm_dct", "--dimIn=23", "--startFrmExt=15",
                  "--endFrmExt=15", "--dctBaseCnt=16"])
    net = Network.read(t)
    net.check_dims()
    assert [s.tag for s in net.specs] == [
        "<expand>", "<transpose>", "<window>", "<copy>", "<blocklinearity>"]
    assert net.n_outputs == 23 * 2 * 16
    t2 = _run_gen(["rasta", "--dimIn=23"])
    net2 = Network.read(t2)
    net2.check_dims()
    assert net2.n_outputs == 23
    # causal FIR: last offset is 0 (history only)
    assert net2.specs[0].offsets[-1] == 0
    assert len(net2.specs[0].offsets) == 51


def test_netjoin_and_bottleneck_trim(tmp_path):
    a = _run_gen(["rbm_init", "--dim=10:8", "--gauss", "--seed=1"])
    # build an MLP with a bottleneck dim 6
    import contextlib, io
    buf = io.StringIO()
    from nnet_asr_tpu.tools import gen_mlp_init
    with contextlib.redirect_stdout(buf):
        gen_mlp_init.main(["--dim=8:6:4", "--gauss", "--seed=2"])
    (tmp_path / "a.mmf").write_text(a)
    (tmp_path / "b.mmf").write_text(buf.getvalue())
    joined = _run_gen(["netjoin", str(tmp_path / "a.mmf"),
                       str(tmp_path / "b.mmf")])
    net = Network.read(joined)
    net.check_dims()
    assert net.n_inputs == 10 and net.n_outputs == 4
    trimmed = _run_gen(["netjoin", "--bndim=6", str(tmp_path / "a.mmf"),
                        str(tmp_path / "b.mmf")])
    net2 = Network.read(trimmed)
    assert net2.n_outputs == 6


def test_tjoiner_frame_ext_and_separators(tmp_path):
    """Reference TJoiner semantics (TJoiner.cc:232-330): archives store
    the ext margins, SCP ranges point at the true segment, NaN separator
    frames sit between segments, and reading back with the same FRM_EXT
    reproduces the extended matrix without touching a separator."""
    rng = np.random.default_rng(3)
    utts = [rng.standard_normal((12 + i, 4)).astype(np.float32)
            for i in range(3)]
    scp_lines = []
    for i, x in enumerate(utts):
        p = str(tmp_path / f"u{i}.fea")
        htk.write_htk_file(p, x, htk.PARMKIND_USER)
        scp_lines.append(p)
    (tmp_path / "in.scp").write_text("\n".join(scp_lines) + "\n")
    outscp = tmp_path / "out.scp"
    tjoiner.main(["tjoiner", "-S", str(tmp_path / "in.scp"),
                  "--TARGETPARAMDIR=" + str(tmp_path / "joined"),
                  "--OUTPUTSCRIPT=" + str(outscp),
                  "--STARTFRMEXT=2", "--ENDFRMEXT=2"])
    entries = read_scp(str(outscp))
    assert len(entries) == 3
    rd = htk.FeatureReader(start_frm_ext=2, end_frm_ext=2)
    rd_plain = htk.FeatureReader()
    for e, x in zip(entries, utts):
        # plain range read gives the true segment
        np.testing.assert_allclose(rd_plain.read(e.physical, e.logical), x,
                                   rtol=1e-6)
        # ext read pulls the STORED margins (replicated edges), not NaNs
        got = rd.read(e.physical, e.logical)
        assert got.shape[0] == x.shape[0] + 4
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got[2:-2], x, rtol=1e-6)
    # raw archive contains NaN separators between segments
    raw, _ = htk.read_htk_file(str(tmp_path / "joined" / "000001.fea_join"))
    assert np.isnan(raw).any()


def test_tjoiner_targetsize_rolls_archives(tmp_path):
    rng = np.random.default_rng(4)
    scp_lines = []
    for i in range(4):
        p = str(tmp_path / f"u{i}.fea")
        htk.write_htk_file(p, rng.standard_normal((10, 2)).astype(np.float32),
                           htk.PARMKIND_USER)
        scp_lines.append(p)
    (tmp_path / "in.scp").write_text("\n".join(scp_lines) + "\n")
    outscp = tmp_path / "o.scp"
    tjoiner.main(["tjoiner", "-S", str(tmp_path / "in.scp"),
                  "--TARGETPARAMDIR=" + str(tmp_path / "j"),
                  "--OUTPUTSCRIPT=" + str(outscp), "--TARGETSIZE=25"])
    import os
    archives = sorted(os.listdir(tmp_path / "j"))
    assert len(archives) == 2
    for e in read_scp(str(outscp)):
        got = htk.FeatureReader().read(e.physical, e.logical)
        assert got.shape == (10, 2)
