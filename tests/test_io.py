"""I/O layer tests against the reference example-01 data (byte-level oracle)."""

import io
import os

import numpy as np
import pytest

from nnet_asr_tpu.io import htk, mlf, scp, labels, mmf
from nnet_asr_tpu.io.htk import FeatureReader, HtkHeader


def test_read_htk_header_and_data(example01):
    data, hdr = htk.read_htk_file(str(example01 / "features" / "001.fea"))
    assert hdr.n_samples == 136
    assert hdr.sample_period == 100000
    assert hdr.sample_size == 92
    assert hdr.sample_kind == htk.PARMKIND_ANON
    assert data.shape == (136, 23)
    assert np.isfinite(data).all()


def test_htk_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((17, 13)).astype(np.float32)
    p = str(tmp_path / "t.fea")
    htk.write_htk_file(p, x, htk.PARMKIND_USER, 100000)
    y, hdr = htk.read_htk_file(p)
    np.testing.assert_array_equal(x, y)
    assert hdr.sample_kind == htk.PARMKIND_USER
    assert hdr.n_samples == 17


def test_compressed_htk(tmp_path):
    # build a compressed file by hand: x = (s + B) / A
    rng = np.random.default_rng(1)
    coefs = 5
    n = 8
    x_true = rng.standard_normal((n, coefs)).astype(np.float32) * 10
    A = np.full(coefs, 100.0, dtype=np.float32)
    B = np.zeros(coefs, dtype=np.float32)
    s = np.round(x_true * A - B).astype(">i2")
    p = str(tmp_path / "c.fea")
    with open(p, "wb") as f:
        hdr = HtkHeader(n + 4, 100000, coefs * 2, htk.PARMKIND_USER | htk.PARMKIND_C)
        f.write(hdr.pack(True))
        f.write(A.astype(">f4").tobytes())
        f.write(B.astype(">f4").tobytes())
        f.write(s.tobytes())
    y, hdr2 = htk.read_htk_file(p)
    assert y.shape == (n, coefs)
    assert hdr2.n_samples == n
    np.testing.assert_allclose(y, x_true, atol=0.01)


def test_frame_extension_edges(example01):
    # reading with ±25 extension replicates edge frames (Features.cc:1264-1279)
    rd = FeatureReader(start_frm_ext=25, end_frm_ext=25)
    x = rd.read(str(example01 / "features" / "001.fea"))
    assert x.shape == (136 + 50, 23)
    for i in range(25):
        np.testing.assert_array_equal(x[i], x[25])
        np.testing.assert_array_equal(x[-1 - i], x[-26])
    raw, _ = htk.read_htk_file(str(example01 / "features" / "001.fea"))
    np.testing.assert_array_equal(x[25:-25], raw)


def test_frame_range_consumes_real_frames_before_extending(example01):
    # with range [30,50] and ext 25, the left extension uses real frames 5..29
    rd = FeatureReader(start_frm_ext=25, end_frm_ext=25)
    x = rd.read(str(example01 / "features" / "001.fea") + "[30,50]")
    raw, _ = htk.read_htk_file(str(example01 / "features" / "001.fea"))
    assert x.shape == (21 + 50, 23)
    np.testing.assert_array_equal(x, raw[5:76])


def test_deltas_match_htk_formula(tmp_path):
    # build a small static file and compute deltas with deriv window 2
    rng = np.random.default_rng(2)
    x = rng.standard_normal((20, 3)).astype(np.float32)
    p = str(tmp_path / "d.fea")
    htk.write_htk_file(p, x, htk.PARMKIND_MFCC)
    rd = FeatureReader(target_kind=htk.parse_parmkind("MFCC_D"),
                       deriv_order=1, deriv_win_lengths=[2])
    y = rd.read(p)
    assert y.shape == (20, 6)
    np.testing.assert_array_equal(y[:, :3], x)
    # oracle: HTK regression formula with edge clamping
    T = len(x)
    norm = sum(2 * k * k for k in (1, 2))
    for i in range(T):
        want = sum(k * (x[min(T - 1, i + k)] - x[max(0, i - k)]) for k in (1, 2)) / norm
        np.testing.assert_allclose(y[i, 3:], want, rtol=1e-5)


def test_sentence_cmn(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((30, 4)).astype(np.float32) + 5.0
    p = str(tmp_path / "z.fea")
    htk.write_htk_file(p, x, htk.PARMKIND_FBANK)
    rd = FeatureReader(target_kind=htk.parse_parmkind("FBANK_Z"))
    y = rd.read(p)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(y, x - x.mean(axis=0, dtype=np.float32), atol=1e-5)


def test_cepsnorm_files(tmp_path):
    mean = np.array([1.0, -2.0, 3.0])
    var = np.array([4.0, 0.25, 1.0])
    pm = str(tmp_path / "cmn")
    pv = str(tmp_path / "cvn")
    htk.write_cepsnorm_file(pm, "MEAN", htk.PARMKIND_FBANK, mean)
    htk.write_cepsnorm_file(pv, "VARIANCE", htk.PARMKIND_FBANK, var)
    m = htk.read_cepsnorm_file(pm, "MEAN", htk.PARMKIND_FBANK, 3)
    v = htk.read_cepsnorm_file(pv, "VARIANCE", htk.PARMKIND_FBANK, 3)
    np.testing.assert_allclose(m, mean)
    np.testing.assert_allclose(v, 1.0 / np.sqrt(var))


def test_parmkind_parse_roundtrip():
    for s, base in [("MFCC_E_D_A_Z", 6), ("USER", 9), ("ANON", 12)]:
        k = htk.parse_parmkind(s)
        assert (k & 0o77) == base
        assert htk.parse_parmkind(htk.parmkind_to_str(k)) == k


def test_scp_parsing():
    e = scp.parse_scp_entry("logical.fea=physical.fea[10,20]{0.5}")
    assert e.logical == "logical.fea"
    assert e.physical == "physical.fea[10,20]"
    assert e.weight == 0.5
    e2 = scp.parse_scp_entry("features/001.fea")
    assert e2.logical == e2.physical == "features/001.fea"
    assert e2.weight == 1.0


def test_scp_example01(example01):
    entries = scp.read_scp(str(example01 / "lib" / "test.scp"))
    assert len(entries) == 100
    assert entries[0].physical == "features/001.fea"


def test_mlf_index_and_lookup(example01):
    r = mlf.MlfReader(str(example01 / "lib" / "test_3s.mlf"))
    assert len(r.names()) == 100
    ivs = r.read_intervals("*/001.lab")
    assert ivs[0] == (0, 100000, "sil_s2")
    # lookup by full path resolves the wildcard record
    ivs2 = r.read_intervals("features/001.lab")
    assert ivs2 == ivs


def test_label_targets(example01):
    rep = labels.LabelRepository(
        str(example01 / "lib" / "test_3s.mlf"),
        str(example01 / "lib" / "mono_state_phn_set_135_phn"),
        label_dir="*/", label_ext="lab")
    assert rep.n_outputs == 135
    lab = rep.get_frame_labels(136, 100000, "features/001.fea")
    assert lab.shape == (136,)
    assert (lab >= 0).all() and (lab < 135).all()
    # first label is sil_s2
    assert lab[0] == rep.label_map["sil_s2"]
    onehot = rep.get_onehot(136, 100000, "features/001.fea")
    np.testing.assert_array_equal(onehot.sum(axis=1), 1.0)
    np.testing.assert_array_equal(onehot.argmax(axis=1), lab)


def test_all_example01_labels_consistent(example01):
    """Every utterance's labels cover exactly the feature frames."""
    rep = labels.LabelRepository(
        str(example01 / "lib" / "test_3s.mlf"),
        str(example01 / "lib" / "mono_state_phn_set_135_phn"),
        label_dir="*/", label_ext="lab")
    entries = scp.read_scp(str(example01 / "lib" / "test.scp"))
    for e in entries[:10]:
        data, hdr = htk.read_htk_file(str(example01 / e.physical))
        lab = rep.get_frame_labels(hdr.n_samples, hdr.sample_period, e.logical)
        assert lab.shape == (hdr.n_samples,)


def test_matrix_vector_ascii_roundtrip():
    rng = np.random.default_rng(4)
    m = rng.standard_normal((3, 5)).astype(np.float32)
    v = rng.standard_normal(7).astype(np.float32)
    m2 = mmf.read_matrix_ascii(mmf.write_matrix_ascii(m))
    v2 = mmf.read_vector_ascii(mmf.write_vector_ascii(v))
    np.testing.assert_array_equal(m, m2)
    np.testing.assert_array_equal(v, v2)


def test_process_mask():
    assert htk.process_mask("dir/spk1_utt3.fea", "*/%%%%_*.fea") == "spk1"
    assert htk.process_mask("abc", "%%%") == "abc"
    with pytest.raises(ValueError):
        htk.process_mask("abc", "x%%")


def test_gzip_ascii_features(tmp_path):
    import gzip
    rng = np.random.default_rng(9)
    x = rng.standard_normal((12, 5)).astype(np.float32)
    p = str(tmp_path / "a.fea.gz")
    with gzip.open(p, "wt") as f:
        for row in x:
            f.write(" ".join(repr(float(v)) for v in row) + "\n")
    rd = FeatureReader(start_frm_ext=2, end_frm_ext=2)
    y = rd.read(p)
    assert y.shape == (16, 5)
    np.testing.assert_allclose(y[2:-2], x, rtol=1e-6)
    np.testing.assert_allclose(y[0], x[0], rtol=1e-6)


def test_stk_open_pipe_streams(tmp_path, example01):
    """StkStream pipe semantics (StkStream.tcc:128-150): a leading '|'
    runs a shell command; works for SCP lists, MLFs, and feature files."""
    from nnet_asr_tpu.io.htk import FeatureReader, stk_open
    from nnet_asr_tpu.io.mlf import MlfReader
    from nnet_asr_tpu.io.scp import read_scp

    scp = example01 / "lib" / "test.scp"
    direct = read_scp(str(scp))
    piped = read_scp(f"| cat {scp}")
    assert [e.physical for e in piped] == [e.physical for e in direct]

    mlf = example01 / "lib" / "test_3s.mlf"
    m1 = MlfReader(str(mlf))
    m2 = MlfReader(f"| cat {mlf}")
    name = next(iter(m1._index))
    assert m1.read_block(name) == m2.read_block(name)

    # feature file through a pipe == direct read
    import numpy as np
    rd = FeatureReader()
    fea = example01 / direct[0].physical
    a = rd.read(str(fea))
    b = rd.read(f"| cat {fea}")
    np.testing.assert_array_equal(a, b)

    # write mode: stream through a pipe into a file
    out = tmp_path / "piped.txt"
    with stk_open(f"| cat > {out}", "w") as f:
        f.write("hello\n")
    assert out.read_text() == "hello\n"


def test_feature_nan_scan(tmp_path):
    """Corrupt feature files fail fast with row/col/file in the message
    (Matrix::CheckData semantics, KaldiLib/Matrix.h:238-250)."""
    import struct

    import numpy as np
    import pytest

    from nnet_asr_tpu.io.htk import PARMKIND_USER, FeatureReader, write_htk_file

    data = np.ones((10, 4), np.float32)
    data[3, 2] = np.nan
    fn = tmp_path / "bad.fea"
    write_htk_file(str(fn), data, PARMKIND_USER, 100000, True)
    rd = FeatureReader()
    with pytest.raises(ValueError, match=r"row: 3 col: 2.*bad\.fea"):
        rd.read(str(fn))


def test_mlf_wildcard_masks(tmp_path):
    """Full LabelContainer semantics (MlfStream.cc:40-264): depth-keyed
    leading-* hash, general ?-glob patterns in a sequential list, and
    earlier-pattern precedence over later hash insertions."""
    p = tmp_path / "w.mlf"
    p.write_text(
        "#!MLF!#\n"
        '"*/special?.lab"\n0 100000 pat\n.\n'        # list pattern (has ?)
        '"*/special1.lab"\n0 100000 hashed\n.\n'     # hashed AFTER pattern
        '"*/deep/x.lab"\n0 100000 deep2\n.\n'        # depth 2
        '"*/x.lab"\n0 100000 shallow\n.\n'           # depth 1
        '"exact/y.lab"\n0 100000 exact\n.\n'         # no wildcard
        '"*tail.lab"\n0 100000 tail\n.\n'            # depth 0
    )
    from nnet_asr_tpu.io.mlf import MlfReader
    m = MlfReader(str(p))
    # general glob pattern matches
    assert m.read_intervals("dir/special7.lab")[0][2] == "pat"
    # earlier list pattern takes precedence over the later hashed record
    # (Find: list limited to pre-hash insertions, MlfStream.cc:247-264)
    assert m.read_intervals("dir/special1.lab")[0][2] == "pat"
    # deepest-first crop: query with 2+ components prefers the deeper mask
    assert m.read_intervals("a/deep/x.lab")[0][2] == "deep2"
    assert m.read_intervals("a/b/x.lab")[0][2] == "shallow"
    # exact (non-wildcard) names win at MAX depth
    assert m.read_intervals("exact/y.lab")[0][2] == "exact"
    # depth-0 '*tail' matches only the full-string tail
    assert m.read_intervals("tail.lab")[0][2] == "tail"
    with pytest.raises(KeyError):
        m.read_block("nothing/matches.here")


def test_stk_open_filter_cmd(tmp_path):
    """HTK filter commands (H*FILTER): '$' expands to the filename
    (ExpandHtkFilterCmd, Common.cc:203-227)."""
    import gzip

    from nnet_asr_tpu.io.htk import stk_open

    raw = tmp_path / "data.txt.gz"
    with gzip.open(raw, "wt") as f:
        f.write("hello filter\n")
    with stk_open(str(raw), "rt", filter_cmd="gunzip -c $") as f:
        assert f.read() == "hello filter\n"
    # failing filter raises at close (exit-status propagation)
    with pytest.raises(IOError):
        with stk_open(str(tmp_path / "missing.gz"), "rt",
                      filter_cmd="gunzip -c $") as f:
            f.read()


def test_lattice_archive_filter(tmp_path):
    from nnet_asr_tpu.io.slf import LatticeArchive

    (tmp_path / "u1.lat").write_text(
        "# rot13'd lattice? no - just plain, filter is 'cat $'\n"
        "I=0\tt=0.00\nI=1\tt=0.10\nJ=0\tS=0\tE=1\tW=a\ta=0.0\tl=-0.5\n")
    arch = LatticeArchive(str(tmp_path), "lat", filter_cmd="cat $")
    lat = arch.get("dir/u1.fea")
    assert len(lat.nodes) == 2 and len(lat.arcs) == 1
    assert lat.arcs[0].word == "a"


def test_mlf_bare_name_matches_fullpath_record(tmp_path):
    """SVite's '-z lat' lattice MLFs store records under FULL paths
    ('"/workdir/001.lat"'); tmpe's LatticeArchive queries by bare name
    ('001.lat') — the basename fallback must fire for base == name too
    (round-3 regression fix: the round-2 wildcard rewrite guarded it with
    base != name and the MPE pipeline lost its lattices)."""
    from nnet_asr_tpu.io.mlf import MlfReader

    p = tmp_path / "lats.mlf"
    p.write_text('#!MLF!#\n"/some/work/dir/001.lat"\nN=1 L=0\n.\n'
                 '"/some/work/dir/002.lat"\nN=2 L=1\n.\n')
    r = MlfReader(str(p))
    assert r.read_block("001.lat") == ["N=1 L=0"]
    assert r.read_block("002.lat") == ["N=2 L=1"]
    # pathful queries keep working
    assert r.read_block("/some/work/dir/001.lat") == ["N=1 L=0"]
