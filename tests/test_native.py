"""Native HTK I/O parity with the pure-Python reader."""

import numpy as np
import pytest

from nnet_asr_tpu.io import htk, native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native htkio not built")


def test_native_header(example01):
    n, per, sz, kind = native.read_header(
        str(example01 / "features" / "001.fea"))
    assert (n, per, sz, kind) == (136, 100000, 92, htk.PARMKIND_ANON)


def test_native_read_matches_python(example01):
    path = str(example01 / "features" / "002.fea")
    a, _ = htk.read_htk_file(path)
    b = native.read_frames(path)
    np.testing.assert_array_equal(a, b)


def test_native_range_and_extension(example01):
    path = str(example01 / "features" / "001.fea")
    rd = htk.FeatureReader(start_frm_ext=25, end_frm_ext=25)
    want = rd.read(path + "[30,50]")
    got = native.read_frames(path, from_frame=30, to_frame=50,
                             start_ext=25, end_ext=25)
    np.testing.assert_array_equal(got, want)


def test_native_compressed(tmp_path):
    rng = np.random.default_rng(0)
    coefs, n = 7, 12
    x_true = rng.standard_normal((n, coefs)).astype(np.float32) * 5
    A = np.full(coefs, 200.0, dtype=np.float32)
    B = np.linspace(-3, 3, coefs).astype(np.float32)
    s = np.round(x_true * A - B).astype(">i2")
    p = str(tmp_path / "c.fea")
    with open(p, "wb") as f:
        hdr = htk.HtkHeader(n + 4, 100000, coefs * 2,
                            htk.PARMKIND_USER | htk.PARMKIND_C)
        f.write(hdr.pack(True))
        f.write(A.astype(">f4").tobytes())
        f.write(B.astype(">f4").tobytes())
        f.write(s.tobytes())
    a, _ = htk.read_htk_file(p)
    b = native.read_frames(p)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_native_write_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((9, 5)).astype(np.float32)
    p = str(tmp_path / "w.fea")
    native.write_file(p, x, htk.PARMKIND_USER)
    y, hdr = htk.read_htk_file(p)
    np.testing.assert_array_equal(x, y)
    assert hdr.sample_kind == htk.PARMKIND_USER


def test_reader_fast_path_matches_generic(example01):
    """FeatureReader with native fast path == pure python pipeline."""
    rd = htk.FeatureReader(start_frm_ext=25, end_frm_ext=25)
    path = str(example01 / "features" / "003.fea")
    fast = rd.read(path)
    # force generic path
    rd2 = htk.FeatureReader(start_frm_ext=25, end_frm_ext=25)
    fast_fn = rd2._native_fast_read
    rd2._native_fast_read = lambda *a: None
    generic = rd2.read(path)
    np.testing.assert_array_equal(fast, generic)


def test_reader_sentence_cmn_fast_path(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((30, 4)).astype(np.float32) + 5.0
    p = str(tmp_path / "z.fea")
    htk.write_htk_file(p, x, htk.PARMKIND_FBANK)
    rd = htk.FeatureReader(target_kind=htk.parse_parmkind("FBANK_Z"))
    y = rd.read(p)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-5)
