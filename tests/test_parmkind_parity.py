"""parmKind-conversion parity vs the reference TFeaCat binary.

Runs only when /tmp/refsrc/TFeaCat has been built
(scripts/parity_vs_reference.sh does that); each case converts random
features through both implementations and requires bit-exact agreement.
"""

import os
import subprocess

import numpy as np
import pytest

from nnet_asr_tpu.io import htk

REF_BIN = "/tmp/refsrc/TFeaCat"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_BIN),
                                reason="reference TFeaCat not built")

CASES = [
    # (src_kind, src_dim, target_kind, deriv_windows, converted_dim)
    ("MFCC_E", 13, "MFCC_E_D_Z", [3], 26),
    ("MFCC_E_D_A", 39, "MFCC_E_D_A_T", [2, 2, 2], 52),
    ("MFCC_0", 13, "MFCC_0_D_A", [2, 2], 39),
    ("FBANK", 23, "FBANK_D_A_Z", [2, 2], 69),
    ("MFCC_E", 13, "MFCC_E_D_A_Z", [2, 2], 39),
]


@pytest.mark.parametrize("src_kind,dim,tgt_kind,dw,out_dim", CASES)
def test_conversion_bit_exact(tmp_path, src_kind, dim, tgt_kind, dw, out_dim):
    rng = np.random.default_rng(hash((src_kind, tgt_kind)) % 2**32)
    x = rng.standard_normal((30, dim)).astype(np.float32)
    src = tmp_path / "in.fea"
    htk.write_htk_file(str(src), x, htk.parse_parmkind(src_kind))
    (tmp_path / "in.scp").write_text(str(src) + "\n")
    (tmp_path / "id.mmf").write_text(
        f"<bias> {out_dim} {out_dim}\nv {out_dim}\n"
        + " ".join(["0"] * out_dim) + "\n")
    outdir = tmp_path / "out"
    outdir.mkdir()

    names = ["DELTAWINDOW", "ACCWINDOW", "THIRDWINDOW"]
    args = [REF_BIN, "-H", str(tmp_path / "id.mmf"),
            "-S", str(tmp_path / "in.scp"), "-l", str(outdir), "-y", "cnv",
            f"--TARGETKIND={tgt_kind}"] + \
        [f"--{names[j]}={w}" for j, w in enumerate(dw)]
    subprocess.run(args, check=True, capture_output=True)

    ref, _ = htk.read_htk_file(str(outdir / "in.cnv"))
    deriv = (3 if "_T" in tgt_kind else 2 if "_A" in tgt_kind
             else 1 if "_D" in tgt_kind else 0)
    rd = htk.FeatureReader(target_kind=htk.parse_parmkind(tgt_kind),
                           deriv_order=deriv,
                           deriv_win_lengths=dw + [2] * (3 - len(dw)))
    ours = rd.read(str(src))
    assert ref.shape == ours.shape
    np.testing.assert_array_equal(ref, ours)


REF_JOINER = "/tmp/refsrc/TJoiner"


@pytest.mark.skipif(not os.path.exists(REF_JOINER),
                    reason="reference TJoiner not built")
def test_compressed_write_byte_exact(tmp_path):
    """_C feature WRITING parity: write_htk_file with a compressed kind
    must produce byte-identical output to the reference WriteHTKFeatures
    (Features.cc:1564-1612, scale=2*32767/(max-min), bias=scale*mid,
    truncating float->int16 casts), exercised through TJoiner which
    writes archives with the target kind."""
    rng = np.random.default_rng(99)
    x = (10.0 * rng.standard_normal((40, 13))).astype(np.float32)
    src = tmp_path / "in.fea"
    htk.write_htk_file(str(src), x, htk.parse_parmkind("USER"))
    (tmp_path / "in.scp").write_text(str(src) + "\n")
    outdir = tmp_path / "out"
    outdir.mkdir()
    subprocess.run(
        [REF_JOINER, "-S", str(tmp_path / "in.scp"), "-l", str(outdir),
         "-y", "cmp", "--OUTPUTSCRIPT=" + str(tmp_path / "out.scp"),
         "--TARGETKIND=USER_C"],
        check=True, capture_output=True)
    ref_bytes = (outdir / "000001.cmp").read_bytes()

    ours = tmp_path / "ours.cmp"
    htk.write_htk_file(str(ours), x, htk.parse_parmkind("USER_C"))
    assert ours.read_bytes() == ref_bytes

    # and the roundtrip decompresses to the original within quantization
    back, hdr = htk.read_htk_file(str(ours))
    assert hdr.sample_kind == htk.parse_parmkind("USER")
    span = x.max(axis=0) - x.min(axis=0)
    np.testing.assert_allclose(back, x, atol=float(span.max()) / 65534 + 1e-4)


def test_compressed_write_roundtrip_no_binary(tmp_path):
    """_C write/read roundtrip (runs without the reference build)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((25, 8)).astype(np.float32)
    p = tmp_path / "c.fea"
    htk.write_htk_file(str(p), x, htk.parse_parmkind("MFCC_E_C"))
    back, hdr = htk.read_htk_file(str(p))
    assert hdr.sample_kind == htk.parse_parmkind("MFCC_E")
    assert back.shape == x.shape
    span = float((x.max(axis=0) - x.min(axis=0)).max())
    np.testing.assert_allclose(back, x, atol=span / 65534 + 1e-4)
