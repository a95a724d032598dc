"""CLI tool tests: config parsing + example-01 end-to-end training."""

import os
import subprocess
import sys

import numpy as np
import pytest

from nnet_asr_tpu.utils.config import UserInterface


def test_userinterface_parsing(tmp_path):
    cfg = tmp_path / "t.cfg"
    cfg.write_text("# comment\nTNET:FOO = 7\nBAR = hello\n")
    ui = UserInterface()
    argv = ["prog", "-C", str(cfg), "-n", "0.01", "-T", "021",
            "--GRAD-DIV-FRM=F", "--BUNCHSIZE=960", "-c", "file1.fea"]
    opt = (" -c n   CROSSVALIDATE=TRUE"
           " -n r   LEARNINGRATE"
           " -T r   TRACE")
    idx = ui.parse_options(argv, opt, "TNET")
    assert argv[idx] == "file1.fea"
    assert ui.get_flt("LEARNINGRATE", 0.06) == 0.01
    assert ui.get_int("TRACE", 0) == 0o21
    assert ui.get_bool("CROSSVALIDATE", False) is True
    assert ui.get_bool("GRADDIVFRM", True) is False
    assert ui.get_int("BUNCHSIZE", 0) == 960
    assert ui.get_int("FOO", 0) == 7          # TNET: namespaced from config
    assert ui.get_str("BAR") == "hello"       # global from config
    ui.check_command_line_param_use()


def test_userinterface_unused_param_check():
    ui = UserInterface()
    ui.parse_options(["prog", "--TYPO=1"], " -n r LEARNINGRATE", "TNET")
    with pytest.raises(ValueError, match="TYPO"):
        ui.check_command_line_param_use()


def test_feature_params_bundle():
    ui = UserInterface()
    ui.parse_options(
        ["prog", "--TARGETKIND=MFCC_D_A", "--STARTFRMEXT=5", "--DELTAWINDOW=3"],
        " ", "TNET")
    p = ui.get_feature_params()
    assert p["start_frm_ext"] == 5
    assert p["deriv_order"] == 2
    assert p["deriv_win_lengths"] == [3, 2, 2]


@pytest.fixture(scope="module")
def example01_training(tmp_path_factory):
    """Run a short training epoch (30 utterances) through the CLI main()."""
    example01 = "/root/reference/examples/01test_MLP3_compare_multithread_cuda_decode_phn"
    if not os.path.isdir(example01):
        pytest.skip("reference example 01 not available")
    tmp = tmp_path_factory.mktemp("ex01")
    init = tmp / "init.mmf"
    scp = tmp / "sub.scp"
    out = tmp / "epoch1.mmf"

    from nnet_asr_tpu.tools import gen_mlp_init
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gen_mlp_init.main(["--dim=598:1024:135", "--gauss", "--negbias",
                           "--seed=11"])
    init.write_text(buf.getvalue())

    with open(os.path.join(example01, "lib/test.scp")) as f:
        lines = f.readlines()[:30]
    scp.write_text("".join(os.path.join(example01, l) for l in lines))

    from nnet_asr_tpu.tools import tnet
    cwd = os.getcwd()
    os.chdir(example01)
    try:
        stdout = io.StringIO()
        with contextlib.redirect_stdout(stdout):
            tnet.main([
                "tnet", "-H", str(init),
                "-I", "lib/test_3s.mlf", "-L", "*/", "-X", "lab",
                "-S", str(scp), "-m", "lib/mono_state_phn_set_135_phn",
                "-n", "0.008", "--GRAD-DIV-FRM=F",
                "--TARGETMMF=" + str(out),
                "--BUNCHSIZE=960", "--CACHESIZE=4800",
                "--RANDOMIZE=TRUE", "--SEED=123",
                "--FEATURETRANSFORM=lib/Hamm_dct_norm",
                "--STARTFRMEXT=25", "--ENDFRMEXT=25"])
    finally:
        os.chdir(cwd)
    return stdout.getvalue(), out


def test_example01_subset_trains(example01_training):
    log, out_mmf = example01_training
    assert "===== TNET TRAINING STARTED =====" in log
    # the scheduler greps this exact line shape (training_scheduler.sh:40-55)
    import re
    m = re.search(r"Xent:\S+ frames:(\d+) err/frm:\S+ correct\[([\d.]+)%\]", log)
    assert m, log
    frames, acc = int(m.group(1)), float(m.group(2))
    assert frames > 10000
    # 30 utterances, 1 epoch: accumulated accuracy must beat majority-class
    assert 5.0 < acc < 60.0
    assert out_mmf.exists()
    # written model parses back
    from nnet_asr_tpu.models import Network
    net = Network.read(str(out_mmf))
    assert net.n_outputs == 135


def test_example01_crossvalidate_improves(example01_training):
    """CV accuracy of the trained net must beat the fresh init's CV accuracy."""
    log, out_mmf = example01_training
    example01 = "/root/reference/examples/01test_MLP3_compare_multithread_cuda_decode_phn"
    import contextlib, io, re

    def cv(mmf):
        from nnet_asr_tpu.tools import tnet
        scp = str(out_mmf.parent / "sub.scp")
        cwd = os.getcwd()
        os.chdir(example01)
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                tnet.main([
                    "tnet", "-c", "-H", str(mmf),
                    "-I", "lib/test_3s.mlf", "-L", "*/", "-X", "lab",
                    "-S", scp, "-m", "lib/mono_state_phn_set_135_phn",
                    "--RANDOMIZE=FALSE", "--BUNCHSIZE=960", "--CACHESIZE=4800",
                    "--FEATURETRANSFORM=lib/Hamm_dct_norm",
                    "--STARTFRMEXT=25", "--ENDFRMEXT=25"])
        finally:
            os.chdir(cwd)
        m = re.search(r"correct\[([\d.]+)%\]", buf.getvalue())
        return float(m.group(1))

    acc_trained = cv(out_mmf)
    assert acc_trained > 15.0


def test_example01_mesh_trains_real_senone_count(example01_training):
    """tnet --MESH=4x2 on the REAL 135-senone example-01 model (135 % 2 != 0
    → senone auto-padding with masked CE) must reproduce the single-chip
    epoch: same shuffle/seed → same stats, allclose params."""
    log, out_mmf = example01_training
    example01 = "/root/reference/examples/01test_MLP3_compare_multithread_cuda_decode_phn"
    import contextlib, io, re

    import jax

    init = out_mmf.parent / "init.mmf"
    scp = out_mmf.parent / "sub.scp"
    out_mesh = out_mmf.parent / "epoch1_mesh.mmf"
    from nnet_asr_tpu.tools import tnet
    cwd = os.getcwd()
    os.chdir(example01)
    try:
        buf = io.StringIO()
        with jax.default_matmul_precision("highest"), \
                contextlib.redirect_stdout(buf):
            tnet.main([
                "tnet", "-H", str(init),
                "-I", "lib/test_3s.mlf", "-L", "*/", "-X", "lab",
                "-S", str(scp), "-m", "lib/mono_state_phn_set_135_phn",
                "-n", "0.008", "--GRAD-DIV-FRM=F",
                "--TARGETMMF=" + str(out_mesh),
                "--BUNCHSIZE=960", "--CACHESIZE=4800",
                "--RANDOMIZE=TRUE", "--SEED=123", "--MESH=4x2",
                "--FEATURETRANSFORM=lib/Hamm_dct_norm",
                "--STARTFRMEXT=25", "--ENDFRMEXT=25"])
    finally:
        os.chdir(cwd)
    mesh_log = buf.getvalue()
    m1 = re.search(r"Xent:(\S+) frames:(\d+) err/frm:\S+ correct\[([\d.]+)%\]",
                   log)
    m2 = re.search(r"Xent:(\S+) frames:(\d+) err/frm:\S+ correct\[([\d.]+)%\]",
                   mesh_log)
    assert m2, mesh_log
    assert int(m2.group(2)) == int(m1.group(2))                 # frames
    assert abs(float(m2.group(3)) - float(m1.group(3))) < 0.1   # accuracy %
    assert abs(float(m2.group(1)) - float(m1.group(1))) < 20.0  # Xent sum

    from nnet_asr_tpu.models import Network
    import numpy as np
    single = Network.read(str(out_mmf))
    meshed = Network.read(str(out_mesh))
    assert meshed.n_outputs == 135      # padding sliced off on export
    for i in (0, 2):
        np.testing.assert_allclose(
            np.asarray(meshed.params[i]["weight"]),
            np.asarray(single.params[i]["weight"]), rtol=5e-3, atol=2e-5)


def test_userinterface_strips_shell_quotes():
    ui = UserInterface()
    ui.parse_options(["prog", "-L", "'*/'", "--FOO=\"bar baz\""],
                     " -L r SOURCETRANSCDIR", "TNET")
    assert ui.get_str("SOURCETRANSCDIR") == "*/"
    assert ui.get_str("FOO") == "bar baz"
