"""Scorer tests: alignment counts and report format."""

import numpy as np

from nnet_asr_tpu.io.mlf import MlfWriter
from nnet_asr_tpu.tools.sresults import align_counts, main


def test_align_counts_basic():
    assert align_counts(list("abc"), list("abc")) == (3, 0, 0, 0)
    assert align_counts(list("abc"), list("axc")) == (2, 0, 1, 0)
    assert align_counts(list("abc"), list("ac")) == (2, 1, 0, 0)
    assert align_counts(list("abc"), list("abxc")) == (3, 0, 0, 1)
    assert align_counts([], list("ab")) == (0, 0, 0, 2)
    assert align_counts(list("ab"), []) == (0, 2, 0, 0)


def test_align_htk_cost_preference():
    # HTK: one substitution (10) beats del+ins (14)
    H, D, S, I = align_counts(list("ab"), list("ax"))
    assert (H, D, S, I) == (1, 0, 1, 0)


def test_main_report(tmp_path, capsys):
    ref = MlfWriter(str(tmp_path / "ref.mlf"))
    ref.write_record("*/u1.lab", ["a", "b", "c"])
    ref.write_record("*/u2.lab", ["a", "a"])
    ref.close()
    hyp = MlfWriter(str(tmp_path / "hyp.mlf"))
    hyp.write_record("*/u1.rec", ["0 1 a -1.0", "1 2 b -1.0", "2 3 c -1.0"])
    hyp.write_record("*/u2.rec", ["0 1 a -1.0", "1 2 b -1.0"])
    hyp.close()
    main(["-I", str(tmp_path / "ref.mlf"), str(tmp_path / "hyp.mlf")])
    out = capsys.readouterr().out
    assert "SENT: %Correct=50.00 [H=1, S=1, N=2]" in out
    assert "WORD: %Corr=80.00, Acc=80.00 [H=4, D=0, S=1, I=0, N=5]" in out
