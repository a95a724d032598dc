"""Word→phone lattice expansion tests: dictionary parsing, composite-HMM
alignment vs brute force, and MPE gammas from word lattices matching a
pre-expanded phone-lattice oracle."""

import numpy as np
import pytest

from nnet_asr_tpu.io.dictionary import Pronun, read_dictionary
from nnet_asr_tpu.io.htk_hmm import Hmm
from nnet_asr_tpu.io.slf import Lattice, LatticeArc, LatticeNode
from nnet_asr_tpu.train.lattice_expand import (LatticeExpander, compose_hmms,
                                               viterbi_segment)
from nnet_asr_tpu.train.mpe import MpeComputer, MpeConfig


def _hmm(name, n_emit=1, self_loop=0.5):
    n = n_emit + 2
    tp = np.zeros((n, n))
    tp[0, 1] = 1.0
    for i in range(1, n - 1):
        tp[i, i] = self_loop
        tp[i, i + 1] = 1.0 - self_loop
    return Hmm(name=name, n_states=n, transp=tp,
               state_names=[f"{name}_s{i+2}" for i in range(n_emit)])


# ---------------------------------------------------------------------------
# dictionary
# ---------------------------------------------------------------------------

def test_read_dictionary(tmp_path):
    d = tmp_path / "dict"
    d.write_text(
        'CAT k ae t\n'
        'THE [the] 0.7 dh ax\n'
        'THE [the] 0.3 dh iy\n'
        'SIL [] sil\n'
        '"A B" ey\n')
    words = read_dictionary(str(d))
    assert words["CAT"][0].phones == ("k", "ae", "t")
    assert words["CAT"][0].log_prob == 0.0
    assert words["CAT"][0].out_symbol == "CAT"
    assert len(words["THE"]) == 2
    assert words["THE"][0].phones == ("dh", "ax")
    assert words["THE"][0].log_prob == pytest.approx(np.log(0.7))
    assert words["THE"][1].variant == 2
    assert words["SIL"][0].out_symbol is None     # [] = silent word
    assert words["A B"][0].phones == ("ey",)


# ---------------------------------------------------------------------------
# composite HMM + Viterbi
# ---------------------------------------------------------------------------

def test_compose_single_is_identity():
    h = _hmm("a", n_emit=3, self_loop=0.4)
    comp = compose_hmms([h], [[0, 1, 2]])
    np.testing.assert_allclose(comp.entry, h.transp[0, 1:4])
    np.testing.assert_allclose(comp.trans, h.transp[1:4, 1:4])
    np.testing.assert_allclose(comp.exit, h.transp[1:4, 4])
    assert comp.tee == 0.0
    np.testing.assert_array_equal(comp.phone_of_state, [0, 0, 0])


def test_viterbi_matches_bruteforce_split():
    """Two 1-state phones over T frames: the Viterbi boundary must be the
    argmax over all split points of the exact two-segment path score."""
    rng = np.random.default_rng(5)
    T = 8
    ha, hb = _hmm("a", self_loop=0.5), _hmm("b", self_loop=0.5)
    comp = compose_hmms([ha, hb], [[0], [1]])
    obs = rng.standard_normal((T, 2))

    res = viterbi_segment(comp, obs)
    assert res is not None
    score, path = res
    seq = comp.phone_of_state[path]
    split = int(np.argmax(seq))          # first frame of phone b

    # brute force: phone a occupies [0, s), b occupies [s, T)
    def seg_score(s):
        lp = 0.0
        # a: entry, s-1 self loops, exit to b's entry
        lp += np.log(1.0) + (s - 1) * np.log(0.5) + np.log(0.5)
        lp += obs[:s, 0].sum()
        lp += np.log(1.0)                # b entry
        lp += (T - s - 1) * np.log(0.5) + np.log(0.5)   # b loops + exit
        lp += obs[s:, 1].sum()
        return lp

    scores = {s: seg_score(s) for s in range(1, T)}
    best = max(scores, key=scores.get)
    assert split == best
    assert score == pytest.approx(scores[best])


def test_viterbi_infeasible_returns_none():
    """3-emitting-state phone needs >= 3 frames; 2 frames has no path."""
    h = _hmm("a", n_emit=3, self_loop=0.3)
    comp = compose_hmms([h], [[0, 1, 2]])
    assert viterbi_segment(comp, np.zeros((2, 3))) is None
    assert viterbi_segment(comp, np.zeros((3, 3))) is not None


# ---------------------------------------------------------------------------
# expansion → MPE gamma parity with pre-expanded phone lattices
# ---------------------------------------------------------------------------

def _setup():
    hmms = {"a": _hmm("a"), "b": _hmm("b"), "c": _hmm("c")}
    label_map = {"a_s2": 0, "b_s2": 1, "c_s2": 2, "d_s2": 3}
    return hmms, label_map


def _posteriors(T=10, C=4, seed=1):
    rng = np.random.default_rng(seed)
    return np.log(rng.dirichlet(np.ones(C), size=T)).astype(np.float32)


def _word_lattice(arcs, times):
    lat = Lattice()
    lat.nodes = [LatticeNode(time=t) for t in times]
    lat.arcs = [LatticeArc(start=s, end=e, word=w, lm=lm)
                for (s, e, w, lm) in arcs]
    return lat


REF_SEGS = [(0, 5, "a"), (5, 10, "b")]


def test_single_phone_words_match_phone_lattice():
    """Words that map 1:1 to phones: expanded gammas == direct phone
    lattice gammas (boundaries are the word boundaries, so the alignment
    is exact parity)."""
    hmms, label_map = _setup()
    log_post = _posteriors()
    dictionary = {
        "A": [Pronun("A", ("a",))],
        "B": [Pronun("B", ("b",))],
        "C": [Pronun("C", ("c",))],
    }
    word_lat = _word_lattice(
        [(0, 1, "A", -1.0), (1, 2, "B", -0.5), (1, 2, "C", -0.2)],
        [0.0, 0.05, 0.10])
    phone_lat = _word_lattice(
        [(0, 1, "a", -1.0), (1, 2, "b", -0.5), (1, 2, "c", -0.2)],
        [0.0, 0.05, 0.10])

    cfg = MpeConfig(lm_scale=2.0, outprb_scale=0.8)
    plain = MpeComputer(hmms, label_map, cfg)
    expanding = MpeComputer(hmms, label_map, cfg, dictionary=dictionary)

    g_ref, acc_ref, lp_ref = plain.compute(phone_lat, log_post, REF_SEGS)
    g_exp, acc_exp, lp_exp = expanding.compute(word_lat, log_post, REF_SEGS)
    np.testing.assert_allclose(g_exp, g_ref, atol=1e-12)
    assert acc_exp == pytest.approx(acc_ref)
    assert lp_exp == pytest.approx(lp_ref)


def test_multiphone_word_matches_preexpanded_oracle():
    """Word → 'a b': gammas must equal a hand-expanded phone lattice whose
    boundary is the brute-force best split of the word span."""
    hmms, label_map = _setup()
    log_post = _posteriors(seed=2)
    kappa = 0.8
    dictionary = {"AB": [Pronun("AB", ("a", "b"))],
                  "C": [Pronun("C", ("c",))]}
    word_lat = _word_lattice(
        [(0, 1, "AB", -0.3), (1, 2, "C", -0.1)],
        [0.0, 0.08, 0.10])

    # brute-force best split of frames [0, 8) between a and b
    def split_score(s):
        lp = (s - 1) * np.log(0.5) + np.log(0.5) \
            + kappa * log_post[:s, 0].sum()
        lp += (8 - s - 1) * np.log(0.5) + np.log(0.5) \
            + kappa * log_post[s:8, 1].sum()
        return lp

    best = max(range(1, 8), key=split_score)
    phone_lat = Lattice()
    phone_lat.nodes = [LatticeNode(time=0.0), LatticeNode(time=0.08),
                       LatticeNode(time=0.10),
                       LatticeNode(time=best / 100.0)]
    phone_lat.arcs = [
        LatticeArc(start=0, end=3, word="a", lm=-0.3),
        LatticeArc(start=3, end=1, word="b", lm=0.0),
        LatticeArc(start=1, end=2, word="c", lm=-0.1),
    ]

    cfg = MpeConfig(lm_scale=2.0, outprb_scale=kappa)
    plain = MpeComputer(hmms, label_map, cfg)
    expanding = MpeComputer(hmms, label_map, cfg, dictionary=dictionary)
    g_ref, acc_ref, lp_ref = plain.compute(phone_lat, log_post, REF_SEGS)
    g_exp, acc_exp, lp_exp = expanding.compute(word_lat, log_post, REF_SEGS)
    np.testing.assert_allclose(g_exp, g_ref, atol=1e-12)
    assert acc_exp == pytest.approx(acc_ref)
    assert lp_exp == pytest.approx(lp_ref)


def test_pronun_variants_and_prior():
    """Two variants expand in parallel; the pronunciation log prob (scaled
    by PRONUNSCALE) + word penalty land on the first phone arc's prior,
    matching a hand-built two-path phone lattice."""
    hmms, label_map = _setup()
    log_post = _posteriors(seed=3)
    dictionary = {"W": [Pronun("W", ("a",), log_prob=np.log(0.7), variant=1),
                        Pronun("W", ("b",), log_prob=np.log(0.3), variant=2)]}
    word_lat = _word_lattice([(0, 1, "W", -0.4)], [0.0, 0.10])

    phone_lat = _word_lattice(
        [(0, 1, "a", -0.4), (0, 1, "b", -0.4)], [0.0, 0.10])
    phone_lat.arcs[0].prior = 2.0 * np.log(0.7) + 1.5
    phone_lat.arcs[1].prior = 2.0 * np.log(0.3) + 1.5

    cfg = MpeConfig(lm_scale=1.0, outprb_scale=1.0, pron_scale=2.0,
                    word_penalty=1.5)
    plain = MpeComputer(hmms, label_map, cfg)
    expanding = MpeComputer(hmms, label_map, cfg, dictionary=dictionary)
    g_ref, acc_ref, _ = plain.compute(phone_lat, log_post, REF_SEGS)
    g_exp, acc_exp, _ = expanding.compute(word_lat, log_post, REF_SEGS)
    np.testing.assert_allclose(g_exp, g_ref, atol=1e-12)
    assert acc_exp == pytest.approx(acc_ref)


def test_respect_pronvars_takes_first_variant():
    hmms, label_map = _setup()
    log_post = _posteriors(seed=4)
    dictionary = {"W": [Pronun("W", ("a",), variant=1),
                        Pronun("W", ("b",), variant=2)]}
    word_lat = _word_lattice([(0, 1, "W", 0.0)], [0.0, 0.10])
    phone_lat = _word_lattice([(0, 1, "a", 0.0)], [0.0, 0.10])

    cfg = MpeConfig(respect_pronun_var=True)
    plain = MpeComputer(hmms, label_map, MpeConfig())
    expanding = MpeComputer(hmms, label_map, cfg, dictionary=dictionary)
    g_ref, _, lp_ref = plain.compute(phone_lat, log_post, REF_SEGS)
    g_exp, _, lp_exp = expanding.compute(word_lat, log_post, REF_SEGS)
    np.testing.assert_allclose(g_exp, g_ref, atol=1e-12)
    assert lp_exp == pytest.approx(lp_ref)


def test_infeasible_variant_dropped(capsys):
    """A pronunciation longer than the arc's frame span dies (its tokens
    would die in STK); the surviving variant carries the mass."""
    hmms = {"a": _hmm("a"), "long": _hmm("long", n_emit=3)}
    label_map = {"a_s2": 0, "long_s2": 1, "long_s3": 2, "long_s4": 3}
    rng = np.random.default_rng(6)
    log_post = np.log(rng.dirichlet(np.ones(4), size=10)).astype(np.float32)
    # arc spans 2 frames: 'long long long' needs 9 frames -> dropped
    dictionary = {"W": [Pronun("W", ("long", "long", "long")),
                        Pronun("W", ("a",), variant=2)]}
    word_lat = _word_lattice([(0, 1, "W", 0.0)], [0.0, 0.02])
    phone_lat = _word_lattice([(0, 1, "a", 0.0)], [0.0, 0.02])
    expanding = MpeComputer(hmms, label_map, MpeConfig(),
                            dictionary=dictionary)
    plain = MpeComputer(hmms, label_map, MpeConfig())
    ref_segs = [(0, 10, "a")]
    g_ref, _, _ = plain.compute(phone_lat, log_post, ref_segs)
    g_exp, _, _ = expanding.compute(word_lat, log_post, ref_segs)
    np.testing.assert_allclose(g_exp, g_ref, atol=1e-12)


# ---------------------------------------------------------------------------
# exact-segmentation mode (DEVIATIONS §3a closed)
# ---------------------------------------------------------------------------

def test_min_duration():
    from nnet_asr_tpu.train.lattice_expand import min_duration

    assert min_duration(_hmm("a", n_emit=1)) == 1
    assert min_duration(_hmm("a", n_emit=3)) == 3
    # skip edge 1->3 shortens the minimum path to 2 emitting frames
    h = _hmm("a", n_emit=3)
    h.transp[1, 3] = 0.2
    assert min_duration(h) == 2


def test_exact_logprob_integrates_all_splits():
    """Single word 'a b' over [0, 8): the exact-mode lattice log prob must
    equal logsumexp over ALL split points of the two-segment path score —
    the segmentation integral STK's token passing computes, which MAP
    mode approximates by its max."""
    hmms, label_map = _setup()
    log_post = _posteriors(seed=7)
    kappa = 0.8
    dictionary = {"AB": [Pronun("AB", ("a", "b"))]}
    word_lat = _word_lattice([(0, 1, "AB", 0.0)], [0.0, 0.08])

    def split_score(s):
        lp = (s - 1) * np.log(0.5) + np.log(0.5) \
            + kappa * log_post[:s, 0].sum()
        lp += (8 - s - 1) * np.log(0.5) + np.log(0.5) \
            + kappa * log_post[s:8, 1].sum()
        return lp

    scores = np.array([split_score(s) for s in range(1, 8)])
    want = scores.max() + np.log(np.exp(scores - scores.max()).sum())

    cfg = MpeConfig(outprb_scale=kappa, exact_segmentation=True)
    exact = MpeComputer(hmms, label_map, cfg, dictionary=dictionary)
    _, _, lp = exact.compute(word_lat, log_post, REF_SEGS)
    # abs tol: the test's float64 split sums round differently than the
    # engine's float32 posterior slices
    assert lp == pytest.approx(want, abs=2e-5)

    # MAP mode returns only the best split's score
    map_cfg = MpeConfig(outprb_scale=kappa)
    mapper = MpeComputer(hmms, label_map, map_cfg, dictionary=dictionary)
    _, _, lp_map = mapper.compute(word_lat, log_post, REF_SEGS)
    assert lp_map == pytest.approx(scores.max(), abs=2e-5)
    assert lp > lp_map


def test_exact_gammas_match_bruteforce_chain_enumeration():
    """Word 'a b c' over [0, 8): exact-mode gammas must equal a hand-built
    oracle lattice with ONE PARALLEL CHAIN PER (s1, s2) SPLIT PAIR — the
    brute-force enumeration of every intra-word segmentation."""
    hmms, label_map = _setup()
    log_post = _posteriors(seed=8)
    kappa = 0.9
    dictionary = {"ABC": [Pronun("ABC", ("a", "b", "c"))]}
    word_lat = _word_lattice([(0, 1, "ABC", -0.3)], [0.0, 0.08])

    oracle = Lattice()
    oracle.nodes = [LatticeNode(time=0.0), LatticeNode(time=0.08)]
    for s1 in range(1, 7):
        for s2 in range(s1 + 1, 8):
            n1 = len(oracle.nodes)
            oracle.nodes.append(LatticeNode(time=s1 / 100.0))
            n2 = len(oracle.nodes)
            oracle.nodes.append(LatticeNode(time=s2 / 100.0))
            oracle.arcs.append(LatticeArc(start=0, end=n1, word="a", lm=-0.3))
            oracle.arcs.append(LatticeArc(start=n1, end=n2, word="b"))
            oracle.arcs.append(LatticeArc(start=n2, end=1, word="c"))

    cfg = MpeConfig(lm_scale=1.7, outprb_scale=kappa, exact_segmentation=True)
    plain = MpeComputer(hmms, label_map,
                        MpeConfig(lm_scale=1.7, outprb_scale=kappa))
    exact = MpeComputer(hmms, label_map, cfg, dictionary=dictionary)
    g_ref, acc_ref, lp_ref = plain.compute(oracle, log_post, REF_SEGS)
    g_exp, acc_exp, lp_exp = exact.compute(word_lat, log_post, REF_SEGS)
    np.testing.assert_allclose(g_exp, g_ref, atol=1e-10)
    assert acc_exp == pytest.approx(acc_ref, abs=1e-10)
    assert lp_exp == pytest.approx(lp_ref, abs=1e-10)


def test_exact_window_zero_reproduces_map_boundaries():
    """exact_window=0 pins every boundary to the MAP split: gammas and
    log prob must match plain MAP mode exactly."""
    hmms, label_map = _setup()
    log_post = _posteriors(seed=9)
    dictionary = {"AB": [Pronun("AB", ("a", "b"))]}
    word_lat = _word_lattice([(0, 1, "AB", -0.2)], [0.0, 0.08])

    map_mode = MpeComputer(hmms, label_map, MpeConfig(),
                           dictionary=dictionary)
    windowed = MpeComputer(hmms, label_map,
                           MpeConfig(exact_segmentation=True, exact_window=0),
                           dictionary=dictionary)
    g_map, acc_map, lp_map = map_mode.compute(word_lat, log_post, REF_SEGS)
    g_win, acc_win, lp_win = windowed.compute(word_lat, log_post, REF_SEGS)
    np.testing.assert_allclose(g_win, g_map, atol=1e-12)
    assert acc_win == pytest.approx(acc_map)
    assert lp_win == pytest.approx(lp_map)


def test_exact_min_duration_respected():
    """A 3-emitting-state phone cannot occupy fewer than 3 frames in any
    enumerated segmentation."""
    hmms = {"a": _hmm("a"), "big": _hmm("big", n_emit=3)}
    label_map = {"a_s2": 0, "big_s2": 1, "big_s3": 2, "big_s4": 3}
    rng = np.random.default_rng(10)
    log_post = np.log(rng.dirichlet(np.ones(4), size=10)).astype(np.float32)
    dictionary = {"W": [Pronun("W", ("a", "big"))]}
    word_lat = _word_lattice([(0, 1, "W", 0.0)], [0.0, 0.08])
    exp = LatticeExpander(hmms, label_map, dictionary, segmentation="exact")
    lat = exp.expand(word_lat, log_post)
    for a in lat.arcs:
        t0, t1 = lat.frame(a.start), lat.frame(a.end)
        if a.word == "big":
            assert t1 - t0 >= 3
        assert t1 > t0
    # boundary after 'a' ranges over [1, 5] -> 5 'a' arcs and 5 'big' arcs
    assert sum(1 for a in lat.arcs if a.word == "a") == 5
    assert sum(1 for a in lat.arcs if a.word == "big") == 5
