"""MPE lattice forward-backward tests against brute-force oracles."""

import io

import numpy as np
import pytest

from nnet_asr_tpu.io.htk_hmm import Hmm, parse_mmf
from nnet_asr_tpu.io.slf import Lattice, LatticeArc, LatticeNode, read_slf, write_slf
from nnet_asr_tpu.train.mpe import (MpeComputer, MpeConfig,
                                    arc_forward_backward,
                                    labels_to_phone_segments,
                                    povey_phone_accuracy)


def _hmm(name, n_emit=1, self_loop=0.5, senone_names=None):
    n = n_emit + 2
    tp = np.zeros((n, n))
    tp[0, 1] = 1.0
    for i in range(1, n - 1):
        tp[i, i] = self_loop
        tp[i, i + 1] = 1.0 - self_loop
    return Hmm(name=name, n_states=n, transp=tp,
               state_names=senone_names or [f"{name}_s{i+2}" for i in range(n_emit)])


def test_arc_fb_matches_bruteforce():
    rng = np.random.default_rng(0)
    T, S = 5, 2
    log_obs = rng.standard_normal((T, S))
    hmm = _hmm("a", n_emit=S, self_loop=0.4)
    ll, occ = arc_forward_backward(log_obs, hmm.transp)

    # brute force over all state paths (left-to-right, no skips)
    tp = hmm.transp
    paths = []
    def rec(t, s, lp, path):
        lp = lp + log_obs[t, s - 1]
        path = path + [s]
        if t == T - 1:
            if tp[s, S + 1] > 0:
                paths.append((lp + np.log(tp[s, S + 1]), path))
            return
        for s2 in range(1, S + 1):
            if tp[s, s2] > 0:
                rec(t + 1, s2, lp + np.log(tp[s, s2]), path)
    rec(0, 1, np.log(tp[0, 1]), [])
    lls = np.array([p[0] for p in paths])
    want_ll = np.max(lls) + np.log(np.sum(np.exp(lls - np.max(lls))))
    np.testing.assert_allclose(ll, want_ll, rtol=1e-10)

    # occupancy oracle
    want_occ = np.zeros((T, S))
    for lp, path in paths:
        w = np.exp(lp - want_ll)
        for t, s in enumerate(path):
            want_occ[t, s - 1] += w
    np.testing.assert_allclose(occ, want_occ, atol=1e-10)


def test_povey_accuracy():
    ref = [(0, 10, "a"), (10, 20, "b")]
    assert povey_phone_accuracy("a", 0, 10, ref) == 1.0      # exact match
    assert povey_phone_accuracy("b", 0, 10, ref) == 0.0      # wrong phone, full overlap
    assert povey_phone_accuracy("a", 5, 15, ref) == 0.0      # half overlap: -1+2*0.5
    assert povey_phone_accuracy("c", 0, 10, ref) == 0.0      # wrong phone anywhere
    assert povey_phone_accuracy("a", 12, 18, ref) == pytest.approx(-0.4)


def test_labels_to_segments():
    labels = np.array([0, 0, 1, 1, 2])
    names = ["a_s2", "a_s3", "b_s2"]
    assert labels_to_phone_segments(labels, names) == [(0, 4, "a"), (4, 5, "b")]


def _simple_lattice(arcs, times):
    lat = Lattice()
    lat.nodes = [LatticeNode(time=t) for t in times]
    lat.arcs = [LatticeArc(start=s, end=e, word=w, lm=lm)
                for (s, e, w, lm) in arcs]
    return lat


def _setup(T=10, C=4):
    hmms = {"a": _hmm("a"), "b": _hmm("b")}
    label_map = {"a_s2": 0, "b_s2": 1, "c_s2": 2, "d_s2": 3}
    return hmms, label_map


def test_single_path_lattice_gives_zero_mpe_gamma():
    hmms, label_map = _setup()
    rng = np.random.default_rng(1)
    T, C = 10, 4
    log_post = np.log(rng.dirichlet(np.ones(C), size=T)).astype(np.float32)
    lat = _simple_lattice([(0, 1, "a", 0.0), (1, 2, "b", 0.0)],
                          [0.0, 0.05, 0.10])
    ref = [(0, 5, "a"), (5, 10, "b")]
    comp = MpeComputer(hmms, label_map, MpeConfig())
    gammas, c_avg, logZ = comp.compute(lat, log_post, ref)
    # only one path: gamma_q = 1 but all accuracy terms equal c_avg → 0
    np.testing.assert_allclose(gammas, 0.0, atol=1e-9)
    assert c_avg == pytest.approx(2.0)   # both phones exactly right


def test_competing_arcs_sign_and_zero_sum():
    hmms, label_map = _setup()
    rng = np.random.default_rng(2)
    T, C = 10, 4
    log_post = np.log(rng.dirichlet(np.ones(C), size=T)).astype(np.float32)
    # two competing arcs over the full span: 'a' (correct) vs 'b' (wrong)
    lat = _simple_lattice([(0, 1, "a", 0.0), (0, 1, "b", 0.0)], [0.0, 0.10])
    ref = [(0, 10, "a")]
    comp = MpeComputer(hmms, label_map, MpeConfig())
    gammas, c_avg, logZ = comp.compute(lat, log_post, ref)
    # column 0 ('a' senone) gets positive gamma, column 1 negative
    assert gammas[:, 0].sum() > 0
    assert gammas[:, 1].sum() < 0
    # per-frame sum of mpe-gammas is zero (full-span competing arcs)
    np.testing.assert_allclose(gammas.sum(axis=1), 0.0, atol=1e-6)


def test_ml_gamma_mode_sums_to_one():
    hmms, label_map = _setup()
    rng = np.random.default_rng(3)
    T, C = 10, 4
    log_post = np.log(rng.dirichlet(np.ones(C), size=T)).astype(np.float32)
    lat = _simple_lattice([(0, 1, "a", 0.0), (0, 1, "b", 0.0)], [0.0, 0.10])
    ref = [(0, 10, "a")]
    comp = MpeComputer(hmms, label_map, MpeConfig(ml_gamma=True))
    gammas, _, _ = comp.compute(lat, log_post, ref)
    np.testing.assert_allclose(gammas.sum(axis=1), 1.0, rtol=1e-6)


def test_posterior_sensitivity():
    """Raising the posterior of the correct phone raises its arc gamma."""
    hmms, label_map = _setup()
    T, C = 10, 4
    base = np.full((T, C), np.log(1.0 / C), dtype=np.float32)
    lat = _simple_lattice([(0, 1, "a", 0.0), (0, 1, "b", 0.0)], [0.0, 0.10])
    ref = [(0, 10, "a")]
    comp = MpeComputer(hmms, label_map, MpeConfig())
    g0, _, _ = comp.compute(lat, base, ref)
    boosted = base.copy()
    boosted[:, 0] += 1.0     # boost 'a' senone
    g1, _, _ = comp.compute(lat, boosted, ref)
    # with 'a' more likely, the MPE gradient magnitude shrinks
    assert abs(g1[:, 1].sum()) < abs(g0[:, 1].sum())


def test_slf_roundtrip():
    lat = _simple_lattice([(0, 1, "a", -1.5), (0, 1, "b", -0.5)], [0.0, 0.10])
    lat.header["lmscale"] = "9.0"
    buf = io.StringIO()
    write_slf(lat, buf)
    lat2 = read_slf(io.StringIO(buf.getvalue()))
    assert len(lat2.nodes) == 2 and len(lat2.arcs) == 2
    assert lat2.arcs[0].word == "a"
    assert lat2.arcs[1].lm == -0.5
    assert lat2.lmscale == 9.0


def test_parse_mmf(tmp_path):
    mmf = tmp_path / "hmms.mmf"
    mmf.write_text("""
~o <STREAMINFO> 1 4 <VECSIZE> 4 <USER>
~h "a"
<BEGINHMM>
<NUMSTATES> 3
<STATE> 2
<MEAN> 4
 0 0 0 0
<VARIANCE> 4
 1 1 1 1
<TRANSP> 3
 0.0 1.0 0.0
 0.0 0.6 0.4
 0.0 0.0 0.0
<ENDHMM>
~h "b"
<BEGINHMM>
<NUMSTATES> 4
<STATE> 2
~s "b_s2"
<STATE> 3
~s "b_s3"
<TRANSP> 4
 0.0 1.0 0.0 0.0
 0.0 0.5 0.5 0.0
 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0
<ENDHMM>
""")
    hmms = parse_mmf(str(mmf))
    assert set(hmms) == {"a", "b"}
    assert hmms["a"].n_emitting == 1
    assert hmms["a"].transp[1, 1] == pytest.approx(0.6)
    assert hmms["b"].state_names == ["b_s2", "b_s3"]
    ids = hmms["b"].senone_ids({"b_s2": 7, "b_s3": 9})
    assert ids == [7, 9]
    # fallback naming for inline states
    ids_a = hmms["a"].senone_ids({"a_s2": 3})
    assert ids_a == [3]


def test_device_engine_matches_host():
    """MpeComputer(engine='jax') == numpy engine (same gammas)."""
    hmms, label_map = _setup()
    rng = np.random.default_rng(7)
    T, C = 12, 4
    log_post = np.log(rng.dirichlet(np.ones(C), size=T)).astype(np.float32)
    lat = _simple_lattice([(0, 1, "a", -0.3), (0, 1, "b", -0.1),
                           (1, 2, "a", 0.0), (1, 2, "b", 0.0)],
                          [0.0, 0.06, 0.12])
    ref = [(0, 6, "a"), (6, 12, "b")]
    from nnet_asr_tpu.train.mpe import MpeComputer, MpeConfig
    g_np, c_np, z_np = MpeComputer(hmms, label_map, MpeConfig()).compute(
        lat, log_post, ref)
    g_jx, c_jx, z_jx = MpeComputer(hmms, label_map, MpeConfig(),
                                   engine="jax").compute(lat, log_post, ref)
    np.testing.assert_allclose(g_jx, g_np, atol=1e-5)
    assert abs(c_jx - c_np) < 1e-6
    assert abs(z_jx - z_np) < 1e-4


def test_forward_only_scorer_matches_full_fb():
    from nnet_asr_tpu.train.mpe import (arc_forward_batch,
                                        arc_forward_backward_batch)
    rng = np.random.default_rng(11)
    obs = rng.standard_normal((3, 6, 2))
    hmm = _hmm("a", n_emit=2, self_loop=0.3)
    with np.errstate(divide="ignore"):
        lt = np.where(hmm.transp > 0, np.log(np.maximum(hmm.transp, 1e-300)),
                      -1e30)
    lt = np.broadcast_to(lt, (3,) + lt.shape).copy()
    ll_full, _ = arc_forward_backward_batch(obs, lt)
    ll_fwd = arc_forward_batch(obs, lt)
    np.testing.assert_allclose(ll_fwd, ll_full, rtol=1e-10)


def test_forward_only_scorer_jax_matches_numpy():
    from nnet_asr_tpu.ops.mpe_device import arc_forward_batch_jax
    from nnet_asr_tpu.train.mpe import arc_forward_batch
    rng = np.random.default_rng(12)
    obs = rng.standard_normal((4, 5, 3))
    hmm = _hmm("a", n_emit=3, self_loop=0.5)
    with np.errstate(divide="ignore"):
        lt = np.where(hmm.transp > 0, np.log(np.maximum(hmm.transp, 1e-300)),
                      -1e30)
    lt = np.broadcast_to(lt, (4,) + lt.shape).copy()
    np.testing.assert_allclose(arc_forward_batch_jax(obs, lt),
                               arc_forward_batch(obs, lt), atol=1e-4)


def test_pruning_wide_beam_matches_exact():
    """A beam wider than any score spread must reproduce the exact result
    through the prune-then-occupancy path."""
    hmms, label_map = _setup()
    rng = np.random.default_rng(13)
    T, C = 12, 4
    log_post = np.log(rng.dirichlet(np.ones(C), size=T)).astype(np.float32)
    lat = _simple_lattice([(0, 1, "a", -0.3), (0, 2, "b", -0.1),
                           (1, 3, "a", 0.0), (2, 3, "b", 0.0)],
                          [0.0, 0.06, 0.06, 0.12])
    ref = [(0, 6, "a"), (6, 12, "b")]
    comp = MpeComputer(hmms, label_map, MpeConfig())
    g0, c0, z0 = comp.compute(lat, log_post, ref)
    g1, c1, z1 = comp.compute(lat, log_post, ref, pruning=1e6)
    np.testing.assert_allclose(g1, g0, atol=1e-9)
    assert c1 == pytest.approx(c0)
    assert z1 == pytest.approx(z0)


def test_pruning_tight_beam_kills_weak_path():
    """With a tight beam the weak same-time node is deactivated: its arcs
    contribute no gamma mass and its occupancies are never computed."""
    hmms, label_map = _setup()
    T, C = 12, 4
    # make senone 0 ('a') strongly favored so the 'b' branch is weak
    log_post = np.full((T, C), -8.0, dtype=np.float32)
    log_post[:, 0] = -0.1
    lat = _simple_lattice([(0, 1, "a", 0.0), (0, 2, "b", 0.0),
                           (1, 3, "a", 0.0), (2, 3, "b", 0.0)],
                          [0.0, 0.06, 0.06, 0.12])
    ref = [(0, 12, "a")]
    comp = MpeComputer(hmms, label_map, MpeConfig(ml_gamma=True))
    g, _, _ = comp.compute(lat, log_post, ref, pruning=5.0)
    # all ML occupancy lands on senone 0; the pruned 'b' branch is gone
    assert g[:, 1].sum() == 0.0
    np.testing.assert_allclose(g[:, 0], 1.0, atol=1e-6)
    # sanity: without the beam the weak branch has (tiny) nonzero mass
    g_exact, _, _ = comp.compute(lat, log_post, ref)
    assert g_exact[:, 1].sum() > 0.0


def test_stk_node_format_parse():
    """SVite's -z lat output: node lines + bare arc lines inside an MLF."""
    text = """N=6\tL=6
0 t=0 W=!NULL
1 t=0.04 M=aa
2 t=0.04 M=bb
3 t=0.08 M=cc
4 t=0.08 W=!NULL
5 t=0.08 W=!NULL
0 1 a=-12.5
0 2 a=-11.0
1 3 a=-5.0
2 4 a=-3.0
3 5
4 5
"""
    lat = read_slf(io.StringIO(text))
    assert len(lat.nodes) == 6 and len(lat.arcs) == 6
    # phone labels live on end nodes (M=)
    assert lat.arc_word(lat.arcs[0]) == "aa"
    assert lat.arc_word(lat.arcs[1]) == "bb"
    assert lat.arcs[0].acoustic == -12.5
    assert lat.nodes[1].time == 0.04


def test_lattice_archive_mlf_transport(tmp_path):
    from nnet_asr_tpu.io.slf import LatticeArchive

    mlf = tmp_path / "lats.mlf"
    mlf.write_text('#!MLF!#\n"*/u1.lat"\n'
                   "0 t=0 W=!NULL\n1 t=0.1 M=aa\n2 t=0.1 W=!NULL\n"
                   "0 1 a=-1.0\n1 2\n.\n")
    arch = LatticeArchive(str(mlf))
    lat = arch.get("u1.fea")
    assert len(lat.nodes) == 3 and len(lat.arcs) == 2
    assert lat.arc_word(lat.arcs[0]) == "aa"


# ---------------------------------------------------------------------------
# decoder knobs: TRANSPSCALE / MODELPENALTY / OCCUPPSCALE / time shifts
# ---------------------------------------------------------------------------

def _copy_hmm_pow(h, power):
    import copy

    h2 = copy.deepcopy(h)
    h2.transp = h.transp ** power
    return h2


def test_transp_scale_equals_powered_transitions():
    """TRANSPSCALE=s multiplies log transition probs — identical to
    running with every transition probability raised to the s-th power
    (Decoder.tcc:1962 semantics)."""
    hmms, label_map = _setup()
    rng = np.random.default_rng(11)
    log_post = np.log(rng.dirichlet(np.ones(4), size=10)).astype(np.float32)
    lat = _simple_lattice([(0, 1, "a", -0.2), (0, 1, "b", -0.4)],
                          [0.0, 0.10])
    ref = [(0, 10, "a")]
    scaled = MpeComputer(hmms, label_map, MpeConfig(transp_scale=2.0))
    powered = MpeComputer({k: _copy_hmm_pow(h, 2.0) for k, h in hmms.items()},
                          label_map, MpeConfig())
    g1, a1, l1 = scaled.compute(lat, log_post, ref)
    g2, a2, l2 = powered.compute(lat, log_post, ref)
    np.testing.assert_allclose(g1, g2, atol=1e-12)
    assert l1 == pytest.approx(l2)


def test_model_penalty_matches_arc_priors():
    """MODELPENALTY adds a constant per phone arc — equal to priors of
    the same value on every phone arc (Decoder.tcc:1713 Penalize)."""
    hmms, label_map = _setup()
    rng = np.random.default_rng(12)
    log_post = np.log(rng.dirichlet(np.ones(4), size=10)).astype(np.float32)
    ref = [(0, 10, "a")]
    # path A: one long arc; path B: two arcs — the penalty tilts toward A
    lat = _simple_lattice([(0, 2, "a", 0.0),
                           (0, 1, "b", 0.0), (1, 2, "a", 0.0)],
                          [0.0, 0.05, 0.10])
    pen = MpeComputer(hmms, label_map, MpeConfig(model_penalty=-1.5))
    lat2 = _simple_lattice([(0, 2, "a", 0.0),
                            (0, 1, "b", 0.0), (1, 2, "a", 0.0)],
                           [0.0, 0.05, 0.10])
    for a in lat2.arcs:
        a.prior = -1.5
    plain = MpeComputer(hmms, label_map, MpeConfig())
    g1, a1, l1 = pen.compute(lat, log_post, ref)
    g2, a2, l2 = plain.compute(lat2, log_post, ref)
    np.testing.assert_allclose(g1, g2, atol=1e-12)
    assert l1 == pytest.approx(l2)
    # and it genuinely changes the result vs no penalty
    g0, _, _ = plain.compute(lat, log_post, ref)
    assert np.abs(g1 - g0).max() > 1e-6


def test_time_shift_equals_shifted_lattice():
    """Uniform START/ENDTIMESHIFT == shifting every node time in the
    lattice (in_net_fmt.mStartTimeShift/mEndTimeShift semantics)."""
    hmms, label_map = _setup()
    rng = np.random.default_rng(13)
    log_post = np.log(rng.dirichlet(np.ones(4), size=10)).astype(np.float32)
    ref = [(0, 10, "a")]
    lat = _simple_lattice([(0, 1, "a", 0.0), (1, 2, "b", 0.0)],
                          [0.0, 0.04, 0.08])
    shifted_cfg = MpeConfig(start_time_shift=0.02, end_time_shift=0.02)
    g1, _, l1 = MpeComputer(hmms, label_map, shifted_cfg).compute(
        lat, log_post, ref)
    lat2 = _simple_lattice([(0, 1, "a", 0.0), (1, 2, "b", 0.0)],
                           [0.02, 0.06, 0.10])
    g2, _, l2 = MpeComputer(hmms, label_map, MpeConfig()).compute(
        lat2, log_post, ref)
    np.testing.assert_allclose(g1, g2, atol=1e-12)
    assert l1 == pytest.approx(l2)


def test_occup_scale_exponentiates_ml_gammas():
    """OCCUPPSCALE=s: every gamma contribution is (gamma_q * occ)^s —
    exp(s*(alpha+beta-P)), Decoder.tcc:2732."""
    from nnet_asr_tpu.train.mpe import arc_forward_backward

    label_map = {"a_s2": 0, "a_s3": 1, "c_s2": 2, "d_s2": 3}
    h = _hmm("a", n_emit=2, senone_names=["a_s2", "a_s3"])
    rng = np.random.default_rng(14)
    log_post = np.log(rng.dirichlet(np.ones(4), size=6)).astype(np.float32)
    lat = _simple_lattice([(0, 1, "a", 0.0)], [0.0, 0.06])
    ref = [(0, 6, "a")]
    s = 0.7
    cfg = MpeConfig(ml_gamma=True, occup_scale=s)
    g, _, _ = MpeComputer({"a": h}, label_map, cfg).compute(
        lat, log_post, ref)
    _, occ = arc_forward_backward(log_post[:, [0, 1]], h.transp)
    want = np.zeros((6, 4))
    want[:, [0, 1]] = occ ** s          # gamma_q == 1 on a single path
    np.testing.assert_allclose(g, want, atol=1e-6)


def test_single_state_closed_form_matches_generic_fb():
    """The S==1 closed-form arc scorer (prefix-sum + transition terms)
    must equal arc_forward_backward_batch exactly, including the L=1
    no-self-loop case and the all-ones occupancies."""
    import numpy as np

    from nnet_asr_tpu.train.mpe import (MpeComputer, MpeConfig,
                                        arc_forward_backward_batch)
    from nnet_asr_tpu.io.htk_hmm import Hmm

    rng = np.random.default_rng(0)
    tp = np.zeros((3, 3))
    tp[0, 1] = 1.0
    tp[1, 1], tp[1, 2] = 0.6, 0.4
    hmms = {"a": Hmm(name="a", n_states=3, transp=tp,
                 state_names=["a_s"])}
    mpe = MpeComputer(hmms, {"a_s": 0}, MpeConfig(outprb_scale=0.7),
                      engine="numpy")

    log_post = np.log(rng.dirichlet(np.ones(4), size=30)).astype(np.float32)
    prefix = mpe._posterior_prefix(log_post)

    class FakeArc:
        def __init__(self, t0, t1):
            self.t0, self.t1 = t0, t1
            self.phone = "a"
            self.senones = [0]

    for (t0, t1) in ((0, 1), (3, 4), (0, 30), (5, 17)):
        arcs = [FakeArc(t0, t1)]
        ll = mpe._single_state_lls(arcs, [0], prefix)
        L = t1 - t0
        obs = 0.7 * log_post[t0:t1, [0]][None, :, :].astype(np.float64)
        lt = mpe._log_tp["a"][None]
        ll_ref, occ_ref = arc_forward_backward_batch(obs, lt)
        assert abs(float(ll[0]) - float(ll_ref[0])) < 1e-9, (t0, t1)
        np.testing.assert_array_equal(mpe._ones_occ(L), occ_ref[0])


# ---------------------------------------------------------------------------
# native (C++) engine parity — gates native/mpefb.cc against the numpy
# engine across every decoder knob (VERDICT r4 #2)
# ---------------------------------------------------------------------------

def _native_or_skip():
    from nnet_asr_tpu.train import mpe_native
    if not mpe_native.available():
        pytest.skip("g++ unavailable: native mpefb not built")


def _rand_post(T, C, seed):
    rng = np.random.default_rng(seed)
    return np.log(rng.dirichlet(np.ones(C), size=T)).astype(np.float32)


def _both(hmms, label_map, cfg, lat, log_post, ref, **kw):
    g_np, c_np, z_np = MpeComputer(hmms, label_map, cfg,
                                   engine="numpy").compute(
        lat, log_post, ref, **kw)
    comp = MpeComputer(hmms, label_map, cfg, engine="native")
    assert comp._native is not None
    g_nt, c_nt, z_nt = comp.compute(lat, log_post, ref, **kw)
    np.testing.assert_allclose(g_nt, g_np, atol=2e-6)
    assert c_nt == pytest.approx(c_np, abs=1e-10)
    assert z_nt == pytest.approx(z_np, abs=1e-9)
    return g_nt


def test_native_engine_parity_battery():
    """Native == numpy across configurations: multi-state HMMs, NULL
    arcs, beam pruning, ML gamma, OCCUPPSCALE, MODELPENALTY, LMSCALE,
    TRANSPSCALE, time shifts, utterance/frame weights."""
    _native_or_skip()
    label_map = {"a_s2": 0, "a_s3": 1, "b_s2": 2, "c_s2": 3}
    hmms = {"a": _hmm("a", n_emit=2, self_loop=0.3,
                      senone_names=["a_s2", "a_s3"]),
            "b": _hmm("b", senone_names=["b_s2"]),
            "c": _hmm("c", self_loop=0.7, senone_names=["c_s2"])}
    T, C = 14, 4
    log_post = _rand_post(T, C, 21)
    ref = [(0, 7, "a"), (7, 14, "b")]
    # diamond with a !NULL arc and same-time nodes
    lat = _simple_lattice(
        [(0, 1, "a", -0.3), (0, 2, "b", -0.1), (1, 3, "c", 0.0),
         (2, 3, "b", -0.2), (3, 4, "!NULL", 0.0), (4, 5, "a", 0.0)],
        [0.0, 0.07, 0.07, 0.10, 0.10, 0.14])

    for cfg, kw in [
        (MpeConfig(), {}),
        (MpeConfig(outprb_scale=0.3), {}),
        (MpeConfig(ml_gamma=True), {}),
        (MpeConfig(occup_scale=0.7, ml_gamma=True), {}),
        (MpeConfig(model_penalty=-1.5), {}),
        (MpeConfig(lm_scale=9.0), {}),
        (MpeConfig(transp_scale=2.0), {}),
        (MpeConfig(start_time_shift=0.01, end_time_shift=0.01), {}),
        (MpeConfig(), {"utt_weight": 0.6}),
        (MpeConfig(), {"frame_weights":
                       np.linspace(0.5, 1.5, T)}),
        (MpeConfig(), {"pruning": 1e6}),     # wide beam == exact
        (MpeConfig(ml_gamma=True), {"pruning": 5.0}),   # tight beam
    ]:
        _both(hmms, label_map, cfg, lat, log_post, ref, **kw)


def test_native_engine_tight_beam_prunes_identically():
    _native_or_skip()
    hmms, label_map = _setup()
    T, C = 12, 4
    log_post = np.full((T, C), -8.0, dtype=np.float32)
    log_post[:, 0] = -0.1
    lat = _simple_lattice([(0, 1, "a", 0.0), (0, 2, "b", 0.0),
                           (1, 3, "a", 0.0), (2, 3, "b", 0.0)],
                          [0.0, 0.06, 0.06, 0.12])
    ref = [(0, 12, "a")]
    g = _both(hmms, label_map, MpeConfig(ml_gamma=True), lat, log_post,
              ref, pruning=5.0)
    assert g[:, 1].sum() == 0.0


def test_native_engine_error_paths():
    _native_or_skip()
    hmms, label_map = _setup()
    T, C = 10, 4
    log_post = _rand_post(T, C, 5)
    ref = [(0, 10, "a")]
    comp = MpeComputer(hmms, label_map, MpeConfig(), engine="native")
    assert comp._native is not None
    # zero-length phone arc
    lat = _simple_lattice([(0, 1, "a", 0.0)], [0.0, 0.0])
    with pytest.raises(ValueError, match="Zero-length arc"):
        comp.compute(lat, log_post, ref)
    # unknown phone
    lat2 = _simple_lattice([(0, 1, "zz", 0.0)], [0.0, 0.10])
    with pytest.raises(KeyError, match="zz"):
        comp.compute(lat2, log_post, ref)
    # overpruning underflow: beam so tight all end-node paths die is
    # hard to provoke on a single path; instead kill the only path via
    # a -inf posterior (log_post LOG_ZERO everywhere)
    lat3 = _simple_lattice([(0, 1, "a", 0.0)], [0.0, 0.10])
    dead = np.full((T, C), -1e30, dtype=np.float64)
    with pytest.raises(FloatingPointError):
        comp.compute(lat3, dead, ref)
    with pytest.raises(FloatingPointError):
        MpeComputer(hmms, label_map, MpeConfig(),
                    engine="numpy").compute(lat3, dead, ref)


def test_native_engine_preflatten_caches():
    _native_or_skip()
    hmms, label_map = _setup()
    lat = _simple_lattice([(0, 1, "a", 0.0)], [0.0, 0.10])
    comp = MpeComputer(hmms, label_map, MpeConfig(), engine="native")
    comp.preflatten(lat)
    assert getattr(lat, "_native_flat", None) is not None
    tables, flat = lat._native_flat
    assert tables is comp._native
    g, c, z = comp.compute(lat, _rand_post(10, 4, 9), [(0, 10, "a")])
    assert g.shape == (10, 4)
