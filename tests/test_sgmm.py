"""SGMM2: init-from-UBM identity, EM convergence, substate splitting,
speaker-vector adaptation, classification.

(ref test strategy: sgmm2/am-sgmm2-test.cc and estimate-am-sgmm2-test.cc —
 randomized likelihood-improvement checks.)
"""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.full_gmm import FullGmm
from kaldi_tpu.gmm.estimation import AccumDiagGmm, mle_diag_gmm_update
from kaldi_tpu.sgmm import (AmSgmm2, Sgmm2Accs, update_sgmm2,
                            estimate_speaker_vector, Sgmm2SpeakerState)


def _make_data(rng, n_states=3, frames=150, dim=4):
    """Class data on a shared low-dim structure + per-class offsets."""
    mu = rng.randn(n_states, dim) * 3.0
    data, post = [], []
    for j in range(n_states):
        x = mu[j] + rng.randn(frames, dim)
        data.append(x)
        post.extend([[(j, 1.0)]] * frames)
    return np.concatenate(data), post, mu


@pytest.fixture(scope="module")
def sgmm_setup():
    rng = np.random.RandomState(0)
    feats, post, mu = _make_data(rng)
    # UBM on pooled data
    ubm = DiagGmm.from_stats(feats.mean(0), feats.var(0)).split(4)
    for _ in range(5):
        acc = AccumDiagGmm(ubm.num_gauss, ubm.dim)
        acc.accumulate(ubm, feats.astype(np.float32))
        ubm = mle_diag_gmm_update(ubm, acc)
    fubm = FullGmm.from_diag(ubm.weights, ubm.means, ubm.vars)
    model = AmSgmm2(fubm, num_states=3, phn_dim=5, spk_dim=2, seed=1)
    return model, feats, post, rng


def test_em_improves_loglike(sgmm_setup):
    """Block-coordinate EM: each iteration updates one parameter group
    with fresh stats (v+weights / subspace+covariances alternating, the
    recipe schedule of steps/train_sgmm2.sh's --update-flags phases)."""
    model, feats, post, _rng = sgmm_setup
    likes = []
    schedule = ["vc", "Mc", "vwc", "Sc", "vc", "Mc"]
    for flags in schedule:
        accs = Sgmm2Accs(model)
        accs.accumulate(model, feats, post, num_gselect=4)
        likes.append(accs.tot_like / accs.tot_frames)
        model = update_sgmm2(model, accs, update_flags=flags)
    accs = Sgmm2Accs(model)
    accs.accumulate(model, feats, post, num_gselect=4)
    likes.append(accs.tot_like / accs.tot_frames)
    assert likes[-1] > likes[0] + 0.1, likes
    assert all(likes[k + 1] >= likes[k] - 0.1 for k in range(len(likes) - 1)), likes


def test_classification_after_training(sgmm_setup):
    model, feats, post, rng = sgmm_setup
    # train explicitly: the module fixture returns the INIT model, and
    # relying on a previous test's in-place mutations made this test
    # order-dependent (it failed when selected alone)
    for flags in ["vc", "Mc", "vwc"]:
        accs = Sgmm2Accs(model)
        accs.accumulate(model, feats, post, num_gselect=4)
        model = update_sgmm2(model, accs, update_flags=flags)
    # fresh eval data from the same class means (recover via state index)
    _f2, post2, mu = _make_data(np.random.RandomState(0))
    correct = 0
    total = 0
    eval_rng = np.random.RandomState(42)
    for j in range(3):
        x = mu[j] + eval_rng.randn(30, 4)
        ll = model.loglikes_matrix(x, num_gselect=4)
        pred = np.argmax(ll.sum(axis=0))
        correct += int(pred == j)
        total += 1
    assert correct == total


def test_substate_splitting(sgmm_setup):
    model, feats, post, _rng = sgmm_setup
    n_before = sum(len(c) for c in model.c)
    model.split_substates(n_before + 3)
    n_after = sum(len(c) for c in model.c)
    assert n_after == n_before + 3
    for j in range(model.num_states):
        assert len(model.v[j]) == len(model.c[j])
        assert model.c[j].sum() == pytest.approx(1.0)
    # still trains after splitting
    accs = Sgmm2Accs(model)
    accs.accumulate(model, feats, post, num_gselect=4)
    before = accs.tot_like / accs.tot_frames
    model2 = update_sgmm2(model, accs, update_flags="vc")
    accs2 = Sgmm2Accs(model2)
    accs2.accumulate(model2, feats, post, num_gselect=4)
    assert accs2.tot_like / accs2.tot_frames >= before - 0.05


@pytest.mark.slow
def test_sgmm2_asr_decode():
    """SGMM2 as a drop-in acoustic model over a GMM system's tree/HCLG:
    decode WER must match or beat the GMM baseline on the easy corpus
    (ref: steps/train_sgmm2.sh + sgmm2-latgen-faster)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import jax.numpy as jnp
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.steps.sgmm_steps import train_sgmm2_system, SgmmTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.dense import make_decoder
    from kaldi_tpu.decoder.beam_search import BeamSearchOpts
    from kaldi_tpu.utils.wer import compute_wer

    rng = np.random.RandomState(13)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    train, test = [], []
    for i in range(14):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        train.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    for i in range(6):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        test.append((f"t{i}", featize(synth_utterance(ws, rng)), ws))
    gmm = train_mono(lang, train, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    sgmm_am, likes = train_sgmm2_system(
        gmm, train, SgmmTrainOpts(ubm_gauss=8, phn_dim=8, num_iters=6))
    assert likes[-1] > likes[0]

    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, gmm.trans_model, gmm.ctx_dep,
                      self_loop_scale=0.1)
    dec = make_decoder(pack_graph(graph.fst, gmm.trans_model.id2pdf_array),
                       BeamSearchOpts(beam=16.0, max_active=256,
                                      acoustic_scale=0.1))
    B = len(test)
    T = max(f.shape[0] for (_u, f, _w) in test)
    D = test[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]

    def wer_of(am):
        results = dec.decode(am.loglikes_np(feats), nf)
        refs, hyps = {}, {}
        for b, (u, _f, ws) in enumerate(test):
            refs[u] = ws
            hyps[u] = ([lang.words.sym(w) for w in results[b][0]]
                       if results[b] else [])
        return compute_wer(refs, hyps).wer

    wer_sgmm = wer_of(sgmm_am)
    wer_gmm = wer_of(gmm.am)
    assert wer_sgmm <= wer_gmm + 5.0, (wer_sgmm, wer_gmm)
    assert wer_sgmm < 20.0


def test_speaker_vector_adaptation(sgmm_setup):
    model, feats, post, _rng = sgmm_setup
    rng = np.random.RandomState(9)
    # a 'speaker': all frames shifted by a fixed offset
    offset = rng.randn(4) * 0.8
    spk_feats = feats[:100] + offset
    spk_post = post[:100]
    accs0 = Sgmm2Accs(model)
    accs0.accumulate(model, spk_feats, spk_post, num_gselect=4)
    base = accs0.tot_like / accs0.tot_frames
    spk = estimate_speaker_vector(model, spk_feats, spk_post, num_gselect=4)
    assert spk.v.shape == (2,)
    accs1 = Sgmm2Accs(model)
    accs1.accumulate(model, spk_feats, spk_post, num_gselect=4, spk=spk)
    adapted = accs1.tot_like / accs1.tot_frames
    assert adapted > base, (base, adapted)


def test_sgmm2_fmllr_recovers_feature_transform(sgmm_setup):
    """Corrupt features with a known affine map; SGMM fMLLR must improve
    the likelihood and largely undo the corruption
    (ref: sgmm2/fmllr-sgmm2.h — randomized recovery check like
    fmllr-sgmm2-test.cc)."""
    from kaldi_tpu.sgmm import Sgmm2Accs, update_sgmm2
    from kaldi_tpu.sgmm.fmllr import (FmllrSgmm2Accs, estimate_sgmm2_fmllr,
                                      apply_fmllr)
    model, feats, post, rng = sgmm_setup
    import copy
    m = copy.deepcopy(model)
    for _ in range(4):
        accs = Sgmm2Accs(m)
        accs.accumulate(m, feats, post)
        m = update_sgmm2(m, accs, ("vc", "Mc"))
    D = feats.shape[1]
    A = np.eye(D) * 0.7
    b = np.full(D, 0.8)
    bad = feats @ A.T + b

    def total_ll(x):
        gsel = m.gselect(x)
        return sum(m.log_likelihood(j, x[t], gsel[t])
                   for t, frame in enumerate(post) for (j, _w) in frame)

    ll_bad = total_ll(bad)
    fa = FmllrSgmm2Accs(m)
    fa.accumulate(m, bad, post)
    W, impr = estimate_sgmm2_fmllr(fa, m)
    assert impr > 0.0
    fixed = apply_fmllr(W, bad)
    ll_fixed = total_ll(fixed)
    assert ll_fixed > ll_bad + 0.2 * len(post)  # clearly better per frame
    # low occupancy -> identity
    fa2 = FmllrSgmm2Accs(m)
    W2, impr2 = estimate_sgmm2_fmllr(fa2, m)
    np.testing.assert_allclose(W2[:, :D], np.eye(D))
    assert impr2 == 0.0


def _mmi_objective(model, feats, num_post, n_states, num_gselect=4):
    """True MMI criterion (uniform state prior):
    mean_t [ log p(x_t | j_num) − log Σ_j p(x_t | j) ], plus the EBW
    statistics (num from the alignment, den weighted by the model's own
    state posterior — exactly the sgmm2-acc-stats2 den stats)."""
    ll = model.loglikes_matrix(feats, num_gselect)          # [T, J]
    m = ll.max(axis=1, keepdims=True)
    den_log = (m[:, 0] + np.log(np.exp(ll - m).sum(axis=1)))
    num_log = np.array([ll[t, num_post[t][0][0]]
                        for t in range(len(feats))])
    obj = float((num_log - den_log).mean())
    p = np.exp(ll - m)
    p /= p.sum(axis=1, keepdims=True)
    den_post = [[(j, float(p[t, j])) for j in range(n_states)
                 if p[t, j] > 1e-6] for t in range(len(feats))]
    num = Sgmm2Accs(model)
    num.accumulate(model, feats, num_post, num_gselect=num_gselect)
    den = Sgmm2Accs(model)
    den.accumulate(model, feats, den_post, num_gselect=num_gselect)
    return obj, num, den


def test_sgmm2_ebw_improves_mmi_objective():
    """EBW update on (num=alignment, den=model posterior) stats must
    increase the MMI objective (ref: sgmm2/estimate-am-sgmm2-ebw.h —
    the defining property of the EBW step).

    Builds its own model: the module fixture is mutated in place by the
    EM tests, which would leave an already-converged starting point."""
    from kaldi_tpu.sgmm.ebw import update_sgmm2_ebw, EbwSgmm2Options
    rng = np.random.RandomState(0)
    feats, post, _mu = _make_data(rng)
    ubm = DiagGmm.from_stats(feats.mean(0), feats.var(0)).split(4)
    for _ in range(5):
        acc = AccumDiagGmm(ubm.num_gauss, ubm.dim)
        acc.accumulate(ubm, feats.astype(np.float32))
        ubm = mle_diag_gmm_update(ubm, acc)
    fubm = FullGmm.from_diag(ubm.weights, ubm.means, ubm.vars)
    m = AmSgmm2(fubm, num_states=3, phn_dim=5, spk_dim=2, seed=1)
    # a few ML iterations first so the model is sane
    for flags in ("vc", "Mc"):
        accs = Sgmm2Accs(m)
        accs.accumulate(m, feats, post, num_gselect=4)
        m = update_sgmm2(m, accs, update_flags=flags)
    obj0, num, den = _mmi_objective(m, feats, post, 3)
    objs = [obj0]
    for _ in range(3):
        update_sgmm2_ebw(m, num, den, EbwSgmm2Options(),
                         update_flags="vMwSc")
        obj, num, den = _mmi_objective(m, feats, post, 3)
        objs.append(obj)
    assert objs[-1] > objs[0] + 1e-3, objs
    # and every step is (weakly) monotone, the EBW guarantee territory
    assert all(objs[k + 1] >= objs[k] - 1e-3 for k in range(len(objs) - 1)), objs


@pytest.mark.slow
def test_sgmm2_bmmi_e2e():
    """ML SGMM -> boosted-MMI EBW iterations: the MMI objective improves
    and decode WER does not regress vs the ML SGMM
    (ref: steps/train_mmi_sgmm2.sh + sgmm2/estimate-am-sgmm2-ebw.h)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import jax.numpy as jnp
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.steps.sgmm_steps import (train_sgmm2_system,
                                            SgmmTrainOpts,
                                            train_sgmm2_bmmi, SgmmMmiOpts)
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.utils.wer import compute_wer

    rng = np.random.RandomState(21)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    train, test = [], []
    for i in range(12):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        train.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    for i in range(6):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        test.append((f"t{i}", featize(synth_utterance(ws, rng)), ws))
    gmm = train_mono(lang, train, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    sgmm_am, _likes = train_sgmm2_system(
        gmm, train, SgmmTrainOpts(ubm_gauss=8, phn_dim=8, num_iters=4))

    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, gmm.trans_model, gmm.ctx_dep,
                      self_loop_scale=0.1)
    dec = BeamSearchDecoder(
        pack_graph(graph.fst, gmm.trans_model.id2pdf_array),
        BeamSearchOpts(beam=16.0, max_active=256, acoustic_scale=0.1))

    def wer_of(am):
        B = len(test)
        T = max(f.shape[0] for (_u, f, _w) in test)
        D = test[0][1].shape[1]
        feats = np.zeros((B, T, D), np.float32)
        nf = np.zeros(B, np.int32)
        for b, (_u, f, _w) in enumerate(test):
            feats[b, : f.shape[0]] = f
            nf[b] = f.shape[0]
        results = dec.decode(am.loglikes_np(feats), nf)
        refs, hyps = {}, {}
        for b, (u, _f, ws) in enumerate(test):
            refs[u] = ws
            hyps[u] = ([lang.words.sym(w) for w in results[b][0]]
                       if results[b] else [])
        return compute_wer(refs, hyps).wer

    wer_ml = wer_of(sgmm_am)
    import copy
    sgmm_am2 = copy.deepcopy(sgmm_am)
    sgmm_am2, objs = train_sgmm2_bmmi(
        gmm, sgmm_am2, graph, train,
        SgmmMmiOpts(num_iters=2, boost=0.1))
    assert objs[-1] >= objs[0] - 1e-3, objs   # MMI objective not worse
    wer_bmmi = wer_of(sgmm_am2)
    print(f"SGMM WER: ML {wer_ml:.2f} -> bMMI {wer_bmmi:.2f}, objs {objs}")
    assert wer_bmmi <= wer_ml + 1e-9, (wer_bmmi, wer_ml)
