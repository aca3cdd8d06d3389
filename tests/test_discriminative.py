"""Discriminative training: lattice posteriors, EBW updates, MMI/sMBR loop.

(ref test strategy: the reference has no dedicated MMI unit test; its
 guarantees are algebraic — posteriors sum to 1, MPE gammas sum to 0 per
 frame — plus recipe-level objective improvement. We test both.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.fst.lang import Lexicon, prepare_lang
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.graph import make_hclg
from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
from kaldi_tpu.steps.mmi import MmiTrainOpts, train_discriminative, make_denlats
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts
from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.estimation import AccumDiagGmm
from kaldi_tpu.gmm.ebw import (EbwOptions, update_ebw_diag_gmm,
                               update_ebw_weights_diag_gmm)
from kaldi_tpu.lat.posteriors import (
    lattice_state_times, lattice_to_post, rescore_lattice,
    lattice_forward_backward_mmi, lattice_forward_backward_mpe_variants,
)
from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.utils.wer import compute_wer

from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR, TONES  # noqa: F401


def _toy_lattice():
    """Two 2-frame paths sharing start/end; tids 1 and 2."""
    lat = Lattice()
    s0 = lat.add_state()
    a1 = lat.add_state()
    a2 = lat.add_state()
    b1 = lat.add_state()
    b2 = lat.add_state()
    lat.start = s0
    # path A: cost 1.0 total; path B: cost 2.0 total
    lat.add_arc(s0, 1, 5, 0.5, 0.0, a1)
    lat.add_arc(a1, 1, 0, 0.5, 0.0, a2)
    lat.add_arc(s0, 2, 6, 1.0, 0.0, b1)
    lat.add_arc(b1, 2, 0, 1.0, 0.0, b2)
    lat.set_final(a2)
    lat.set_final(b2)
    return lat


def test_state_times_and_post_sum_to_one():
    lat = _toy_lattice()
    times, T = lattice_state_times(lat)
    assert T == 2
    post, tot = lattice_to_post(lat)
    for frame in post:
        assert abs(sum(w for _t, w in frame) - 1.0) < 1e-6
    # path A (cost 1) should dominate path B (cost 2):
    # P(A) = e^-1/(e^-1+e^-2)
    pa = np.exp(-1) / (np.exp(-1) + np.exp(-2))
    assert abs(dict(post[0])[1] - pa) < 1e-6


def test_mpe_gammas_sum_to_zero_per_frame():
    class TmStub:
        def transition_id_to_pdf(self, tid):
            return tid
        def transition_id_to_phone(self, tid):
            return tid

    lat = _toy_lattice()
    tm = TmStub()
    post, acc = lattice_forward_backward_mpe_variants(
        lat, [1, 1], tm, "smbr", silence_phones=frozenset(),
        one_silence_class=False)
    for frame in post:
        assert abs(sum(w for _p, w in frame)) < 1e-6
    # expected accuracy = 2 * P(path A)
    pa = np.exp(-1) / (np.exp(-1) + np.exp(-2))
    assert abs(acc - 2 * pa) < 1e-6
    # correct pdf (1) must get positive gradient
    assert dict(post[0])[1] > 0 and dict(post[0])[2] < 0


def test_mmi_posteriors():
    class TmStub:
        def transition_id_to_pdf(self, tid):
            return tid
        def transition_id_to_phone(self, tid):
            return tid

    lat = _toy_lattice()
    post, den_like = lattice_forward_backward_mmi(
        lat, [1, 1], TmStub(), drop_frames=False, cancel=False)
    d = dict(post[0])
    pa = np.exp(-1) / (np.exp(-1) + np.exp(-2))
    assert abs(d[1] - (1.0 - pa)) < 1e-6
    assert abs(d[2] + (1.0 - pa)) < 1e-6


def test_rescore_lattice_changes_acoustics():
    lat = _toy_lattice()

    class TmStub:
        def transition_id_to_pdf(self, tid):
            return tid - 1
    ll = np.array([[0.0, -1.0, -2.0], [0.0, -1.0, -2.0]])[:, :]
    # pdf0 for tid1, pdf1 for tid2
    ll = np.tile(np.array([[-3.0, -7.0]]), (2, 1))
    rescore_lattice(lat, ll, TmStub(), acoustic_scale=0.5)
    assert lat.arcs[0][0].acoustic_cost == pytest.approx(1.5)
    assert lat.arcs[0][1].acoustic_cost == pytest.approx(3.5)


def test_ebw_update_moves_toward_num():
    rng = np.random.RandomState(0)
    gmm = DiagGmm(np.array([1.0]), np.zeros((1, 2)), np.ones((1, 2)))
    num = AccumDiagGmm(1, 2)
    den = AccumDiagGmm(1, 2)
    x_num = rng.randn(500, 2) + 2.0      # num data centered at +2
    x_den = rng.randn(300, 2) - 1.0      # den data centered at -1
    num.accumulate_from_posteriors(x_num, np.ones((500, 1)))
    den.accumulate_from_posteriors(x_den, np.ones((300, 1)))
    new, _impr, cnt = update_ebw_diag_gmm(gmm, num, den,
                                          EbwOptions(E=2.0, tau=0.0))
    # mean starts at 0; it must move toward the num data (+2), away from
    # den (-1) — step size damped by the per-Gaussian D smoothing
    assert np.all(new.means > 0.5)
    assert np.all(new.vars > 0)
    assert cnt > 0
    w = update_ebw_weights_diag_gmm(new, num, den)
    assert abs(w.weights.sum() - 1.0) < 1e-8


@pytest.fixture(scope="module")
def mmi_system():
    rng = np.random.RandomState(7)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    opts = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(wave):
        f = np.asarray(mfcc(jnp.asarray(wave), opts))
        return np.asarray(add_deltas(jnp.asarray(f), order=2, window=2))

    train_utts = []
    for i in range(16):
        words = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 5))]
        wave = synth_utterance(words, rng)
        train_utts.append((f"train_{i}", featize(wave), words))
    test_utts = []
    for i in range(6):
        words = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 5))]
        wave = synth_utterance(words, rng)
        test_utts.append((f"test_{i}", featize(wave), words))

    model = train_mono(
        lang, train_utts,
        MonoTrainOpts(num_iters=8, totgauss=40, max_iter_inc=6,
                      realign_iters=tuple(range(1, 8))))
    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    den_graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                          self_loop_scale=0.1)
    return lang, model, den_graph, train_utts, test_utts


@pytest.mark.slow
def test_mmi_objf_improves_and_wer_not_worse(mmi_system):
    lang, model, den_graph, train_utts, test_utts = mmi_system
    sil = {lang.phones["SIL"]}
    opts = MmiTrainOpts(num_iters=3, boost=0.1, lattice_beam=8.0)
    new_am, hist = train_discriminative(model, den_graph, train_utts, opts,
                                        silence_phones=sil)
    assert len(hist) == 3
    # MMI objective (num - den loglike) must improve over iterations
    assert hist[-1] >= hist[0] - 1e-3
    # decode with baseline and bMMI models: bMMI must not be worse
    packed = pack_graph(den_graph.fst, model.trans_model.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=16.0, max_active=256, acoustic_scale=0.1))
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _w) in test_utts)
    D = test_utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test_utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]

    def wer_of(am):
        results = dec.decode(am.loglikes_np(feats), nf)
        refs, hyps = {}, {}
        for b, (u, _f, words) in enumerate(test_utts):
            refs[u] = words
            hyps[u] = [lang.words.sym(w) for w in results[b][0]]
        return compute_wer(refs, hyps).wer

    assert wer_of(new_am) <= wer_of(model.am)


@pytest.mark.slow
def test_nnet_sequence_discriminative_smbr(mmi_system):
    """sMBR fine-tuning of a hybrid TDNN raises expected frame accuracy
    (ref: steps/nnet2/train_discriminative2.sh)."""
    from kaldi_tpu.steps.tdnn import train_tdnn, align_with_gmm
    from kaldi_tpu.nnet.train import NnetTrainOpts
    from kaldi_tpu.nnet.tdnn import TdnnConfig
    from kaldi_tpu.nnet.discriminative import (
        NnetDiscriminativeOpts, train_nnet_discriminative)
    from kaldi_tpu.lat.generate import decode_to_lattices

    lang, model, den_graph, train_utts, _ = mmi_system
    utts = train_utts[:8]
    res = train_tdnn(
        model, utts,
        config=TdnnConfig(feat_dim=1, num_pdfs=1, hidden_dim=64,
                          pnorm_output_dim=16,
                          splice_indexes=((-2, -1, 0, 1, 2), (-1, 1), (0,))),
        train_opts=NnetTrainOpts(num_epochs=4, minibatch_size=128))
    am_nnet = res.am
    tm = model.trans_model
    lc, rc = am_nnet.model.config.left_context, am_nnet.model.config.right_context

    # denlats decoded with the nnet model; num alignment from the GMM
    packed = pack_graph(den_graph.fst, tm.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=16.0, max_active=256, acoustic_scale=0.1))
    aligned = align_with_gmm(model, utts)
    egs = []
    for (feats, _pdfs), (_u, rawf, _w) in zip(aligned, utts):
        T = feats.shape[0]
        ll = am_nnet.loglikes_np(feats[None])[0]
        lat = decode_to_lattices(dec, ll[None], np.array([T]),
                                 lattice_beam=8.0)[0]
        if lat is None:
            continue
        # numerator alignment as tids via GMM viterbi over the lattice? use
        # the GMM alignment's tids recomputed by align_with_gmm -> pdfs only;
        # realign to get tids:
        egs.append((feats, lat))
    # recover tid alignments for the numerator
    from kaldi_tpu.fst.graph import TrainingGraphCompiler
    from kaldi_tpu.decoder.graph_pack import pack_graphs
    from kaldi_tpu.decoder.viterbi import viterbi_align
    compiler = TrainingGraphCompiler(lang, tm, model.ctx_dep)
    full_egs = []
    for (feats, lat), (_u, _f, words) in zip(egs, utts):
        g = compiler.compile_transcript(list(words))
        batch = pack_graphs([g], tm.id2pdf_array)
        ll = model.am.loglikes_np(feats[None])
        r = viterbi_align(batch, ll, np.array([feats.shape[0]]), 0.1)[0]
        if r is None:
            continue
        tids = r[0]
        ctx_feats = np.pad(feats, ((lc, rc), (0, 0)), mode="edge")
        full_egs.append((ctx_feats, tids, lat))
    assert len(full_egs) >= 4

    sil = {lang.phones["SIL"]}
    opts = NnetDiscriminativeOpts(criterion="smbr", num_epochs=3,
                                  learning_rate=3e-4)
    new_params, hist = train_nnet_discriminative(
        am_nnet, tm, full_egs, opts, silence_phones=sil)
    assert len(hist) == 3
    assert np.isfinite(hist).all()
    # expected accuracy per frame should not decrease
    assert hist[-1] >= hist[0] - 1e-3


@pytest.mark.slow
def test_smbr_training_runs(mmi_system):
    lang, model, den_graph, train_utts, _ = mmi_system
    sil = {lang.phones["SIL"]}
    opts = MmiTrainOpts(num_iters=2, criterion="smbr", lattice_beam=8.0)
    new_am, hist = train_discriminative(model, den_graph, train_utts[:8],
                                        opts, silence_phones=sil)
    assert len(hist) == 2
    # expected per-frame accuracy is a fraction in [0, 1] (objf normalized
    # by frames) and should not degrade
    assert hist[-1] >= hist[0] - 1e-3
