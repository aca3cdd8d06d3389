"""Online i-vector, online-nnet2 pipeline, online GMM decoding with fMLLR.

(ref: online2/online-ivector-feature.h, online2/online-nnet2-decoding.h,
 online2/online-gmm-decoding.h.)
"""

import numpy as np
import pytest

from kaldi_tpu.gmm.diag_gmm import DiagGmm
from kaldi_tpu.gmm.estimation import AccumDiagGmm, mle_diag_gmm_update
from kaldi_tpu.ivector.extractor import IvectorExtractor
from kaldi_tpu.online.ivector import (
    OnlineIvectorConfig, OnlineIvectorFeature, OnlineIvectorAdaptationState,
    OnlineSilenceWeighting,
)


@pytest.fixture(scope="module")
def small_extractor():
    rng = np.random.RandomState(3)
    data = rng.randn(2000, 6) * 2.0 + rng.randn(6)
    ubm = DiagGmm.from_stats(data.mean(0), data.var(0)).split(4)
    for _ in range(4):
        acc = AccumDiagGmm(ubm.num_gauss, ubm.dim)
        acc.accumulate(ubm, data.astype(np.float32))
        ubm = mle_diag_gmm_update(ubm, acc)
    ext = IvectorExtractor(ubm, ivector_dim=4, seed=0)
    # give M nontrivial content so ivectors respond to data
    ext.M = np.random.RandomState(1).randn(*ext.M.shape) * 0.3
    return ext


def test_online_ivector_matches_offline_stats(small_extractor):
    """Feeding frames in chunks must equal one-shot accumulation."""
    ext = small_extractor
    rng = np.random.RandomState(5)
    feats = rng.randn(120, 6) * 2.0
    cfg = OnlineIvectorConfig(posterior_scale=0.1)

    online = OnlineIvectorFeature(ext, cfg)
    for lo in (0, 13, 40, 77):
        hi = {0: 13, 13: 40, 40: 77, 77: 120}[lo]
        online.accept_features(feats[lo:hi])
    iv_online = online.get_frame(119)

    oneshot = OnlineIvectorFeature(ext, cfg)
    oneshot.accept_features(feats)
    iv_oneshot = oneshot.get_frame(119)
    np.testing.assert_allclose(iv_online, iv_oneshot, atol=1e-8)

    # must equal offline extraction with the same scaled posteriors
    post = ext.frame_posteriors(feats, cfg.num_gselect, cfg.min_post) * 0.1
    gamma, X = post.sum(0), post.T @ feats
    iv_ref, _L = ext.extract(gamma, X)
    np.testing.assert_allclose(iv_online, iv_ref, atol=1e-8)


def test_online_ivector_adaptation_state(small_extractor):
    ext = small_extractor
    rng = np.random.RandomState(6)
    cfg = OnlineIvectorConfig(max_remembered_frames=50.0)
    f1 = OnlineIvectorFeature(ext, cfg)
    f1.accept_features(rng.randn(200, 6))
    st = f1.get_adaptation_state()
    # limited to 50 frames worth of (scaled) stats
    assert st.gamma.sum() / cfg.posterior_scale <= 50.0 + 1e-6
    # a second utterance starts from the carried stats
    f2 = OnlineIvectorFeature(ext, cfg, adaptation_state=st)
    assert f2.gamma.sum() == pytest.approx(st.gamma.sum())


def test_silence_weighting_zeroes_stats(small_extractor):
    ext = small_extractor
    rng = np.random.RandomState(7)
    feats = rng.randn(50, 6)
    cfg = OnlineIvectorConfig()
    a = OnlineIvectorFeature(ext, cfg)
    a.accept_features(feats, frame_weights=np.zeros(50))
    assert a.gamma.sum() == 0.0
    b = OnlineIvectorFeature(ext, cfg)
    b.accept_features(feats, frame_weights=np.ones(50))
    assert b.gamma.sum() > 0.0


def test_update_frame_weights_reweights_past_stats(small_extractor):
    """Regression: decoder silence feedback must change ALREADY-accumulated
    stats (it used to be a no-op that indexed future frames)."""
    ext = small_extractor
    rng = np.random.RandomState(8)
    feats = rng.randn(40, 6)
    a = OnlineIvectorFeature(ext, OnlineIvectorConfig())
    a.accept_features(feats)
    g_before = a.gamma.sum()
    # re-weight the first 20 frames to 0
    w = np.ones(40)
    w[:20] = 0.0
    a.update_frame_weights(w)
    assert a.gamma.sum() < g_before
    # equivalent to accumulating with those weights up front
    b = OnlineIvectorFeature(ext, OnlineIvectorConfig())
    b.accept_features(feats, frame_weights=w)
    np.testing.assert_allclose(a.gamma, b.gamma, atol=1e-10)
    np.testing.assert_allclose(a.X, b.X, atol=1e-10)
    # and the cached i-vector is invalidated
    np.testing.assert_allclose(a.get_frame(39), b.get_frame(39),
                               atol=1e-10)


def test_pipeline_delayed_emission_gives_offline_parity():
    """Regression: frames must only be emitted once their delta context is
    complete, so every emitted frame equals the offline computation."""
    import jax.numpy as jnp
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.online.features import OnlineFeaturePipeline
    rng = np.random.RandomState(12)
    wave = (rng.randn(8000) * 1000).astype(np.float32)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=8000.0, dither=0.0))
    offline = np.asarray(add_deltas(mfcc(jnp.asarray(wave), fo),
                                    order=2, window=2))
    pipe = OnlineFeaturePipeline(fo, delta_order=2)
    emitted = []
    n_prev = 0
    for lo in range(0, len(wave), 1234):
        pipe.accept_waveform(wave[lo: lo + 1234])
        f = pipe.get_features()
        if f.shape[0] > n_prev:
            emitted.append(f[n_prev:])
            n_prev = f.shape[0]
    pipe.input_finished()
    f = pipe.get_features()
    emitted.append(f[n_prev:])
    streamed = np.concatenate(emitted)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-4)


def test_silence_weighting_from_alignment():
    class TmStub:
        def transition_id_to_phone(self, tid):
            return 1 if tid < 10 else 2
    w = OnlineSilenceWeighting(TmStub(), {1}, silence_weight=0.25)
    out = w.weights_from_alignment([5, 15, 7, 20])
    np.testing.assert_allclose(out, [0.25, 1.0, 0.25, 1.0])


def test_online_nnet2_pipeline_dims(small_extractor):
    """Pipeline = base features ⊕ i-vector: dim and streaming behavior."""
    from kaldi_tpu.online.nnet2_decoding import OnlineNnet2FeaturePipeline

    class FakeBase:
        """6-dim deterministic 'feature extractor' over samples."""
        dim = 6

        def __init__(self):
            self._n = 0
            self._fin = False

        def accept_waveform(self, wave):
            self._n += len(wave) // 80

        def input_finished(self):
            self._fin = True

        def num_frames_ready(self):
            return self._n

        def get_frames(self, a, b):
            t = np.arange(a, b, dtype=np.float32)
            return np.stack([t * (i + 1) * 0.01 for i in range(6)], axis=1)

    iv = OnlineIvectorFeature(small_extractor, OnlineIvectorConfig())
    pipe = OnlineNnet2FeaturePipeline(FakeBase(), iv)
    assert pipe.dim == 6 + 4
    pipe.accept_waveform(np.zeros(800))   # 10 frames
    f = pipe.get_frames(0, pipe.num_frames_ready())
    assert f.shape == (10, 10)
    # i-vector stats accumulated from the base frames
    assert iv.gamma.sum() > 0


@pytest.mark.slow
def test_online_gmm_decoder_with_fmllr():
    """Streaming GMM decode on yesno; fMLLR estimated mid-utterance must
    not break decoding (and should be estimated when enough frames)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.online.features import OnlineFeaturePipeline
    from kaldi_tpu.online.gmm_decoding import (SingleUtteranceGmmDecoder,
                                               AdaptationPolicy)
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo),
                                     order=2, window=2))

    utts = []
    for i in range(10):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        utts.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    model = train_mono(lang, utts, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    packed = pack_graph(graph.fst, model.trans_model.id2pdf_array)
    base = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=100.0, max_active=64, acoustic_scale=0.1))

    # stream one long utterance (repeat words to pass the 2s adaptation
    # delay) through the online GMM decoder
    words_ref = ["YES", "NO", "YES", "NO", "YES", "NO"]
    wave = synth_utterance(words_ref, rng)
    pipe = OnlineFeaturePipeline(fo, delta_order=2)
    sud = SingleUtteranceGmmDecoder(
        model.am, model.trans_model, base, pipe,
        policy=AdaptationPolicy(adaptation_first_utt_delay=1.0),
        fmllr_min_count=50.0)
    step = int(0.5 * SR)
    for lo in range(0, len(wave), step):
        pipe.accept_waveform(wave[lo: lo + step])
        sud.advance_decoding()
    sud.finalize_decoding()
    res = sud.best_path()
    assert res is not None
    words, _tids, _cost = res
    assert [lang.words.sym(w) for w in words] == words_ref
    assert sud.have_transform()   # utterance > 1s, so fMLLR was estimated
