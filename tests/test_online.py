"""Online/streaming tests: exact parity with offline features & decoding,
endpoint rules, RTF accounting (style of feat/online-feature-test.cc and
the online2 decoding flow)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
from kaldi_tpu.online.features import (OnlineMfcc, OnlineCmvn,
                                       OnlineCmvnOpts, OnlineFeaturePipeline)
from kaldi_tpu.online.endpoint import (EndpointConfig, EndpointRule,
                                       endpoint_detected)
from kaldi_tpu.online.timing import OnlineTimer, OnlineTimingStats
from kaldi_tpu.transform.cmvn import CmvnStats


def test_online_mfcc_matches_offline():
    rng = np.random.RandomState(0)
    wave = (rng.randn(7000) * 500).astype(np.float32)
    opts = MfccOpts(frame_opts=FrameOpts(dither=0.0))
    offline = np.asarray(mfcc(jnp.asarray(wave), opts))
    online = OnlineMfcc(opts)
    # feed in uneven chunks
    for chunk in np.split(wave, [1000, 1500, 3000, 3001, 6500]):
        online.accept_waveform(chunk)
    online.input_finished()
    assert online.num_frames_ready() == offline.shape[0]
    got = online.get_frames(0, online.num_frames_ready())
    np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-3)


def test_online_cmvn_causal():
    rng = np.random.RandomState(1)
    x = (rng.randn(300, 5) * 2 + 3).astype(np.float32)
    cm = OnlineCmvn(OnlineCmvnOpts(cmn_window=100))
    y = cm.apply(x)
    # frame 200 normalized by mean of frames 101..200
    want = x[200] - x[101:201].mean(axis=0)
    np.testing.assert_allclose(y[200], want, rtol=1e-4, atol=1e-4)
    # early frames use fewer frames (causal) — frame 0 subtracts itself
    np.testing.assert_allclose(y[0], 0.0, atol=1e-5)


def test_online_cmvn_with_global_prior():
    rng = np.random.RandomState(2)
    prior = CmvnStats(4)
    prior.accumulate(rng.randn(1000, 4) + 10.0)
    x = (rng.randn(5, 4)).astype(np.float32)
    cm = OnlineCmvn(OnlineCmvnOpts(cmn_window=100, global_frames=200),
                    global_stats=prior)
    y = cm.apply(x)
    # with only 5 own frames, the prior dominates: output ~ x - ~9.76
    # (weighted mean of 5 own frames at 0 and 200 prior frames at 10)
    assert np.all(np.abs(y.mean(axis=0) + 9.76) < 1.2)


def test_online_cmvn_freeze():
    x = np.ones((10, 3), np.float32) * 4.0
    cm = OnlineCmvn(OnlineCmvnOpts())
    cm.freeze(np.full(3, 1.0), np.ones(3))
    y = cm.apply(x)
    np.testing.assert_allclose(y, 3.0)


def test_endpointing():
    cfg = EndpointConfig()
    shift = 0.01
    # long trailing silence after speech -> rule4 fires
    assert endpoint_detected(cfg, shift, num_frames_decoded=500,
                             trailing_silence_frames=250, relative_cost=3.0)
    # no silence, short utt -> nothing fires
    assert not endpoint_detected(cfg, shift, num_frames_decoded=100,
                                 trailing_silence_frames=5,
                                 relative_cost=3.0)
    # 20s utterance -> rule5 fires regardless
    assert endpoint_detected(cfg, shift, num_frames_decoded=2001,
                             trailing_silence_frames=0, relative_cost=100.0)


def test_timing_stats():
    stats = OnlineTimingStats()
    t = OnlineTimer("utt1")
    t.wait_until(2.0)
    t.finish(stats)
    assert stats.num_utts == 1
    assert stats.real_time_factor < 1.0  # compute was ~instant


@pytest.mark.slow
def test_online_decode_matches_offline():
    """Chunked AdvanceDecoding must produce the same words as one-shot."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.online.decoder import OnlineDecoder

    rng = np.random.RandomState(9)
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
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=100.0, max_active=64, acoustic_scale=0.1))

    f = utts[0][1]
    ll = model.am.loglikes_np(f[None])[0]
    offline = dec.decode(ll[None], np.array([f.shape[0]]))[0]

    online = OnlineDecoder(dec, chunk_frames=16)
    # feed in odd-sized chunks, like a live pipeline
    pos = 0
    for size in (7, 30, 16, 50, 1000):
        online.advance_decoding(ll[pos: pos + size])
        pos += size
        if pos >= ll.shape[0]:
            break
    assert online.num_frames_decoded == f.shape[0]
    words, tids, cost = online.best_path()
    assert words == offline[0]
    assert cost == pytest.approx(offline[2], abs=0.1)
    assert len(tids) == f.shape[0]

    # trailing-silence counting must agree with the decoded tid sequence
    # (on this synthetic corpus the GMM may absorb silence into word
    # phones, so we check the counter against the actual best path)
    res = online.best_path(use_final_probs=False)
    _w3, tids3, _c3 = res
    sil = {lang.phones["SIL"]}
    want = 0
    for tid in reversed(tids3):
        if model.trans_model.transition_id_to_phone(tid) in sil:
            want += 1
        else:
            break
    n_sil = online.trailing_silence_frames(sil, model.trans_model)
    assert n_sil == want

    # partial results: re-decode incrementally and ask for partials
    online2 = OnlineDecoder(dec, chunk_frames=16)
    online2.advance_decoding(ll[:40])
    partial = online2.best_path(use_final_probs=False)
    assert partial is not None
    online2.advance_decoding(ll[40:])
    words2, _t2, _c2 = online2.best_path()
    assert words2 == offline[0]
