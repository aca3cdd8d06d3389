"""Threaded online decoder: non-blocking audio acceptance, identical
results to the synchronous single-utterance decoder.

(ref: online2/online-nnet2-decoding-threaded.h:64.)
"""

import time

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.slow
def test_threaded_equals_synchronous():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.steps.tdnn import train_tdnn
    from kaldi_tpu.nnet.train import NnetTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.online.features import (OnlineFeaturePipeline,
                                           OnlineProcessedFeature)
    from kaldi_tpu.online.nnet2_decoding import (
        OnlineNnet2FeaturePipeline, SingleUtteranceNnet2Decoder)
    from kaldi_tpu.online.threaded import ThreadedSingleUtteranceDecoder

    rng = np.random.RandomState(42)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    train = []
    for i in range(24):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 6))]
        train.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    gmm = train_mono(lang, train, MonoTrainOpts(
        num_iters=12, totgauss=60, max_iter_inc=8,
        realign_iters=tuple(range(1, 12))))
    res = train_tdnn(gmm, train, train_opts=NnetTrainOpts(
        initial_lr=0.1, final_lr=0.01, num_epochs=30,
        minibatch_size=64, momentum=0.9))

    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, gmm.trans_model, gmm.ctx_dep,
                      self_loop_scale=0.1)
    base_dec = BeamSearchDecoder(
        pack_graph(graph.fst, gmm.trans_model.id2pdf_array),
        BeamSearchOpts(beam=16.0, max_active=256, acoustic_scale=0.1))
    sil = {lang.phones["SIL"]}

    test_ws = ["YES", "NO", "YES", "NO"]
    wave = synth_utterance(test_ws, rng)
    step = int(0.2 * SR)

    def make_sud():
        base = OnlineProcessedFeature(OnlineFeaturePipeline(
            fo, delta_order=2))
        pipe = OnlineNnet2FeaturePipeline(base)
        return SingleUtteranceNnet2Decoder(
            res.am, gmm.trans_model, base_dec, pipe,
            chunk_frames=16, silence_phones=sil)

    # synchronous reference
    sud = make_sud()
    for lo in range(0, len(wave), step):
        sud.pipeline.accept_waveform(wave[lo: lo + step])
        sud.advance_decoding()
    sud.finalize_decoding()
    ref = sud.best_path()
    assert ref is not None
    ref_words = [lang.words.sym(w) for w in ref[0]]
    # absolute accuracy on this tiny corpus is covered by the e2e tests;
    # the contract HERE is threaded == synchronous (the established
    # streaming==offline pattern), plus non-blocking acceptance
    assert len(ref_words) >= 2

    # threaded: audio acceptance must be quick even while decoding runs
    tsud = ThreadedSingleUtteranceDecoder(make_sud())
    accept_times = []
    for lo in range(0, len(wave), step):
        t0 = time.perf_counter()
        tsud.accept_waveform(wave[lo: lo + step])
        accept_times.append(time.perf_counter() - t0)
    tsud.input_finished()
    assert tsud.wait(timeout=120.0)
    got = tsud.best_path()
    assert got is not None
    assert [lang.words.sym(w) for w in got[0]] == ref_words
    assert got[1] == ref[1]                  # identical tid alignment
    assert got[2] == pytest.approx(ref[2], abs=1e-3)
    # producer-side acceptance is queue-append only
    assert max(accept_times) < 0.05, accept_times
    assert tsud.num_frames_decoded() > 0
