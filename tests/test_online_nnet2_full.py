"""Full online-nnet2 stack: TDNN trained on MFCC ⊕ i-vector features,
decoded through the streaming pipeline with decoder-fed silence weighting.

(ref: the steps/online/nnet2 recipe family — prepare_online_decoding.sh
 freezes the feature+i-vector config; online WER ≈ offline WER
 (egs/swbd/s5c/RESULTS:77-80). Here the contract asserted is
 streaming == offline decode of the same utterances.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR

from kaldi_tpu.fst.lang import Lexicon, prepare_lang
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.graph import make_hclg
from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc
from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
from kaldi_tpu.steps.tdnn import align_with_gmm
from kaldi_tpu.steps.ubm import train_diag_ubm, DiagUbmTrainOpts
from kaldi_tpu.ivector.extractor import IvectorExtractor
from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
from kaldi_tpu.nnet.am_nnet import AmNnet
from kaldi_tpu.nnet.train import NnetTrainOpts, train_epochs, make_egs
from kaldi_tpu.online.ivector import (OnlineIvectorConfig,
                                      OnlineIvectorFeature)
from kaldi_tpu.online.features import OnlineMfcc
from kaldi_tpu.online.nnet2_decoding import (OnlineNnet2FeaturePipeline,
                                             SingleUtteranceNnet2Decoder)
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts


@pytest.mark.slow
def test_online_nnet2_with_ivectors_streaming_matches_offline():
    rng = np.random.RandomState(77)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def base_feats(w):
        return np.asarray(mfcc(jnp.asarray(w), fo))

    # delta feats only for the GMM alignment system
    from kaldi_tpu.ops import add_deltas

    def ali_feats(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo),
                                     order=2, window=2))

    waves = []
    for i in range(14):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        waves.append((f"u{i}", synth_utterance(ws, rng), ws))
    gmm = train_mono(lang, [(u, ali_feats(w), ws) for (u, w, ws) in waves],
                     MonoTrainOpts(num_iters=8, totgauss=30,
                                   max_iter_inc=6,
                                   realign_iters=tuple(range(1, 8))))

    # i-vector extractor on base MFCCs
    pooled = np.concatenate([base_feats(w) for (_u, w, _ws) in waves])
    ubm = train_diag_ubm(pooled.astype(np.float64),
                         DiagUbmTrainOpts(num_gauss=8, num_iters=2))
    ext = IvectorExtractor(ubm, ivector_dim=4, seed=0)
    ivec_cfg = OnlineIvectorConfig(num_gselect=4, use_most_recent_ivector=True)

    def combined_feats(w):
        """Offline version of the online pipeline: per-frame most-recent
        i-vector appended to base MFCCs."""
        base = base_feats(w)
        iv = OnlineIvectorFeature(ext, ivec_cfg)
        iv.accept_features(base.astype(np.float64))
        ivec = iv.get_frame(base.shape[0] - 1)
        return np.concatenate(
            [base, np.tile(ivec, (base.shape[0], 1))], axis=1) \
            .astype(np.float32)

    # train the TDNN on combined features with GMM alignments
    aligned = align_with_gmm(
        gmm, [(u, ali_feats(w), ws) for (u, w, ws) in waves])
    combined = [combined_feats(w) for (_u, w, _ws) in waves]
    pairs = [(combined[i][: aligned[i][0].shape[0]], aligned[i][1])
             for i in range(len(aligned))]
    cfg = TdnnConfig(feat_dim=combined[0].shape[1],
                     num_pdfs=gmm.am.num_pdfs, hidden_dim=256,
                     pnorm_output_dim=64,
                     splice_indexes=((-1, 0, 1), (-1, 1), (0,)))
    model = Tdnn(cfg)
    params = model.init(jax.random.PRNGKey(0))
    egs = make_egs(pairs, cfg.left_context, cfg.right_context, chunk=8)
    params, _h = train_epochs(model, params, egs,
                              NnetTrainOpts(num_epochs=30, minibatch_size=64,
                                            initial_lr=0.1, final_lr=0.01,
                                            momentum=0.9))
    am = AmNnet(model, params)
    counts = np.zeros(gmm.am.num_pdfs, np.float64)
    for (_f, pdfs) in pairs:
        np.add.at(counts, pdfs, 1.0)
    am.set_priors_from_alignment_counts(counts)

    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, gmm.trans_model, gmm.ctx_dep,
                      self_loop_scale=0.1)
    base_dec = BeamSearchDecoder(
        pack_graph(graph.fst, gmm.trans_model.id2pdf_array),
        BeamSearchOpts(beam=100.0, max_active=64, acoustic_scale=0.1))

    # streaming decode of a fresh utterance
    test_ws = ["YES", "NO", "YES"]
    wave = synth_utterance(test_ws, rng)
    iv_feat = OnlineIvectorFeature(ext, ivec_cfg)
    pipe = OnlineNnet2FeaturePipeline(OnlineMfcc(fo), iv_feat)
    sud = SingleUtteranceNnet2Decoder(
        am, gmm.trans_model, base_dec, pipe, chunk_frames=16,
        silence_phones={lang.phones["SIL"]})
    step = int(0.4 * SR)
    for lo in range(0, len(wave), step):
        pipe.accept_waveform(wave[lo: lo + step])
        sud.advance_decoding()
    sud.finalize_decoding()
    res = sud.best_path()
    assert res is not None
    stream_words = [lang.words.sym(w) for w in res[0]]

    # offline decode of the same wave through the offline combined feats
    f = combined_feats(wave)
    off = base_dec.decode(am.loglikes_np(f[None]),
                          np.array([f.shape[0]]))[0]
    offline_words = [lang.words.sym(w) for w in off[0]]
    # the i-vector estimate differs slightly between streaming (growing
    # stats, silence-weighted) and the offline snapshot; the decoded words
    # must still agree
    assert stream_words == offline_words
    assert stream_words == test_ws  # and on this easy corpus, be correct
