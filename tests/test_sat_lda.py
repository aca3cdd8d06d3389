"""train_lda_mllt and train_sat recipe steps.

(ref: steps/train_lda_mllt.sh, steps/train_sat.sh, steps/decode_fmllr.sh;
 expected-behavior oracle = egs/rm/s5/RESULTS-style improvement ordering.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.fst.lang import Lexicon, prepare_lang
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.graph import make_hclg
from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
from kaldi_tpu.steps.lda_mllt import (train_lda_mllt, LdaMlltTrainOpts)
from kaldi_tpu.steps.sat import (train_sat, SatTrainOpts, decode_fmllr)
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts
from kaldi_tpu.utils.wer import compute_wer

from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR


def _corpus(rng, n, featize, spk_warp=None, spk=None):
    out = []
    for i in range(n):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 5))]
        f = featize(synth_utterance(ws, rng))
        if spk_warp is not None:
            f = f @ spk_warp["A"].T + spk_warp["b"]
        out.append((f"u{spk}_{i}" if spk else f"u{i}", f.astype(np.float32),
                    ws))
    return out


@pytest.fixture(scope="module")
def base():
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize_raw(w):
        return np.asarray(mfcc(jnp.asarray(w), fo))

    def featize_delta(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    g = lambda lang_: arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang_.words)  # noqa: E731
    return lang, featize_raw, featize_delta, g


@pytest.mark.slow
def test_train_lda_mllt_pipeline(base):
    lang, featize_raw, featize_delta, make_g = base
    rng = np.random.RandomState(5)
    # same waves featurized two ways (delta feats for mono, raw for LDA)
    waves = []
    for i in range(20):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 5))]
        waves.append((f"u{i}", synth_utterance(ws, rng), ws))
    utts_delta = [(u, featize_delta(w), ws) for (u, w, ws) in waves]
    utts_raw = [(u, featize_raw(w), ws) for (u, w, ws) in waves]

    mono = train_mono(lang, utts_delta, MonoTrainOpts(
        num_iters=8, totgauss=40, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))

    opts = LdaMlltTrainOpts(num_iters=10, totgauss=60, max_iter_inc=8,
                            num_leaves=20, lda_dim=20,
                            realign_iters=(1, 2, 3, 4, 5, 6, 7, 8, 9),
                            mllt_iters=(3, 6))
    res = train_lda_mllt(lang, utts_delta, utts_raw, mono, opts)
    assert res.transform.shape == (20, 13 * 7 + 1)

    # decode fresh test data through the transform: WER 0
    test_waves = []
    for i in range(6):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 5))]
        test_waves.append((f"t{i}", synth_utterance(ws, rng), ws))
    graph = make_hclg(lang, make_g(lang), res.model.trans_model,
                      res.model.ctx_dep, self_loop_scale=0.1)
    dec = BeamSearchDecoder(pack_graph(graph.fst,
                                       res.model.trans_model.id2pdf_array),
                            BeamSearchOpts(beam=16.0, max_active=256,
                                           acoustic_scale=0.1))
    feats_t = [res.transform_feats(featize_raw(w), opts)
               for (_u, w, _ws) in test_waves]
    B = len(feats_t)
    T = max(f.shape[0] for f in feats_t)
    feats = np.zeros((B, T, 20), np.float32)
    nf = np.zeros(B, np.int32)
    for b, f in enumerate(feats_t):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    results = dec.decode(res.model.am.loglikes_np(feats), nf)
    refs, hyps = {}, {}
    for b, (u, _w, ws) in enumerate(test_waves):
        refs[u] = ws
        hyps[u] = [lang.words.sym(w) for w in results[b][0]]
    assert compute_wer(refs, hyps).wer == 0.0


@pytest.mark.slow
def test_train_sat_beats_si_on_warped_speakers(base):
    lang, _fr, featize_delta, make_g = base
    rng = np.random.RandomState(6)
    D = 39
    # 3 'speakers', each with a fixed affine feature distortion
    spk_warps = {}
    for s in range(3):
        A = np.eye(D) + rng.randn(D, D) * 0.05
        b = rng.randn(D) * 1.5
        spk_warps[f"s{s}"] = {"A": A, "b": b}

    train_utts = []   # (utt, feats, words, spk)
    for s, warp in spk_warps.items():
        for (u, f, ws) in _corpus(rng, 7, featize_delta, warp, s):
            train_utts.append((u, f, ws, s))

    mono = train_mono(lang, [(u, f, w) for (u, f, w, _s) in train_utts],
                      MonoTrainOpts(num_iters=8, totgauss=40,
                                    max_iter_inc=6,
                                    realign_iters=tuple(range(1, 8))))

    sat = train_sat(lang, train_utts, mono, SatTrainOpts(
        num_iters=10, totgauss=60, max_iter_inc=8, num_leaves=20,
        realign_iters=(1, 2, 3, 4, 5, 6, 7, 8, 9), fmllr_iters=(3, 6),
        fmllr_min_count=50.0))
    assert len(sat.transforms) == 3

    # test utterances from the same warped speakers
    test_utts, refs = [], {}
    for s, warp in spk_warps.items():
        for (u, f, ws) in _corpus(np.random.RandomState(100 + int(s[1])),
                                  3, featize_delta, warp, "t" + s):
            test_utts.append((u, f, s))
            refs[u] = ws

    graph = make_hclg(lang, make_g(lang), sat.model.trans_model,
                      sat.model.ctx_dep, self_loop_scale=0.1)
    dec = BeamSearchDecoder(pack_graph(graph.fst,
                                       sat.model.trans_model.id2pdf_array),
                            BeamSearchOpts(beam=16.0, max_active=256,
                                           acoustic_scale=0.1))
    hyps = decode_fmllr(sat, dec, test_utts, lang, fmllr_min_count=50.0)
    hyps_sym = {u: [lang.words.sym(w) for w in h] for u, h in hyps.items()}
    wer_sat = compute_wer(refs, hyps_sym).wer

    # SI decode with the same model, unadapted features
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _s) in test_utts)
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _s) in enumerate(test_utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    res_si = dec.decode(sat.model.am.loglikes_np(feats), nf)
    hyps_si = {u: [lang.words.sym(w) for w in (res_si[b][0] if res_si[b]
                                               else [])]
               for b, (u, _f, _s) in enumerate(test_utts)}
    wer_si = compute_wer(refs, hyps_si).wer
    assert wer_sat <= wer_si
    assert wer_sat < 25.0, (wer_sat, wer_si)
