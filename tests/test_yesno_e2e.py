"""End-to-end minimum slice (SURVEY.md §7 stage 3): synthetic 'yesno'.

The reference's de-facto integration test is egs/yesno/s5/run.sh (mono GMM
on 60 tiny wavs, WER ~0). With zero network egress we synthesize an
acoustically-equivalent corpus: two 'words' realized as distinct tones,
flat-start mono training, HCLG build with the yesno unigram LM, batched
beam-search decode, WER == 0 expected.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.fst.lang import Lexicon, prepare_lang
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.graph import make_hclg, TrainingGraphCompiler
from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts
from kaldi_tpu.utils.wer import compute_wer

SR = 8000.0
TONES = {"YES": 440.0, "NO": 1320.0}


def synth_utterance(words, rng):
    """Tone per word + silence gaps, light noise."""
    chunks = [np.zeros(int(SR * rng.uniform(0.08, 0.15)))]
    for w in words:
        dur = rng.uniform(0.25, 0.4)
        t = np.arange(int(SR * dur)) / SR
        freq = TONES[w] * rng.uniform(0.98, 1.02)
        tone = np.sin(2 * np.pi * freq * t) * 3000 * rng.uniform(0.7, 1.0)
        # fade in/out to avoid clicks
        env = np.minimum(1.0, np.minimum(np.arange(len(t)), len(t) - np.arange(len(t))) / (0.02 * SR))
        chunks.append(tone * env)
        chunks.append(np.zeros(int(SR * rng.uniform(0.1, 0.2))))
    wave = np.concatenate(chunks)
    wave += rng.randn(len(wave)) * 20.0
    return wave.astype(np.float32)


YESNO_ARPA = """
\\data\\
ngram 1=4

\\1-grams:
-1\tNO
-1\tYES
-99\t<s>
-1\t</s>

\\end\\
"""


@pytest.fixture(scope="module")
def yesno_system():
    rng = np.random.RandomState(42)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)

    opts = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(wave):
        f = np.asarray(mfcc(jnp.asarray(wave), opts))
        return np.asarray(add_deltas(jnp.asarray(f), order=2, window=2))

    train_utts = []
    for i in range(24):
        words = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 6))]
        wave = synth_utterance(words, rng)
        train_utts.append((f"train_{i}", featize(wave), words))

    test_utts = []
    for i in range(8):
        words = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 6))]
        wave = synth_utterance(words, rng)
        test_utts.append((f"test_{i}", featize(wave), words))

    model = train_mono(
        lang, train_utts,
        MonoTrainOpts(num_iters=12, totgauss=60, max_iter_inc=8,
                      realign_iters=tuple(range(1, 12))),
    )
    return lang, model, train_utts, test_utts


def test_training_graph_accepts_transcript(yesno_system):
    lang, model, train_utts, _ = yesno_system
    compiler = TrainingGraphCompiler(lang, model.trans_model, model.ctx_dep)
    g = compiler.compile_transcript(["YES", "NO"])
    assert g.num_states > 0
    # best path's olabels == transcript
    _, ol, _ = g.shortest_path()
    words = [lang.words.sym(o) for o in ol]
    assert words == ["YES", "NO"]
    # ilabels map to valid transition ids whose phones spell Y1 Y2 N1 N2
    il, _, _ = g.shortest_path()
    phones = []
    for tid in il:
        ph = model.trans_model.transition_id_to_phone(tid)
        if not phones or phones[-1] != ph:
            phones.append(ph)
    names = [lang.phones.sym(p) for p in phones if lang.phones.sym(p) != "SIL"]
    assert names == ["Y1", "Y2", "N1", "N2"]


def test_train_loglike_improves(yesno_system):
    lang, model, train_utts, _ = yesno_system
    # after training, aligned loglike per frame should be finite & sane
    f = train_utts[0][1]
    ll = model.am.loglikes_np(f[None, :, :])
    assert np.all(np.isfinite(ll))


def test_yesno_decode_wer_zero(yesno_system):
    lang, model, train_utts, test_utts = yesno_system
    lm = ArpaLm.parse(YESNO_ARPA)
    g = arpa_to_g(lm, lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    packed = pack_graph(graph.fst, model.trans_model.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(beam=16.0, max_active=256,
                                                   acoustic_scale=0.1))
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _w) in test_utts)
    D = test_utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test_utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = model.am.loglikes_np(feats)
    results = dec.decode(ll, nf)
    refs, hyps = {}, {}
    for (utt, _f, words), res in zip(test_utts, results):
        refs[utt] = words
        assert res is not None, f"{utt}: no decode result"
        hyps[utt] = [lang.words.sym(w) for w in res[0]]
    stats = compute_wer(refs, hyps)
    print(stats)
    assert stats.wer == 0.0, str(stats) + repr(hyps)


@pytest.mark.slow
def test_tdnn_hybrid_decode(yesno_system):
    """GMM alignments -> TDNN -> hybrid decode, WER 0 (the nnet2 path)."""
    from kaldi_tpu.steps.tdnn import train_tdnn
    from kaldi_tpu.nnet.train import NnetTrainOpts

    lang, model, train_utts, test_utts = yesno_system
    res = train_tdnn(
        model, train_utts,
        train_opts=NnetTrainOpts(initial_lr=0.1, final_lr=0.01,
                                 num_epochs=30, minibatch_size=64,
                                 momentum=0.9),
    )
    # frame accuracy ceiling is limited by arbitrary intra-phone state
    # boundaries; ~0.65+ is converged on this task. WER is the real check.
    assert res.history[-1][3] > 0.5, res.history[-2:]

    lm = ArpaLm.parse(YESNO_ARPA)
    g = arpa_to_g(lm, lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    packed = pack_graph(graph.fst, model.trans_model.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(beam=16.0, max_active=256,
                                                   acoustic_scale=0.1))
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _w) in test_utts)
    D = test_utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test_utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = res.am.loglikes_np(feats)
    results = dec.decode(ll, nf)
    refs, hyps = {}, {}
    for (utt, _f, words), r in zip(test_utts, results):
        refs[utt] = words
        hyps[utt] = [lang.words.sym(w) for w in r[0]] if r else []
    stats = compute_wer(refs, hyps)
    print(stats)
    assert stats.wer == 0.0, str(stats) + repr(hyps)


@pytest.mark.slow
def test_nnet3_tdnn_hybrid_decode_parity(yesno_system):
    """GMM alignments -> config-defined nnet3 TDNN (NG-SGD trainer) ->
    hybrid decode: WER 0, i.e. parity with the hand-written nnet2 TDNN
    (ref: nnet3/nnet-training.cc:37 — the nnet3-train role)."""
    from kaldi_tpu.steps.nnet3_train import train_tdnn3
    from kaldi_tpu.nnet3.training import Nnet3TrainOpts

    lang, model, train_utts, test_utts = yesno_system
    res = train_tdnn3(
        model, train_utts,
        train_opts=Nnet3TrainOpts(initial_lr=0.1, final_lr=0.01,
                                  num_epochs=30, minibatch_size=64,
                                  momentum=0.9),
    )
    assert res.history[-1][3] > 0.5, res.history[-2:]

    lm = ArpaLm.parse(YESNO_ARPA)
    g = arpa_to_g(lm, lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    packed = pack_graph(graph.fst, model.trans_model.id2pdf_array)
    dec = BeamSearchDecoder(packed, BeamSearchOpts(beam=16.0, max_active=256,
                                                   acoustic_scale=0.1))
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _w) in test_utts)
    D = test_utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test_utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = res.am.loglikes_np(feats)
    results = dec.decode(ll, nf)
    refs, hyps = {}, {}
    for (utt, _f, words), r in zip(test_utts, results):
        refs[utt] = words
        hyps[utt] = [lang.words.sym(w) for w in r[0]] if r else []
    stats = compute_wer(refs, hyps)
    print(stats)
    assert stats.wer == 0.0, str(stats) + repr(hyps)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 33, 42])
def test_yesno_seed_robustness(seed):
    """Round-1 verdict flagged corpus-seed sensitivity (seeds 0/33 used
    to produce trailing-YES insertions). Pin WER == 0 across seeds."""
    rng = np.random.RandomState(seed)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    opts = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(wave):
        f = np.asarray(mfcc(jnp.asarray(wave), opts))
        return np.asarray(add_deltas(jnp.asarray(f), order=2, window=2))

    train_utts, test_utts = [], []
    for i in range(24):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 6))]
        train_utts.append((f"tr{i}", featize(synth_utterance(ws, rng)), ws))
    for i in range(8):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 6))]
        test_utts.append((f"te{i}", featize(synth_utterance(ws, rng)), ws))
    model = train_mono(lang, train_utts, MonoTrainOpts(
        num_iters=12, totgauss=60, max_iter_inc=8,
        realign_iters=tuple(range(1, 12))))
    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    dec = BeamSearchDecoder(
        pack_graph(graph.fst, model.trans_model.id2pdf_array),
        BeamSearchOpts(beam=16.0, max_active=256, acoustic_scale=0.1))
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _w) in test_utts)
    D = test_utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test_utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    results = dec.decode(model.am.loglikes_np(feats), nf)
    refs = {u: ws for (u, _f, ws) in test_utts}
    hyps = {u: [lang.words.sym(w) for w in results[b][0]]
            for b, (u, _f, _ws) in enumerate(test_utts)}
    stats = compute_wer(refs, hyps)
    assert stats.wer == 0.0, (seed, stats, hyps)
