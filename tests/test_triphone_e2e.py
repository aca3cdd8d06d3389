"""Triphone (train_deltas-style) end-to-end: tree building + tied-state GMM
training on a synthetic corpus whose words share phones, then HCLG decode.

(mirrors egs/rm/s5's mono -> tri pipeline at miniature scale)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.fst.lang import Lexicon, prepare_lang
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.graph import make_hclg, TrainingGraphCompiler
from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
from kaldi_tpu.steps.deltas import train_deltas, DeltasTrainOpts
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.beam_search import BeamSearchDecoder, BeamSearchOpts
from kaldi_tpu.utils.wer import compute_wer

SR = 8000.0
# three tone "phones" shared across words -> real triphone contexts
PHONE_FREQS = {"A": 400.0, "B": 900.0, "C": 1800.0}
LEXICON = "AB A B\nAC A C\nBC B C\nCA C A"
WORDS = ["AB", "AC", "BC", "CA"]

ARPA = """
\\data\\
ngram 1=6

\\1-grams:
-1\tAB
-1\tAC
-1\tBC
-1\tCA
-99\t<s>
-1\t</s>

\\end\\
"""


def synth(words, rng):
    chunks = [np.zeros(int(SR * rng.uniform(0.08, 0.12)))]
    for w in words:
        for ph in w:  # one char per phone
            dur = rng.uniform(0.12, 0.2)
            t = np.arange(int(SR * dur)) / SR
            f = PHONE_FREQS[ph] * rng.uniform(0.98, 1.02)
            tone = np.sin(2 * np.pi * f * t) * 3000 * rng.uniform(0.7, 1.0)
            env = np.minimum(1.0, np.minimum(
                np.arange(len(t)), len(t) - np.arange(len(t))) / (0.015 * SR))
            chunks.append(tone * env)
        chunks.append(np.zeros(int(SR * rng.uniform(0.08, 0.15))))
    wave = np.concatenate(chunks)
    wave += rng.randn(len(wave)) * 20.0
    return wave.astype(np.float32)


@pytest.fixture(scope="module")
def tri_system():
    rng = np.random.RandomState(11)
    lex = Lexicon.parse(LEXICON)
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    opts = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(wave):
        f = np.asarray(mfcc(jnp.asarray(wave), opts))
        return np.asarray(add_deltas(jnp.asarray(f), order=2, window=2))

    def corpus(n, prefix):
        out = []
        for i in range(n):
            words = [WORDS[rng.randint(len(WORDS))]
                     for _ in range(rng.randint(2, 5))]
            out.append((f"{prefix}_{i}", featize(synth(words, rng)), words))
        return out

    train_utts = corpus(30, "train")
    test_utts = corpus(8, "test")
    mono = train_mono(lang, train_utts,
                      MonoTrainOpts(num_iters=10, totgauss=40, max_iter_inc=6,
                                    realign_iters=tuple(range(1, 10))))
    tri = train_deltas(lang, train_utts, mono,
                       DeltasTrainOpts(num_iters=15, totgauss=100,
                                       max_iter_inc=10, num_leaves=25,
                                       tree_thresh=20.0,
                                       realign_iters=(2, 4, 6, 8, 10, 12)))
    return lang, mono, tri, train_utts, test_utts


@pytest.mark.slow
def test_tree_has_context_dependence(tri_system):
    lang, mono, tri, train_utts, _ = tri_system
    assert tri.ctx_dep.context_width == 3
    assert tri.am.num_pdfs >= mono.am.num_pdfs  # more leaves than mono pdfs


def test_triphone_training_graph(tri_system):
    lang, _mono, tri, _tr, _te = tri_system
    compiler = TrainingGraphCompiler(lang, tri.trans_model, tri.ctx_dep)
    g = compiler.compile_transcript(["AB", "CA"])
    il, ol, cost = g.shortest_path()
    words = [lang.words.sym(o) for o in ol]
    assert words == ["AB", "CA"]
    phones = []
    for tid in il:
        ph = lang.phones.sym(tri.trans_model.transition_id_to_phone(tid))
        if not phones or phones[-1] != ph:
            phones.append(ph)
    assert [p for p in phones if p != "SIL"] == ["A", "B", "C", "A"]


@pytest.mark.slow
def test_triphone_decode_wer(tri_system):
    lang, _mono, tri, _tr, test_utts = tri_system
    g = arpa_to_g(ArpaLm.parse(ARPA), lang.words)
    graph = make_hclg(lang, g, tri.trans_model, tri.ctx_dep,
                      self_loop_scale=0.1)
    packed = pack_graph(graph.fst, tri.trans_model.id2pdf_array)
    # synthetic pure tones have extreme likelihood contrasts; a beam that
    # is generous in kaldi terms (16) prunes the Viterbi path here
    dec = BeamSearchDecoder(packed, BeamSearchOpts(beam=200.0, max_active=512,
                                                   acoustic_scale=0.1))
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _w) in test_utts)
    D = test_utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test_utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = tri.am.loglikes_np(feats)
    results = dec.decode(ll, nf)
    refs, hyps = {}, {}
    for (utt, _f, words), r in zip(test_utts, results):
        refs[utt] = words
        hyps[utt] = [lang.words.sym(w) for w in r[0]] if r else []
    stats = compute_wer(refs, hyps)
    print(stats)
    assert stats.wer == 0.0, str(stats) + repr(hyps)
