"""A harder synthetic corpus (12-word vocab, 20 tone-phones): the recipe
pyramid mono -> tied triphones -> boosted-MMI must improve (or hold) WER at
each rung — the egs/rm/s5 RESULTS-progression analogue.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.fst.lang import Lexicon, prepare_lang
from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
from kaldi_tpu.fst.graph import make_hclg
from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
from kaldi_tpu.steps.deltas import train_deltas, DeltasTrainOpts
from kaldi_tpu.steps.mmi import MmiTrainOpts, train_discriminative
from kaldi_tpu.steps.mono import MonoModel
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.dense import make_decoder
from kaldi_tpu.decoder.beam_search import BeamSearchOpts
from kaldi_tpu.utils.wer import compute_wer

SR = 8000.0

# 20 phones as distinct tones; 12 words of 2-3 phones
PHONE_FREQS = {f"P{i}": 260.0 * (1.13 ** i) for i in range(20)}
WORDS = {
    "ONE": "P0 P5", "TWO": "P1 P6", "THREE": "P2 P7 P12",
    "FOUR": "P3 P8", "FIVE": "P4 P9 P13", "SIX": "P10 P14",
    "SEVEN": "P11 P15 P0", "EIGHT": "P16 P1", "NINE": "P17 P2",
    "ZERO": "P18 P3 P8", "OH": "P19 P4", "STOP": "P5 P10 P15",
}


def synth(words, rng):
    chunks = [np.zeros(int(SR * rng.uniform(0.05, 0.1)))]
    for w in words:
        for ph in WORDS[w].split():
            dur = rng.uniform(0.09, 0.16)
            t = np.arange(int(SR * dur)) / SR
            f = PHONE_FREQS[ph] * rng.uniform(0.99, 1.01)
            env = np.minimum(1.0, np.minimum(
                np.arange(len(t)), len(t) - np.arange(len(t)))
                / (0.012 * SR))
            chunks.append(np.sin(2 * np.pi * f * t) * 2500
                          * rng.uniform(0.75, 1.0) * env)
        chunks.append(np.zeros(int(SR * rng.uniform(0.06, 0.14))))
    w = np.concatenate(chunks)
    w = w + rng.randn(len(w)) * 60.0      # noisier than the yesno corpus
    return w.astype(np.float32)


@pytest.fixture(scope="module")
def rm_system():
    rng = np.random.RandomState(17)
    lex = Lexicon.parse("\n".join(f"{w} {p}" for w, p in WORDS.items()))
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo),
                                     order=2, window=2))

    vocab = list(WORDS)
    train, test = [], []
    for i in range(42):
        ws = [vocab[rng.randint(len(vocab))]
              for _ in range(rng.randint(3, 6))]
        train.append((f"tr{i}", featize(synth(ws, rng)), ws))
    for i in range(12):
        ws = [vocab[rng.randint(len(vocab))]
              for _ in range(rng.randint(3, 6))]
        test.append((f"te{i}", featize(synth(ws, rng)), ws))

    # unigram LM over the vocab
    lines = [f"-{np.log10(len(vocab)):.4f}\t{w}" for w in vocab]
    arpa = ("\\data\\\nngram 1=%d\n\n\\1-grams:\n%s\n-99\t<s>\n-1\t</s>\n"
            "\n\\end\\\n" % (len(vocab) + 2, "\n".join(lines)))
    g = arpa_to_g(ArpaLm.parse(arpa), lang.words)
    return lang, g, train, test


def _wer(lang, g, model, test) -> float:
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    dec = make_decoder(pack_graph(graph.fst, model.trans_model.id2pdf_array),
                       BeamSearchOpts(beam=14.0, max_active=1024,
                                      acoustic_scale=0.1))
    B = len(test)
    T = max(f.shape[0] for (_u, f, _w) in test)
    D = test[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    results = dec.decode(model.am.loglikes_np(feats), nf)
    refs, hyps = {}, {}
    for b, (u, _f, ws) in enumerate(test):
        refs[u] = ws
        hyps[u] = ([lang.words.sym(w) for w in results[b][0]]
                   if results[b] else [])
    return compute_wer(refs, hyps).wer


@pytest.mark.slow
def test_recipe_pyramid(rm_system):
    lang, g, train, test = rm_system

    mono = train_mono(lang, train, MonoTrainOpts(
        num_iters=14, totgauss=140, max_iter_inc=10,
        realign_iters=tuple(range(1, 14))))
    wer_mono = _wer(lang, g, mono, test)

    tri = train_deltas(lang, train, mono, DeltasTrainOpts(
        num_iters=12, totgauss=350, max_iter_inc=8, num_leaves=120,
        realign_iters=(1, 2, 3, 4, 5, 6, 8, 10)))
    wer_tri = _wer(lang, g, tri, test)

    graph = make_hclg(lang, g, tri.trans_model, tri.ctx_dep,
                      self_loop_scale=0.1)
    sil = {lang.phones["SIL"]}
    am_mmi, hist = train_discriminative(
        tri, graph, train,
        MmiTrainOpts(num_iters=2, boost=0.1, lattice_beam=7.0,
                     max_active=1024),
        silence_phones=sil)
    mmi_model = MonoModel(am_mmi, tri.trans_model, tri.ctx_dep, lang)
    wer_mmi = _wer(lang, g, mmi_model, test)

    print(f"WER pyramid: mono {wer_mono:.2f} -> tri {wer_tri:.2f} "
          f"-> tri+bMMI {wer_mmi:.2f}")
    # Pinned numbers (PARITY.md): observed mono 9.09 / tri 9.09 /
    # tri+bMMI 6.82 on this corpus — RESULTS-file style bars with a
    # small tolerance, like the reference's egs/rm/s5/RESULTS ordering
    assert wer_tri <= wer_mono + 1e-9
    assert wer_mmi <= wer_tri + 1e-9     # bMMI must improve (or tie)
    assert wer_mono <= 12.0, wer_mono
    assert wer_tri <= 10.0, wer_tri
    assert wer_mmi <= 8.0, wer_mmi
