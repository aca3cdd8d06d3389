"""Graph-walk workload simulator: sampled paths must be decodable, the
synthesized audio must align with its pdf targets, and peaky acoustics
must produce the low-occupancy search dynamics real decoding has.

(ref: no reference analogue — Kaldi benches on real corpora; this keeps
the sandbox benchmarks honest, see kaldi_tpu/decoder/simulate.py.)
"""

import numpy as np
import pytest

from kaldi_tpu.decoder.biggraph import make_big_hclg, BigGraphConfig
from kaldi_tpu.decoder.csr_beam import CsrBeamDecoder, CsrBeamOpts
from kaldi_tpu.decoder.simulate import (make_corpus, sample_path,
                                        synth_wave, fbank_targets)


@pytest.fixture(scope="module")
def graph():
    g, _ = make_big_hclg(BigGraphConfig(vocab=300, avg_bigram_succ=20,
                                        num_pdfs=64, seed=1))
    return g


def _oracle_ll(segs, num_pdfs, peak=12.0):
    """Per-frame loglikes peaked at the aligned pdf (oracle acoustics)."""
    B, T = segs.shape
    ll = np.full((B, T, num_pdfs), -peak, np.float32)
    b = np.arange(B)[:, None]
    t = np.arange(T)[None, :]
    ll[b, t, segs] = 0.0
    return ll


def test_sampled_path_decodes_to_its_words(graph):
    """Oracle acoustics on a sampled path: beam search must recover the
    walk's own word sequence (the walk IS a graph path, and the oracle
    makes it the overwhelming acoustic winner)."""
    rng = np.random.default_rng(0)
    B, T = 3, 50
    waves, segs, words = make_corpus(graph, B, T, rng)
    ll = _oracle_ll(segs, 64) * 10.0  # acoustic_scale=0.1 undoes this
    dec = CsrBeamDecoder(graph, CsrBeamOpts(beam=10.0, max_active=512,
                                            acoustic_scale=0.1,
                                            expand_budget=8192))
    res = dec.decode(ll, np.full(B, T, np.int32))
    for b in range(B):
        got = res[b][0]
        # the utterance ends mid-word; every COMPLETE sampled word must
        # be recovered as a prefix of the hypothesis
        assert got[: len(words[b])] == words[b] or got == words[b][: len(got)]
        assert len(got) >= len(words[b]) - 1


def test_peaky_acoustics_shrink_occupancy(graph):
    """The simulator's whole point: trained-model-like (peaky) acoustics
    keep far fewer tokens alive than white noise at identical settings."""
    rng = np.random.default_rng(1)
    B, T = 2, 40
    _w, segs, _ = make_corpus(graph, B, T, rng)
    ll_peaky = _oracle_ll(segs, 64) * 10.0
    ll_noise = (np.random.RandomState(0).randn(B, T, 64) * 3) \
        .astype(np.float32)
    dec = CsrBeamDecoder(graph, CsrBeamOpts(beam=13.0, max_active=512,
                                            acoustic_scale=0.1,
                                            expand_budget=8192))
    nf = np.full(B, T, np.int32)
    dec.decode(ll_peaky, nf)
    mean_peaky = dec.last_active_sum.sum() / nf.sum()
    dec.decode(ll_noise, nf)
    mean_noise = dec.last_active_sum.sum() / nf.sum()
    assert mean_peaky < mean_noise / 2, (mean_peaky, mean_noise)


def test_synth_wave_and_targets_align(graph):
    """The two-tone code must be recoverable from fbank: frames aligned
    to the same pdf must be far more similar to each other than frames
    of different pdfs, and fbank_targets must index the right segment."""
    from kaldi_tpu.ops import FbankOpts, FrameOpts, MelOpts, fbank
    from kaldi_tpu.decoder.simulate import ToneCoder
    rng = np.random.default_rng(2)
    pdfs, _tids, _words = sample_path(graph, 60, rng)
    coder = ToneCoder(graph.pdf[graph.pdf >= 0])
    wave = synth_wave(pdfs, rng, coder, noise=0.05)
    assert wave.shape == (60 * 160,)
    opts = FbankOpts(frame_opts=FrameOpts(samp_freq=16000.0, dither=0.0),
                     mel_opts=MelOpts(num_bins=40))
    feats = np.asarray(fbank(wave[None], opts))[0]
    tgt = fbank_targets(pdfs, feats.shape[0])
    assert tgt.shape == (feats.shape[0],)
    # frames with the same target pdf cluster tighter than across pdfs
    same, diff = [], []
    for i in range(0, len(tgt) - 4, 3):
        for j in range(i + 1, min(i + 12, len(tgt))):
            d = float(np.linalg.norm(feats[i] - feats[j]))
            (same if tgt[i] == tgt[j] else diff).append(d)
    if same and diff:
        assert np.mean(same) < np.mean(diff) * 0.7
