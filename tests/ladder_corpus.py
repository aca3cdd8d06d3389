"""A synthetic corpus hard enough to separate the recipe ladder.

The yesno/rm-like corpora saturate (every system near-ties); this one
builds in the two physical effects the ladder's upgrades exist to model
(ref: egs/rm/s5/RESULTS:6-20 — mono 8.74 > tri2b 2.98 > +bMMI 2.74):

  * COARTICULATION: each phone is a tone whose frequency GLIDES from
    the previous phone's target into its own and onward toward the next
    phone's target — so a phone's acoustics depend on its neighbors,
    which monophone models average over and context-dependent
    (triphone) models capture.
  * SPEAKER VARIATION: each speaker has a fixed multiplicative warp of
    all frequencies (the vocal-tract-length analogue) plus an amplitude
    tilt — what fMLLR/SAT normalizes.
  * NOISE + duration variance keep frame classification imperfect.

Words are 2-4 phone sequences over a 30-phone set; several hundred
words so word identity is genuinely ambiguous under acoustic error.
"""

from __future__ import annotations

import numpy as np

SR = 8000.0


def make_vocab(rng, n_words=240, n_phones=30):
    """-> (lexicon text, word list). Each word 2-4 phones."""
    words = [f"W{k:03d}" for k in range(n_words)]
    lines = []
    for w in words:
        L = int(rng.randint(2, 5))
        seq = " ".join(f"P{rng.randint(n_phones)}" for _ in range(L))
        lines.append(f"{w} {seq}")
    return "\n".join(lines), words


def phone_freqs(n_phones=30):
    """Mel-spaced tone targets over 300-3400 Hz."""
    mel = lambda f: 1127.0 * np.log1p(f / 700.0)          # noqa: E731
    imel = lambda m: 700.0 * np.expm1(m / 1127.0)         # noqa: E731
    return imel(np.linspace(mel(300.0), mel(3400.0), n_phones))


def synth_utt(word_seq, lexicon: dict, freqs, rng, warp=1.0,
              noise=110.0, coart=0.45, amp_tilt=0.0):
    """Coarticulated tone synthesis.

    Each phone's instantaneous frequency is a raised-cosine glide from
    the boundary frequency (midpoint with the previous phone's target)
    through its own target to the next boundary — `coart` controls how
    much of the phone is transition (0 = the old steady tones).
    """
    phones = []
    for w in word_seq:
        phones.extend(lexicon[w])
    targets = np.array([freqs[p] for p in phones]) * warp
    sil = int(SR * rng.uniform(0.05, 0.1))
    segs = [np.zeros(sil)]
    n = len(targets)
    for i, f0 in enumerate(targets):
        dur = int(SR * rng.uniform(0.07, 0.14))
        prev_f = targets[i - 1] if i > 0 else f0
        next_f = targets[i + 1] if i + 1 < n else f0
        t = np.arange(dur) / dur
        # piecewise raised-cosine: in-glide, steady, out-glide
        a = coart / 2
        f_in = 0.5 * (prev_f + f0)
        f_out = 0.5 * (next_f + f0)
        freq = np.where(
            t < a, f_in + (f0 - f_in) * 0.5 * (1 - np.cos(np.pi * t / a)),
            np.where(t > 1 - a,
                     f0 + (f_out - f0) * 0.5 *
                     (1 - np.cos(np.pi * (t - (1 - a)) / a)),
                     f0))
        ph = np.cumsum(2 * np.pi * freq / SR)
        amp = 2200.0 * (1.0 + amp_tilt * (f0 / 3400.0 - 0.5))
        env = np.minimum(1.0, np.minimum(np.arange(dur), dur -
                                         np.arange(dur)) / (0.010 * SR))
        segs.append(np.sin(ph) * amp * env * rng.uniform(0.8, 1.0))
    segs.append(np.zeros(int(SR * rng.uniform(0.05, 0.1))))
    w = np.concatenate(segs)
    return (w + rng.randn(len(w)) * noise).astype(np.float32)


def build_corpus(rng, n_words=240, n_phones=30, speakers=5,
                 train_per_spk=14, test_per_spk=4, words_per_utt=(4, 8),
                 noise=110.0, coart=0.45):
    """-> dict with lexicon text, train/test lists of
    (utt_id, wave, words, spk)."""
    lex_text, words = make_vocab(rng, n_words, n_phones)
    lexicon = {}
    for line in lex_text.splitlines():
        parts = line.split()
        lexicon[parts[0]] = [int(p[1:]) for p in parts[1:]]
    freqs = phone_freqs(n_phones)
    warps = {f"s{k}": rng.uniform(0.88, 1.12) for k in range(speakers)}
    tilts = {f"s{k}": rng.uniform(-0.5, 0.5) for k in range(speakers)}

    def gen(spk, n, tag):
        out = []
        for i in range(n):
            ws = [words[rng.randint(n_words)]
                  for _ in range(rng.randint(*words_per_utt))]
            wav = synth_utt(ws, lexicon, freqs, rng, warp=warps[spk],
                            noise=noise, coart=coart,
                            amp_tilt=tilts[spk])
            out.append((f"{tag}_{spk}_{i}", wav, ws, spk))
        return out

    train, test = [], []
    for spk in warps:
        train.extend(gen(spk, train_per_spk, "tr"))
        test.extend(gen(spk, test_per_spk, "te"))
    return dict(lex_text=lex_text, words=words, train=train, test=test)
