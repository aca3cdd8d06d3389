"""Resample / signal / pitch / MBR tests (oracle style)."""

import math

import numpy as np
import pytest

from kaldi_tpu.ops.resample import (LinearResample, ArbitraryResample,
                                    resample_waveform)
from kaldi_tpu.ops.signal import convolve_signals, reverberate
from kaldi_tpu.ops.pitch import (compute_kaldi_pitch, process_pitch,
                                 PitchOpts)


def test_linear_resample_sine():
    """A bandlimited sine must survive 16k->8k resampling accurately."""
    sr_in, sr_out = 16000.0, 8000.0
    t = np.arange(16000) / sr_in
    f = 440.0
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample_waveform(x, sr_in, sr_out)
    assert abs(len(y) - 8000) <= 1
    t2 = np.arange(len(y)) / sr_out
    want = np.sin(2 * np.pi * f * t2)
    # ignore filter edge effects
    sl = slice(100, -100)
    assert np.max(np.abs(y[sl] - want[sl])) < 0.01


def test_linear_resample_upsample():
    sr_in, sr_out = 8000.0, 16000.0
    t = np.arange(8000) / sr_in
    x = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)
    y = resample_waveform(x, sr_in, sr_out)
    t2 = np.arange(len(y)) / sr_out
    want = np.sin(2 * np.pi * 200.0 * t2)
    assert np.max(np.abs(y[200:-200] - want[200:-200])) < 0.01


def test_arbitrary_resample():
    sr = 1000.0
    t = np.arange(1000) / sr
    x = np.sin(2 * np.pi * 50.0 * t)
    points = np.array([0.1, 0.25, 0.333, 0.5])
    ar = ArbitraryResample(len(x), sr, 400.0, points)
    y = ar.resample(x)
    want = np.sin(2 * np.pi * 50.0 * points)
    np.testing.assert_allclose(y, want, atol=0.01)


def test_convolution_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(500).astype(np.float32)
    h = rng.randn(32).astype(np.float32)
    got = convolve_signals(x, h)
    want = np.convolve(x, h)[:500]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_reverberate_snr():
    rng = np.random.RandomState(1)
    x = rng.randn(4000).astype(np.float32) * 100
    rir = np.zeros(100, np.float32)
    rir[0] = 1.0
    rir[50] = 0.5
    out = reverberate(x, rir, snr_db=20.0, rng=rng)
    assert out.shape == x.shape
    assert np.all(np.isfinite(out))


def test_pitch_tracks_sine():
    """Pitch of a pure tone must be recovered within a few percent."""
    sr = 16000.0
    for f0 in (120.0, 220.0, 330.0):
        t = np.arange(int(sr * 0.6)) / sr
        x = (np.sin(2 * np.pi * f0 * t) * 5000).astype(np.float32)
        out = compute_kaldi_pitch(x, PitchOpts(samp_freq=sr))
        assert out.shape[0] > 30
        mid = out[10:-10]
        med = np.median(mid[:, 1])
        assert abs(med - f0) / f0 < 0.05, (f0, med)
        # voiced: nccf close to 1
        assert np.median(mid[:, 0]) > 0.7


def test_pitch_unvoiced_low_nccf():
    rng = np.random.RandomState(2)
    x = (rng.randn(8000) * 100).astype(np.float32)
    out = compute_kaldi_pitch(x, PitchOpts())
    assert np.median(out[:, 0]) < 0.5  # noise: low NCCF


def test_process_pitch_dims():
    sr = 16000.0
    t = np.arange(int(sr * 0.5)) / sr
    x = (np.sin(2 * np.pi * 150 * t) * 5000).astype(np.float32)
    raw = compute_kaldi_pitch(x, PitchOpts(samp_freq=sr))
    feats = process_pitch(raw)
    assert feats.shape == (raw.shape[0], 3)
    assert np.all(np.isfinite(feats))
    # normalized log pitch of a constant tone ~ 0
    assert abs(np.median(feats[5:-5, 1])) < 0.5


def test_mbr_decode():
    from kaldi_tpu.lat.lattice import Lattice
    from kaldi_tpu.lat.mbr import mbr_decode, word_confidences, expected_wer
    lat = Lattice()
    s = [lat.add_state() for _ in range(4)]
    lat.start = s[0]
    # dominant path: words [1, 2]; competitor [1, 3] slightly worse
    lat.add_arc(s[0], 1, 1, 0.0, 0.0, s[1])
    lat.add_arc(s[1], 2, 2, 0.0, 0.5, s[2])
    lat.add_arc(s[1], 3, 3, 0.0, 1.5, s[3])
    lat.set_final(s[2])
    lat.set_final(s[3])
    hyp, bins = mbr_decode(lat)
    assert hyp == [1, 2]
    conf = word_confidences(hyp, bins)
    assert conf[0] == pytest.approx(1.0, abs=1e-6)   # word 1 on all paths
    assert 0.5 < conf[1] < 1.0                        # word 2 vs 3
    assert expected_wer(lat, hyp) < expected_wer(lat, [1, 3])


def test_viterbi_lag_backtrace_exact():
    """Regression: the backtrace dropped frame 0's state and duplicated
    the last (path came out shifted by one frame)."""
    from kaldi_tpu.ops.pitch import _viterbi_lags
    import jax.numpy as jnp
    BIG = 100.0
    costs = np.full((3, 3), BIG, np.float64)
    costs[0, 0] = 0.0
    costs[1, 1] = 0.0
    costs[2, 2] = 0.0
    trans = np.zeros((3, 3))
    path = np.asarray(_viterbi_lags(jnp.asarray(costs), jnp.asarray(trans)))
    np.testing.assert_array_equal(path, [0, 1, 2])


def test_pov_feature_signed():
    """NccfToPovFeature is pow(1.0001-nccf,0.15)-1, signed (regression:
    abs() collapsed voiced and unvoiced; ref pitch-functions.cc:44)."""
    from kaldi_tpu.ops.pitch import process_pitch
    raw = np.array([[0.9, 200.0], [-0.9, 200.0]], np.float32)
    feats = process_pitch(raw)
    pov_scale = 2.0  # ProcessPitchOpts default
    want_voiced = pov_scale * ((1.0001 - 0.9) ** 0.15 - 1.0)
    want_unvoiced = pov_scale * ((1.0001 + 0.9) ** 0.15 - 1.0)
    assert abs(feats[0, 0] - want_voiced) < 1e-4
    assert abs(feats[1, 0] - want_unvoiced) < 1e-4
    assert feats[0, 0] != feats[1, 0]


def test_linear_resample_output_count_exact():
    """Regression: int() truncation lost one output sample for
    non-divisible lengths (ref: resample.cc GetNumOutputSamples)."""
    rs = LinearResample(16000, 8000)
    y = rs.resample(np.zeros(239, np.float64))
    assert len(y) == 120
    y = rs.resample(np.zeros(240, np.float64))
    assert len(y) == 120


def test_shifted_delta_tail_blocks_zero():
    """Regression: blocks whose offset frame falls past the end must be
    exactly 0 (every window index clamps to T-1; ref:
    feature-functions.cc ShiftedDeltaFeatures::Process)."""
    from kaldi_tpu.ops.delta import shifted_delta
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 2).astype(np.float32))
    out = np.asarray(shifted_delta(x, window=1, block_shift=3, num_blocks=3))
    D = 2
    # frame t=4, block b=1: offsets {6,7,8} all clamp to 4 -> delta 0
    np.testing.assert_allclose(out[4, D * 2: D * 3], 0.0, atol=1e-7)
    # block b=2 at t=4 likewise
    np.testing.assert_allclose(out[4, D * 3: D * 4], 0.0, atol=1e-7)
    # oracle for an in-range block: b=0 at t=2 -> 0.5*(x[3]-x[1])
    # (scales are j/sum(j^2) = [-0.5, 0, 0.5] for window=1)
    want = 0.5 * (np.asarray(x)[3] - np.asarray(x)[1])
    np.testing.assert_allclose(out[2, D: D * 2], want, atol=1e-6)
