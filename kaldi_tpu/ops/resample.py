"""Sample-rate conversion with windowed-sinc filters.

(ref: feat/resample.h:95 LinearResample (rational-ratio streaming-capable),
 :147 ArbitraryResample.) The polyphase filter bank is a host-built
constant; applying it is a gather + matmul, so batched resampling runs as
one tensor program.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp


def _hanning_sinc(t, cutoff, window_width):
    """Windowed sinc at offsets t (seconds), lowpass `cutoff` Hz."""
    t = np.asarray(t, np.float64)
    win = np.where(
        np.abs(t) < window_width,
        0.5 * (1 + np.cos(math.pi * t / window_width)),
        0.0,
    )
    sinc = np.where(t == 0.0, 2 * cutoff,
                    np.sin(2 * math.pi * cutoff * np.where(t == 0, 1.0, t))
                    / (math.pi * np.where(t == 0, 1.0, t)))
    return win * sinc


class LinearResample:
    """Rational-ratio resampler (ref: resample.h:95)."""

    def __init__(self, samp_rate_in: float, samp_rate_out: float,
                 filter_cutoff: float | None = None,
                 num_zeros: int = 6):
        self.rate_in = float(samp_rate_in)
        self.rate_out = float(samp_rate_out)
        if filter_cutoff is None:
            filter_cutoff = 0.99 * 0.5 * min(samp_rate_in, samp_rate_out)
        self.cutoff = filter_cutoff
        g = math.gcd(int(samp_rate_in), int(samp_rate_out))
        self.in_step = int(samp_rate_in) // g    # input samples per block
        self.out_step = int(samp_rate_out) // g  # output samples per block
        window_width = num_zeros / (2.0 * filter_cutoff)
        self.half_width = int(math.ceil(window_width * samp_rate_in))
        # per-phase filters: output sample k (mod out_step) sits at input
        # time (k * rate_in / rate_out)
        filt = np.zeros((self.out_step, 2 * self.half_width + 1))
        self.first_index = np.zeros(self.out_step, np.int64)
        for phase in range(self.out_step):
            t_out = phase / self.rate_out
            center = t_out * self.rate_in  # in input samples
            c0 = int(math.floor(center)) - self.half_width
            self.first_index[phase] = c0
            idx = np.arange(2 * self.half_width + 1) + c0
            t = idx / self.rate_in - t_out
            filt[phase] = _hanning_sinc(t, self.cutoff, window_width) \
                / self.rate_in
        self.filters = filt

    def resample(self, wave: np.ndarray) -> np.ndarray:
        """[S] or [B, S] -> resampled."""
        wave = np.asarray(wave, np.float64)
        single = wave.ndim == 1
        if single:
            wave = wave[None]
        B, S = wave.shape
        # number of output samples with t_k = k/rate_out strictly inside
        # [0, S/rate_in): exact integer arithmetic, equivalent to the
        # tick-based count in GetNumOutputSamples(flush=true)
        # (ref: resample.cc:58-101) — plain int() truncation is one short
        # for non-divisible lengths (e.g. S=239 at 16k->8k: 120, not 119)
        prod = S * int(round(self.rate_out))
        den = int(round(self.rate_in))
        n_out = prod // den + (1 if prod % den else 0)
        pad = self.half_width + self.in_step + 1
        padded = np.pad(wave, ((0, 0), (pad, pad)))
        out = np.zeros((B, n_out))
        L = self.filters.shape[1]
        for phase in range(self.out_step):
            ks = np.arange(phase, n_out, self.out_step)
            if len(ks) == 0:
                continue
            blocks = ks // self.out_step
            starts = blocks * self.in_step + self.first_index[phase] + pad
            gather = padded[:, starts[:, None] + np.arange(L)[None, :]]
            out[:, ks] = gather @ self.filters[phase]
        out = out.astype(np.float32)
        return out[0] if single else out


class ArbitraryResample:
    """Evaluate the signal at arbitrary time points (ref: resample.h:147)."""

    def __init__(self, num_samples_in: int, samp_rate_in: float,
                 filter_cutoff: float, sample_points: np.ndarray,
                 num_zeros: int = 6):
        self.rate_in = samp_rate_in
        window_width = num_zeros / (2.0 * filter_cutoff)
        half = int(math.ceil(window_width * samp_rate_in))
        self.indices = []
        self.weights = []
        for t in np.asarray(sample_points, np.float64):
            center = t * samp_rate_in
            c0 = int(math.floor(center)) - half
            idx = np.arange(2 * half + 1) + c0
            tt = idx / samp_rate_in - t
            w = _hanning_sinc(tt, filter_cutoff, window_width) / samp_rate_in
            ok = (idx >= 0) & (idx < num_samples_in)
            self.indices.append(np.where(ok, idx, 0))
            self.weights.append(np.where(ok, w, 0.0))
        self.indices = np.stack(self.indices)
        self.weights = np.stack(self.weights)

    def resample(self, wave: np.ndarray) -> np.ndarray:
        wave = np.asarray(wave, np.float64)
        single = wave.ndim == 1
        if single:
            wave = wave[None]
        out = np.einsum("bnl,nl->bn", wave[:, self.indices], self.weights)
        out = out.astype(np.float32)
        return out[0] if single else out


def resample_waveform(wave, rate_in: float, rate_out: float) -> np.ndarray:
    return LinearResample(rate_in, rate_out).resample(wave)
