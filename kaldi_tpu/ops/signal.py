"""Signal processing: FFT convolution, reverberation.

(ref: feat/signal.h:30-44 ConvolveSignals / FFTbasedBlockConvolveSignals,
 featbin/wav-reverberate.cc.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def convolve_signals(signal: np.ndarray, filt: np.ndarray) -> np.ndarray:
    """Full FFT-based convolution, output length = len(signal)
    (matching the reference's in-place semantics)."""
    n = len(signal) + len(filt) - 1
    nfft = 1 << (n - 1).bit_length()
    S = np.fft.rfft(np.asarray(signal, np.float64), nfft)
    F = np.fft.rfft(np.asarray(filt, np.float64), nfft)
    out = np.fft.irfft(S * F, nfft)[: len(signal)]
    return out.astype(np.float32)


def reverberate(wave: np.ndarray, rir: np.ndarray,
                snr_db: float | None = None,
                noise: np.ndarray | None = None,
                rng=None) -> np.ndarray:
    """Convolve with a room impulse response, optionally add noise at a
    target SNR (ref: featbin/wav-reverberate.cc)."""
    out = convolve_signals(wave, rir)
    # energy-normalize to the dry signal
    e_dry = float(np.mean(np.square(wave))) + 1e-10
    e_wet = float(np.mean(np.square(out))) + 1e-10
    out = out * np.sqrt(e_dry / e_wet)
    if snr_db is not None:
        rng = rng or np.random.RandomState(0)
        if noise is None:
            noise = rng.randn(len(out)).astype(np.float32)
        e_sig = float(np.mean(np.square(out))) + 1e-10
        e_noise = float(np.mean(np.square(noise))) + 1e-10
        scale = np.sqrt(e_sig / (e_noise * 10 ** (snr_db / 10.0)))
        out = out + scale * noise[: len(out)]
    return out.astype(np.float32)
