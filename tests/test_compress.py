"""Audio transport codecs (the OnlineSpeexWrapper role)."""

import numpy as np
import pytest

from kaldi_tpu.online.compress import (mulaw_encode, mulaw_decode,
                                       adpcm_encode, adpcm_decode,
                                       AdpcmState)


def _tone(n=2000, sr=8000.0, f=440.0, amp=8000.0):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_mulaw_roundtrip_snr():
    x = _tone()
    y = mulaw_decode(mulaw_encode(x))
    err = x - y
    snr = 10 * np.log10((x ** 2).mean() / (err ** 2).mean())
    assert snr > 30.0, snr


def test_adpcm_roundtrip_snr_and_streaming_state():
    x = _tone(4000)
    codes, _st = adpcm_encode(x)
    y, _st2 = adpcm_decode(codes)
    snr = 10 * np.log10((x ** 2).mean() / ((x - y) ** 2).mean())
    assert snr > 18.0, snr
    # chunked encode/decode with carried state == one-shot
    st_e = AdpcmState()
    parts = []
    for lo in range(0, 4000, 700):
        c, st_e = adpcm_encode(x[lo:lo + 700], st_e)
        parts.append(c)
    codes2 = np.concatenate(parts)
    np.testing.assert_array_equal(codes2, codes)
    st_d = AdpcmState()
    outs = []
    for lo in range(0, 4000, 900):
        o, st_d = adpcm_decode(codes2[lo:lo + 900], st_d)
        outs.append(o)
    np.testing.assert_allclose(np.concatenate(outs), y, atol=0)
