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


def test_compressed_write_matches_in_memory_class():
    """write_ark(compress=True) and CompressedMatrix.compress must
    quantize identically (regression: two divergent implementations)."""
    import io as _io
    import numpy as np
    from kaldi_tpu.io.kaldi_io import write_ark, read_ark
    from kaldi_tpu.io.compressed import CompressedMatrix
    rng = np.random.RandomState(7)
    for rows in (1, 2, 3, 4, 5, 6, 7, 50):
        m = rng.randn(rows, 5).astype(np.float32)
        buf = _io.BytesIO()
        write_ark(buf, [("k", m)], compress=True)
        buf.seek(0)
        (_k, via_ark), = list(read_ark(buf))
        via_cls = CompressedMatrix.compress(m).decompress()
        np.testing.assert_allclose(via_ark, via_cls, atol=1e-6)


def test_compress_empty_matrix_raises():
    import io as _io
    import numpy as np
    import pytest
    from kaldi_tpu.io.kaldi_io import write_ark
    buf = _io.BytesIO()
    with pytest.raises(ValueError):
        write_ark(buf, [("k", np.zeros((0, 4), np.float32))], compress=True)


def test_compress_zero_cols_roundtrip():
    import io as _io
    import numpy as np
    from kaldi_tpu.io.kaldi_io import write_ark, read_ark
    from kaldi_tpu.io.compressed import CompressedMatrix
    m = np.zeros((3, 0), np.float32)
    buf = _io.BytesIO()
    write_ark(buf, [("k", m)], compress=True)
    buf.seek(0)
    (_k, back), = list(read_ark(buf))
    assert back.shape == (3, 0)
    assert CompressedMatrix.compress(m).decompress().shape == (3, 0)


def test_in_memory_and_ark_decoders_bit_identical():
    import io as _io
    import numpy as np
    from kaldi_tpu.io.kaldi_io import write_ark, read_ark
    from kaldi_tpu.io.compressed import CompressedMatrix
    rng = np.random.RandomState(3)
    m = rng.randn(40, 7).astype(np.float32)
    buf = _io.BytesIO()
    write_ark(buf, [("k", m)], compress=True)
    buf.seek(0)
    (_k, via_ark), = list(read_ark(buf))
    via_cls = CompressedMatrix.compress(m).decompress()
    np.testing.assert_array_equal(via_ark, via_cls)  # bit-identical
