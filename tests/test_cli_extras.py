"""Extra CLI subcommands: reverberate, VAD, EER, feat selection, segments."""

import os

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.wave import write_wave, read_wave
from kaldi_tpu.io.kaldi_io import write_ark, read_ark


def test_wav_reverberate(tmp_path):
    rng = np.random.RandomState(0)
    wav = rng.randn(4000).astype(np.float32) * 1000
    rir = np.zeros(100, np.float32)
    rir[0], rir[50] = 1.0, 0.5
    write_wave(str(tmp_path / "in.wav"), wav, 8000.0)
    write_wave(str(tmp_path / "rir.wav"), rir * 32767, 8000.0)
    main(["wav-reverberate", str(tmp_path / "in.wav"),
          str(tmp_path / "rir.wav"), str(tmp_path / "out.wav")])
    out, sr = read_wave(str(tmp_path / "out.wav"))
    assert sr == 8000.0 and out.shape[1] >= 4000


def test_vad_and_select_voiced(tmp_path):
    rng = np.random.RandomState(1)
    # C0-like energy in col 0: first half silent, second half voiced
    f = rng.randn(100, 5).astype(np.float32)
    f[:50, 0] = 0.0
    f[50:, 0] = 20.0
    write_ark(str(tmp_path / "f.ark"), {"u1": f})
    main(["compute-vad", f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/v.ark"])
    vad = dict(read_ark(str(tmp_path / "v.ark")))["u1"]
    assert vad[60] == 1.0 and vad[10] == 0.0
    main(["select-voiced-frames", f"ark:{tmp_path}/f.ark",
          f"ark:{tmp_path}/v.ark", f"ark:{tmp_path}/sel.ark"])
    sel = dict(read_ark(str(tmp_path / "sel.ark")))["u1"]
    assert sel.shape[0] == int(vad.sum())


def test_compute_eer_cli(tmp_path, capsys):
    lines = [f"{s} target" for s in (2.0, 1.5, 1.2)] + \
            [f"{s} nontarget" for s in (0.1, 0.4, 1.3)]
    (tmp_path / "scores").write_text("\n".join(lines) + "\n")
    main(["compute-eer", str(tmp_path / "scores")])
    out = capsys.readouterr().out
    assert "EER 16.6667%" in out


def test_feat_selection(tmp_path):
    rng = np.random.RandomState(2)
    f = rng.randn(20, 10).astype(np.float32)
    write_ark(str(tmp_path / "f.ark"), {"u": f})
    main(["subsample-feats", f"ark:{tmp_path}/f.ark",
          f"ark:{tmp_path}/sub.ark", "--n=2"])
    assert dict(read_ark(str(tmp_path / "sub.ark")))["u"].shape[0] == 10
    main(["select-feats", "0-2,5", f"ark:{tmp_path}/f.ark",
          f"ark:{tmp_path}/selc.ark"])
    got = dict(read_ark(str(tmp_path / "selc.ark")))["u"]
    np.testing.assert_allclose(got, f[:, [0, 1, 2, 5]], atol=1e-6)


def test_extract_segments(tmp_path, capsys):
    wav = np.arange(8000, dtype=np.float32)
    write_wave(str(tmp_path / "rec.wav"), wav, 8000.0)
    (tmp_path / "wav.scp").write_text(f"rec1 {tmp_path}/rec.wav\n")
    (tmp_path / "segments").write_text(
        "u1 rec1 0.1 0.3\nu2 rec1 0.5 0.9\n")
    main(["extract-segments", str(tmp_path / "wav.scp"),
          str(tmp_path / "segments"), str(tmp_path / "segs")])
    w1, sr = read_wave(str(tmp_path / "segs" / "u1.wav"))
    assert w1.shape[1] == int(0.2 * 8000)
    w2, _ = read_wave(str(tmp_path / "segs" / "u2.wav"))
    assert w2.shape[1] == int(0.4 * 8000)
