"""online2-wav-gmm-latgen-faster CLI (streaming GMM decode with carried
per-speaker adaptation state) and small featbin utilities.

(ref: online2bin/online2-wav-gmm-latgen-faster.cc;
 featbin/{feat-to-dim,feat-to-len,shift-feats,wav-to-duration,wav-copy,
 modify-cmvn-stats}.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, open_rspecifier

from test_gmmbin_cli import _tiny_corpus


@pytest.mark.slow
def test_online2_wav_gmm_latgen_faster(tmp_path):
    _tiny_corpus(tmp_path, n_utts=20, seed=6)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    utts = sorted(l.split()[0] for l in open(P("text")))
    with open(P("utt2spk"), "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 2}\n")
    main(["online2-wav-gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          P("wav.scp"), "--transcription-out", P("hyp.txt"),
          "--utt2spk", P("utt2spk"), "--sample-frequency", "8000",
          "--adaptation-delay", "2.0", "--fmllr-min-count", "300"])
    try:
        main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)


def test_featbin_utilities(tmp_path, capsys):
    _tiny_corpus(tmp_path, n_utts=4, seed=7)
    P = lambda n: str(tmp_path / n)
    capsys.readouterr()
    main(["feat-to-dim", f"ark:{P('feats.ark')}"])
    assert capsys.readouterr().out.strip() == "39"
    feats = dict(open_rspecifier(f"ark:{P('feats.ark')}"))
    main(["feat-to-len", f"ark:{P('feats.ark')}"])
    lens = dict(l.split() for l in
                capsys.readouterr().out.strip().splitlines())
    assert all(int(lens[k]) == v.shape[0] for k, v in feats.items())

    main(["shift-feats", f"ark:{P('feats.ark')}",
          f"ark:{P('shifted.ark')}", "--shift", "2"])
    sh = dict(read_ark(P("shifted.ark")))
    k0 = sorted(feats)[0]
    np.testing.assert_allclose(sh[k0][2:], feats[k0][:-2], rtol=1e-6)
    np.testing.assert_allclose(sh[k0][0], feats[k0][0], rtol=1e-6)

    main(["wav-to-duration", P("wav.scp")])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 4
    assert all(0.2 < float(l.split()[1]) < 20.0 for l in out)

    wav0 = open(P("wav.scp")).readline().split()[1]
    main(["wav-copy", wav0, P("copy.wav")])
    from kaldi_tpu.io.wave import read_wave
    a, sra = read_wave(wav0)
    b, srb = read_wave(P("copy.wav"))
    assert sra == srb
    np.testing.assert_array_equal(a, b)

    main(["compute-cmvn-stats", f"ark:{P('feats.ark')}",
          f"ark:{P('cmvn.ark')}"])
    main(["modify-cmvn-stats", f"ark:{P('cmvn.ark')}",
          f"ark:{P('cmvn_novar.ark')}"])
    for _k, st in open_rspecifier(f"ark:{P('cmvn_novar.ark')}"):
        cnt = st[0, -1]
        mean = st[0, :-1] / cnt
        var = st[1, :-1] / cnt - mean ** 2
        np.testing.assert_allclose(var, 1.0, atol=1e-3)
