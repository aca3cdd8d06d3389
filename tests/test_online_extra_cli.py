"""Legacy online CLI: TCP server + client, threaded online2 decode,
online nnet2 AM forward, codec round-trip, raw fMLLR,
gmm-global-init-from-feats.

(ref: onlinebin/*.cc, online2bin/*.cc — cited in
 kaldi_tpu/cli_online_extra.py.)
"""

import os
import threading

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, write_ark
from kaldi_tpu.io.wave import read_wave


def test_gmm_global_init_from_feats(tmp_path):
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(0)
    x = np.concatenate([rng.randn(300, 4), rng.randn(300, 4) + 4.0])
    write_ark(P("f.ark"), {"u": x.astype(np.float32)})
    main(["gmm-global-init-from-feats", f"ark:{P('f.ark')}",
          P("g.npz"), "--num-gauss", "2", "--num-iters", "6"])
    from kaldi_tpu.io.model_io import load_ubm
    g = load_ubm(P("g.npz"))
    assert g.num_gauss == 2
    # the two modes are found (means near 0 and 4)
    mean_of_means = np.sort(g.means.mean(axis=1))
    assert abs(mean_of_means[0] - 0.0) < 1.0
    assert abs(mean_of_means[1] - 4.0) < 1.0


def test_compress_uncompress_speex(tmp_path):
    P = lambda n: str(tmp_path / n)
    from kaldi_tpu.io.wave import write_wave
    rng = np.random.RandomState(1)
    sr = 8000.0
    t = np.arange(int(sr)) / sr
    w = (np.sin(2 * np.pi * 440 * t) * 8000).astype(np.float32)
    write_wave(P("a.wav"), w[None], sr)
    with open(P("wav.scp"), "w") as f:
        f.write(f"a {P('a.wav')}\n")
    main(["compress-uncompress-speex", P("wav.scp"), P("out")])
    w2, sr2 = read_wave(str(tmp_path / "out" / "a.wav"))
    assert sr2 == sr and w2.shape[1] == len(w)
    # codec round trip keeps the waveform close (ADPCM ~ 4-bit SNR)
    err = np.sqrt(np.mean((w2[0] - w) ** 2)) / np.sqrt(np.mean(w ** 2))
    assert err < 0.2, err


@pytest.mark.slow
def test_online_server_client_and_threaded(tmp_path):
    from test_gmmbin_cli import _tiny_corpus
    # corpus with wavs on disk: reuse the CLI recipe synthesis path
    P = lambda n: str(tmp_path / n)
    _tiny_corpus(tmp_path, n_utts=8, seed=10)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "5", "--totgauss", "30"])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])

    # server handles one connection; client streams the first wav
    first = open(P("wav.scp")).readline().split()[0]
    with open(P("one.scp"), "w") as f:
        f.write(open(P("wav.scp")).readline())
    t = threading.Thread(target=main, args=([
        "online-server-gmm-decode-faster", P("mono.npz"), P("hclg.npz"),
        "--port-file", P("port"), "--num-connections", "1",
        "--sample-frequency", "8000", "--beam", "14"],), daemon=True)
    t.start()
    import time
    for _ in range(100):
        if os.path.exists(P("port")):
            break
        time.sleep(0.1)
    port = int(open(P("port")).read())
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["online-audio-client", "127.0.0.1", str(port),
              P("one.scp")])
    t.join(timeout=30)
    out = buf.getvalue()
    assert first in out and "FINAL" in out


@pytest.mark.slow
def test_online2_nnet2_am_and_threaded(tmp_path):
    # drive through the file-CLI yesno recipe artifacts
    main(["recipe-yesno-files", str(tmp_path / "work")])
    work = tmp_path / "work"
    test_scp = str(work / "test" / "wav.scp")
    mdl = str(work / "mono.npz")
    nnet = str(work / "tdnn.npz")
    graph = str(work / "hclg.npz")
    P = lambda n: str(tmp_path / n)

    main(["online2-wav-nnet2-am-compute", nnet, test_scp,
          f"ark:{P('act.ark')}", "--sample-frequency", "8000"])
    acts = dict(read_ark(P("act.ark")))
    assert acts and all(np.isfinite(v).all() for v in acts.values())

    main(["online2-wav-nnet2-latgen-threaded", mdl, nnet, graph,
          test_scp, "--sample-frequency", "8000",
          "--transcription-out", P("hyp.txt")])
    ref = {l.split()[0]: " ".join(l.split()[1:])
           for l in open(work / "test" / "text")}
    hyp = {l.split()[0]: " ".join(l.split()[1:])
           for l in open(P("hyp.txt"))}
    errs = sum(hyp.get(k, "") != v for k, v in ref.items())
    assert errs <= 1, (errs, hyp, ref)
