"""Adaptation + decode-variant CLI: global fMLLR/LVTLN/MLLT, HLDA,
regtree MLLR/fMLLR estimation + adapted decoding, N-best, MAP decode,
tracking decode.

(ref: gmmbin/*.cc — cited per command in kaldi_tpu/cli_adapt.py.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, write_ark
from kaldi_tpu.io.model_io import save_ubm
from kaldi_tpu.gmm.diag_gmm import DiagGmm


def test_global_fmllr_and_mllt(tmp_path):
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(0)
    D = 4
    ubm = DiagGmm(np.array([0.5, 0.5]),
                  np.stack([np.zeros(D), np.ones(D) * 3]),
                  np.ones((2, D)))
    save_ubm(P("ubm.npz"), ubm)
    # features drawn near the model: fMLLR should stay near identity
    x = rng.randn(200, D).astype(np.float32)
    x[100:] += 3.0
    write_ark(P("f.ark"), {"u1": x[:100], "u2": x[100:]})
    with open(P("u2s"), "w") as f:
        f.write("u1 s\nu2 s\n")
    main(["gmm-est-fmllr-global", P("ubm.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('tr.ark')}", "--utt2spk", P("u2s"),
          "--min-count", "50"])
    W = dict(read_ark(P("tr.ark")))["s"]
    assert W.shape == (D, D + 1)
    assert np.abs(W[:, :D] - np.eye(D)).max() < 0.5

    # shifted features: the transform must undo most of the shift
    write_ark(P("fs.ark"), {"u1": x[:100] + 5.0, "u2": x[100:] + 5.0})
    main(["gmm-est-fmllr-global", P("ubm.npz"), f"ark:{P('fs.ark')}",
          f"ark:{P('tr2.ark')}", "--utt2spk", P("u2s"),
          "--min-count", "50"])
    W2 = dict(read_ark(P("tr2.ark")))["s"].astype(np.float64)
    shifted = (x + 5.0).astype(np.float64)
    y = shifted @ W2[:, :D].T + W2[:, D]
    ll_before = ubm.loglike(shifted).mean()
    ll_after = ubm.loglike(y).mean()
    assert ll_after > ll_before + 1.0, (ll_before, ll_after)

    main(["gmm-acc-mllt-global", P("ubm.npz"), f"ark:{P('f.ark')}",
          P("macc.npz")])
    z = np.load(P("macc.npz"))
    assert z["G"].shape == (D, D, D) and z["beta"] > 100


@pytest.mark.slow
def test_regtree_and_decode_variants(tmp_path, capsys):
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=8, seed=7)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "5", "--totgauss", "30"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    with open(P("u2s"), "w") as f:
        for line in open(P("text")):
            f.write(f"{line.split()[0]} spk\n")

    # regtree: mllr + fmllr-ali estimation, then adapted decodes
    main(["gmm-make-regtree", P("mono.npz"), P("rtree.npz"),
          "--max-leaves", "2"])
    main(["gmm-est-regtree-mllr", P("mono.npz"), P("rtree.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"),
          f"ark:{P('mllr.ark')}", "--utt2spk", P("u2s"),
          "--min-count", "50"])
    main(["gmm-est-regtree-fmllr-ali", P("mono.npz"), P("rtree.npz"),
          f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}",
          f"ark:{P('rf.ark')}", "--utt2spk", P("u2s"),
          "--min-count", "50"])
    ref = {k: " ".join(l.split()[1:]) for k, l in
           ((l.split()[0], l) for l in open(P("text")))}

    def wer_of(path):
        hyp = {}
        for line in open(path):
            toks = line.split()
            hyp[toks[0]] = " ".join(toks[1:])
        errs = sum(hyp.get(k, "") != v for k, v in ref.items())
        return errs

    # unadapted baseline on this tiny fixture (adaptation with matched
    # stats must not decode worse than this)
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--beam", "14",
          "--transcription-out", P("base.txt")])
    base_errs = wer_of(P("base.txt"))

    for cmd, trans in (("gmm-decode-faster-regtree-mllr", "mllr.ark"),
                       ("gmm-decode-faster-regtree-fmllr", "rf.ark"),
                       ("gmm-latgen-faster-regtree-fmllr", "rf.ark")):
        main([cmd, P("mono.npz"), P("rtree.npz"), P("hclg.npz"),
              f"ark:{P('feats.ark')}", P(trans),
              "--utt2spk", P("u2s"), "--beam", "14",
              "--transcription-out", P("hyp.txt")])
        assert wer_of(P("hyp.txt")) <= base_errs, cmd

    # N-best: rank-1 equals the 1-best decode
    main(["gmm-decode-nbest", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--n", "3", "--beam", "14",
          "--transcription-out", P("nbest.txt")])
    nb = {}
    for line in open(P("nbest.txt")):
        toks = line.split()
        nb[toks[0]] = " ".join(toks[1:])
    hits = sum(nb.get(f"{k}-1", "") == v for k, v in ref.items())
    assert hits >= len(ref) - base_errs

    # MAP decode: adapt to the single speaker, decode stays correct
    main(["gmm-adapt-map", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("post.txt"), P("mapdir"), "--utt2spk", P("u2s")])
    main(["gmm-latgen-map", P("mono.npz"), P("mapdir"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--utt2spk", P("u2s"),
          "--beam", "14", "--transcription-out", P("maphyp.txt")])
    assert wer_of(P("maphyp.txt")) <= base_errs

    # tracking: first pass lattices -> arc graphs -> tracked decode
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--beam", "14",
          "--lattice-out", P("lat.ark"),
          "--transcription-out", P("pass1.txt")])
    main(["lattice-arcgraph", P("lat.ark"), P("arcs.fsts")])
    main(["gmm-latgen-tracking", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('arcs.fsts')}", "--beam", "14",
          "--transcription-out", P("track.txt")])
    assert wer_of(P("track.txt")) <= base_errs

    # HLDA: stats + transform estimation
    main(["gmm-acc-hlda", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("hacc.npz")])
    D = next(iter(read_ark(P("feats.ark"))))[1].shape[1]
    main(["gmm-est-hlda", P("hlda.ark"), P("hacc.npz"),
          "--keep-dims", str(D - 2)])
    A = dict(read_ark(P("hlda.ark")))["hlda"]
    assert A.shape == (D - 2, D)

    # basis-fmllr accs file
    main(["gmm-basis-fmllr-accs", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("post.txt"), P("bacc.npz"), "--utt2spk", P("u2s")])
    z = np.load(P("bacc.npz"))
    n = D * (D + 1)
    assert z["grad_scatter"].shape == (n, n)

    # get-full-lda-mat: identity blocks compose correctly
    write_ark(P("ldam.ark"), {"m": np.eye(D - 2, D).astype(np.float32)})
    write_ark(P("fullm.ark"), {"m": np.eye(D).astype(np.float32)})
    main(["get-full-lda-mat", P("ldam.ark"), P("fullm.ark"),
          P("fullout.ark"), P("invout.ark")])
    F = dict(read_ark(P("fullout.ark")))["full_lda_mllt"]
    np.testing.assert_allclose(F, np.eye(D), atol=1e-6)
