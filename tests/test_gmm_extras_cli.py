"""GMM adaptation/discriminative extras CLI: LVTLN, regtree fMLLR,
stats algebra (acc-stats2 / ismooth / scale), MAP speaker models,
lattice rescoring, big-LM decoding.

(ref: gmmbin/{gmm-init-lvtln,gmm-train-lvtln-special,
 gmm-est-lvtln-trans,gmm-acc-stats2,gmm-ismooth-stats,gmm-scale-accs,
 gmm-rescore-lattice,gmm-latgen-biglm-faster,gmm-adapt-map,
 gmm-make-regtree,gmm-est-regtree-fmllr}.cc.)
"""

import os

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, read_ark, open_rspecifier
from kaldi_tpu.io.model_io import load_gmm_system, load_gmm_accs

from test_gmmbin_cli import _tiny_corpus

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gmmx")
    _tiny_corpus(tmp, n_utts=12, seed=10)
    P = lambda n: str(tmp / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    utts = sorted(l.split()[0] for l in open(P("text")))
    with open(P("utt2spk"), "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 2}\n")
    return tmp


def test_lvtln_cli(system, capsys):
    P = lambda n: str(system / n)
    main(["gmm-init-lvtln", P("lvtln0.npz"), "--dim", "39",
          "--warps", "0.9:1.0:1.1"])
    # train the 0.9 class on a synthetic linear warp of the features
    feats = dict(open_rspecifier(f"ark:{P('feats.ark')}"))
    A = np.eye(39) * 1.05
    warped = {k: (v @ A.T).astype(np.float32) for k, v in feats.items()}
    write_ark(P("warped.ark"), warped)
    main(["gmm-train-lvtln-special", "0", P("lvtln0.npz"),
          f"ark:{P('feats.ark')}", f"ark:{P('warped.ark')}",
          P("lvtln.npz")])
    z = np.load(P("lvtln.npz"))
    np.testing.assert_allclose(z["A"][0], A, atol=1e-3)
    np.testing.assert_allclose(z["A"][1], np.eye(39), atol=1e-8)
    main(["gmm-est-lvtln-trans", P("mono.npz"), P("lvtln.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"),
          f"ark:{P('lv_trans.ark')}", "--utt2spk", P("utt2spk")])
    trans = dict(read_ark(P("lv_trans.ark")))
    assert sorted(trans) == ["spk0", "spk1"]
    for W in trans.values():
        assert W.shape == (39, 40)


def test_stats_algebra(system):
    P = lambda n: str(system / n)
    main(["gmm-acc-stats-ali", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("acc.npz")])
    main(["gmm-scale-accs", "0.5", P("acc.npz"), P("acc_half.npz")])
    a, _ = load_gmm_accs(P("acc.npz"))
    h, _ = load_gmm_accs(P("acc_half.npz"))
    np.testing.assert_allclose(h.accs[0].occ, 0.5 * a.accs[0].occ,
                               rtol=1e-6)
    main(["gmm-ismooth-stats", P("mono.npz"), P("acc.npz"),
          P("acc_sm.npz"), "--tau", "10"])
    s, _ = load_gmm_accs(P("acc_sm.npz"))
    np.testing.assert_allclose(s.accs[0].occ, a.accs[0].occ + 10.0,
                               rtol=1e-6)
    # acc-stats2 on +1/-0.5 signed posteriors splits num/den
    post_lines = open(P("post.txt")).read().splitlines()
    # craft: scale to -0.5 for den-style entries of the 2nd half utts
    from kaldi_tpu.hmm.posterior import read_post_ark, write_post_line
    with open(P("signed.txt"), "w") as f:
        for i, (utt, post) in enumerate(read_post_ark(P("post.txt"))):
            sign = 1.0 if i % 2 == 0 else -0.5
            write_post_line(f, utt,
                            [[(t, w * sign) for (t, w) in fr]
                             for fr in post])
    main(["gmm-acc-stats2", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("signed.txt"), P("num.accs"), P("den.accs")])
    num, _ = load_gmm_accs(P("num.accs"))
    den, _ = load_gmm_accs(P("den.accs"))
    tot_num = sum(x.occ.sum() for x in num.accs)
    tot_den = sum(x.occ.sum() for x in den.accs)
    assert tot_num > 0 and tot_den > 0
    total_frames = sum(v.shape[0] for v in
                       dict(open_rspecifier(f"ark:{P('feats.ark')}"))
                       .values())
    assert abs(tot_num + 2 * tot_den - total_frames) < 1e-3


def test_map_rescore_regtree(system):
    P = lambda n: str(system / n)
    main(["gmm-adapt-map", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("post.txt"), P("mapdir"), "--utt2spk", P("utt2spk"),
          "--mean-tau", "5"])
    assert sorted(os.listdir(P("mapdir"))) == ["spk0.npz", "spk1.npz"]
    m0 = load_gmm_system(P("mapdir") + "/spk0.npz")
    base = load_gmm_system(P("mono.npz"))
    assert any(not np.allclose(a.means, b.means)
               for a, b in zip(m0.am.pdfs, base.am.pdfs))

    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--lattice-out", P("lat.ark"),
          "--beam", "14"])
    # rescoring with the SAME model at the decode scale is an identity
    # on best paths
    main(["gmm-rescore-lattice", P("mono.npz"), P("lat.ark"),
          f"ark:{P('feats.ark')}", P("relat.ark"),
          "--acoustic-scale", "0.1"])
    main(["lattice-equivalent", P("lat.ark"), P("relat.ark"),
          "--delta", "0.1"])

    main(["gmm-make-regtree", P("mono.npz"), P("regtree.npz"),
          "--max-leaves", "4"])
    main(["gmm-est-regtree-fmllr", P("mono.npz"), P("regtree.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"),
          f"ark:{P('rt.ark')}", "--utt2spk", P("utt2spk"),
          "--min-count", "100"])
    rt = dict(read_ark(P("rt.ark")))
    assert sorted(rt) == ["spk0", "spk1"]
    for W in rt.values():
        assert W.shape[1] == 40 and W.shape[0] % 39 == 0


def test_biglm_decode_cli(system):
    """Decoding under a biased big LM via the graph's small LM: the
    rescored decode prefers what the big LM prefers."""
    P = lambda n: str(system / n)
    model = load_gmm_system(P("mono.npz"))
    model.lang.words.write(P("words.txt"))
    backoff = model.lang.words.get("#0")
    main(["arpa2fst", P("lm.arpa"), P("words.txt"), P("g.txt")])
    main(["arpa-to-const-arpa", P("words.txt"), P("lm.arpa"),
          P("biglm.npz")])
    main(["gmm-latgen-biglm-faster", P("mono.npz"), P("hclg.npz"),
          P("g.txt"), P("biglm.npz"), f"ark:{P('feats.ark')}",
          "--backoff-symbol", str(backoff),
          "--transcription-out", P("hyp_big.txt"), "--beam", "14"])
    # same LM swapped in == plain decode of the same corpus
    main(["decode-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp.txt")])
    big = {l.split()[0]: l.split()[1:] for l in open(P("hyp_big.txt"))}
    plain = {l.split()[0]: l.split()[1:] for l in open(P("hyp.txt"))}
    agree = sum(big[k] == plain[k] for k in big)
    assert agree >= len(big) - 1   # identical up to rare tie-breaks
