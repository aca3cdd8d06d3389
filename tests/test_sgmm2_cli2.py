"""sgmm2 primitive-command layer: gselect, sharded EM stats + sum + est,
EBW discriminative update, SGMM alignment, speaker vectors — the
steps/train_sgmm2.sh / train_mmi_sgmm2.sh file protocol in primitives.

(ref: sgmm2bin/{sgmm2-gselect,sgmm2-acc-stats,sgmm2-sum-accs,sgmm2-est,
 sgmm2-est-ebw,sgmm2-align-compiled,sgmm2-est-spkvecs}.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, open_rspecifier
from kaldi_tpu.io.model_io import load_sgmm2, load_sgmm2_accs

from test_gmmbin_cli import _tiny_corpus


@pytest.mark.slow
def test_sgmm2_primitives(tmp_path, capsys):
    _tiny_corpus(tmp_path, n_utts=12, seed=2)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "6", "--totgauss", "40"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    main(["train-sgmm2", P("mono.npz"), P("text"),
          f"ark:{P('feats.ark')}", P("sgmm.npz"),
          "--num-iters", "4", "--ubm-gauss", "16", "--phn-dim", "10",
          "--spk-dim", "5"])

    # gselect: [T, N] int indices within the UBM size
    main(["sgmm2-gselect", P("sgmm.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('gsel.ark')}", "--num-gselect", "6"])
    am = load_sgmm2(P("sgmm.npz"))
    for _k, g in read_ark(P("gsel.ark")):
        assert g.shape[1] == 6
        assert (g >= 0).all() and (g < am.sgmm.num_gauss).all()

    # sharded stats sum == unsharded
    utts = sorted(l.split()[0] for l in open(P("text")))
    post_lines = {l.split()[0]: l for l in open(P("post.txt"))}
    for name, keys in (("post1.txt", utts[:6]), ("post2.txt", utts[6:])):
        with open(P(name), "w") as f:
            for u in keys:
                f.write(post_lines[u])
    main(["sgmm2-acc-stats", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post1.txt"), P("a1.npz")])
    main(["sgmm2-acc-stats", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post2.txt"), P("a2.npz")])
    main(["sgmm2-sum-accs", P("a.npz"), P("a1.npz"), P("a2.npz")])
    main(["sgmm2-acc-stats", P("sgmm.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"), P("a_all.npz")])
    s, a = load_sgmm2_accs(P("a.npz")), load_sgmm2_accs(P("a_all.npz"))
    np.testing.assert_allclose(s.Y, a.Y, rtol=1e-8)
    np.testing.assert_allclose(s.tot_like, a.tot_like, rtol=1e-8)
    for j in range(len(s.gamma)):
        np.testing.assert_allclose(s.gamma[j], a.gamma[j], rtol=1e-8)

    # one primitive EM step raises the training loglike
    like0 = s.tot_like / s.tot_frames
    main(["sgmm2-est", P("sgmm.npz"), P("a.npz"), P("sgmm1.npz"),
          "--update-flags", "vc"])
    main(["sgmm2-acc-stats", P("sgmm1.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"), P("a_new.npz")])
    anew = load_sgmm2_accs(P("a_new.npz"))
    like1 = anew.tot_like / anew.tot_frames
    assert like1 >= like0 - 1e-6, (like0, like1)

    # EBW: den stats from decoded-lattice posteriors; the model moves
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["sgmm2-latgen-faster", P("sgmm1.npz"), P("mono.npz"),
          P("hclg.npz"), f"ark:{P('feats.ark')}",
          "--lattice-out", P("lat.ark"), "--beam", "14"])
    main(["lattice-to-post", P("lat.ark"), P("den_post.txt"),
          "--acoustic-scale", "0.1"])
    main(["sgmm2-acc-stats", P("sgmm1.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("den_post.txt"), P("den.npz")])
    main(["sgmm2-est-ebw", P("sgmm1.npz"), P("a_new.npz"), P("den.npz"),
          P("sgmm_mmi.npz")])
    m0 = load_sgmm2(P("sgmm1.npz"))
    m1 = load_sgmm2(P("sgmm_mmi.npz"))
    assert any(not np.allclose(np.stack(a), np.stack(b))
               for a, b in zip(m0.sgmm.v, m1.sgmm.v))

    # SGMM alignment: per-utt tid sequences of the right length
    main(["sgmm2-align", P("sgmm1.npz"), P("mono.npz"), P("text"),
          f"ark:{P('feats.ark')}", f"ark:{P('sali.ark')}"])
    feats = dict(open_rspecifier(f"ark:{P('feats.ark')}"))
    salis = dict(open_rspecifier(f"ark:{P('sali.ark')}"))
    assert len(salis) == 12
    for u, tids in salis.items():
        assert len(tids) == feats[u].shape[0]

    # speaker vectors
    with open(P("utt2spk"), "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 3}\n")
    main(["sgmm2-est-spkvecs", P("sgmm1.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"),
          f"ark:{P('vecs.ark')}", "--utt2spk", P("utt2spk")])
    vecs = dict(read_ark(P("vecs.ark")))
    assert sorted(vecs) == ["spk0", "spk1", "spk2"]
    for v in vecs.values():
        assert v.shape == (5,) and np.isfinite(v).all()
