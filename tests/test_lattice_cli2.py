"""Second lattice/GMM-discriminative CLI batch: the boosted-MMI
primitive loop (gmm-acc-stats over posteriors, lattice-boost-ali,
lattice-to-post, gmm-est-{gaussians,weights}-ebw) and the lattice
toolbox (1best, lmrescore, phone mapping, equivalence, depth cap,
MPE/sMBR posteriors).

(ref: gmmbin/gmm-acc-stats.cc, gmm-est-gaussians-ebw.cc,
 gmm-est-weights-ebw.cc; latbin/lattice-{1best,to-post,boost-ali,
 lmrescore,to-phone-lattice,align-phones,equivalent,limit-depth,
 to-mpe-post,to-smbr-post}.cc, linear-to-nbest.cc — the
 steps/train_mmi.sh file protocol in primitives.)
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from kaldi_tpu.cli import main
from kaldi_tpu.io.model_io import load_gmm_system

from test_gmmbin_cli import _tiny_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("latcli2")
    _tiny_corpus(tmp, n_utts=12, seed=1)
    P = lambda n: str(tmp / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "8", "--totgauss", "60"])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--lattice-out", P("lat.ark"),
          "--beam", "14", "--lattice-beam", "7"])
    return tmp


def test_mmi_ebw_primitive_loop(corpus, capsys):
    """bMMI via primitives: num stats from the alignment, den stats from
    the boosted lattice, EBW update — the updated model still decodes the
    corpus at WER 0 and its parameters moved."""
    P = lambda n: str(corpus / n)
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("num_post.txt")])
    main(["gmm-acc-stats", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("num_post.txt"), P("num.accs")])
    main(["lattice-boost-ali", P("mono.npz"), P("lat.ark"),
          f"ark:{P('ali.ark')}", P("blat.ark"), "--b", "0.05"])
    main(["lattice-to-post", P("blat.ark"), P("den_post.txt"),
          "--acoustic-scale", "0.1"])
    main(["gmm-acc-stats", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("den_post.txt"), P("den.accs")])
    main(["gmm-est-gaussians-ebw", P("mono.npz"), P("num.accs"),
          P("den.accs"), P("mmi1.npz"), "--tau", "20"])
    main(["gmm-est-weights-ebw", P("mmi1.npz"), P("num.accs"),
          P("den.accs"), P("mmi.npz")])
    m0 = load_gmm_system(P("mono.npz"))
    m1 = load_gmm_system(P("mmi.npz"))
    moved = any(not np.allclose(a.means, b.means)
                for a, b in zip(m0.am.pdfs, m1.am.pdfs))
    assert moved
    main(["decode-faster", P("mmi.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp.txt")])
    try:
        main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)


def test_lattice_toolbox(corpus, capsys):
    P = lambda n: str(corpus / n)
    # 1best of a lattice is equivalent to itself and to the raw lattice's
    # best path
    main(["lattice-1best", P("lat.ark"), P("one.ark"),
          "--acoustic-scale", "1.0"])
    main(["lattice-equivalent", P("one.ark"), P("one.ark")])

    # LM swap identity: subtracting and re-adding the same G leaves the
    # best path (words and cost) unchanged
    model = load_gmm_system(P("mono.npz"))
    model.lang.words.write(P("words.txt"))
    backoff = model.lang.words.get("#0")
    main(["arpa2fst", P("lm.arpa"), P("words.txt"), P("g.txt")])
    main(["lattice-lmrescore", P("lat.ark"), P("g.txt"), P("noG.ark"),
          "--lm-scale", "-1", "--backoff-symbol", str(backoff)])
    main(["lattice-lmrescore", P("noG.ark"), P("g.txt"), P("reG.ark"),
          "--lm-scale", "1", "--backoff-symbol", str(backoff)])
    main(["lattice-equivalent", P("lat.ark"), P("reG.ark"),
          "--delta", "0.01"])

    # phone lattices: every nonzero output label is a phone id
    main(["lattice-to-phone-lattice", P("mono.npz"), P("lat.ark"),
          P("phlat.ark")])
    from kaldi_tpu.lat.io import read_lattice_ark
    phones = set()
    n_ph = len(model.lang.phones)
    for _k, lat in read_lattice_ark(P("phlat.ark")):
        for arcs in lat.arcs:
            for a in arcs:
                if a.olabel:
                    phones.add(a.olabel)
    assert phones and all(0 < p < n_ph for p in phones)
    main(["lattice-align-phones", P("mono.npz"), P("lat.ark"),
          P("palat.ark")])
    main(["lattice-equivalent", P("palat.ark"), P("lat.ark"),
          "--delta", "0.01"])

    # depth cap prunes down to a bounded mean depth
    main(["lattice-limit-depth", P("lat.ark"), P("dlat.ark"),
          "--max-depth", "3"])
    from kaldi_tpu.lat.posteriors import lattice_state_times
    for _k, lat in read_lattice_ark(P("dlat.ark")):
        _t, T = lattice_state_times(lat)
        n_arcs = sum(1 for arcs in lat.arcs for a in arcs if a.ilabel)
        assert n_arcs / max(T, 1) <= 6.0   # 3 requested, slack for floor

    # linear-to-nbest builds single-path lattices from int transcripts
    with open(P("lin.txt"), "w") as f:
        f.write("u0 3 4 3\nu1 4\n")
    main(["linear-to-nbest", P("lin.txt"), P("lin.ark")])
    lats = dict(read_lattice_ark(P("lin.ark")))
    assert sorted(lats) == ["u0", "u1"]
    from kaldi_tpu.lat.functions import lattice_best_path
    assert lattice_best_path(lats["u0"])[0] == [3, 4, 3]


def test_mpe_smbr_posteriors(corpus):
    P = lambda n: str(corpus / n)
    for cmd, out in (("lattice-to-smbr-post", "smbr_post.txt"),
                     ("lattice-to-mpe-post", "mpe_post.txt")):
        main([cmd, P("mono.npz"), f"ark:{P('ali.ark')}", P("lat.ark"),
              P(out), "--acoustic-scale", "0.1"])
        txt = open(P(out)).read()
        assert txt.strip()
    # sMBR posteriors sum to ~0 per frame (they are accuracy gradients)
    from kaldi_tpu.hmm.posterior import read_post_ark
    for _utt, post in read_post_ark(P("smbr_post.txt")):
        for entries in post:
            if entries:
                s = sum(w for (_p, w) in entries)
                assert abs(s) < 1.0
