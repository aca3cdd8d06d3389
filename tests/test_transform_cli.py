"""The transform-estimation primitive CLI layer: gmm-est-fmllr (SAT-style
speaker adaptation from posteriors), acc-lda/est-lda, gmm-acc-mllt/est-mllt,
compose-transforms, gmm-est-map, and per-speaker transform-feats lookup —
the file protocol steps/train_lda_mllt.sh and steps/train_sat.sh drive in
the reference.

(ref: gmmbin/gmm-est-fmllr.cc, bin/{acc-lda,est-lda,est-mllt}.cc,
 gmmbin/{gmm-acc-mllt,gmm-est-map}.cc, featbin/{compose-transforms,
 transform-feats}.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, write_ark, open_rspecifier
from kaldi_tpu.io.model_io import load_gmm_accs, load_gmm_system

from test_gmmbin_cli import _tiny_corpus


@pytest.fixture(scope="module")
def mono_system(tmp_path_factory):
    """A small flat-start mono system + alignments + posteriors, built
    once through the primitive CLI (3 EM iterations are enough for the
    adaptation math to have something non-degenerate to work with)."""
    tmp_path = tmp_path_factory.mktemp("xfcli")
    _tiny_corpus(tmp_path, n_utts=12, seed=3)
    P = lambda n: str(tmp_path / n)
    main(["gmm-init-mono", P("lexicon.txt"), f"ark:{P('feats.ark')}",
          P("m0.npz")])
    main(["align-equal", P("m0.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    for it in range(3):
        main(["gmm-acc-stats-ali", P(f"m{it}.npz"), f"ark:{P('feats.ark')}",
              f"ark:{P('ali.ark')}", P("acc.npz")])
        main(["gmm-est", P(f"m{it}.npz"), P("acc.npz"), P(f"m{it+1}.npz"),
              "--mix-up", "40"])
        main(["gmm-align", P(f"m{it+1}.npz"), P("text"),
              f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    # two "speakers", odd/even utterances
    utts = sorted(dict(open_rspecifier(f"ark:{P('feats.ark')}")))
    with open(P("utt2spk"), "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 2}\n")
    return tmp_path


def _tot_like(P, model, feats_rx):
    main(["gmm-acc-stats-ali", model, feats_rx, f"ark:{P('ali.ark')}",
          P("_like.npz")])
    acc, _ = load_gmm_accs(P("_like.npz"))
    return acc.tot_like / acc.tot_frames


def test_gmm_est_fmllr_per_speaker(mono_system):
    tmp_path = mono_system
    P = lambda n: str(tmp_path / n)
    main(["gmm-est-fmllr", P("m3.npz"), f"ark:{P('feats.ark')}",
          P("post.txt"), f"ark:{P('trans.ark')}",
          "--utt2spk", P("utt2spk"), "--min-count", "50"])
    trans = dict(read_ark(f"{P('trans.ark')}"))
    model = load_gmm_system(P("m3.npz"))
    D = model.am.dim
    assert sorted(trans) == ["spk0", "spk1"]
    for W in trans.values():
        assert W.shape == (D, D + 1)
    # transforms are per-speaker, not identical
    assert not np.allclose(trans["spk0"], trans["spk1"])
    # applying them raises the fMLLR objective under the same alignment:
    # sum_t log p(A x_t + b) + beta log|det A|  (the Jacobian term is part
    # of the auxiliary — raw likelihood alone can move either way,
    # ref: transform/fmllr-diag-gmm.cc auxf includes beta*logdet)
    base = _tot_like(P, P("m3.npz"), f"ark:{P('feats.ark')}")
    main(["transform-feats", P("trans.ark"), f"ark:{P('feats.ark')}",
          f"ark:{P('feats_fmllr.ark')}", "--utt2spk", P("utt2spk")])
    adapted = _tot_like(P, P("m3.npz"), f"ark:{P('feats_fmllr.ark')}")
    utt2spk = dict(line.split() for line in open(P("utt2spk")))
    feats = dict(open_rspecifier(f"ark:{P('feats.ark')}"))
    frames = {s: sum(len(f) for u, f in feats.items() if utt2spk[u] == s)
              for s in ("spk0", "spk1")}
    tot = sum(frames.values())
    logdet = sum(frames[s] * np.linalg.slogdet(
        trans[s][:, :D].astype(np.float64))[1] for s in frames) / tot
    assert adapted + logdet > base, (base, adapted, logdet)


def test_lda_mllt_estimation_cli(mono_system):
    tmp_path = mono_system
    P = lambda n: str(tmp_path / n)
    # LDA on spliced features (class = pdf), like train_lda_mllt stage 0
    main(["splice-feats", f"ark:{P('feats.ark')}",
          f"ark:{P('spliced.ark')}", "--left-context", "3",
          "--right-context", "3"])
    main(["acc-lda", P("m3.npz"), f"ark:{P('spliced.ark')}",
          P("post.txt"), P("lda_acc.npz")])
    main(["est-lda", P("lda_acc.npz"), P("lda.ark"), "--dim", "20"])
    (lda,) = [v for _, v in read_ark(P("lda.ark"))]
    assert lda.shape[0] == 20 and lda.shape[1] in (39 * 7, 39 * 7 + 1)
    main(["transform-feats", P("lda.ark"), f"ark:{P('spliced.ark')}",
          f"ark:{P('feats_lda.ark')}"])
    red = dict(open_rspecifier(f"ark:{P('feats_lda.ark')}"))
    assert next(iter(red.values())).shape[1] == 20

    # MLLT on the model-dim features
    main(["gmm-acc-mllt", P("m3.npz"), f"ark:{P('feats.ark')}",
          P("post.txt"), P("mllt_acc.npz")])
    main(["est-mllt", P("mllt_acc.npz"), P("mllt.ark")])
    (M,) = [v for _, v in read_ark(P("mllt.ark"))]
    assert M.shape == (39, 39)
    # the row update's fixed point satisfies m_i G_i m_i^T = beta for
    # every row (ref: transform/mllt.cc:66 Update), and the objective
    # beta log|det M| - 0.5 sum_i m_i G_i m_i^T must beat identity
    from kaldi_tpu.transform.mllt import MlltStats, mllt_objf
    z = np.load(P("mllt_acc.npz"))
    stats = MlltStats(39)
    stats.G, stats.beta = z["G"], float(z["beta"])
    Md = M.astype(np.float64)
    quad = np.array([Md[i] @ stats.G[i] @ Md[i] for i in range(39)])
    np.testing.assert_allclose(quad, stats.beta, rtol=1e-3)
    assert mllt_objf(stats, Md) > mllt_objf(stats, np.eye(39))


def test_compose_transforms_matches_sequential(mono_system, tmp_path):
    src = mono_system
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(0)
    x = rng.randn(17, 39).astype(np.float32)
    write_ark(P("x.ark"), {"u1": x})
    # affine B (39 -> 39 affine), square A (39 -> 39 linear)
    B = rng.randn(39, 40).astype(np.float32)
    A = rng.randn(39, 39).astype(np.float32)
    write_ark(P("B.ark"), {"b": B})
    write_ark(P("A.ark"), {"a": A})
    main(["compose-transforms", P("A.ark"), P("B.ark"), P("AB.ark")])
    (C,) = [v for _, v in read_ark(P("AB.ark"))]
    assert C.shape == (39, 40)
    # apply B then A == apply C
    main(["transform-feats", P("B.ark"), f"ark:{P('x.ark')}",
          f"ark:{P('xb.ark')}"])
    main(["transform-feats", P("A.ark"), f"ark:{P('xb.ark')}",
          f"ark:{P('xba.ark')}"])
    main(["transform-feats", P("AB.ark"), f"ark:{P('x.ark')}",
          f"ark:{P('xc.ark')}"])
    (seq,) = [v for _, v in read_ark(P("xba.ark"))]
    (comp,) = [v for _, v in read_ark(P("xc.ark"))]
    np.testing.assert_allclose(seq, comp, rtol=1e-4, atol=1e-4)
    # affine A (39 x 41 would be shape-incompatible; affine-on-affine)
    A2 = rng.randn(39, 40).astype(np.float32)
    write_ark(P("A2.ark"), {"a2": A2})
    main(["compose-transforms", P("A2.ark"), P("B.ark"), P("A2B.ark")])
    main(["transform-feats", P("A2.ark"), f"ark:{P('xb.ark')}",
          f"ark:{P('xba2.ark')}"])
    main(["transform-feats", P("A2B.ark"), f"ark:{P('x.ark')}",
          f"ark:{P('xc2.ark')}"])
    (seq2,) = [v for _, v in read_ark(P("xba2.ark"))]
    (comp2,) = [v for _, v in read_ark(P("xc2.ark"))]
    np.testing.assert_allclose(seq2, comp2, rtol=1e-4, atol=1e-4)


def test_gmm_est_map_adapts(mono_system):
    tmp_path = mono_system
    P = lambda n: str(tmp_path / n)
    main(["gmm-acc-stats-ali", P("m3.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("map_acc.npz")])
    main(["gmm-est-map", P("m3.npz"), P("map_acc.npz"), P("m_map.npz"),
          "--mean-tau", "10"])
    m0 = load_gmm_system(P("m3.npz"))
    m1 = load_gmm_system(P("m_map.npz"))
    moved = any(not np.allclose(a.means, b.means)
                for a, b in zip(m0.am.pdfs, m1.am.pdfs))
    assert moved
    # MAP toward the adaptation data raises its likelihood
    base = _tot_like(P, P("m3.npz"), f"ark:{P('feats.ark')}")
    adapted = _tot_like(P, P("m_map.npz"), f"ark:{P('feats.ark')}")
    assert adapted >= base, (base, adapted)


@pytest.mark.slow
def test_train_lda_mllt_and_sat_fused_cli(tmp_path):
    """train-mono -> train-lda-mllt (decode in the projected space) and
    train-mono -> train-sat (decode training speakers via
    transform-feats --utt2spk), all file-driven (ref:
    steps/train_lda_mllt.sh, steps/train_sat.sh)."""
    _tiny_corpus(tmp_path, n_utts=24, seed=0)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "8", "--totgauss", "40"])
    utts = sorted(u for u, _ in read_ark(P("feats.ark")))
    with open(P("utt2spk"), "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 2}\n")

    # ---- LDA+MLLT: raw mfcc spliced, alignment feats are +deltas
    main(["train-lda-mllt", P("mono.npz"), P("text"),
          f"ark:{P('mfcc.ark')}", f"ark:{P('feats.ark')}",
          P("lm_model.npz"), P("final_mat.ark"),
          "--num-iters", "12", "--totgauss", "100", "--num-leaves", "20",
          "--lda-dim", "20"])
    main(["splice-feats", f"ark:{P('mfcc.ark')}", f"ark:{P('spl.ark')}",
          "--left-context", "3", "--right-context", "3"])
    main(["transform-feats", P("final_mat.ark"), f"ark:{P('spl.ark')}",
          f"ark:{P('proj.ark')}"])
    main(["mkgraph", P("lm_model.npz"), P("lm.arpa"), P("hclg_lm.npz")])
    main(["decode-faster", P("lm_model.npz"), P("hclg_lm.npz"),
          f"ark:{P('proj.ark')}", "--transcription-out", P("hyp_lm.txt")])
    main(["compute-wer", P("text"), P("hyp_lm.txt"), "--max-wer", "0"])

    # ---- SAT on the delta features
    main(["train-sat", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          P("utt2spk"), P("sat_model.npz"), f"ark:{P('sat_trans.ark')}",
          "--num-iters", "8", "--totgauss", "60", "--num-leaves", "20"])
    main(["transform-feats", P("sat_trans.ark"), f"ark:{P('feats.ark')}",
          f"ark:{P('feats_sat.ark')}", "--utt2spk", P("utt2spk")])
    main(["mkgraph", P("sat_model.npz"), P("lm.arpa"), P("hclg_sat.npz")])
    main(["decode-faster", P("sat_model.npz"), P("hclg_sat.npz"),
          f"ark:{P('feats_sat.ark')}", "--transcription-out",
          P("hyp_sat.txt")])
    main(["compute-wer", P("text"), P("hyp_sat.txt"), "--max-wer", "0"])
