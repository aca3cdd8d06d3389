"""nnet1 (component-stack) CLI: proto init, RBM pretrain + convert,
CMVN/transform front components, concat, frame-shuffled training,
forward, KL-HMM accumulation, train-transitions.

(ref: nnetbin/{nnet-initialize,nnet-info,nnet-copy,nnet-concat,
 nnet-forward,nnet-train-frmshuff,rbm-train-cd1-frmshuff,
 rbm-convert-to-nnet,cmvn-to-nnet,transf-to-nnet,feat-to-post,
 paste-post,train-transitions,nnet-kl-hmm-acc,nnet-kl-hmm-sum-accs}.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, read_ark, open_rspecifier
from kaldi_tpu.nnet1.nnet import load_nnet1


def _toy_frames(tmp_path, n_utts=4, T=50, D=8, n_cls=3, seed=0):
    """Linearly separable per-frame classification data."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_cls, D) * 3.0
    feats, alis = {}, {}
    for i in range(n_utts):
        cls = rng.randint(n_cls, size=T)
        feats[f"u{i}"] = (centers[cls]
                          + rng.randn(T, D) * 0.5).astype(np.float32)
        alis[f"u{i}"] = cls.astype(np.int32)
    write_ark(str(tmp_path / "f.ark"), feats)
    write_ark(str(tmp_path / "ali.ark"), alis)
    return feats, alis


def test_nnet1_dbn_pipeline(tmp_path, capsys):
    """The classic nnet1 recipe shape: cmvn-to-nnet front, RBM pretrain
    -> convert -> concat with a random top layer -> frmshuff training
    -> forward accuracy ~1.0 on the training data."""
    P = lambda n: str(tmp_path / n)
    feats, alis = _toy_frames(tmp_path)

    main(["compute-cmvn-stats", f"ark:{P('f.ark')}",
          f"ark:{P('cmvn.ark')}"])
    main(["cmvn-to-nnet", f"ark:{P('cmvn.ark')}", P("front.npz")])

    main(["rbm-train-cd1-frmshuff", f"ark:{P('f.ark')}", P("rbm.npz"),
          "--hidden-dim", "16", "--num-epochs", "3"])
    main(["rbm-convert-to-nnet", P("rbm.npz"), P("dbn.npz")])

    with open(P("top.proto"), "w") as f:
        f.write("<AffineTransform> <InputDim> 16 <OutputDim> 3\n"
                "<Softmax> <InputDim> 3 <OutputDim> 3\n")
    main(["nnet-initialize", P("top.proto"), P("top.npz")])
    main(["nnet-concat", P("net0.npz"), P("front.npz"), P("dbn.npz"),
          P("top.npz")])
    capsys.readouterr()
    main(["nnet-info", P("net0.npz")])
    info = capsys.readouterr().out
    assert "input-dim 8" in info and "output-dim 3" in info
    assert info.count("component ") == 6

    main(["nnet-train-frmshuff", P("net0.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('ali.ark')}", P("net1.npz"),
          "--num-epochs", "20", "--learn-rate", "0.1",
          "--momentum", "0.9"])
    main(["nnet-forward", P("net1.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('post.ark')}", "--apply-log"])
    correct = total = 0
    post = dict(read_ark(P("post.ark")))
    for u, lp in post.items():
        correct += int((np.argmax(lp, -1) == alis[u]).sum())
        total += len(alis[u])
    assert correct / total > 0.95

    # prior-divided output differs by exactly the log-prior row
    counts = np.bincount(np.concatenate(list(alis.values())),
                         minlength=3).astype(np.float32)
    write_ark(P("cnt.ark"), {"counts": counts})
    main(["nnet-forward", P("net1.npz"), f"ark:{P('f.ark')}",
          f"ark:{P('lik.ark')}", "--apply-log",
          "--class-frame-counts", P("cnt.ark")])
    lik = dict(read_ark(P("lik.ark")))
    p = counts + 0.5
    log_prior = np.log(p / p.sum())
    np.testing.assert_allclose(lik["u0"], post["u0"] - log_prior,
                               rtol=1e-4, atol=1e-4)

    # copy round-trips
    main(["nnet-copy", P("net1.npz"), P("net1c.npz")])
    n1, p1 = load_nnet1(P("net1.npz"))
    n2, p2 = load_nnet1(P("net1c.npz"))
    assert n1.to_proto() == n2.to_proto()


def test_feat_to_post_paste_and_klhmm(tmp_path):
    P = lambda n: str(tmp_path / n)
    feats, alis = _toy_frames(tmp_path, n_utts=2, D=4)
    # feat-to-post round-trips dense rows as (dim, value) entries
    main(["feat-to-post", f"ark:{P('f.ark')}", P("fp.txt")])
    from kaldi_tpu.hmm.posterior import read_post_ark
    (u0, post), _ = list(read_post_ark(P("fp.txt")))
    row = np.zeros(4, np.float32)
    for (d, v) in post[0]:
        row[d] = v
    np.testing.assert_allclose(row, feats["u0"][0], atol=1e-5)

    main(["paste-post", P("fp.txt"), "4", P("fp.txt"), P("pp.txt")])
    (_u, merged), _ = list(read_post_ark(P("pp.txt")))
    assert max(i for (i, _w) in merged[0]) >= 4

    # KL-HMM accumulation: state dists recover the class structure
    post_feats = {}
    for u, cls in alis.items():
        onehot = np.eye(3, dtype=np.float32)[cls]
        post_feats[u] = onehot * 0.9 + 0.05
    write_ark(P("postf.ark"), post_feats)
    half = {k: v for i, (k, v) in enumerate(post_feats.items()) if i < 1}
    rest = {k: v for i, (k, v) in enumerate(post_feats.items()) if i >= 1}
    ali_d = dict(open_rspecifier(f"ark:{P('ali.ark')}"))
    write_ark(P("pf1.ark"), half)
    write_ark(P("pf2.ark"), rest)
    main(["nnet-kl-hmm-acc", f"ark:{P('pf1.ark')}", f"ark:{P('ali.ark')}",
          P("kl1.npz"), "--num-states", "3"])
    main(["nnet-kl-hmm-acc", f"ark:{P('pf2.ark')}", f"ark:{P('ali.ark')}",
          P("kl2.npz"), "--num-states", "3"])
    main(["nnet-kl-hmm-sum-accs", P("kl.npz"), P("kl1.npz"),
          P("kl2.npz")])
    main(["nnet-kl-hmm-acc", f"ark:{P('postf.ark')}",
          f"ark:{P('ali.ark')}", P("kl_all.npz"), "--num-states", "3"])
    np.testing.assert_allclose(np.load(P("kl.npz"))["counts"],
                               np.load(P("kl_all.npz"))["counts"],
                               rtol=1e-8)
    c = np.load(P("kl.npz"))["counts"]
    assert all(np.argmax(c[s]) == s for s in range(3))


def test_transf_to_nnet_and_train_transitions(tmp_path):
    P = lambda n: str(tmp_path / n)
    M = np.array([[0.0, 2.0, 1.0], [1.0, 0.0, -1.0]], np.float32)
    write_ark(P("m.ark"), {"m": M})
    main(["transf-to-nnet", P("m.ark"), P("tn.npz"), "--affine"])
    net, params = load_nnet1(P("tn.npz"))
    import jax.numpy as jnp
    y = np.asarray(net.apply(params, jnp.asarray([[1.0, 1.0]])))
    np.testing.assert_allclose(y, [[3.0, 0.0]], atol=1e-5)

    # train-transitions changes the stored log-probs
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=6, seed=12)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "4", "--totgauss", "30"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali2.ark')}"])
    main(["train-transitions", P("mono.npz"), f"ark:{P('ali2.ark')}",
          P("mono_t.npz")])
    from kaldi_tpu.io.model_io import load_gmm_system
    m0 = load_gmm_system(P("mono.npz"))
    m1 = load_gmm_system(P("mono_t.npz"))
    assert not np.allclose(m0.trans_model.log_probs[1:],
                           m1.trans_model.log_probs[1:])
