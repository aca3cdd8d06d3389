"""Long-tail CLI: lattice set ops, pronunciation alignment, nnet1
LSTM-stream + sequential-discriminative training, nnet3 egs tools.

(ref: latbin/*.cc, bin/{phones-to-prons,prons-to-wordali}.cc,
 nnetbin/*.cc, nnet3bin/*.cc — cited in kaldi_tpu/cli_tail.py.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, write_ark
from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.io import read_lattice_ark, write_lattice_ark


def _linear_lat(words, cost=0.0):
    lat = Lattice()
    s = lat.add_state()
    lat.start = s
    for w in words:
        d = lat.add_state()
        lat.add_arc(s, 1, w, cost, 0.0, d)
        s = d
    lat.set_final(s)
    return lat


def _two_path_lat():
    """Accepts [1, 2] (cheap) and [1, 3] (pricier)."""
    lat = Lattice()
    s0, s1, s2 = lat.add_state(), lat.add_state(), lat.add_state()
    lat.start = s0
    lat.add_arc(s0, 1, 1, 0.0, 0.0, s1)
    lat.add_arc(s1, 1, 2, 0.0, 0.0, s2)
    lat.add_arc(s1, 1, 3, 1.0, 0.0, s2)
    lat.set_final(s2)
    return lat


def test_lattice_set_ops(tmp_path):
    P = lambda n: str(tmp_path / n)
    write_lattice_ark(P("a.ark"), {"u1": _two_path_lat(),
                                   "u2": _linear_lat([5])})
    write_lattice_ark(P("b.ark"), {"u1": _linear_lat([9, 9])})

    # copy-backoff: u1 comes from b, u2 backs off to a
    main(["lattice-copy-backoff", P("a.ark"), P("b.ark"), P("c.ark")])
    c = dict(read_lattice_ark(P("c.ark")))
    assert list([w for (w, _t, _c) in c["u1"].paths()][0]) == [9, 9]
    assert list([w for (w, _t, _c) in c["u2"].paths()][0]) == [5]

    # difference: removing the best path [1, 2] keeps only [1, 3]
    write_lattice_ark(P("num.ark"), {"u1": _linear_lat([1, 2])})
    main(["lattice-difference", P("a.ark"), P("num.ark"), P("d.ark")])
    d = dict(read_lattice_ark(P("d.ark")))
    seqs = {tuple(w) for (w, _t, _c) in d["u1"].paths()}
    assert seqs == {(1, 3)}

    # expand-ngram: path set is unchanged
    main(["lattice-expand-ngram", P("a.ark"), P("e.ark"), "--n", "2"])
    e = dict(read_lattice_ark(P("e.ark")))
    assert {tuple(w) for (w, _t, _c) in e["u1"].paths()} == \
        {(1, 2), (1, 3)}


@pytest.mark.slow
def test_prons_pipeline(tmp_path, capsys):
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=6, seed=8)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "4", "--totgauss", "20"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    capsys.readouterr()
    main(["ali-to-phones", P("mono.npz"), f"ark:{P('ali.ark')}"])
    open(P("phones.ark"), "w").write(capsys.readouterr().out)
    main(["phones-to-prons", P("mono.npz"), P("lexicon.txt"),
          f"ark:{P('phones.ark')}", P("text"), P("prons.txt")])
    prons = {l.split()[0]: l for l in open(P("prons.txt"))}
    text = {l.split()[0]: l.split()[1:] for l in open(P("text"))}
    assert len(prons) == len(text)
    # every utterance's non-silence words appear in order
    from kaldi_tpu.io.model_io import load_gmm_system
    lang = load_gmm_system(P("mono.npz")).lang
    for utt, line in prons.items():
        body = line.split(None, 1)[1]
        words = [int(chunk.split()[0]) for chunk in body.split(";")
                 if chunk.split()]
        said = [w for w in words if w != 0]
        assert said == [lang.words[w] for w in text[utt]]

    # prons + lengths -> word alignment with total frames preserved
    capsys.readouterr()
    main(["ali-to-phones", P("mono.npz"), f"ark:{P('ali.ark')}",
          "--write-lengths"])
    open(P("lens.txt"), "w").write(capsys.readouterr().out)
    main(["prons-to-wordali", P("prons.txt"), P("lens.txt"),
          P("wali.txt")])
    ali = dict(read_ark(P("ali.ark")))
    for line in open(P("wali.txt")):
        toks = line.split(None, 1)
        total = sum(int(c.split()[1]) for c in toks[1].split(";")
                    if c.split())
        assert total == len(ali[toks[0]])

    # nbest-to-prons over word-aligned 1-best lattices
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--beam", "14",
          "--lattice-out", P("lat.ark")])
    main(["lattice-1best", P("lat.ark"), P("one.ark")])
    main(["lattice-align-words", P("lexicon.txt"), P("mono.npz"),
          P("one.ark"), P("aligned.ark")])
    main(["nbest-to-prons", P("mono.npz"), P("aligned.ark"),
          P("nprons.txt")])
    lines = open(P("nprons.txt")).read().splitlines()
    assert lines
    assert all(len(l.split()) >= 4 for l in lines)


def test_lstm_streams_training(tmp_path):
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(0)
    # two separable classes over short sequences
    feats, targs = {}, {}
    for u in range(6):
        T = 24 + u
        x = rng.randn(T, 5).astype(np.float32)
        y = (np.arange(T) % 2).astype(np.float32)
        x[y == 1] += 2.5
        feats[f"u{u}"] = x
        targs[f"u{u}"] = y
    write_ark(P("f.ark"), feats)
    write_ark(P("t.ark"), targs)
    for cmd in ("nnet-train-lstm-streams", "nnet-train-blstm-streams"):
        main([cmd, f"ark:{P('f.ark')}", f"ark:{P('t.ark')}",
              "init", P("m.npz"), "--cell-dim", "8", "--proj-dim", "6",
              "--num-epochs", "15", "--learn-rate", "0.2"])
        from kaldi_tpu.cli_tail import _load_lstm
        model, params = _load_lstm(P("m.npz"))
        import jax.numpy as jnp
        logp, _st = model.apply(params, jnp.asarray(feats["u0"][None]))
        pred = np.asarray(logp[0]).argmax(-1)
        acc = (pred == targs["u0"].astype(np.int64)).mean()
        assert acc > 0.8, (cmd, acc)


@pytest.mark.slow
def test_nnet1_sequential_and_nnet3_tools(tmp_path, capsys):
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=6, seed=9)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "4", "--totgauss", "20"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-pdf", P("mono.npz"), f"ark:{P('ali.ark')}",
          f"ark:{P('pdf.ark')}"])

    # xent-pretrained nnet1, then one MMI sequential pass moves it
    from kaldi_tpu.io.model_io import load_gmm_system
    model = load_gmm_system(P("mono.npz"))
    D = next(iter(read_ark(P("feats.ark"))))[1].shape[1]
    proto = (f"<NnetProto>\n<AffineTransform> <InputDim> {D} "
             f"<OutputDim> 32\n<Sigmoid> <InputDim> 32 <OutputDim> 32\n"
             f"<AffineTransform> <InputDim> 32 <OutputDim> "
             f"{model.am.num_pdfs}\n<Softmax> <InputDim> "
             f"{model.am.num_pdfs} <OutputDim> {model.am.num_pdfs}\n"
             f"</NnetProto>\n")
    open(P("proto"), "w").write(proto)
    main(["nnet-initialize", P("proto"), P("n0.npz")])
    main(["nnet-train-frmshuff", P("n0.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('pdf.ark')}", P("n1.npz"), "--num-epochs", "3"])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--beam", "14",
          "--lattice-out", P("den.ark")])
    main(["nnet-train-mmi-sequential", P("n1.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("den.ark"), f"ark:{P('ali.ark')}",
          P("n2.npz"), "--learn-rate", "1e-3"])
    from kaldi_tpu.nnet1.nnet import load_nnet1
    _net1, p1 = load_nnet1(P("n1.npz"))
    _net2, p2 = load_nnet1(P("n2.npz"))
    moved = sum(float(np.abs(np.asarray(a[k]) - np.asarray(b[k])).sum())
                for a, b in zip(p1, p2) for k in a)
    assert moved > 0
    main(["nnet-train-mpe-sequential", P("n1.npz"), P("mono.npz"),
          f"ark:{P('feats.ark')}", P("den.ark"), f"ark:{P('ali.ark')}",
          P("n3.npz"), "--learn-rate", "1e-3"])

    # nnet3 egs tools
    main(["nnet3-get-egs", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("egs"), "--left-context", "0",
          "--right-context", "0", "--chunk", "4"])
    main(["nnet3-acc-lda-stats", P("egs"), P("lda.npz")])
    z = np.load(P("lda.npz"))
    assert z["zero_acc"].sum() > 0

    cfg = (f"input-node name=input dim={D}\n"
           f"component name=a type=AffineComponent input-dim={D} "
           f"output-dim={model.am.num_pdfs}\n"
           f"component-node name=a_node component=a input=input\n"
           f"output-node name=output input=a_node objective=linear\n")
    open(P("cfg"), "w").write(cfg)
    main(["nnet3-init", P("cfg"), P("am3.npz")])
    main(["nnet3-compute-from-egs", P("am3.npz"), P("egs"),
          f"ark:{P('out.ark')}", "--max-examples", "4"])
    outs = dict(read_ark(P("out.ark")))
    assert len(outs) >= 1
    capsys.readouterr()
    main(["nnet3-show-progress", P("am3.npz"), P("am3.npz"), P("egs")])
    out = capsys.readouterr().out
    assert "parameter-change l2 0.0" in out

    # kl-hmm matrix conversion
    write_ark(P("klmat.ark"), {"m": np.abs(
        np.random.RandomState(0).randn(7, 5)).astype(np.float32)})
    main(["nnet-kl-hmm-mat-to-component", P("kl.npz"), P("klmat.ark")])
    import pickle as _p
    kl = _p.loads(np.load(P("kl.npz"))["__host__"].tobytes())
    assert kl.counts.shape == (7, 5)
