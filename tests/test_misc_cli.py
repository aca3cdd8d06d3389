"""bin/ long-tail utilities: weight algebra, MCE scale, silence probs,
VAD splitting, two-channel CMVN, pfile export, tree introspection,
device probes.

(ref: bin/{dot-weights,reverse-weights,compute-mce-scale,
 duplicate-matrix,matrix-logprob,copy-int-vector-vector,
 build-pfile-from-ali,extract-ctx,compile-questions,draw-tree}.cc,
 gmmbin/get-silence-probs.cc, ivectorbin/create-split-from-vad.cc,
 featbin/compute-cmvn-stats-two-channel.cc,
 online2bin/ivector-randomize.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, write_ark


def test_weight_and_scalar_tools(tmp_path):
    P = lambda n: str(tmp_path / n)
    w1 = {"a": np.array([1.0, 0.0, 0.5], np.float32),
          "b": np.array([0.2, 0.8], np.float32)}
    w2 = {"a": np.array([0.0, 1.0, 1.0], np.float32),
          "b": np.array([1.0, 1.0], np.float32)}
    write_ark(P("w1.ark"), w1)
    write_ark(P("w2.ark"), w2)

    main(["dot-weights", f"ark:{P('w1.ark')}", f"ark:{P('w2.ark')}",
          f"ark:{P('dot.ark')}"])
    d = dict(read_ark(P("dot.ark")))
    np.testing.assert_allclose(d["a"], [0.5], rtol=1e-6)
    np.testing.assert_allclose(d["b"], [1.0], rtol=1e-6)

    main(["reverse-weights", f"ark:{P('w1.ark')}", f"ark:{P('rw.ark')}"])
    np.testing.assert_allclose(dict(read_ark(P("rw.ark")))["a"],
                               [0.0, 1.0, 0.5], rtol=1e-6)

    # MCE scale: num == den -> sigmoid 0.5 -> scale exactly 1.0
    write_ark(P("num.ark"), {"a": np.array([3.0], np.float32)})
    write_ark(P("den.ark"), {"a": np.array([3.0], np.float32)})
    main(["compute-mce-scale", f"ark:{P('num.ark')}",
          f"ark:{P('den.ark')}", f"ark:{P('scale.ark')}"])
    np.testing.assert_allclose(dict(read_ark(P("scale.ark")))["a"],
                               [1.0], rtol=1e-6)

    # silence probs: equal likes + prior 0.5 -> 0.5; quantize rounds
    write_ark(P("sil.ark"), {"a": np.array([0.0, 5.0], np.float32)})
    write_ark(P("nsl.ark"), {"a": np.array([0.0, 0.0], np.float32)})
    main(["get-silence-probs", f"ark:{P('sil.ark')}",
          f"ark:{P('nsl.ark')}", f"ark:{P('sp.ark')}",
          "--quantize", "0.25"])
    sp = dict(read_ark(P("sp.ark")))["a"]
    np.testing.assert_allclose(sp[0], 0.5, atol=1e-6)
    assert sp[1] == 1.0


def test_matrix_and_vad_tools(tmp_path):
    P = lambda n: str(tmp_path / n)
    m = {"u1": np.arange(12, dtype=np.float32).reshape(3, 4)}
    write_ark(P("m.ark"), m)
    main(["duplicate-matrix", f"ark:{P('m.ark')}",
          f"ark:{P('d1.ark')}", f"ark:{P('d2.ark')}"])
    for n in ("d1.ark", "d2.ark"):
        np.testing.assert_allclose(dict(read_ark(P(n)))["u1"], m["u1"])

    write_ark(P("ali.ark"), {"u1": np.array([0, 3, 2], np.float32)})
    main(["matrix-logprob", f"ark:{P('m.ark')}", f"ark:{P('ali.ark')}",
          f"ark:{P('out.ark')}"])
    np.testing.assert_allclose(dict(read_ark(P("out.ark")))["u1"],
                               m["u1"])

    # ivector-randomize: rows are always drawn from [t, T)
    mat = np.arange(40, dtype=np.float32).reshape(10, 4)
    write_ark(P("iv.ark"), {"u": mat})
    main(["ivector-randomize", f"ark:{P('iv.ark')}",
          f"ark:{P('ivr.ark')}", "--randomize-prob", "1.0"])
    out = dict(read_ark(P("ivr.ark")))["u"]
    for t in range(10):
        assert out[t, 0] >= mat[t, 0]
    assert (out[-1] == mat[-1]).all()

    # VAD split: runs of voiced frames, capped
    vad = np.zeros(20, np.float32)
    vad[3:9] = 1.0
    vad[15:19] = 1.0
    write_ark(P("vad.ark"), {"u": vad})
    main(["create-split-from-vad", f"ark:{P('vad.ark')}",
          P("segs"), "--max-voiced", "6"])
    lines = [l.split() for l in open(P("segs"))]
    assert len(lines) == 2
    assert lines[0][2:] == ["3", "8"]
    assert lines[1][2:] == ["15", "18"]

    # two-channel CMVN: louder channel dominates the stats
    rng = np.random.RandomState(0)
    a = rng.randn(30, 3).astype(np.float32) + 5.0   # louder (c0 ~ 5)
    b = rng.randn(30, 3).astype(np.float32) - 5.0   # quieter
    write_ark(P("f2.ark"), {"uA": a, "uB": b})
    with open(P("reco2fc"), "w") as f:
        f.write("uA rec1 A\nuB rec1 B\n")
    main(["compute-cmvn-stats-two-channel", P("reco2fc"),
          f"ark:{P('f2.ark')}", f"ark:{P('cm.ark')}"])
    st = dict(read_ark(P("cm.ark")))
    assert st["uA"][0, -1] > 29.0           # ~ full weight
    assert st["uB"][0, -1] < 1.0            # ~ quieter weight only

    # copy-int-vector-vector: text pass-through
    with open(P("vv.txt"), "w") as f:
        f.write("u1 1 2 ; 3 4 5 ;\n")
    main(["copy-int-vector-vector", f"ark:{P('vv.txt')}",
          f"ark:{P('vv2.txt')}"])
    assert open(P("vv2.txt")).read() == "u1 1 2 ; 3 4 5 ;\n"


def test_tree_tools(tmp_path, capsys):
    from test_gmmbin_cli import _tiny_corpus
    _tiny_corpus(tmp_path, n_utts=6, seed=4)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "4", "--totgauss", "20"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    # tree stats + triphone tree via existing primitives
    main(["acc-tree-stats", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("treeacc.npz")])
    main(["cluster-phones", P("treeacc.npz"), P("questions.txt")])
    main(["compile-questions", P("questions.txt"), P("questions.pkl")])
    import pickle
    q = pickle.load(open(P("questions.pkl"), "rb"))
    assert q.by_key, "compiled questions have per-key sets"

    main(["build-tree", P("mono.npz"), P("treeacc.npz"), P("tree.npz"),
          "--questions", P("questions.txt"), "--max-leaves", "20"])

    # extract-ctx prints pdf-id lines for every seen event
    capsys.readouterr()
    main(["extract-ctx", P("treeacc.npz"), P("tree.npz")])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) > 5
    assert all(len(l.split()) >= 4 for l in out)

    # draw-tree emits graphviz
    with open(P("phones.txt"), "w") as f:
        for i in range(1, 40):
            f.write(f"p{i} {i}\n")
    main(["draw-tree", P("phones.txt"), P("tree.npz")])
    dot = capsys.readouterr().out
    assert dot.startswith("digraph tree") and "->" in dot

    # pfile rows: one per aligned frame, feat dim + 3 columns
    main(["build-pfile-from-ali", P("mono.npz"), f"ark:{P('ali.ark')}",
          f"ark:{P('feats.ark')}", P("pfile.txt")])
    rows = [l.split() for l in open(P("pfile.txt"))]
    assert rows
    D = next(iter(read_ark(P("feats.ark"))))[1].shape[1]
    assert all(len(r) == D + 3 for r in rows)


def test_device_probes():
    # on the CPU test mesh these exit nonzero; they must not crash
    with pytest.raises(SystemExit) as e1:
        main(["cuda-compiled"])
    with pytest.raises(SystemExit) as e2:
        main(["cuda-gpu-available"])
    assert e1.value.code in (0, 1) and e2.value.code in (0, 1)
