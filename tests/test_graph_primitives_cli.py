"""The standalone graph-build primitive commands reproduce the fused
mkgraph pipeline step by step, like utils/mkgraph.sh drives the
reference binaries.

(ref: utils/mkgraph.sh:64-104 — fsttablecompose | fstdeterminizestar |
 fstminimizeencoded ; fstcomposecontext ; make-h-transducer ;
 fstrmsymbols | fstrmepslocal ; add-self-loops — plus bin/arpa2fst,
 bin/tree-info, bin/show-transitions.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.model_io import load_gmm_system, load_hclg

from test_gmmbin_cli import _tiny_corpus


@pytest.mark.slow
def test_mkgraph_via_primitives(tmp_path, capsys):
    _tiny_corpus(tmp_path, n_utts=16)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["train-deltas", P("mono.npz"), P("text"),
          f"ark:{P('feats.ark')}", P("tri.npz"),
          "--num-leaves", "40", "--totgauss", "150", "--num-iters", "8"])
    tri = load_gmm_system(P("tri.npz"))

    capsys.readouterr()
    main(["tree-info", P("tri.npz")])
    info = capsys.readouterr().out
    assert "context-width 3" in info and "central-position 1" in info
    main(["show-transitions", P("mono.npz")])
    trans = capsys.readouterr().out
    assert "Transition-state 1:" in trans and "self-loop" in trans

    # --- the mkgraph.sh pipeline, one primitive at a time
    from kaldi_tpu.fst.text_io import save_fst
    save_fst(P("L_disambig.txt"), tri.lang.L_disambig)
    with open(P("phone_disambig.txt"), "w") as f:
        for p in tri.lang.disambig_phone_ids:
            f.write(f"{p}\n")
    tri.lang.words.write(P("words.txt"))

    main(["arpa2fst", P("lm.arpa"), P("words.txt"), P("g.txt")])
    # LG = min(det*(L o G))
    main(["fst-compose", "--table", P("L_disambig.txt"), P("g.txt"),
          P("lg0.txt")])
    main(["fst-determinize-star", "--use-log", P("lg0.txt"), P("lg1.txt")])
    main(["fst-minimize-encoded", P("lg1.txt"), P("lg.txt")])
    # CLG + ilabels
    main(["fst-compose-context", P("ilabels.json"), P("lg.txt"),
          P("clg.txt"), "--context-size", "3", "--central-position", "1",
          "--read-disambig-syms", P("phone_disambig.txt")])
    # Ha
    main(["make-h-transducer", P("ilabels.json"), P("tri.npz"),
          P("ha.txt"), "--disambig-syms-out", P("disambig_tids.txt")])
    # HCLGa = min(rmepslocal(rmsyms(det*(Ha o CLG))))
    main(["fst-compose", "--table", P("ha.txt"), P("clg.txt"),
          P("hclga0.txt")])
    main(["fst-determinize-star", "--use-log", P("hclga0.txt"),
          P("hclga1.txt")])
    main(["fst-rmsymbols", P("disambig_tids.txt"), P("hclga1.txt"),
          P("hclga2.txt")])
    main(["fst-rmepslocal", P("hclga2.txt"), P("hclga3.txt")])
    main(["fst-minimize-encoded", P("hclga3.txt"), P("hclga.txt")])
    # HCLG = add-self-loops(HCLGa)
    main(["add-self-loops", P("tri.npz"), P("hclga.txt"), P("hclg.txt"),
          "--self-loop-scale", "0.1"])
    main(["fst-pack-graph", P("tri.npz"), P("hclg.txt"),
          P("graph_prim.npz")])

    main(["mkgraph", P("tri.npz"), P("lm.arpa"), P("graph_mk.npz")])
    a = load_hclg(P("graph_prim.npz"))
    b = load_hclg(P("graph_mk.npz"))
    assert a.num_states == b.num_states

    # both graphs decode the training corpus identically (and correctly)
    for g, hyp in (("graph_prim.npz", "hyp_prim.txt"),
                   ("graph_mk.npz", "hyp_mk.txt")):
        main(["decode-faster", P("tri.npz"), P(g),
              f"ark:{P('feats.ark')}", "--transcription-out", P(hyp)])
    assert open(P("hyp_prim.txt")).read() == open(P("hyp_mk.txt")).read()
    try:
        main(["compute-wer", P("text"), P("hyp_prim.txt"),
              "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)
