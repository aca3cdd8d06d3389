"""The tree-building / triphone primitive-command layer: acc-tree-stats,
sum-tree-stats, cluster-phones, build-tree, gmm-init-model, convert-ali,
train-deltas — the steps/train_deltas.sh file protocol.

(ref: bin/{acc-tree-stats,sum-tree-stats,cluster-phones,build-tree,
 convert-ali}.cc, gmmbin/gmm-init-model.cc, steps/train_deltas.sh.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, open_rspecifier
from kaldi_tpu.io.model_io import (load_gmm_system, load_tree,
                                   load_tree_stats)

from test_gmmbin_cli import _tiny_corpus


@pytest.mark.slow
def test_triphone_primitives_end_to_end(tmp_path):
    """mono -> align -> sharded tree accs -> questions -> tree ->
    init-model -> convert-ali -> EM -> decode at WER 0; the sharded
    tree-stat sum equals the unsharded accumulation."""
    feats = _tiny_corpus(tmp_path, n_utts=24)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])

    # sharded accumulation == unsharded
    utts = sorted(feats)
    half = len(utts) // 2
    alis = dict(open_rspecifier(f"ark:{P('ali.ark')}"))
    write_ark(P("ali1.ark"), {u: alis[u] for u in utts[:half]})
    write_ark(P("ali2.ark"), {u: alis[u] for u in utts[half:]})
    main(["acc-tree-stats", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali1.ark')}", P("ts1.npz")])
    main(["acc-tree-stats", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali2.ark')}", P("ts2.npz")])
    main(["sum-tree-stats", P("ts.npz"), P("ts1.npz"), P("ts2.npz")])
    main(["acc-tree-stats", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("ts_all.npz")])
    s_sum, N, Pc = load_tree_stats(P("ts.npz"))
    s_all, _, _ = load_tree_stats(P("ts_all.npz"))
    assert (N, Pc) == (3, 1)
    assert set(s_sum) == set(s_all)
    for ev in s_all:
        assert s_sum[ev].count == pytest.approx(s_all[ev].count)
        np.testing.assert_allclose(s_sum[ev].x, s_all[ev].x, rtol=1e-6)

    main(["cluster-phones", P("ts.npz"), P("questions.txt")])
    qlines = [l.split() for l in open(P("questions.txt")) if l.split()]
    assert qlines and all(all(t.isdigit() for t in l) for l in qlines)

    main(["build-tree", P("mono.npz"), P("ts.npz"), P("tree.npz"),
          "--questions", P("questions.txt"), "--max-leaves", "50"])
    ctx = load_tree(P("tree.npz"))
    mono = load_gmm_system(P("mono.npz"))
    assert ctx.context_width == 3 and ctx.central_position == 1
    assert ctx.num_pdfs >= mono.am.num_pdfs

    main(["gmm-init-model", P("mono.npz"), P("tree.npz"), P("ts.npz"),
          P("tri0.npz")])
    tri0 = load_gmm_system(P("tri0.npz"))
    assert tri0.am.num_pdfs == ctx.num_pdfs
    assert tri0.am.dim == mono.am.dim

    # convert-ali preserves the phone-level structure exactly
    main(["convert-ali", P("mono.npz"), P("tri0.npz"),
          f"ark:{P('ali.ark')}", f"ark:{P('triali.ark')}"])
    tri_alis = dict(open_rspecifier(f"ark:{P('triali.ark')}"))
    tm_o, tm_n = mono.trans_model, tri0.trans_model
    for u in utts:
        a, b = alis[u], tri_alis[u]
        assert len(a) == len(b)
        for to, tn in zip(a.tolist(), b.tolist()):
            assert tm_o.transition_id_to_phone(to) == \
                tm_n.transition_id_to_phone(tn)
            assert tm_o.transition_id_to_hmm_state(to) == \
                tm_n.transition_id_to_hmm_state(tn)
            assert tm_o.is_self_loop(to) == tm_n.is_self_loop(tn)

    # a few EM iterations from the converted alignments, then decode
    main(["gmm-acc-stats-ali", P("tri0.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('triali.ark')}", P("acc.npz")])
    main(["gmm-est", P("tri0.npz"), P("acc.npz"), P("tri1.npz"),
          "--min-gaussian-occupancy", "3", "--power", "0.25"])
    for it in range(1, 5):
        main(["gmm-align", P(f"tri{it}.npz"), P("text"),
              f"ark:{P('feats.ark')}", f"ark:{P('triali.ark')}"])
        main(["gmm-acc-stats-ali", P(f"tri{it}.npz"),
              f"ark:{P('feats.ark')}", f"ark:{P('triali.ark')}",
              P("acc.npz")])
        main(["gmm-est", P(f"tri{it}.npz"), P("acc.npz"),
              P(f"tri{it + 1}.npz"), "--min-gaussian-occupancy", "3",
              "--power", "0.25", "--mix-up", str(ctx.num_pdfs + 10 * it)])
    main(["mkgraph", P("tri5.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["decode-faster", P("tri5.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp.txt")])
    try:
        main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)


def test_train_deltas_cli(tmp_path):
    """The fused train-deltas command trains a triphone system that
    decodes the training corpus exactly."""
    _tiny_corpus(tmp_path, n_utts=16)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["train-deltas", P("mono.npz"), P("text"),
          f"ark:{P('feats.ark')}", P("tri.npz"),
          "--num-leaves", "40", "--totgauss", "150", "--num-iters", "8"])
    tri = load_gmm_system(P("tri.npz"))
    mono = load_gmm_system(P("mono.npz"))
    assert tri.am.num_pdfs >= mono.am.num_pdfs
    main(["mkgraph", P("tri.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["decode-faster", P("tri.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp.txt")])
    try:
        main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)
