"""nnet3 primitive-command layer: config -> nnet3-init -> get-egs ->
nnet3-train -> compute-prob / average / combine / adjust-priors ->
nnet3-latgen-faster, all through files.

(ref: nnet3bin/{nnet3-init,nnet3-train,nnet3-compute-prob,nnet3-average,
 nnet3-combine,nnet3-am-adjust-priors,nnet3-latgen-faster,
 nnet3-get-egs,nnet3-shuffle-egs,nnet3-subset-egs}.cc +
 steps/nnet3/make_tdnn_configs.py / train_tdnn.sh.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.model_io import load_gmm_system

from test_gmmbin_cli import _tiny_corpus


@pytest.mark.slow
def test_nnet3_primitive_training_loop(tmp_path, capsys):
    _tiny_corpus(tmp_path, n_utts=24, seed=5)
    P = lambda *n: str(tmp_path.joinpath(*n))
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "8", "--totgauss", "60"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])

    # config generated like make_tdnn_configs.py, then nnet3-init
    from kaldi_tpu.nnet3.configs import make_tdnn_config
    model = load_gmm_system(P("mono.npz"))
    cfg = make_tdnn_config(
        39, model.am.num_pdfs,
        splice_indexes=((-2, -1, 0, 1, 2), (-1, 2), (0,)),
        hidden_dim=256, nonlinearity="PnormComponent",
        pnorm_output_dim=64)
    with open(P("tdnn.config"), "w") as f:
        f.write(cfg)
    main(["nnet3-init", P("tdnn.config"), P("nn0.npz")])
    capsys.readouterr()
    main(["nnet3-info", P("nn0.npz")])
    info = capsys.readouterr().out
    assert "left-context 3" in info and "right-context 4" in info

    main(["nnet3-get-egs", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("egs"),
          "--left-context", "3", "--right-context", "4", "--chunk", "8"])
    main(["nnet3-subset-egs", P("egs"), P("egs_valid"), "--n", "24",
          "--randomize"])
    capsys.readouterr()
    main(["nnet3-compute-prob", P("nn0.npz"), P("egs_valid")])
    prob0 = float(capsys.readouterr().out.split()[1])

    for job, seed in ((1, 11), (2, 22)):
        main(["nnet3-shuffle-egs", P("egs"), P(f"egs_j{job}"),
              "--seed", str(seed)])
        main(["nnet3-train", P("nn0.npz"), P(f"egs_j{job}"),
              P(f"nn_j{job}.npz"), "--num-epochs", "60",
              "--initial-lr", "0.1", "--final-lr", "0.01",
              "--minibatch-size", "64"])
    main(["nnet3-average", P("nn_avg.npz"), P("nn_j1.npz"),
          P("nn_j2.npz")])
    main(["nnet3-combine", P("egs_valid"), P("nn_comb.npz"),
          P("nn_j1.npz"), P("nn_j2.npz"), P("nn_avg.npz")])
    capsys.readouterr()
    main(["nnet3-compute-prob", P("nn_comb.npz"), P("egs_valid")])
    prob1 = float(capsys.readouterr().out.split()[1])
    assert prob1 > prob0 + 0.5       # training moved the objective a lot

    main(["nnet3-am-adjust-priors", P("nn_comb.npz"),
          f"ark:{P('feats.ark')}", P("nn_final.npz")])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["nnet3-latgen-faster", P("mono.npz"), P("nn_final.npz"),
          P("hclg.npz"), f"ark:{P('feats.ark')}",
          "--lattice-out", P("lat.ark"),
          "--transcription-out", P("hyp.txt"),
          "--beam", "16", "--max-active", "256"])
    from kaldi_tpu.lat.io import read_lattice_ark
    assert len(dict(read_lattice_ark(P("lat.ark")))) == 24
    try:
        main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)
