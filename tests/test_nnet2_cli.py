"""nnet2 primitive-command layer: the egs pipeline + the
parallel-SGD-with-model-averaging outer loop of
steps/nnet2/train_multisplice_accel2.sh, driven purely through files.

(ref: nnet2bin/{nnet-get-egs,nnet-copy-egs,nnet-shuffle-egs,
 nnet-subset-egs,nnet-train-simple,nnet-am-init,nnet-am-info,
 nnet-am-copy,nnet-am-average,nnet-combine-fast,nnet-adjust-priors,
 nnet-latgen-faster}.cc.)
"""

import os

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark

from test_gmmbin_cli import _tiny_corpus

SPLICE = "-2,-1,0,1,2;-1,2;0"
LEFT, RIGHT = 3, 4


@pytest.mark.slow
def test_nnet2_primitive_training_loop(tmp_path, capsys):
    _tiny_corpus(tmp_path, n_utts=24, seed=3)
    P = lambda *n: str(tmp_path.joinpath(*n))
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "8", "--totgauss", "60"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])

    # egs pipeline
    main(["nnet-get-egs", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}", P("egs"),
          "--left-context", str(LEFT), "--right-context", str(RIGHT),
          "--chunk", "8", "--num-archives", "2"])
    assert os.path.exists(P("egs", "egs.0.ark"))
    main(["nnet-shuffle-egs", P("egs"), P("egs_shuf"),
          "--num-archives", "2", "--seed", "7"])
    n_in = sum(1 for a in (0, 1)
               for _ in read_ark(P("egs", f"egs.{a}.ark")))
    n_shuf = sum(1 for a in (0, 1)
                 for _ in read_ark(P("egs_shuf", f"egs.{a}.ark")))
    assert n_in == n_shuf and n_in > 40
    main(["nnet-subset-egs", P("egs_shuf"), P("egs_valid"),
          "--n", "24", "--randomize"])
    main(["nnet-copy-egs", P("egs_shuf"), P("egs_1arch"),
          "--num-archives", "1"])

    # init + two SGD 'jobs' from different shuffles + average
    main(["nnet-am-init", P("mono.npz"), f"ark:{P('feats.ark')}",
          P("nn0.npz"), f"--splice-indexes={SPLICE}",
          "--hidden-dim", "256", "--pnorm-output-dim", "64"])
    capsys.readouterr()
    main(["nnet-am-info", P("nn0.npz")])
    info = capsys.readouterr().out
    assert f"left-context {LEFT}" in info
    assert f"right-context {RIGHT}" in info
    for job, seed in ((1, 11), (2, 22)):
        main(["nnet-shuffle-egs", P("egs"), P(f"egs_j{job}"),
              "--num-archives", "1", "--seed", str(seed)])
        main(["nnet-train-simple", P("nn0.npz"), P(f"egs_j{job}"),
              P(f"nn_j{job}.npz"), "--num-epochs", "40",
              "--initial-lr", "0.1", "--final-lr", "0.01",
              "--minibatch-size", "64"])
    main(["nnet-am-average", P("nn_avg.npz"), P("nn_j1.npz"),
          P("nn_j2.npz")])
    main(["nnet-combine-fast", P("egs_valid"), P("nn_comb.npz"),
          P("nn_j1.npz"), P("nn_j2.npz"), P("nn_avg.npz")])
    main(["nnet-adjust-priors", P("nn_comb.npz"),
          f"ark:{P('feats.ark')}", P("nn_final.npz")])
    main(["nnet-am-copy", P("nn_final.npz"), P("nn_copy.npz")])

    # the combined model decodes the corpus
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["nnet-latgen-faster", P("mono.npz"), P("nn_final.npz"),
          P("hclg.npz"), f"ark:{P('feats.ark')}",
          "--lattice-out", P("lat.ark"),
          "--transcription-out", P("hyp.txt"),
          "--beam", "14", "--max-active", "256"])
    from kaldi_tpu.lat.io import read_lattice_ark
    assert len(dict(read_lattice_ark(P("lat.ark")))) == 24
    try:
        main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)

    # gmm-system-dependent surgery wrappers
    # (ref: nnet2bin/nnet-am-reinitialize.cc, nnet2-boost-silence.cc)
    from kaldi_tpu.io.model_io import load_am_nnet, load_gmm_system
    main(["nnet-am-reinitialize", P("nn_final.npz"), P("mono.npz"),
          P("nn_reinit.npz")])
    reinit = load_am_nnet(P("nn_reinit.npz"))
    assert reinit.num_pdfs == load_gmm_system(P("mono.npz")).am.num_pdfs
    sil_phone = load_gmm_system(P("mono.npz")).lang.phones["SIL"]
    main(["nnet2-boost-silence", str(sil_phone), P("mono.npz"),
          P("nn_final.npz"), P("nn_boost.npz")])
    boosted = load_am_nnet(P("nn_boost.npz"))
    assert not np.allclose(boosted.priors, load_am_nnet(
        P("nn_final.npz")).priors)

    # discriminative egs pipeline + sequence training
    # (ref: nnet2bin/nnet-{get,shuffle,copy,compare-hash}-egs-
    #  discriminative.cc, nnet-train-discriminative-simple.cc)
    main(["nnet-get-egs-discriminative", P("nn_final.npz"),
          f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}", P("lat.ark"),
          P("degs"), "--num-archives", "2"])
    main(["nnet-shuffle-egs-discriminative", P("degs"), P("degs_shuf"),
          "--num-archives", "1", "--seed", "3"])
    main(["nnet-copy-egs-discriminative", P("degs_shuf"),
          P("degs_copy")])
    main(["nnet-compare-hash-discriminative", P("degs_shuf"),
          P("degs_copy")])
    main(["nnet-train-discriminative-simple", P("nn_final.npz"),
          P("mono.npz"), P("degs_copy"), P("nn_smbr.npz"),
          "--criterion", "smbr", "--num-epochs", "1",
          "--learning-rate", "1e-4",
          "--silence-phones", str(sil_phone)])
    assert load_am_nnet(P("nn_smbr.npz")) is not None

    # nnet-side forced alignment (ref: nnet2bin/nnet-align-compiled.cc)
    main(["nnet-align-compiled", P("mono.npz"), P("nn_final.npz"),
          P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali_nnet.ark')}"])
    n_ali = sum(1 for _ in read_ark(P("ali_nnet.ark")))
    assert n_ali == 24
