"""File-driven training + online decoding CLI (round-2 verdict item #6).

(ref: steps/train_mono.sh, gmmbin/gmm-align-compiled.cc,
 steps/nnet2/train_multisplice_accel2.sh,
 online2bin/online2-wav-nnet2-latgen-faster.cc, egs/yesno/s5/run.sh —
 the recipe below runs ENTIRELY through CLI subcommands over files.)
"""

import os

import pytest

from kaldi_tpu.cli import main


@pytest.mark.slow
def test_recipe_yesno_files_end_to_end(tmp_path):
    """wav files -> compute-mfcc-feats -> add-deltas -> train-mono ->
    mkgraph -> decode-faster -> gmm-align -> train-tdnn ->
    online2-wav-nnet2-latgen-faster -> compute-wer, all via the CLI;
    asserts WER 0 on both the GMM and streaming-TDNN paths (the command
    exits nonzero otherwise)."""
    work = str(tmp_path / "yesno")
    main(["recipe-yesno-files", work])
    # artifacts exist and are nonempty
    for f in ("mono.npz", "hclg.npz", "tdnn.npz", "ali.ark",
              "hyp_gmm.txt", "hyp_tdnn.txt"):
        p = os.path.join(work, f)
        assert os.path.exists(p) and os.path.getsize(p) > 0, f
    # alignment ark has one entry per training utterance, all tids valid
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    alis = list(open_rspecifier(f"ark:{os.path.join(work, 'ali.ark')}"))
    assert len(alis) == 24
    for _utt, tids in alis:
        assert len(tids) > 0 and (tids > 0).all()


@pytest.mark.slow
def test_train_nnet3_cli_roundtrip(tmp_path):
    """train-nnet3 over files -> saved config+params npz -> reload
    produces identical loglikes (ref: nnet3bin/nnet3-train +
    nnet3-am-copy read/write)."""
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from kaldi_tpu.io.model_io import load_am_nnet3
    # reuse the file-driven corpus from the yesno recipe (cheap subset)
    work = str(tmp_path / "w")
    from kaldi_tpu.cli import cmd_recipe_yesno_files  # noqa: F401
    # build a tiny corpus via the recipe's data-prep only: simpler to
    # synthesize directly through the recipe and stop after train-mono
    main(["recipe-yesno-files", work])   # produces mono.npz + feats
    out = str(tmp_path / "nnet3.npz")
    main(["train-nnet3", f"{work}/mono.npz", f"{work}/train/text",
          f"ark:{work}/train/feats.ark", out,
          "--net-type", "tdnn", "--num-epochs", "8"])
    am = load_am_nnet3(out)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 30, 39).astype(np.float32)
    ll = am.loglikes_np(x)
    assert ll.shape[0] == 1 and ll.shape[1] == 30
    assert np.all(np.isfinite(ll))
    # params round-trip exactly: resave and reload
    from kaldi_tpu.io.model_io import save_am_nnet3
    out2 = str(tmp_path / "nnet3b.npz")
    save_am_nnet3(out2, am)
    am2 = load_am_nnet3(out2)
    np.testing.assert_allclose(am2.loglikes_np(x), ll, rtol=1e-6)


@pytest.mark.slow
def test_online2_cli_fused_matches_generic(tmp_path):
    """--fused on online2-wav-nnet2-latgen-faster: the single-dispatch
    fused decoder must produce the same transcripts as the generic
    per-stage pipeline at the same settings (delta-order 0)."""
    work = str(tmp_path / "work")
    main(["recipe-yesno-files", work])
    P = lambda *n: os.path.join(work, *n)
    # a delta-free system (the fused program scores raw base features):
    # mono GMM + TDNN trained on raw mfcc
    main(["train-mono", P("lexicon.txt"), P("train", "text"),
          f"ark:{P('train', 'mfcc.ark')}", P("mono0.npz"),
          "--num-iters", "12", "--totgauss", "60", "--max-iter-inc", "8"])
    main(["mkgraph", P("mono0.npz"), P("lm.arpa"), P("hclg0.npz")])
    main(["train-tdnn", P("mono0.npz"), P("train", "text"),
          f"ark:{P('train', 'mfcc.ark')}", P("tdnn_nodelta.npz"),
          "--num-epochs", "30", "--initial-lr", "0.1",
          "--final-lr", "0.01", "--momentum", "0.9"])
    common = [P("mono0.npz"), P("tdnn_nodelta.npz"), P("hclg0.npz"),
              P("test", "wav.scp"), "--sample-frequency", "8000",
          "--delta-order", "0"]
    main(["online2-wav-nnet2-latgen-faster", *common,
          "--transcription-out", P("hyp_generic.txt")])
    main(["online2-wav-nnet2-latgen-faster", *common, "--fused",
          "--transcription-out", P("hyp_fused.txt")])
    a = open(P("hyp_generic.txt")).read().strip().splitlines()
    b = open(P("hyp_fused.txt")).read().strip().splitlines()
    assert sorted(a) == sorted(b)
    assert len(a) == 8
