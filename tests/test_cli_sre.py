"""File-driven speaker-recognition pipeline through the CLI:
train-ubm -> train-ivector-extractor -> ivector-extract -> train-plda ->
ivector-plda-scoring, with an EER bar.

(ref: egs/sre10/v1/run.sh — the sid/* + ivectorbin/* chain.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, read_ark


@pytest.mark.slow
def test_sre_pipeline_via_cli(tmp_path):
    rng = np.random.RandomState(0)
    dim, n_comp, n_spk = 8, 4, 10
    comp_means = rng.randn(n_comp, dim) * 4.0
    spk_dirs = rng.randn(2, dim)

    def utt(shift, frames=150):
        comps = rng.randint(0, n_comp, frames)
        return (comp_means[comps] + shift
                + rng.randn(frames, dim)).astype(np.float32)

    train, enroll, test = {}, {}, {}
    spk2utt_train, spk2utt_enroll = [], []
    trials, labels = [], []
    shifts = {f"spk{s}": rng.randn(2) @ spk_dirs * 1.2
              for s in range(n_spk)}
    for s, shift in shifts.items():
        us = []
        for u in range(3):
            train[f"{s}_tr{u}"] = utt(shift)
            us.append(f"{s}_tr{u}")
        spk2utt_train.append(f"{s} " + " ".join(us))
        enroll[f"{s}_en"] = utt(shift)
        spk2utt_enroll.append(f"{s} {s}_en")
        test[f"{s}_te"] = utt(shift)
    for s in shifts:
        for t in shifts:
            trials.append(f"{s} {t}_te")
            labels.append(s == t)

    P = lambda n: str(tmp_path / n)
    write_ark(P("train.ark"), train)
    write_ark(P("enroll.ark"), enroll)
    write_ark(P("test.ark"), test)
    (tmp_path / "spk2utt_train").write_text("\n".join(spk2utt_train) + "\n")
    (tmp_path / "spk2utt_enroll").write_text(
        "\n".join(spk2utt_enroll) + "\n")
    (tmp_path / "trials").write_text("\n".join(trials) + "\n")

    main(["train-ubm", f"ark:{P('train.ark')}", P("ubm.npz"),
          "--num-gauss", "8", "--num-iters", "3", "--full",
          "--full-iters", "3"])
    main(["train-ivector-extractor", P("ubm.npz"),
          f"ark:{P('train.ark')}", P("ext.npz"),
          "--ivector-dim", "8", "--num-iters", "4",
          "--num-gselect", "8"])
    # utterance i-vectors for PLDA training
    main(["ivector-extract", P("ext.npz"), f"ark:{P('train.ark')}",
          f"ark:{P('train_ivec.ark')}", "--num-gselect", "8"])
    # speaker-averaged enroll i-vectors, per-utt test i-vectors
    main(["ivector-extract", P("ext.npz"), f"ark:{P('enroll.ark')}",
          f"ark:{P('enroll_ivec.ark')}", "--num-gselect", "8",
          "--spk2utt", str(tmp_path / "spk2utt_enroll")])
    main(["ivector-extract", P("ext.npz"), f"ark:{P('test.ark')}",
          f"ark:{P('test_ivec.ark')}", "--num-gselect", "8"])
    main(["train-plda", str(tmp_path / "spk2utt_train"),
          f"ark:{P('train_ivec.ark')}", P("plda.npz")])
    main(["ivector-plda-scoring", P("plda.npz"),
          f"ark:{P('enroll_ivec.ark')}", f"ark:{P('test_ivec.ark')}",
          str(tmp_path / "trials"),
          "--scores-out", P("scores.txt")])

    scores = []
    with open(P("scores.txt")) as f:
        for line in f:
            scores.append(float(line.split()[2]))
    assert len(scores) == len(trials)
    from kaldi_tpu.ivector.metrics import compute_eer
    scores, labels = np.array(scores), np.array(labels)
    eer, _thr = compute_eer(scores[labels], scores[~labels])
    print(f"CLI SRE EER {eer*100:.2f}%")
    assert eer < 0.15, eer
