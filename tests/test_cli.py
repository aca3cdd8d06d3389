"""CLI subcommands + job scheduler.

(ref: the reference's binaries are smoke-tested by the recipes; here each
 subcommand is driven end to end on a temp corpus.)
"""

import os
import sys

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.wave import write_wave
from kaldi_tpu.io.kaldi_io import read_ark, read_scp
from kaldi_tpu.utils.jobs import run_jobs, JobFailure


@pytest.fixture()
def wav_corpus(tmp_path):
    rng = np.random.RandomState(0)
    scp = tmp_path / "wav.scp"
    lines = []
    for i in range(3):
        w = (rng.randn(8000 + 400 * i) * 1000).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wave(str(p), w, 16000.0)
        lines.append(f"u{i} {p}")
    scp.write_text("\n".join(lines) + "\n")
    return tmp_path, str(scp)


def test_cli_mfcc_and_cmvn_pipeline(wav_corpus):
    tmp, scp = wav_corpus
    ark = str(tmp / "feats.ark")
    fscp = str(tmp / "feats.scp")
    main(["compute-mfcc-feats", scp, f"ark,scp:{ark},{fscp}",
          "--dither=0.0"])
    feats = dict(read_scp(fscp))
    assert len(feats) == 3 and feats["u0"].shape[1] == 13

    cmvn_ark = str(tmp / "cmvn.ark")
    main(["compute-cmvn-stats", f"scp:{fscp}", f"ark:{cmvn_ark}"])
    norm_ark = str(tmp / "norm.ark")
    main(["apply-cmvn", f"ark:{cmvn_ark}", f"scp:{fscp}",
          f"ark:{norm_ark}"])
    normed = dict(read_ark(norm_ark))
    # per-utterance mean ~ 0 after CMVN
    for k, v in normed.items():
        assert np.abs(v.mean(0)).max() < 1e-3

    delta_ark = str(tmp / "delta.ark")
    main(["add-deltas", f"ark:{norm_ark}", f"ark:{delta_ark}"])
    assert dict(read_ark(delta_ark))["u0"].shape[1] == 39

    splice_ark = str(tmp / "splice.ark")
    main(["splice-feats", f"ark:{norm_ark}", f"ark:{splice_ark}",
          "--left-context=2", "--right-context=2"])
    assert dict(read_ark(splice_ark))["u0"].shape[1] == 13 * 5


def test_cli_config_file(wav_corpus, tmp_path):
    tmp, scp = wav_corpus
    conf = tmp_path / "mfcc.conf"
    conf.write_text("--dither=0.0\n--num-ceps=10\n")
    ark = str(tmp / "f2.ark")
    main(["compute-mfcc-feats", scp, f"ark:{ark}", f"--config={conf}"])
    assert dict(read_ark(ark))["u0"].shape[1] == 10


def test_cli_compute_wer(tmp_path, capsys):
    (tmp_path / "ref.txt").write_text("u1 a b c\nu2 d e\n")
    (tmp_path / "hyp.txt").write_text("u1 a b c\nu2 d f\n")
    main(["compute-wer", str(tmp_path / "ref.txt"),
          str(tmp_path / "hyp.txt")])
    out = capsys.readouterr().out
    assert "WER 20.00" in out


def test_run_jobs_contract(tmp_path):
    log_dir = str(tmp_path / "log")
    results = run_jobs(4, lambda job: job * job, log_dir=log_dir,
                       name="sq")
    assert results == [1, 4, 9, 16]
    assert sorted(os.listdir(log_dir)) == [f"sq.{j}.log" for j in
                                           range(1, 5)]
    # shell command with JOB placeholder
    run_jobs(2, f"echo job JOB > {tmp_path}/out.JOB", log_dir=log_dir,
             name="sh")
    assert (tmp_path / "out.2").read_text().strip() == "job 2"
    # failure propagates after all jobs ran (run.pl semantics)
    with pytest.raises(JobFailure):
        run_jobs(3, lambda job: 1 / 0 if job == 2 else job,
                 log_dir=log_dir, name="bad")


def test_run_jobs_retry_recovers_transient_failure(tmp_path):
    """max_retries re-runs only the failed jobs (preemption/transient
    recovery); the recovery is recorded in the job log."""
    log_dir = str(tmp_path / "logs")
    flag = tmp_path / "fail_once"

    def task(job):
        if job == 2 and not flag.exists():
            flag.write_text("x")
            raise RuntimeError("transient")
        return job * 10

    results = run_jobs(3, task, log_dir=log_dir, name="retry",
                       max_retries=2)
    assert results == [10, 20, 30]
    log2 = (tmp_path / "logs" / "retry.2.log").read_text()
    assert "recovered on retry 1" in log2

    # a permanently-failing job still raises after the retry budget
    with pytest.raises(JobFailure, match="after 1 retries"):
        run_jobs(2, lambda j: 1 / 0 if j == 1 else j, max_retries=1)
