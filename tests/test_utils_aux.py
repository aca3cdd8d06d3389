"""Aux subsystems: checkpoints, stage-resumable experiments, profiling.

(ref: SURVEY.md §5 — checkpoint/resume, failure recovery, tracing.)
"""

import os
import time

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                        list_checkpoints)
from kaldi_tpu.utils.experiment import Experiment
from kaldi_tpu.utils.profiling import Timer, AccuProfiler, check_finite


def test_checkpoint_roundtrip_and_pruning(tmp_path):
    d = str(tmp_path / "ckpt")
    tree = {"layers": [{"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                        "b": np.zeros(2, np.float32)}],
            "final": {"w": np.ones((1, 2), np.float32)}}
    for step in (10, 20, 30, 40):
        save_checkpoint(d, step, tree, keep=2, extra={"lr": 0.1 * step})
    assert list_checkpoints(d) == [30, 40]       # pruned to keep=2
    step, restored, extra = load_checkpoint(d, like=tree)
    assert step == 40 and extra == {"lr": 4.0}
    np.testing.assert_array_equal(restored["layers"][0]["w"],
                                  tree["layers"][0]["w"])
    np.testing.assert_array_equal(restored["final"]["w"],
                                  tree["final"]["w"])
    # flat load without structure
    _s, flat, _e = load_checkpoint(d, step=30)
    assert any("final" in k for k in flat)


def test_experiment_stages_resume(tmp_path):
    d = str(tmp_path / "exp")
    runs = []
    exp = Experiment(d, config={"beam": 13.0})
    exp.stage("prep", lambda: runs.append("prep"))
    exp.stage("train", lambda: runs.append("train"))
    assert runs == ["prep", "train"]
    assert os.path.exists(os.path.join(d, "config.json"))

    # re-run: all stages skipped
    exp2 = Experiment(d)
    exp2.stage("prep", lambda: runs.append("prep2"))
    exp2.stage("train", lambda: runs.append("train2"))
    assert runs == ["prep", "train"]

    # resume from a given stage re-runs it and everything after
    exp3 = Experiment(d, from_stage="train")
    exp3.stage("prep", lambda: runs.append("prep3"))
    exp3.stage("train", lambda: runs.append("train3"))
    exp3.stage("decode", lambda: runs.append("decode3"))
    assert runs == ["prep", "train", "train3", "decode3"]


def test_profiler_and_guards():
    t = Timer()
    time.sleep(0.01)
    assert t.elapsed() >= 0.01
    prof = AccuProfiler()
    with prof.track("gemm"):
        time.sleep(0.005)
    with prof.track("gemm"):
        pass
    assert prof.counts["gemm"] == 2
    assert "gemm" in prof.report()

    check_finite({"a": np.ones(3)})
    with pytest.raises(FloatingPointError, match="'b'"):
        check_finite({"a": np.ones(3), "b": np.array([1.0, np.nan])})


def test_checkpoint_bf16_roundtrip(tmp_path):
    """Regression: bf16 leaves silently became void arrays through
    np.savez; they must round-trip (stored as f32, cast back on load)."""
    import numpy as np
    import jax.numpy as jnp
    import ml_dtypes
    from kaldi_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
    tree = {"w": jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3),
                             jnp.bfloat16),
            "b": np.ones(3, np.float32)}
    d = str(tmp_path / "ck")
    # numpy scalar in extra must not crash the json dump either
    save_checkpoint(d, 1, tree, extra={"loss": np.float32(1.5)})
    step, back, extra = load_checkpoint(d, like=tree)
    assert step == 1
    assert np.asarray(back["w"]).dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(np.asarray(back["w"], np.float32),
                               np.asarray(tree["w"], np.float32))


def test_run_jobs_failure_marker(tmp_path):
    """run.pl contract: a failed job's log carries an accounting line
    (regression: silent-failure logs looked identical to success)."""
    import pytest
    from kaldi_tpu.utils.jobs import run_jobs, JobFailure
    d = str(tmp_path)
    with pytest.raises(JobFailure):
        run_jobs(2, "exit JOB", log_dir=d, name="t")
    log1 = open(f"{d}/t.1.log").read()
    log2 = open(f"{d}/t.2.log").read()
    assert "FAILED rc=1" in log1
    assert "FAILED rc=2" in log2
