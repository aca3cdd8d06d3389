"""Guard for the driver entry file `__graft_entry__.py`.

Round-4 postmortem: a SyntaxError in this file went unnoticed because no
test imported it — the only executor was the end-of-round driver, which
recorded MULTICHIP_r04.json as a FAIL.  This test (fast tier) makes the
file's parse, import, `entry()` compile-check, and a tiny
`dryrun_multichip(2)` part of every test run.
"""

import importlib.util
import os
import py_compile
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__graft_entry__.py")


def _load():
    spec = importlib.util.spec_from_file_location("__graft_entry__", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_file_compiles():
    # parse failure here == the driver's multichip dryrun dies at rc=1
    py_compile.compile(ENTRY, doraise=True)


def test_entry_single_chip_compile_check():
    mod = _load()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)  # trace-only: driver does jit+run
    assert out.shape[0] == args[1].shape[0]


def test_dryrun_multichip_smoke():
    """Run the real driver dryrun on a 2-device CPU mesh (tiny shapes)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    mod = _load()
    mod.dryrun_multichip(2)
