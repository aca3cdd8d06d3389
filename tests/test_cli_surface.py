"""CLI surface parity: every binary in the reference's Makefiles has a
kaldi_tpu subcommand or documented alias.

(ref: src/*/Makefile BINFILES — the ~507-binary user surface.)
"""

import argparse
import os
import re

import pytest

REF_SRC = "/root/reference/src"


def _reference_binaries():
    bins = set()
    for root, _dirs, files in os.walk(REF_SRC):
        if "Makefile" not in files:
            continue
        txt = open(os.path.join(root, "Makefile")).read()
        m = re.search(r"BINFILES\s*=\s*((?:[^\\\n]*\\\n)*[^\n]*)", txt)
        if not m:
            continue
        for tok in m.group(1).replace("\\\n", " ").split():
            if tok and not tok.startswith("$"):
                bins.add(tok)
    return bins


def _our_commands():
    from kaldi_tpu import cli
    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def spy(self, args=None, namespace=None):
        captured["p"] = self
        raise SystemExit(0)

    argparse.ArgumentParser.parse_args = spy
    try:
        cli.main(["__probe__"])
    except SystemExit:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    sub = next(a for a in captured["p"]._actions
               if isinstance(a, argparse._SubParsersAction))
    return set(sub.choices.keys()) | set(cli._ALIASES.keys())


@pytest.mark.skipif(not os.path.isdir(REF_SRC),
                    reason="reference tree not available")
def test_every_reference_binary_has_a_subcommand():
    ref = _reference_binaries()
    assert len(ref) > 450, "reference Makefiles not parsed"
    missing = sorted(ref - _our_commands())
    assert not missing, f"{len(missing)} reference binaries without " \
                        f"a CLI counterpart: {missing}"


def test_aliases_resolve_to_registered_commands():
    from kaldi_tpu import cli
    cmds = _our_commands()
    for alias, target in cli._ALIASES.items():
        tgt = target[0]
        for _hop in range(4):
            if tgt in cli._ALIASES:
                tgt = cli._ALIASES[tgt][0]
        assert tgt in cmds - set(cli._ALIASES.keys()), (alias, tgt)
