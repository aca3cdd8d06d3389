"""FST tools CLI over OpenFst-compatible text files.

(ref: the fstbin/OpenFst binaries fstcompose/fstdeterminizestar/
 fstrmepsilon/fstarcsort/fstshortestpath — text interchange per
 fstcompile/fstprint.)
"""

import json

import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.fst.text_io import load_fst, save_fst, read_fst_text


A_TEXT = """0 1 1 10 0.5
0 1 2 20 1.5
1 2 3 30
1 1 0 0 0.25
2 0.125
"""

B_TEXT = """0 0 10 100 0.1
0 0 20 200 0.2
0 0 30 300 0.3
0
"""


def test_text_roundtrip(tmp_path):
    import io
    f = io.StringIO(A_TEXT)
    fst = read_fst_text(f)
    assert fst.start == 0
    assert fst.num_states == 3
    assert fst.num_arcs == 4
    assert fst.finals[2] == pytest.approx(0.125)
    p = tmp_path / "a.fst"
    save_fst(str(p), fst)
    again = load_fst(str(p))
    assert again.num_states == fst.num_states
    assert again.num_arcs == fst.num_arcs
    assert sorted(map(tuple, sum(again.arcs, []))) == \
        sorted(map(tuple, sum(fst.arcs, [])))


def test_fst_cli_pipeline(tmp_path, capsys):
    a = tmp_path / "a.fst"
    b = tmp_path / "b.fst"
    a.write_text(A_TEXT)
    b.write_text(B_TEXT)
    comp = tmp_path / "comp.fst"
    main(["fst-compose", str(a), str(b), str(comp)])
    noeps = tmp_path / "noeps.fst"
    main(["fst-rmepsilon", str(comp), str(noeps)])
    det = tmp_path / "det.fst"
    main(["fst-determinize-star", str(noeps), str(det)])
    srt = tmp_path / "srt.fst"
    main(["fst-arcsort", str(det), str(srt)])
    capsys.readouterr()
    main(["fst-info", str(srt)])
    info = json.loads(capsys.readouterr().out)
    assert info["num_states"] > 0
    assert info["input_deterministic"] is True
    capsys.readouterr()
    main(["fst-shortest-path", str(srt)])
    lines = capsys.readouterr().out.strip().splitlines()
    ils = list(map(int, lines[0].split()))
    ols = list(map(int, lines[1].split()))
    cost = float(lines[2])
    # best path through A∘B: arcs 1/10 (0.5) -> 3/30 (0) against B adds
    # 0.1 + 0.3; final 0.125 + 0.0
    assert ils == [1, 3]
    assert ols == [100, 300]
    assert cost == pytest.approx(0.5 + 0.1 + 0.3 + 0.125, abs=1e-5)
