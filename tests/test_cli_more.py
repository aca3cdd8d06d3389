"""CLI surface: the featbin/latbin-style subcommands added for parity
(transform/paste/subset feats, sliding CMVN, copy-matrix, ali-to-phones,
lattice-{scale,prune,to-nbest,mbr-decode,oracle}).
"""

import io
import sys

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, read_ark


def _run(argv, capsys):
    main(argv)
    return capsys.readouterr().out


def test_transform_paste_subset_feats(tmp_path, capsys):
    rng = np.random.RandomState(0)
    feats = {f"u{i}": rng.randn(6, 3).astype(np.float32) for i in range(3)}
    fark = str(tmp_path / "f.ark")
    write_ark(fark, sorted(feats.items()))
    # affine transform [2, 4]
    W = np.array([[1.0, 0, 0, 0.5], [0, 2.0, 0, 0]], np.float32)
    tark = str(tmp_path / "t.ark")
    write_ark(tark, [("t", W)])
    oark = str(tmp_path / "o.ark")
    main(["transform-feats", tark, f"ark:{fark}", f"ark:{oark}"])
    got = dict(read_ark(oark))
    want = feats["u1"] @ W[:, :3].T + W[:, 3]
    np.testing.assert_allclose(got["u1"], want, atol=1e-5)

    park = str(tmp_path / "p.ark")
    main(["paste-feats", f"ark:{fark}", f"ark:{fark}", f"ark:{park}"])
    got = dict(read_ark(park))
    assert got["u0"].shape == (6, 6)

    sark = str(tmp_path / "s.ark")
    main(["subset-feats", f"ark:{fark}", f"ark:{sark}", "--n", "2"])
    assert len(dict(read_ark(sark))) == 2


def test_sliding_cmvn_and_copy_matrix(tmp_path, capsys):
    rng = np.random.RandomState(1)
    feats = rng.randn(50, 4).astype(np.float32) + 3.0
    fark = str(tmp_path / "f.ark")
    write_ark(fark, [("u", feats)])
    oark = str(tmp_path / "o.ark")
    main(["apply-cmvn-sliding", f"ark:{fark}", f"ark:{oark}",
          "--cmn-window", "25", "--min-window", "10"])
    got = dict(read_ark(oark))["u"]
    assert abs(got.mean()) < abs(feats.mean())  # mean largely removed

    cark = str(tmp_path / "c.ark")
    main(["copy-matrix", f"ark:{fark}", f"ark:{cark}", "--scale", "2.0"])
    np.testing.assert_allclose(dict(read_ark(cark))["u"], feats * 2.0,
                               rtol=1e-6)


def _toy_lattice_ark(tmp_path):
    from kaldi_tpu.lat.lattice import Lattice
    from kaldi_tpu.lat.io import write_lattice_ark
    lat = Lattice()
    s0, s1, s2 = lat.add_state(), lat.add_state(), lat.add_state()
    lat.start = s0
    lat.add_arc(s0, 1, 7, 0.0, 1.0, s1)
    lat.add_arc(s0, 2, 8, 0.0, 2.0, s2)
    lat.add_arc(s1, 3, 9, 0.0, 0.5, s2)
    lat.set_final(s2)
    path = str(tmp_path / "lat.ark")
    write_lattice_ark(path, {"u": lat})
    return path


def test_lattice_subcommands(tmp_path, capsys):
    lark = _toy_lattice_ark(tmp_path)
    out = _run(["lattice-to-nbest", lark, "--n", "2"], capsys)
    assert out.startswith("u-1 ")
    assert "u-2" in out

    sark = str(tmp_path / "scaled.ark")
    main(["lattice-scale", lark, sark, "--acoustic-scale", "0.5"])
    out = _run(["lattice-to-nbest", sark, "--n", "1"], capsys)
    # best path total = acoustic (1.0+0.5)*0.5 = 0.75
    assert float(out.split()[1]) == pytest.approx(0.75, abs=1e-4)

    park = str(tmp_path / "pruned.ark")
    main(["lattice-prune", lark, park, "--beam", "0.25"])
    out = _run(["lattice-to-nbest", park, "--n", "5"], capsys)
    assert "u-2" not in out  # worse path pruned away

    out = _run(["lattice-mbr-decode", lark, "--acoustic-scale", "1.0",
                "--lm-scale", "1.0"], capsys)
    assert out.startswith("u ")

    ref = str(tmp_path / "ref.txt")
    with open(ref, "w") as f:
        f.write("u 7 9\n")
    out = _run(["lattice-oracle", lark, ref], capsys)
    assert out.split()[0] == "u" and out.split()[1] == "0"


def test_lattice_to_ctm_conf(tmp_path, capsys):
    lark = _toy_lattice_ark(tmp_path)
    out = _run(["lattice-to-ctm-conf", lark, "--acoustic-scale", "1.0",
                "--frame-shift", "0.01"], capsys)
    lines = [l.split() for l in out.strip().splitlines()]
    # best path: arcs 7 then 9 (cost 1.5 < 2.0); two words, 1 frame each
    assert [l[4] for l in lines] == ["7", "9"]
    assert lines[0][2] == "0.00" and lines[0][3] == "0.01"
    assert lines[1][2] == "0.01"
    assert all(0.0 <= float(l[5]) <= 1.0 for l in lines)


def test_check_packed_graph_valid_and_invalid():
    """Graph verifier: silent on the yesno-style graph, raises on
    corruption (the nnet3 ComputationChecker analogue for decode)."""
    import dataclasses
    import numpy as np
    from kaldi_tpu.decoder.graph_pack import PackedGraph
    from kaldi_tpu.decoder.verify import check_packed_graph
    g = PackedGraph(
        start=0,
        arc_start=np.array([0, 2, 3, 3], np.int32),
        ilabel=np.array([5, 0, 6], np.int32),
        olabel=np.array([1, 0, 2], np.int32),
        cost=np.array([0.5, 0.1, 0.2], np.float32),
        nextstate=np.array([1, 2, 2], np.int32),
        pdf=np.array([3, -1, 4], np.int32),
        final=np.array([np.inf, np.inf, 0.0], np.float32))
    check_packed_graph(g, num_pdfs=5)  # silent
    bad = dataclasses.replace(
        g, nextstate=np.array([1, 5, 2], np.int32))
    import pytest
    with pytest.raises(ValueError, match="nextstate"):
        check_packed_graph(bad)
    bad2 = dataclasses.replace(g, pdf=np.array([3, -1, 9], np.int32))
    with pytest.raises(ValueError, match="num_pdfs"):
        check_packed_graph(bad2, num_pdfs=5)
    # eps-before-emitting ordering violation
    bad3 = dataclasses.replace(
        g,
        ilabel=np.array([0, 5, 6], np.int32),
        pdf=np.array([-1, 3, 4], np.int32))
    with pytest.raises(ValueError, match="emitting-first"):
        check_packed_graph(bad3)


def test_lattice_surgery_subcommands(tmp_path, capsys):
    lark = _toy_lattice_ark(tmp_path)
    dark = str(tmp_path / "det.ark")
    main(["lattice-determinize", lark, dark])
    out = _run(["lattice-to-nbest", dark, "--n", "5"], capsys)
    assert "u-1" in out

    park = str(tmp_path / "push.ark")
    main(["lattice-push", lark, park])
    mark = str(tmp_path / "min.ark")
    main(["lattice-minimize", lark, mark])
    # total best cost invariant under push/minimize
    for ark in (park, mark):
        out = _run(["lattice-to-nbest", ark, "--n", "1"], capsys)
        assert float(out.split()[1]) == pytest.approx(1.5, abs=1e-4)

    uark = str(tmp_path / "u.ark")
    main(["lattice-union", lark, lark, uark])
    out = _run(["lattice-to-nbest", uark, "--n", "5"], capsys)
    assert "u-1" in out

    iark = str(tmp_path / "i.ark")
    main(["lattice-interp", lark, lark, iark, "--alpha", "0.5"])
    out = _run(["lattice-to-nbest", iark, "--n", "1"], capsys)
    assert float(out.split()[1]) == pytest.approx(1.5, abs=1e-2)

    out = _run(["nbest-to-linear", lark, "--n", "2"], capsys)
    assert out.splitlines()[0].startswith("u-1 ")
