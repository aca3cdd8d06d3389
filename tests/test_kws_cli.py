"""File-driven KWS chain through the CLI: lattice-to-kws-index ->
kws-index-union -> kws-search --index, plus compute-atwv,
generate-proxy-keywords and transcripts-to-fsts.

(ref: kwsbin/* + babel recipe local/kws_search.sh — index build, union
 over job shards, search, then ATWV scoring.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.io import write_lattice_ark


def _two_path_lattice():
    lat = Lattice()
    s0, s1, s2, s3 = (lat.add_state() for _ in range(4))
    lat.start = s0
    lat.add_arc(s0, 1, 7, 1.0, 0.0, s1)
    lat.add_arc(s0, 2, 8, 2.0, 0.0, s1)
    lat.add_arc(s1, 3, 9, 0.0, 0.0, s2)
    lat.add_arc(s2, 0, 0, 0.0, 0.0, s3)
    lat.set_final(s3)
    return lat


def _one_word_lattice(word):
    lat = Lattice()
    s0, s1 = lat.add_state(), lat.add_state()
    lat.start = s0
    lat.add_arc(s0, 1, word, 0.0, 0.0, s1)
    lat.set_final(s1)
    return lat


def test_kws_index_build_union_search(tmp_path, capsys):
    P = lambda n: str(tmp_path / n)
    write_lattice_ark(P("a.ark"), {"utt1": _two_path_lattice()})
    write_lattice_ark(P("b.ark"), {"utt2": _one_word_lattice(7)})
    main(["lattice-to-kws-index", P("a.ark"), P("a.idx")])
    main(["lattice-to-kws-index", P("b.ark"), P("b.idx")])
    main(["kws-index-union", P("u.idx"), P("a.idx"), P("b.idx")])
    (tmp_path / "kw").write_text("KW1 7\nKW2 7 9\n")
    capsys.readouterr()
    main(["kws-search", P("u.idx"), P("kw"), "--index"])
    out = capsys.readouterr().out.strip().splitlines()
    hits = {}
    for line in out:
        kwid, utt, t0, t1, p = line.split()
        hits[(kwid, utt)] = float(p)
    pa = np.exp(-1) / (np.exp(-1) + np.exp(-2))
    assert hits[("KW1", "utt1")] == pytest.approx(pa, abs=1e-4)
    assert hits[("KW1", "utt2")] == pytest.approx(1.0, abs=1e-4)
    assert hits[("KW2", "utt1")] == pytest.approx(pa, abs=1e-4)
    assert ("KW2", "utt2") not in hits
    # searching the raw ark (no index file) gives identical posteriors
    capsys.readouterr()
    main(["kws-search", P("a.ark"), P("kw")])
    out2 = capsys.readouterr().out.strip().splitlines()
    direct = {}
    for line in out2:
        kwid, utt, t0, t1, p = line.split()
        direct[(kwid, utt)] = float(p)
    assert direct[("KW1", "utt1")] == pytest.approx(hits[("KW1", "utt1")])


def test_compute_atwv_cli(tmp_path, capsys):
    ref = tmp_path / "ref"
    hits = tmp_path / "hits"
    # KW1: 2 refs, both found; KW2: 1 ref found + 1 false alarm
    ref.write_text("KW1 u1 0 10\nKW1 u2 5 15\nKW2 u1 20 30\n")
    hits.write_text("KW1 u1 0 10 0.9\nKW1 u2 6 14 0.8\n"
                    "KW2 u1 21 29 0.9\nKW2 u2 0 8 0.7\n")
    capsys.readouterr()
    main(["compute-atwv", "3600", str(ref), str(hits)])
    out = capsys.readouterr().out.splitlines()
    vals = {ln.split()[0]: float(ln.split()[1]) for ln in out}
    # KW1 perfect: TWV 1; KW2: 1 hit/1 ref but 1 FA over ~3599 trials
    assert vals["KW1"] == pytest.approx(1.0)
    assert vals["KW2"] == pytest.approx(1.0 - 999.9 / 3599.0, rel=1e-3)
    assert vals["ATWV"] == pytest.approx((vals["KW1"] + vals["KW2"]) / 2)
    assert vals["STWV"] == pytest.approx(1.0)


def test_generate_proxy_keywords_cli(tmp_path, capsys):
    lex = tmp_path / "lexicon"
    lex.write_text("cat k ae t\ncab k ae b\ndog d ao g\n")
    kw = tmp_path / "keywords"
    kw.write_text("OOV1 k ae p\n")
    conf = tmp_path / "conf"
    conf.write_text("p t 0.2\np b 0.3\n")
    capsys.readouterr()
    main(["generate-proxy-keywords", str(kw), str(lex),
          "--confusion-matrix", str(conf), "--nbest", "2"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split() == ["OOV1", "0.200", "cat"]
    assert out[1].split() == ["OOV1", "0.300", "cab"]


def test_transcripts_to_fsts_cli(tmp_path, capsys):
    (tmp_path / "words.txt").write_text("<eps> 0\nyes 1\nno 2\n")
    (tmp_path / "text").write_text("u1 yes no\nu2 no\n")
    main(["transcripts-to-fsts", str(tmp_path / "text"),
          str(tmp_path / "fsts"), "--word-symbols",
          str(tmp_path / "words.txt")])
    from kaldi_tpu.fst.text_io import read_fst_text
    import io
    blocks = (tmp_path / "fsts").read_text().split("\n\n")
    utts = {}
    for blk in blocks:
        if not blk.strip():
            continue
        lines = blk.strip().splitlines()
        utts[lines[0]] = read_fst_text(io.StringIO("\n".join(lines[1:])))
    assert set(utts) == {"u1", "u2"}
    assert utts["u1"].get_linear_symbol_sequence()[1] == [1, 2]
    assert utts["u2"].get_linear_symbol_sequence()[1] == [2]
