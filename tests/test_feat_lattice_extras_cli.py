"""featbin extras, fMPE file protocol, and lattice extras.

(ref: featbin/{fmpe-init,fmpe-acc-stats,fmpe-sum-accs,fmpe-est,
 fmpe-apply-transform,append-feats,append-vector-to-feats,compare-feats,
 reverse-feats,remove-mean,extract-feature-segments,copy-feats-to-htk,
 process-kaldi-pitch-feats,add-deltas-sdc,detect-sinusoids}.cc;
 latbin/{lattice-to-fst,lattice-project,lattice-depth-per-frame,
 lattice-confidence,nbest-to-ctm,lattice-rescore-mapped,
 lattice-add-trans-probs,lattice-compose}.cc.)
"""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, read_ark, open_rspecifier

from test_gmmbin_cli import _tiny_corpus


def test_featbin_extras(tmp_path, capsys):
    P = lambda n: str(tmp_path / n)
    rng = np.random.RandomState(0)
    feats = {f"u{i}": rng.randn(20 + i, 6).astype(np.float32)
             for i in range(3)}
    write_ark(P("f.ark"), feats)

    main(["append-feats", f"ark:{P('f.ark')}", f"ark:{P('f.ark')}",
          f"ark:{P('ap.ark')}"])
    ap = dict(read_ark(P("ap.ark")))
    assert ap["u0"].shape == (40, 6)
    np.testing.assert_allclose(ap["u0"][:20], feats["u0"], rtol=1e-6)

    vecs = {k: rng.randn(2).astype(np.float32) for k in feats}
    write_ark(P("v.ark"), vecs)
    main(["append-vector-to-feats", f"ark:{P('f.ark')}",
          f"ark:{P('v.ark')}", f"ark:{P('av.ark')}"])
    av = dict(read_ark(P("av.ark")))
    assert av["u1"].shape == (21, 8)
    np.testing.assert_allclose(
        av["u1"][:, 6:], np.broadcast_to(vecs["u1"], (21, 2)), rtol=1e-6)

    main(["compare-feats", f"ark:{P('f.ark')}", f"ark:{P('f.ark')}"])
    with pytest.raises(SystemExit):
        write_ark(P("g.ark"), {k: -v for k, v in feats.items()})
        main(["compare-feats", f"ark:{P('f.ark')}", f"ark:{P('g.ark')}"])

    main(["reverse-feats", f"ark:{P('f.ark')}", f"ark:{P('r.ark')}"])
    np.testing.assert_allclose(
        dict(read_ark(P("r.ark")))["u0"], feats["u0"][::-1], rtol=1e-6)

    main(["remove-mean", f"ark:{P('f.ark')}", f"ark:{P('rm.ark')}"])
    for _k, v in read_ark(P("rm.ark")):
        assert np.abs(v.mean(0)).max() < 1e-5

    (tmp_path / "segments").write_text(
        "u0-a u0 0.00 0.10\nu0-b u0 0.10 0.20\n")
    main(["extract-feature-segments", f"ark:{P('f.ark')}",
          P("segments"), f"ark:{P('seg.ark')}"])
    seg = dict(read_ark(P("seg.ark")))
    assert seg["u0-a"].shape == (10, 6)
    np.testing.assert_allclose(seg["u0-b"], feats["u0"][10:20], rtol=1e-6)

    # HTK export round-trips through our HTK reader
    main(["copy-feats-to-htk", f"ark:{P('f.ark')}", P("htk")])
    from kaldi_tpu.io.htk import read_htk
    data, _hdr = read_htk(P("htk") + "/u0.fea")
    np.testing.assert_allclose(data, feats["u0"], rtol=1e-5)

    # SDC output dim = D * (1 + k)
    main(["add-deltas-sdc", f"ark:{P('f.ark')}", f"ark:{P('sdc.ark')}",
          "--k", "3"])
    assert dict(read_ark(P("sdc.ark")))["u0"].shape == (20, 24)

    # pitch post-processing shape contract
    pf = {"u0": np.stack([np.linspace(-0.5, 0.9, 30),
                          np.full(30, 120.0)], axis=1)
          .astype(np.float32)}
    write_ark(P("pf.ark"), pf)
    main(["process-pitch-feats", f"ark:{P('pf.ark')}",
          f"ark:{P('pp.ark')}"])
    assert dict(read_ark(P("pp.ark")))["u0"].shape == (30, 3)


def test_detect_sinusoids(tmp_path, capsys):
    from kaldi_tpu.io.wave import write_wave
    sr = 8000.0
    t = np.arange(int(sr)) / sr
    w = (np.sin(2 * np.pi * 440.0 * t) * 5000).astype(np.float32)
    write_wave(str(tmp_path / "a.wav"), w[None, :], sr)
    (tmp_path / "wav.scp").write_text(f"a {tmp_path / 'a.wav'}\n")
    capsys.readouterr()
    main(["detect-sinusoids", str(tmp_path / "wav.scp")])
    out = capsys.readouterr().out
    assert out.startswith("a ") and "440" in out


@pytest.mark.slow
def test_fmpe_file_protocol(tmp_path):
    """fmpe-init -> acc-stats (sharded, summed) -> est -> apply; one
    step moves features toward higher MPE auxiliary (here just checks
    the transform becomes nonzero and composes)."""
    _tiny_corpus(tmp_path, n_utts=8, seed=9)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz"),
          "--num-iters", "6", "--totgauss", "40"])
    main(["gmm-align", P("mono.npz"), P("text"), f"ark:{P('feats.ark')}",
          f"ark:{P('ali.ark')}"])
    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    main(["train-ubm", f"ark:{P('feats.ark')}", P("ubm.npz"),
          "--num-gauss", "8", "--num-iters", "2"])
    main(["fmpe-init", P("ubm.npz"), P("fmpe0.npz")])
    # zero transform: apply is identity
    main(["fmpe-apply-transform", P("fmpe0.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('id.ark')}"])
    feats = dict(open_rspecifier(f"ark:{P('feats.ark')}"))
    for k, v in read_ark(P("id.ark")):
        np.testing.assert_allclose(v, feats[k], atol=1e-5)
    # sharded accumulation == unsharded
    utts = sorted(feats)
    post_lines = {l.split()[0]: l for l in open(P("post.txt"))}
    for name, keys in (("p1.txt", utts[:4]), ("p2.txt", utts[4:])):
        with open(P(name), "w") as f:
            for u in keys:
                f.write(post_lines[u])
    main(["fmpe-acc-stats", P("mono.npz"), P("fmpe0.npz"),
          f"ark:{P('feats.ark')}", P("p1.txt"), P("a1.npz")])
    main(["fmpe-acc-stats", P("mono.npz"), P("fmpe0.npz"),
          f"ark:{P('feats.ark')}", P("p2.txt"), P("a2.npz")])
    main(["fmpe-sum-accs", P("a.npz"), P("a1.npz"), P("a2.npz")])
    main(["fmpe-acc-stats", P("mono.npz"), P("fmpe0.npz"),
          f"ark:{P('feats.ark')}", P("post.txt"), P("a_all.npz")])
    np.testing.assert_allclose(np.load(P("a.npz"))["acc"],
                               np.load(P("a_all.npz"))["acc"],
                               rtol=1e-8)
    main(["fmpe-est", P("fmpe0.npz"), P("a.npz"), P("fmpe1.npz")])
    assert np.abs(np.load(P("fmpe1.npz"))["M"]).max() > 0
    main(["fmpe-apply-transform", P("fmpe1.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('out.ark')}"])
    moved = dict(read_ark(P("out.ark")))
    assert any(not np.allclose(moved[k], feats[k]) for k in feats)


@pytest.mark.slow
def test_lattice_extras(tmp_path, capsys):
    _tiny_corpus(tmp_path, n_utts=8, seed=8)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--lattice-out", P("lat.ark"),
          "--beam", "14"])
    from kaldi_tpu.lat.io import read_lattice_ark

    main(["lattice-project", P("lat.ark"), P("proj.ark")])
    for _k, lat in read_lattice_ark(P("proj.ark")):
        for arcs in lat.arcs:
            for a in arcs:
                assert a.ilabel == a.olabel

    capsys.readouterr()
    main(["lattice-depth-per-frame", P("lat.ark")])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 8
    assert all(int(x) >= 1 for x in lines[0].split()[1:])

    main(["lattice-confidence", P("lat.ark")])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 8
    assert all(float(l.split()[1]) >= 0 for l in out)

    main(["lattice-1best", P("lat.ark"), P("one.ark"),
          "--acoustic-scale", "0.1"])
    capsys.readouterr()
    main(["nbest-to-ctm", P("one.ark")])
    ctm = capsys.readouterr().out.strip().splitlines()
    assert ctm and all(len(l.split()) == 5 for l in ctm)

    main(["lattice-to-fst", P("lat.ark"), P("fsts.txt")])
    txt = open(P("fsts.txt")).read()
    assert txt.strip()

    # rescore-mapped with the SAME model's loglikes leaves best paths
    # equivalent (acoustic costs recomputed identically)
    main(["gmm-compute-likes", P("mono.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('likes.ark')}"])
    # our lattices carry decode-time SCALED acoustic costs, so the
    # identity rescore uses the same 0.1 scale the decode ran at
    main(["lattice-rescore-mapped", P("mono.npz"), P("lat.ark"),
          f"ark:{P('likes.ark')}", P("resc.ark"),
          "--acoustic-scale", "0.1"])
    main(["lattice-equivalent", P("lat.ark"), P("resc.ark"),
          "--delta", "0.1"])

    main(["lattice-add-trans-probs", P("mono.npz"), P("lat.ark"),
          P("tp.ark")])
    a0 = next(iter(read_lattice_ark(P("lat.ark"))))[1]
    a1 = next(iter(read_lattice_ark(P("tp.ark"))))[1]
    g0 = sum(a.graph_cost for arcs in a0.arcs for a in arcs)
    g1 = sum(a.graph_cost for arcs in a1.arcs for a in arcs)
    assert g0 != g1

    # compose with a linear acceptor of the best path keeps exactly it
    from kaldi_tpu.lat.functions import lattice_best_path
    from kaldi_tpu.lat.io import read_lattice_ark as _rla
    k0, lat0 = next(iter(_rla(P("lat.ark"))))
    words = lattice_best_path(lat0)[0]
    from kaldi_tpu.fst.fst import Fst
    from kaldi_tpu.fst.text_io import save_fst
    acc = Fst()
    prev = acc.add_state()
    acc.start = prev
    for w in words:
        nxt = acc.add_state()
        acc.add_arc(prev, w, w, 0.0, nxt)
        prev = nxt
    acc.set_final(prev, 0.0)
    save_fst(P("acc.txt"), acc)
    main(["lattice-compose", P("lat.ark"), P("acc.txt"), P("comp.ark")])
    comp = dict(_rla(P("comp.ark")))
    assert lattice_best_path(comp[k0])[0] == words
