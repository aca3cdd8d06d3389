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


def test_apply_cmvn_online_cli(tmp_path, capsys):
    """(ref: online2bin/apply-cmvn-online.cc — causal per-utt CMVN)"""
    from kaldi_tpu.io.kaldi_io import write_ark, read_ark
    rng = np.random.RandomState(0)
    feats = {"u1": (rng.randn(50, 4) * 3 + 5).astype(np.float32)}
    ark = str(tmp_path / "f.ark")
    write_ark(ark, feats)
    out = str(tmp_path / "c.ark")
    main(["apply-cmvn-online", f"ark:{ark}", f"ark:{out}",
          "--cmn-window", "20"])
    got = dict(read_ark(out))["u1"]
    assert got.shape == feats["u1"].shape
    # later frames are normalized toward zero mean over the window
    assert abs(got[30:].mean()) < abs(feats["u1"][30:].mean())
    # causal: early frames depend only on the past (first frame is
    # normalized by priors/itself, not by future data)
    f2 = feats["u1"].copy()
    f2[40:] += 100.0
    ark2 = str(tmp_path / "f2.ark")
    write_ark(ark2, {"u1": f2})
    out2 = str(tmp_path / "c2.ark")
    main(["apply-cmvn-online", f"ark:{ark2}", f"ark:{out2}",
          "--cmn-window", "20"])
    got2 = dict(read_ark(out2))["u1"]
    np.testing.assert_allclose(got2[:40], got[:40], atol=1e-5)


@pytest.mark.slow
def test_lattice_align_words_cli(tmp_path, capsys):
    """(ref: latbin/lattice-align-words-lexicon.cc)"""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    import jax.numpy as jnp
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.io.model_io import save_gmm_system
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.lat.generate import decode_to_lattices
    from kaldi_tpu.lat.io import write_lattice_ark, read_lattice_ark

    rng = np.random.RandomState(42)
    lex_text = "YES Y1 Y2\nNO N1 N2"
    lex = Lexicon.parse(lex_text)
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    utts = []
    for i in range(12):
        ws = [rng.choice(["YES", "NO"]) for _ in range(2)]
        utts.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    model = train_mono(lang, utts, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    dec = BeamSearchDecoder(
        pack_graph(graph.fst, model.trans_model.id2pdf_array),
        BeamSearchOpts(beam=16.0, max_active=128, acoustic_scale=0.1))
    f = utts[0][1]
    ll = model.am.loglikes_np(f[None])
    lats = decode_to_lattices(dec, ll, np.array([f.shape[0]], np.int32),
                              lattice_beam=8.0)
    assert lats[0] is not None
    lat_ark = str(tmp_path / "lat.txt")
    write_lattice_ark(lat_ark, {"u0": lats[0]})
    mdl = str(tmp_path / "m.npz")
    save_gmm_system(mdl, model)
    lexf = tmp_path / "lexicon.txt"
    lexf.write_text(lex_text + "\n")
    out_ark = str(tmp_path / "aligned.txt")
    main(["lattice-align-words", str(lexf), mdl, lat_ark, out_ark])
    aligned = dict(read_lattice_ark(out_ark))["u0"]
    # aligned lattice: words ride arcs; best-path words preserved
    from kaldi_tpu.lat.functions import lattice_best_path
    w0 = lattice_best_path(lats[0])[0]
    w1 = lattice_best_path(aligned)[0]
    assert w0 == w1


def test_ivector_extract_online2_cli(tmp_path):
    """(ref: online2bin/ivector-extract-online2.cc — per-frame online
    i-vectors with utt2spk-carried adaptation state)"""
    from kaldi_tpu.io.kaldi_io import write_ark, read_ark
    from kaldi_tpu.io.model_io import (save_ivector_extractor,
                                       load_ivector_extractor)
    from kaldi_tpu.steps.ubm import train_diag_ubm, DiagUbmTrainOpts
    from kaldi_tpu.ivector.extractor import IvectorExtractor

    rng = np.random.RandomState(0)
    data = np.concatenate([m + rng.randn(200, 4)
                           for m in (rng.randn(3, 4) * 3)])
    ubm = train_diag_ubm(data, DiagUbmTrainOpts(num_gauss=4, num_iters=2))
    ext = IvectorExtractor(ubm, ivector_dim=3, seed=0)
    mdl = str(tmp_path / "ext.npz")
    save_ivector_extractor(mdl, ext)
    # round-trip sanity
    ext2 = load_ivector_extractor(mdl)
    np.testing.assert_allclose(ext2.M, ext.M)
    np.testing.assert_allclose(ext2.inv_covars, ext.inv_covars)

    feats = {"spkA_u1": rng.randn(30, 4).astype(np.float32),
             "spkA_u2": rng.randn(25, 4).astype(np.float32)}
    ark = str(tmp_path / "f.ark")
    write_ark(ark, feats)
    (tmp_path / "utt2spk").write_text("spkA_u1 A\nspkA_u2 A\n")
    out = str(tmp_path / "iv.ark")
    main(["ivector-extract-online2", mdl, f"ark:{ark}", f"ark:{out}",
          "--utt2spk", str(tmp_path / "utt2spk"),
          "--ivector-period", "5", "--num-gselect", "3"])
    got = dict(read_ark(out))
    assert set(got) == set(feats)
    for u, f in feats.items():
        assert got[u].shape == (f.shape[0], 3)
        assert np.isfinite(got[u]).all()
    # the i-vector evolves as stats accumulate within an utterance
    assert np.abs(got["spkA_u1"][0] - got["spkA_u1"][-1]).max() > 0 or \
        np.abs(got["spkA_u2"][0] - got["spkA_u2"][-1]).max() > 0


def test_split_scp_and_spk2utt(tmp_path, capsys):
    """(ref: utils/split_scp.pl, utils/utt2spk_to_spk2utt.pl)"""
    scp = tmp_path / "f.scp"
    scp.write_text("".join(f"utt{i:02d} /p/{i}\n" for i in range(11)))
    main(["split-scp", str(scp), "3",
          str(tmp_path / "f.JOB.scp")])
    parts = [(tmp_path / f"f.{j}.scp").read_text().splitlines()
             for j in (1, 2, 3)]
    flat = sorted(ln for p in parts for ln in p)
    assert flat == sorted(scp.read_text().splitlines())
    sizes = sorted(len(p) for p in parts)
    assert sizes[-1] - sizes[0] <= 1
    u2s = tmp_path / "utt2spk"
    u2s.write_text("u1 spkB\nu2 spkA\nu3 spkA\n")
    capsys.readouterr()
    main(["utt2spk-to-spk2utt", str(u2s)])
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["spkA u2 u3", "spkB u1"]
