"""Second leftovers batch: fstbin copy/stochasticity checks, fgmm
global conversions, lattice reverse/combine/nbest re-merge, online2
wav utilities, pitch interpolation, row extraction, transform-dim
extension, model-copy round trips.

(ref: fstbin/{fstcopy,fstisstochastic,fsts-to-transcripts}.cc,
 fgmmbin/{fgmm-global-to-gmm,fgmm-global-acc-stats-post}.cc,
 latbin/{lattice-reverse,lattice-combine,nbest-to-lattice}.cc,
 online2bin/{extend-wav-with-silence,online2-wav-dump-features}.cc,
 featbin/{interpolate-pitch,extract-rows,extend-transform-dim,
 copy-feats-to-sphinx,compute-and-process-kaldi-pitch-feats}.cc.)
"""

import struct

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import open_rspecifier, write_ark
from kaldi_tpu.io.wave import read_wave, write_wave
from kaldi_tpu.lat.io import read_lattice_ark, write_lattice_ark
from kaldi_tpu.lat.lattice import Lattice


def _linear_lattice(labels, cost=1.0):
    lat = Lattice()
    for _ in range(len(labels) + 1):
        lat.add_state()
    lat.start = 0
    for i, w in enumerate(labels):
        lat.add_arc(i, i + 1, w, cost, 0.5, i + 1)
    lat.set_final(len(labels), 0.25, 0.0)
    return lat


def _best_words(lat):
    best = None
    for (words, _tids, tot) in lat.paths():
        if best is None or tot < best[1]:
            best = (words, tot)
    return best


def test_fst_copy_and_stochastic(tmp_path, capsys):
    fst_txt = tmp_path / "f.txt"
    # state 0 splits probability 0.5/0.5 (stochastic in the log
    # semiring); costs are -log(p).
    c = 0.6931471805599453
    fst_txt.write_text(f"0 1 1 1 {c}\n0 1 2 2 {c}\n1 {0.0}\n")
    main(["fstcopy", str(fst_txt), str(tmp_path / "g.txt")])
    main(["fstisstochastic", str(tmp_path / "g.txt"),
          "--delta", "1e-4"])
    lo, hi = map(float, capsys.readouterr().out.split())
    assert abs(lo) < 1e-6 and abs(hi) < 1e-6
    # a deficient state (sums to 0.5) must fail the check
    bad = tmp_path / "bad.txt"
    bad.write_text(f"0 1 1 1 {c}\n1 0\n")
    with pytest.raises(SystemExit):
        main(["fstisstochastic", str(bad), "--delta", "1e-4"])


def test_fsts_to_transcripts(tmp_path, capsys):
    blocks = tmp_path / "fsts.txt"
    # utt1: two paths, the cheap one outputs 7 8; utt2: outputs 9
    blocks.write_text(
        "utt1\n0 1 1 7 0.1\n1 2 1 8 0.1\n0 2 1 6 5.0\n2 0\n"
        "\n"
        "utt2\n0 1 2 9 0.0\n1 0\n")
    main(["fsts-to-transcripts", str(blocks)])
    out = dict(line.split(maxsplit=1)
               for line in capsys.readouterr().out.splitlines())
    assert out["utt1"].split() == ["7", "8"]
    assert out["utt2"].split() == ["9"]


def test_fgmm_global_round_trip(tmp_path):
    from kaldi_tpu.gmm.full_gmm import FullGmm
    from kaldi_tpu.io.model_io import load_ubm, save_ubm
    rng = np.random.default_rng(0)
    D, G = 3, 2
    covars = np.stack([np.eye(D) * (i + 1) + 0.1 for i in range(G)])
    full = FullGmm(np.array([0.4, 0.6]), rng.normal(size=(G, D)), covars)
    save_ubm(str(tmp_path / "full.ubm"), full)
    main(["gmm-global-copy", str(tmp_path / "full.ubm"),
          str(tmp_path / "copy.ubm")])
    again = load_ubm(str(tmp_path / "copy.ubm"))
    np.testing.assert_allclose(again.covars, covars)
    main(["fgmm-global-to-gmm", str(tmp_path / "full.ubm"),
          str(tmp_path / "diag.ubm")])
    diag = load_ubm(str(tmp_path / "diag.ubm"))
    np.testing.assert_allclose(
        diag.vars, np.stack([np.diag(c) for c in covars]))
    np.testing.assert_allclose(diag.means, full.means)


def test_fgmm_global_acc_stats_post(tmp_path):
    """Stats from explicit posteriors == direct accumulate_from_posteriors."""
    from kaldi_tpu.gmm.full_gmm import FullGmm, AccumFullGmm
    from kaldi_tpu.hmm.posterior import write_post_line
    from kaldi_tpu.io.model_io import save_ubm
    rng = np.random.default_rng(1)
    D, G, T = 2, 2, 4
    covars = np.stack([np.eye(D), np.eye(D) * 2.0])
    ubm = FullGmm(np.array([0.5, 0.5]), rng.normal(size=(G, D)), covars)
    save_ubm(str(tmp_path / "u.ubm"), ubm)
    x = rng.normal(size=(T, D)).astype(np.float32)
    write_ark(f"{tmp_path}/f.ark", {"utt1": x})
    P = np.abs(rng.normal(size=(T, G)))
    P /= P.sum(1, keepdims=True)
    with open(tmp_path / "post.txt", "w") as f:
        write_post_line(f, "utt1",
                        [[(g, float(P[t, g])) for g in range(G)]
                         for t in range(T)])
    main(["fgmm-global-acc-stats-post", str(tmp_path / "u.ubm"),
          f"ark:{tmp_path}/f.ark", str(tmp_path / "post.txt"),
          str(tmp_path / "accs.npz")])
    got = np.load(tmp_path / "accs.npz")
    want = AccumFullGmm(G, D)
    want.accumulate_from_posteriors(x.astype(np.float64), P)
    np.testing.assert_allclose(got["occ"], want.occ, rtol=1e-4)
    np.testing.assert_allclose(got["mean_acc"], want.mean_acc, rtol=1e-4)
    np.testing.assert_allclose(got["cov_acc"], want.cov_acc, rtol=1e-4)
    assert int(got["full"]) == 1


def test_lattice_reverse(tmp_path):
    lat = _linear_lattice([5, 6, 7])
    write_lattice_ark(f"{tmp_path}/in.ark", {"u": lat})
    main(["lattice-reverse", f"{tmp_path}/in.ark", f"{tmp_path}/rev.ark"])
    (key, rev), = list(read_lattice_ark(f"{tmp_path}/rev.ark"))
    words, tot = _best_words(rev)
    fw_words, fw_tot = _best_words(lat)
    assert list(words) == [7, 6, 5]
    assert abs(tot - fw_tot) < 1e-6


def test_lattice_combine_and_nbest(tmp_path):
    a = _linear_lattice([1, 2], cost=1.0)
    b = _linear_lattice([3], cost=0.25)
    write_lattice_ark(f"{tmp_path}/a.ark", {"u": a})
    write_lattice_ark(f"{tmp_path}/b.ark", {"u": b})
    main(["lattice-combine", f"{tmp_path}/u.ark",
          f"{tmp_path}/a.ark", f"{tmp_path}/b.ark"])
    (_, u), = list(read_lattice_ark(f"{tmp_path}/u.ark"))
    words, _ = _best_words(u)
    assert list(words) == [3]   # the cheaper path survives
    paths = {ws for (ws, _, _) in u.paths()}
    assert paths == {(1, 2), (3,)}          # but both are present
    # nbest-to-lattice strips the -N suffix and unions per base key
    write_lattice_ark(f"{tmp_path}/nb.ark", {"utt-1": a, "utt-2": b})
    main(["nbest-to-lattice", f"{tmp_path}/nb.ark", f"{tmp_path}/m.ark"])
    (key, m), = list(read_lattice_ark(f"{tmp_path}/m.ark"))
    assert key == "utt"
    assert {ws for (ws, _, _) in m.paths()} \
        == {(1, 2), (3,)}


def test_extend_wav_with_silence(tmp_path):
    sr = 8000.0
    w = (np.sin(2 * np.pi * 440 * np.arange(800) / sr) * 1000)[None, :]
    write_wave(str(tmp_path / "a.wav"), w.astype(np.float32), sr)
    (tmp_path / "wav.scp").write_text(f"a {tmp_path}/a.wav\n")
    main(["extend-wav-with-silence", str(tmp_path / "wav.scp"),
          str(tmp_path / "ext"), "--extend-secs", "0.1"])
    scp = dict(line.split() for line in
               open(tmp_path / "ext" / "wav.scp"))
    out, sr2 = read_wave(scp["a"])
    assert sr2 == sr and out.shape[1] == 800 + 800
    assert np.all(out[:, 800:] == 0)


def test_online2_wav_dump_features_matches_offline(tmp_path):
    """Chunked online dump == offline compute-mfcc-feats + add-deltas."""
    sr = 16000.0
    rng = np.random.default_rng(3)
    w = (rng.normal(size=int(0.5 * sr)) * 500).astype(np.float32)[None]
    write_wave(str(tmp_path / "a.wav"), w, sr)
    (tmp_path / "wav.scp").write_text(f"a {tmp_path}/a.wav\n")
    main(["online2-wav-dump-features", str(tmp_path / "wav.scp"),
          f"ark:{tmp_path}/on.ark", "--chunk-secs", "0.13"])
    main(["compute-mfcc-feats", str(tmp_path / "wav.scp"),
          f"ark:{tmp_path}/raw.ark", "--dither", "0"])
    main(["add-deltas", f"ark:{tmp_path}/raw.ark",
          f"ark:{tmp_path}/off.ark"])
    (_, on), = list(open_rspecifier(f"ark:{tmp_path}/on.ark"))
    (_, off), = list(open_rspecifier(f"ark:{tmp_path}/off.ark"))
    assert on.shape == off.shape
    np.testing.assert_allclose(on, off, atol=1e-3)


def test_interpolate_pitch(tmp_path):
    # frames 0 and 3 are voiced (nccf 0.9); 1-2 get interpolated
    f = np.array([[0.9, 100.0], [0.0, 55.0], [0.0, 44.0], [0.9, 130.0]],
                 np.float32)
    write_ark(f"{tmp_path}/p.ark", {"u": f})
    main(["interpolate-pitch", f"ark:{tmp_path}/p.ark",
          f"ark:{tmp_path}/q.ark"])
    (_, q), = list(open_rspecifier(f"ark:{tmp_path}/q.ark"))
    np.testing.assert_allclose(q[:, 1], [100.0, 110.0, 120.0, 130.0],
                               rtol=1e-5)
    np.testing.assert_allclose(q[:, 0], f[:, 0])


def test_extract_rows(tmp_path):
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    write_ark(f"{tmp_path}/f.ark", {"u": x})
    (tmp_path / "ranges").write_text("seg1 u 2 5\nseg2 u 7 10\n")
    main(["extract-rows", str(tmp_path / "ranges"),
          f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/o.ark"])
    segs = dict(open_rspecifier(f"ark:{tmp_path}/o.ark"))
    np.testing.assert_allclose(segs["seg1"], x[2:5])
    np.testing.assert_allclose(segs["seg2"], x[7:10])


def test_extend_transform_dim(tmp_path):
    # affine 2x3 transform extended to dim 4: identity on new dims,
    # offset column preserved
    M = np.array([[1.0, 2.0, 0.5], [3.0, 4.0, -0.5]], np.float32)
    write_ark(f"{tmp_path}/t.ark", {"t": M})
    main(["extend-transform-dim", f"{tmp_path}/t.ark",
          f"{tmp_path}/t4.ark", "--new-dimension", "4"])
    (_, E), = list(open_rspecifier(f"ark:{tmp_path}/t4.ark"))
    assert E.shape == (4, 5)
    np.testing.assert_allclose(E[:2, :2], M[:, :2])
    np.testing.assert_allclose(E[:2, -1], M[:, -1])
    np.testing.assert_allclose(E[2:, 2:4], np.eye(2))
    x = np.array([0.3, -0.7, 1.1, 2.2, 1.0])
    np.testing.assert_allclose(
        (E @ x)[:2], M @ np.array([0.3, -0.7, 1.0]), rtol=1e-6)
    np.testing.assert_allclose((E @ x)[2:], [1.1, 2.2], rtol=1e-6)


def test_model_copies(tmp_path):
    from kaldi_tpu.cli import _load_fmpe, _save_fmpe
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.transform.fmpe import Fmpe
    rng = np.random.default_rng(5)
    D, G = 3, 4
    gmm = DiagGmm(np.full(G, 1.0 / G), rng.normal(size=(G, D)),
                  np.ones((G, D)))
    fmpe = Fmpe(gmm, D)
    _save_fmpe(str(tmp_path / "f.fmpe"), fmpe)
    main(["fmpe-copy", str(tmp_path / "f.fmpe"),
          str(tmp_path / "g.fmpe")])
    again = _load_fmpe(str(tmp_path / "g.fmpe"))
    np.testing.assert_allclose(again.M, fmpe.M)
    # logistic-regression-copy round-trips npz blobs
    np.savez(open(tmp_path / "lr.npz", "wb"),
             W=rng.normal(size=(3, 5)), classes=np.arange(3))
    main(["logistic-regression-copy", str(tmp_path / "lr.npz"),
          str(tmp_path / "lr2.npz")])
    z = np.load(tmp_path / "lr2.npz")
    np.testing.assert_allclose(z["W"], np.load(tmp_path / "lr.npz")["W"])
    # copy-gselect is a pass-through
    (tmp_path / "gs.txt").write_text("utt1 [ 0 1 2 ]\n")
    main(["copy-gselect", str(tmp_path / "gs.txt"),
          str(tmp_path / "gs2.txt")])
    assert open(tmp_path / "gs2.txt").read() == "utt1 [ 0 1 2 ]\n"


def test_copy_feats_to_sphinx(tmp_path):
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    write_ark(f"{tmp_path}/f.ark", {"u": x})
    main(["copy-feats-to-sphinx", f"ark:{tmp_path}/f.ark",
          str(tmp_path / "sph")])
    raw = open(tmp_path / "sph" / "u.mfc", "rb").read()
    (count,) = struct.unpack(">i", raw[:4])
    assert count == 6
    got = np.frombuffer(raw[4:], ">f4").reshape(2, 3)
    np.testing.assert_allclose(got, x)


@pytest.mark.slow
def test_compute_and_process_pitch_cli(tmp_path):
    sr = 8000.0
    t = np.arange(int(0.5 * sr)) / sr
    w = (np.sin(2 * np.pi * 150 * t) * 8000).astype(np.float32)[None]
    write_wave(str(tmp_path / "a.wav"), w, sr)
    (tmp_path / "wav.scp").write_text(f"a {tmp_path}/a.wav\n")
    main(["compute-and-process-kaldi-pitch-feats",
          str(tmp_path / "wav.scp"), f"ark:{tmp_path}/p.ark",
          "--sample-frequency", "8000"])
    (_, p), = list(open_rspecifier(f"ark:{tmp_path}/p.ark"))
    assert p.shape[1] == 3 and p.shape[0] > 10
    # a clean 150 Hz tone: delta-pitch ~ 0 once locked on
    assert np.abs(p[5:, 2]).mean() < 0.1
