"""gmm-latgen-faster (the reference's #1 entry point), decode-fmllr
two-pass adaptation, and the small lattice-archive utilities
(lattice-copy/-depth/-rmali/-add-penalty), all file-driven.

(ref: gmmbin/gmm-latgen-faster.cc, steps/decode_fmllr.sh,
 latbin/lattice-{copy,depth,rmali,add-penalty}.cc.)
"""

import contextlib
import io

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.lat.io import read_lattice_ark

from test_gmmbin_cli import _tiny_corpus


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("latgen")
    _tiny_corpus(tmp_path, n_utts=16, seed=0)
    P = lambda n: str(tmp_path / n)
    main(["train-mono", P("lexicon.txt"), P("text"),
          f"ark:{P('feats.ark')}", P("mono.npz")])
    main(["mkgraph", P("mono.npz"), P("lm.arpa"), P("hclg.npz")])
    utts = sorted(l.split()[0] for l in open(P("text")))
    with open(P("utt2spk"), "w") as f:
        for i, u in enumerate(utts):
            f.write(f"{u} spk{i % 2}\n")
    return tmp_path


def test_gmm_latgen_faster_and_lattice_utils(trained):
    tmp_path = trained
    P = lambda n: str(tmp_path / n)
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--determinize-lattice",
          "--lattice-out", P("lat.ark"),
          "--transcription-out", P("hyp.txt")])
    main(["compute-wer", P("text"), P("hyp.txt"), "--max-wer", "0"])
    lats = dict(read_lattice_ark(P("lat.ark")))
    assert len(lats) == 16
    assert all(l.num_arcs > 0 for l in lats.values())

    # copy roundtrip preserves best paths
    main(["lattice-copy", P("lat.ark"), "--out", P("lat2.ark")])

    def best_paths(ark):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            main(["lattice-best-path", ark])
        return sorted(buf.getvalue().strip().splitlines())

    assert best_paths(P("lat.ark")) == best_paths(P("lat2.ark"))

    # depth >= 1 for every utterance (at least the best path crosses
    # every frame)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["lattice-depth", P("lat.ark")])
    depths = {l.split()[0]: float(l.split()[1])
              for l in buf.getvalue().strip().splitlines()}
    assert len(depths) == 16 and all(d >= 1.0 for d in depths.values())

    # rmali strips all transition-id labels but keeps the words
    main(["lattice-rmali", P("lat.ark"), P("lat_rm.ark")])
    for _k, lat in read_lattice_ark(P("lat_rm.ark")):
        for s in range(lat.num_states):
            for a in lat.arcs[s]:
                assert a.ilabel == 0 and not getattr(a, "tids", ())
    assert best_paths(P("lat.ark")) == best_paths(P("lat_rm.ark"))

    # a huge insertion penalty shortens (or empties) every best path
    main(["lattice-add-penalty", P("lat.ark"), P("lat_pen.ark"),
          "--word-ins-penalty", "1000"])
    n_before = sum(len(l.split()) - 1 for l in best_paths(P("lat.ark")))
    n_after = sum(len(l.split()) - 1 for l in best_paths(P("lat_pen.ark")))
    assert n_after <= n_before


def test_gmm_latgen_matches_decode_faster(trained):
    tmp_path = trained
    P = lambda n: str(tmp_path / n)
    main(["decode-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp_df.txt")])
    main(["gmm-latgen-faster", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", "--transcription-out", P("hyp_lg.txt")])
    df = sorted(open(P("hyp_df.txt")).read().splitlines())
    lg = sorted(open(P("hyp_lg.txt")).read().splitlines())
    assert df == lg


def test_decode_fmllr_two_pass(trained):
    tmp_path = trained
    P = lambda n: str(tmp_path / n)
    main(["decode-fmllr", P("mono.npz"), P("hclg.npz"),
          f"ark:{P('feats.ark')}", P("utt2spk"),
          "--transcription-out", P("hyp_fm.txt"),
          "--fmllr-min-count", "50"])
    main(["compute-wer", P("text"), P("hyp_fm.txt"), "--max-wer", "0"])
