"""Model/graph file I/O + the file-driven decode CLI path.

(ref: the ReadKaldiObject/WriteKaldiObject contract; utils/mkgraph.sh +
 gmm-decode-faster as the file-level pipeline.)
"""

import numpy as np
import pytest

from kaldi_tpu.io.model_io import (save_gmm_system, load_gmm_system,
                                   save_hclg, load_hclg)
from kaldi_tpu.io.kaldi_io import write_ark
from kaldi_tpu.cli import main

from test_dense_decoder import yesno_graph  # noqa: F401


def test_model_roundtrip_and_cli_decode(yesno_graph, tmp_path):
    packed, model, utts = yesno_graph

    mdl = str(tmp_path / "final.mdl.npz")
    save_gmm_system(mdl, model)
    loaded = load_gmm_system(mdl)
    assert loaded.am.num_pdfs == model.am.num_pdfs
    assert (loaded.trans_model.num_transition_ids
            == model.trans_model.num_transition_ids)
    np.testing.assert_allclose(loaded.am.pdfs[0].means,
                               model.am.pdfs[0].means)
    # loglikes identical
    f = utts[0][1]
    np.testing.assert_allclose(loaded.am.loglikes_np(f[None]),
                               model.am.loglikes_np(f[None]), atol=1e-5)

    gpath = str(tmp_path / "HCLG.npz")
    save_hclg(gpath, packed)
    p2 = load_hclg(gpath)
    assert p2.num_states == packed.num_states
    np.testing.assert_array_equal(p2.ilabel, packed.ilabel)

    # file-driven decode: feats ark -> transcriptions
    feats_ark = str(tmp_path / "feats.ark")
    write_ark(feats_ark, {u: f for (u, f, _w) in utts[:4]})
    out = str(tmp_path / "trans.txt")
    main(["decode-faster", mdl, gpath, f"ark:{feats_ark}",
          f"--transcription-out={out}", "--beam=100", "--max-active=64"])
    hyps = {}
    with open(out) as fh:
        for line in fh:
            parts = line.split()
            hyps[parts[0]] = parts[1:]
    # the file-path contract: CLI output == in-process decode of the same
    # features with the same options and the IN-MEMORY model
    from kaldi_tpu.decoder.dense import make_decoder
    from kaldi_tpu.decoder.beam_search import BeamSearchOpts
    dec = make_decoder(packed, BeamSearchOpts(beam=100.0, max_active=64,
                                              acoustic_scale=0.1))
    B = 4
    T = max(f.shape[0] for (_u, f, _w) in utts[:B])
    D = utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(utts[:B]):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ref = dec.decode(model.am.loglikes_np(feats), nf)
    for b, (u, _f, _w) in enumerate(utts[:B]):
        want = [model.lang.words.sym(w) for w in ref[b][0]]
        assert hyps[u] == want, u


def test_cli_latgen_faster_mapped(yesno_graph, tmp_path, capsys):
    """Graph + loglike matrices -> transcriptions + text lattices."""
    packed, model, utts = yesno_graph
    gpath = str(tmp_path / "HCLG.npz")
    save_hclg(gpath, packed)
    # precomputed pdf loglikes for 2 utterances
    ll_ark = str(tmp_path / "ll.ark")
    lls = {}
    for (u, f, _w) in utts[:2]:
        lls[u] = model.am.loglikes_np(f[None])[0].astype(np.float32)
    write_ark(ll_ark, lls)
    lat_out = str(tmp_path / "lat.txt")
    main(["latgen-faster-mapped", gpath, f"ark:{ll_ark}",
          f"--lattice-out={lat_out}", "--beam=100", "--max-active=64"])
    out = capsys.readouterr().out
    lines = dict(line.split(None, 1) if " " in line else (line, "")
                 for line in out.strip().splitlines())
    assert set(lines) == {u for (u, _f, _w) in utts[:2]}
    # lattice best paths match the printed transcriptions
    from kaldi_tpu.lat.io import read_lattice_ark
    from kaldi_tpu.lat.functions import lattice_best_path
    got = dict(read_lattice_ark(lat_out))
    for u in got:
        res = lattice_best_path(got[u])
        assert " ".join(str(w) for w in res[0]) == lines[u].strip()


def test_cli_mkgraph(yesno_graph, tmp_path):
    packed, model, _utts = yesno_graph
    mdl = str(tmp_path / "m.npz")
    save_gmm_system(mdl, model)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("\\data\\\nngram 1=4\n\n\\1-grams:\n-1\tNO\n-1\tYES\n"
                    "-99\t<s>\n-1\t</s>\n\n\\end\\\n")
    gout = str(tmp_path / "HCLG.npz")
    main(["mkgraph", mdl, str(arpa), gout])
    g = load_hclg(gout)
    assert g.num_states == packed.num_states


def test_save_load_without_npz_suffix(tmp_path):
    """Regression: np.savez(str path) appends '.npz', breaking verbatim
    save->load round trips for user-supplied extensionless paths."""
    import numpy as np
    from kaldi_tpu.decoder.graph_pack import PackedGraph
    from kaldi_tpu.io.model_io import save_hclg, load_hclg
    g = PackedGraph(
        start=0,
        arc_start=np.array([0, 1, 1], np.int32),
        ilabel=np.array([1], np.int32),
        olabel=np.array([2], np.int32),
        cost=np.array([0.5], np.float32),
        nextstate=np.array([1], np.int32),
        pdf=None,
        final=np.array([np.inf, 0.0], np.float32))
    p = str(tmp_path / "HCLG.graph")   # no .npz suffix
    save_hclg(p, g)
    import os
    assert os.path.exists(p)
    g2 = load_hclg(p)
    assert g2.start == 0
    np.testing.assert_allclose(g2.cost, g.cost)


def test_cli_latgen_determinize_lattice(yesno_graph, tmp_path, capsys):
    """--determinize-lattice writes word-level deterministic lattices
    whose best path matches the raw decode (ref: gmm-latgen-faster's
    default determinize-lattice=true, decoder-wrappers.cc:267)."""
    packed, model, utts = yesno_graph
    gpath = str(tmp_path / "HCLG.npz")
    save_hclg(gpath, packed)
    ll_ark = str(tmp_path / "ll.ark")
    lls = {}
    for (u, f, _w) in utts[:2]:
        lls[u] = model.am.loglikes_np(f[None])[0].astype(np.float32)
    write_ark(ll_ark, lls)
    raw_out = str(tmp_path / "raw.txt")
    det_out = str(tmp_path / "det.txt")
    main(["latgen-faster-mapped", gpath, f"ark:{ll_ark}",
          f"--lattice-out={raw_out}", "--beam=100", "--max-active=64"])
    t_raw = capsys.readouterr().out
    main(["latgen-faster-mapped", gpath, f"ark:{ll_ark}",
          f"--lattice-out={det_out}", "--determinize-lattice",
          "--beam=100", "--max-active=64"])
    t_det = capsys.readouterr().out
    assert t_raw == t_det   # best paths unchanged by determinization
    from kaldi_tpu.lat.io import read_lattice_ark
    det = dict(read_lattice_ark(det_out))
    for u, lat in det.items():
        # word-level deterministic: no state has two out-arcs with the
        # same word label, and word-eps arcs only carry costs/tids
        for s in range(lat.num_states):
            seen = set()
            for a in lat.arcs[s]:
                assert a.ilabel == 0       # tids live in the weight
                if a.olabel:
                    assert a.olabel not in seen
                    seen.add(a.olabel)
