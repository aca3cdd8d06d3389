"""nnet3 config generator + lattice text serialization + KWS integration.

(ref: steps/nnet3/make_tdnn_configs.py; lat/kaldi-lattice.h text holders;
 end-to-end decoder->lattice->KWS path.)
"""

import io

import numpy as np
import pytest

import jax

from kaldi_tpu.nnet3 import Nnet3
from kaldi_tpu.nnet3.configs import make_tdnn_config
from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.io import (write_lattice_ark, read_lattice_ark,
                              write_lattice_text)
from kaldi_tpu.lat.functions import lattice_best_path, nbest
from kaldi_tpu.cli import main


def test_make_tdnn_config_builds_and_runs():
    cfg = make_tdnn_config(feat_dim=13, num_targets=50,
                           splice_indexes=((-2, -1, 0, 1, 2), (-1, 2),
                                           (0,)),
                           hidden_dim=64)
    net = Nnet3(cfg)
    assert (net.left_context, net.right_context) == (3, 4)
    params = net.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp
    x = jnp.zeros((1, 20, 13))
    y = net.apply(params, x, pad_context=True)
    assert y.shape == (1, 20, 50)
    np.testing.assert_allclose(np.exp(np.asarray(y)).sum(-1), 1.0,
                               atol=1e-4)


def _lat():
    lat = Lattice()
    s = [lat.add_state() for _ in range(4)]
    lat.start = s[0]
    lat.add_arc(s[0], 3, 7, 0.25, 0.5, s[1])
    lat.add_arc(s[1], 4, 8, 0.25, 0.5, s[2])
    lat.add_arc(s[0], 5, 9, 1.0, 1.0, s[3])
    lat.set_final(s[2], 0.1, 0.2)
    lat.set_final(s[3])
    return lat


def test_lattice_text_roundtrip(tmp_path):
    lats = {"utt1": _lat(), "utt2": _lat()}
    path = str(tmp_path / "lat.txt")
    write_lattice_ark(path, lats)
    got = dict(read_lattice_ark(path))
    assert set(got) == {"utt1", "utt2"}
    a = sorted((tuple(w), round(c, 5)) for (w, _t, c) in nbest(lats["utt1"], 5))
    b = sorted((tuple(w), round(c, 5)) for (w, _t, c) in nbest(got["utt1"], 5))
    assert a == b


def test_cli_lattice_best_path(tmp_path, capsys):
    write_lattice_ark(str(tmp_path / "l.txt"), {"u": _lat()})
    main(["lattice-best-path", str(tmp_path / "l.txt")])
    out = capsys.readouterr().out
    assert out.strip() == "u 7 8"
    # word insertion penalty flips to the 1-word path
    main(["lattice-best-path", str(tmp_path / "l.txt"),
          "--word-ins-penalty=2.0"])
    out = capsys.readouterr().out
    assert out.strip() == "u 9"


def test_decoder_to_kws_integration():
    """Decode -> lattices -> KWS index -> keyword hit with times."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_dense_decoder import yesno_graph as _yg  # noqa: F401
    # build the system inline (fixture funcs can't be called directly)
    import jax.numpy as jnp
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.lat.generate import decode_to_lattices
    from kaldi_tpu.kws import lattice_to_kws_index, search_index

    rng = np.random.RandomState(51)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    utts = []
    for i in range(10):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 4))]
        utts.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    model = train_mono(lang, utts, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, model.trans_model, model.ctx_dep,
                      self_loop_scale=0.1)
    dec = BeamSearchDecoder(pack_graph(graph.fst,
                                       model.trans_model.id2pdf_array),
                            BeamSearchOpts(beam=14.0, max_active=128,
                                           acoustic_scale=0.1))
    # pick an utterance containing YES
    target = next(u for u in utts if "YES" in u[1:][1] or "YES" in u[2])
    f = target[1]
    lats = decode_to_lattices(dec, model.am.loglikes_np(f[None]),
                              np.array([f.shape[0]]), lattice_beam=8.0)
    assert lats[0] is not None
    idx = lattice_to_kws_index(lats[0], target[0])
    yes_id = lang.words["YES"]
    hits = search_index([idx], [yes_id])
    n_yes = sum(1 for w in target[2] if w == "YES")
    assert len(hits) >= n_yes
    for (_u, t0, t1, p) in hits[:n_yes]:
        assert 0 <= t0 < t1 <= f.shape[0]
        assert p > 0.5
