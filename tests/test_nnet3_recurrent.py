"""nnet3 recurrence: IfDefined(Offset(...)) cycles via the scan executor.

(ref: nnet3/nnet-descriptor.h:64-66 — "Failover or IfDefined might be
 useful for time t=-1 in a RNN"; nnet-compile-looped.h — the reference
 compiles recurrent configs into looped computations; here the loop is
 one lax.scan with ring-buffered recurrences.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.nnet3.network import Nnet3
from kaldi_tpu.nnet3.configs import make_lstm_config


RNN_CFG = """
input-node name=input dim=2
component name=a type=AffineComponent input-dim=3 output-dim=1
component-node name=h component=a input=Append(input, IfDefined(Offset(h, -1)))
output-node name=output input=h
"""


def test_simple_rnn_matches_manual_loop():
    """h_t = W [x_t; h_{t-1}] + b, h_{-1} = 0 — exact vs a numpy loop."""
    net = Nnet3(RNN_CFG)
    assert net.is_recurrent
    assert (net.left_context, net.right_context) == (0, 0)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    B, T = 3, 7
    x = rng.randn(B, T, 2).astype(np.float32)
    y = np.asarray(net.apply(params, jnp.asarray(x)))
    W = np.asarray(params["a"]["w"])           # [1, 3]
    b = np.asarray(params["a"]["b"])
    h = np.zeros((B, 1), np.float32)
    for t in range(T):
        inp = np.concatenate([x[:, t], h], axis=1)
        h = inp @ W.T + b
        np.testing.assert_allclose(y[:, t], h, rtol=1e-5, atol=1e-5)


def test_rnn_deeper_delay_and_positive_offset_rejected():
    cfg = RNN_CFG.replace("Offset(h, -1)", "Offset(h, -3)")
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(0))
    x = np.zeros((1, 5, 2), np.float32)
    net.apply(params, jnp.asarray(x))          # delay 3 runs
    bad = Nnet3(RNN_CFG.replace("Offset(h, -1)", "Offset(h, 1)"))
    with pytest.raises(ValueError, match="positive"):
        bad.apply(params, jnp.zeros((1, 5, 2)))


def test_required_cycle_rejected():
    cfg = RNN_CFG.replace("IfDefined(Offset(h, -1))", "Offset(h, -1)")
    # a required (non-IfDefined) cyclic dependency cannot have a static
    # context — construction must fail loudly
    with pytest.raises(ValueError, match="cycle"):
        Nnet3(cfg)


def test_zero_delay_cycle_rejected():
    cfg = RNN_CFG.replace("Offset(h, -1)", "h")
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="zero-delay"):
        net.apply(params, jnp.zeros((1, 5, 2)))


def test_lstm_config_builds_and_runs():
    cfg = make_lstm_config(feat_dim=4, num_targets=5, cell_dim=8,
                           proj_dim=6, splice=(-1, 0, 1))
    net = Nnet3(cfg)
    assert net.is_recurrent
    assert (net.left_context, net.right_context) == (1, 1)
    params = net.init(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(2, 12, 4).astype(np.float32)
    y = np.asarray(net.apply(params, jnp.asarray(x)))
    assert y.shape == (2, 12, 5)
    # log-softmax output
    np.testing.assert_allclose(np.exp(y).sum(-1), 1.0, rtol=1e-4)
    # recurrence actually carries state: permuting earlier frames must
    # change later outputs
    x2 = x.copy()
    x2[:, 0] += 1.0
    y2 = np.asarray(net.apply(params, jnp.asarray(x2)))
    assert np.abs(y2[:, -1] - y[:, -1]).max() > 1e-6


def test_lstm_gradients_flow_through_recurrence():
    cfg = make_lstm_config(feat_dim=3, num_targets=4, cell_dim=6,
                           proj_dim=4, splice=(0,),
                           final_logsoftmax=True)
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 6, 3), jnp.float32)
    tgt = jnp.asarray(rng.randint(0, 4, (2, 6)))

    def loss(p):
        y = net.apply(p, x)
        return -jnp.mean(jnp.take_along_axis(y, tgt[..., None], -1))

    g = jax.grad(loss)(params)
    # the recurrent projection W_r receives gradient through time
    gw = np.asarray(g["lstm0.W_r"]["w"])
    assert np.abs(gw).max() > 0
    # numerical check on one entry of a gate affine
    import numpy as _np
    eps = 1e-3
    w = params["lstm0.W_i"]["w"]
    for (i, j) in [(0, 0), (2, 3)]:
        pp = {**params, "lstm0.W_i": {**params["lstm0.W_i"],
                                      "w": w.at[i, j].add(eps)}}
        pm = {**params, "lstm0.W_i": {**params["lstm0.W_i"],
                                      "w": w.at[i, j].add(-eps)}}
        num = (loss(pp) - loss(pm)) / (2 * eps)
        got = float(np.asarray(g["lstm0.W_i"]["w"])[i, j])
        assert got == pytest.approx(float(num), abs=3e-3), (i, j)


@pytest.mark.slow
def test_lstm_learns_delayed_echo():
    """The config LSTM must solve a task REQUIRING memory: predict the
    input class from `delay` frames ago (cf. the nnet1 LSTM test)."""
    from kaldi_tpu.nnet3.training import Nnet3TrainOpts, train_nnet3

    delay = 3
    rng = np.random.RandomState(0)
    N, T, C = 192, 12, 3
    cls = rng.randint(0, C, (N, T))
    feats = np.eye(C, dtype=np.float32)[cls] \
        + rng.randn(N, T, C).astype(np.float32) * 0.05
    targets = np.roll(cls, delay, axis=1)
    weights = np.ones((N, T), np.float32)
    weights[:, :delay] = 0.0           # undefined before the echo starts
    cfg = make_lstm_config(feat_dim=C, num_targets=C, cell_dim=32,
                           proj_dim=16, splice=(0,))
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(3))
    egs = {"feats": feats, "targets": targets, "weights": weights}
    params, hist = train_nnet3(
        net, params, egs,
        Nnet3TrainOpts(initial_lr=0.2, final_lr=0.02, num_epochs=100,
                       minibatch_size=64, momentum=0.9), log_every=1)
    accs = [h[3] for h in hist]
    assert accs[-1] > 0.95, accs[-5:]   # observed: 1.0


@pytest.mark.slow
def test_lstm_hybrid_decode_e2e():
    """GMM alignments -> config-built nnet3 LSTM -> hybrid decode,
    WER 0 on the synthetic yesno corpus (the steps/nnet3/lstm parity
    bar, like the TDNN e2e tests)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.steps.nnet3_train import train_lstm3
    from kaldi_tpu.nnet3.training import Nnet3TrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.utils.wer import compute_wer

    rng = np.random.RandomState(42)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    train, test = [], []
    for i in range(24):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 6))]
        train.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    for i in range(8):
        ws = [rng.choice(["YES", "NO"]) for _ in range(rng.randint(2, 6))]
        test.append((f"t{i}", featize(synth_utterance(ws, rng)), ws))
    gmm = train_mono(lang, train, MonoTrainOpts(
        num_iters=12, totgauss=60, max_iter_inc=8,
        realign_iters=tuple(range(1, 12))))
    res = train_lstm3(
        gmm, train, cell_dim=64, proj_dim=32, splice=(-1, 0, 1),
        train_opts=Nnet3TrainOpts(initial_lr=0.15, final_lr=0.02,
                                  num_epochs=40, minibatch_size=64,
                                  momentum=0.9))
    assert res.history[-1][3] > 0.5, res.history[-2:]

    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, gmm.trans_model, gmm.ctx_dep,
                      self_loop_scale=0.1)
    dec = BeamSearchDecoder(
        pack_graph(graph.fst, gmm.trans_model.id2pdf_array),
        BeamSearchOpts(beam=16.0, max_active=256, acoustic_scale=0.1))
    B = len(test)
    T = max(f.shape[0] for (_u, f, _w) in test)
    D = test[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(test):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = res.am.loglikes_np(feats)
    results = dec.decode(ll, nf)
    refs, hyps = {}, {}
    for (utt, _f, words), r in zip(test, results):
        refs[utt] = words
        hyps[utt] = [lang.words.sym(w) for w in r[0]] if r else []
    stats = compute_wer(refs, hyps)
    print(stats)
    assert stats.wer == 0.0, str(stats) + repr(hyps)


@pytest.mark.slow
def test_nnet3_sequence_discriminative():
    """nnet3 config nets plug into the sequence-discriminative trainer
    (AmNnet3 duck-types AmNnet): sMBR objf does not decrease
    (ref: the nnet3 analogue of steps/nnet2/train_discriminative2.sh)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg, TrainingGraphCompiler
    from kaldi_tpu.ops import MfccOpts, FrameOpts, mfcc, add_deltas
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.steps.nnet3_train import train_tdnn3
    from kaldi_tpu.nnet3.training import Nnet3TrainOpts
    from kaldi_tpu.nnet.discriminative import (
        NnetDiscriminativeOpts, train_nnet_discriminative)
    from kaldi_tpu.decoder.graph_pack import (pack_graph, pack_graphs)
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.decoder.viterbi import viterbi_align
    from kaldi_tpu.lat.generate import decode_to_lattices

    rng = np.random.RandomState(42)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    fo = MfccOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0))

    def featize(w):
        return np.asarray(add_deltas(mfcc(jnp.asarray(w), fo), order=2,
                                     window=2))

    utts = []
    for i in range(10):
        ws = [rng.choice(["YES", "NO"]) for _ in range(2)]
        utts.append((f"u{i}", featize(synth_utterance(ws, rng)), ws))
    gmm = train_mono(lang, utts, MonoTrainOpts(
        num_iters=8, totgauss=30, max_iter_inc=6,
        realign_iters=tuple(range(1, 8))))
    res = train_tdnn3(gmm, utts, train_opts=Nnet3TrainOpts(
        initial_lr=0.1, final_lr=0.01, num_epochs=20,
        minibatch_size=64, momentum=0.9))
    am = res.am
    tm = gmm.trans_model
    lc, rc = am.model.left_context, am.model.right_context

    g = arpa_to_g(ArpaLm.parse(YESNO_ARPA), lang.words)
    graph = make_hclg(lang, g, tm, gmm.ctx_dep, self_loop_scale=0.1)
    dec = BeamSearchDecoder(pack_graph(graph.fst, tm.id2pdf_array),
                            BeamSearchOpts(beam=16.0, max_active=256,
                                           acoustic_scale=0.1))
    compiler = TrainingGraphCompiler(lang, tm, gmm.ctx_dep)
    egs = []
    for (_u, feats, words) in utts:
        T = feats.shape[0]
        ll = am.loglikes_np(feats[None])[0]
        lat = decode_to_lattices(dec, ll[None], np.array([T]),
                                 lattice_beam=8.0)[0]
        if lat is None:
            continue
        gtr = compiler.compile_transcript(list(words))
        batch = pack_graphs([gtr], tm.id2pdf_array)
        r = viterbi_align(batch, gmm.am.loglikes_np(feats[None]),
                          np.array([T]), 0.1)[0]
        if r is None:
            continue
        ctx_feats = np.pad(feats, ((lc, rc), (0, 0)), mode="edge")
        egs.append((ctx_feats, r[0], lat))
    assert len(egs) >= 5

    opts = NnetDiscriminativeOpts(criterion="smbr", num_epochs=3,
                                  learning_rate=3e-4)
    _params, hist = train_nnet_discriminative(
        am, tm, egs, opts, silence_phones={lang.phones["SIL"]})
    assert len(hist) == 3 and np.isfinite(hist).all()
    assert hist[-1] >= hist[0] - 1e-3, hist
