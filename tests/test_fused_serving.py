"""FusedStreamingServer: N lockstep streams == offline batch decode.

Covers interleaved feeding at different rates, utterances of different
lengths, slot reuse after close(), and a full-capacity batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaldi_tpu.ops import FbankOpts, FrameOpts, MelOpts, fbank
from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
from kaldi_tpu.nnet.am_nnet import AmNnet
from kaldi_tpu.decoder.biggraph import make_big_hclg, BigGraphConfig
from kaldi_tpu.decoder.csr_beam import CsrBeamDecoder, CsrBeamOpts
from kaldi_tpu.online.serving import FusedStreamingServer


@pytest.fixture(scope="module")
def setup():
    fb_opts = FbankOpts(frame_opts=FrameOpts(dither=0.0),
                        mel_opts=MelOpts(num_bins=24))
    graph, n_tids = make_big_hclg(BigGraphConfig(
        vocab=40, avg_bigram_succ=6, num_pdfs=16, seed=3))
    cfg = TdnnConfig(feat_dim=24, num_pdfs=16, hidden_dim=64,
                     pnorm_output_dim=32, nonlinearity="relu",
                     splice_indexes=((-2, -1, 0, 1, 2), (-1, 2), (0,)))
    model = Tdnn(cfg)
    am = AmNnet(model, model.init(jax.random.PRNGKey(0)))
    dec = CsrBeamDecoder(graph, CsrBeamOpts(
        beam=11.0, max_active=128, acoustic_scale=0.1,
        expand_budget=2048, eps_budget=512, hub_threshold=64))
    srv = FusedStreamingServer(am, dec, fb_opts, n_streams=4,
                               chunk_samples=2560, t_max=256)
    return fb_opts, am, dec, srv


def _offline(am, dec, wave, fb_opts):
    feats = np.asarray(fbank(jnp.asarray(wave), fb_opts))
    ll = am.loglikes_np(feats[None])
    return dec.decode(ll, np.array([feats.shape[0]], np.int32))[0]


def test_lockstep_parity_mixed_lengths(setup):
    fb_opts, am, dec, srv = setup
    rng = np.random.default_rng(21)
    lengths = [9000, 17000, 30000, 12345]
    waves = [rng.standard_normal(L).astype(np.float32) * 4000
             for L in lengths]
    offline = [_offline(am, dec, w, fb_opts) for w in waves]
    slots = [srv.open() for _ in waves]
    assert srv.open() is None          # batch is full
    # interleave: feed different chunk sizes per stream, step as we go
    pos = [0] * len(waves)
    sizes = [2560, 1300, 5000, 2000]
    while any(p < len(w) for p, w in zip(pos, waves)):
        for i, w in enumerate(waves):
            if pos[i] < len(w):
                srv.feed(slots[i], w[pos[i]: pos[i] + sizes[i]])
                pos[i] += sizes[i]
        srv.step()
    for i in range(len(waves)):
        srv.input_finished(slots[i])
        srv.drain(slots[i])
        assert srv.finished(slots[i])
    for i, (ow, ot, oc) in enumerate(offline):
        got = srv.best_path(slots[i])
        assert got is not None
        w, t, c = got
        assert list(w) == list(ow), f"stream {i} words differ"
        assert list(t) == list(ot), f"stream {i} tids differ"
        assert c == pytest.approx(oc, rel=1e-4, abs=1e-2)
    for s in slots:
        srv.close(s)


def test_slot_reuse(setup):
    """A reopened slot must decode a fresh utterance correctly."""
    fb_opts, am, dec, srv = setup
    rng = np.random.default_rng(31)
    for round_ in range(2):
        wave = rng.standard_normal(11000).astype(np.float32) * 4000
        ow, ot, oc = _offline(am, dec, wave, fb_opts)
        s = srv.open()
        srv.feed(s, wave)
        srv.input_finished(s)
        srv.drain(s)
        w, t, c = srv.best_path(s)
        assert list(w) == list(ow)
        assert list(t) == list(ot)
        srv.close(s)


def test_staggered_open_close(setup):
    """Streams that start while others are mid-utterance stay isolated."""
    fb_opts, am, dec, srv = setup
    rng = np.random.default_rng(41)
    w1 = rng.standard_normal(20000).astype(np.float32) * 4000
    w2 = rng.standard_normal(8000).astype(np.float32) * 4000
    o1 = _offline(am, dec, w1, fb_opts)
    o2 = _offline(am, dec, w2, fb_opts)
    s1 = srv.open()
    srv.feed(s1, w1[:10000])
    srv.step()
    srv.step()
    s2 = srv.open()                    # opens mid-flight of s1
    srv.feed(s2, w2)
    srv.input_finished(s2)
    srv.feed(s1, w1[10000:])
    srv.input_finished(s1)
    srv.drain(s2)
    srv.drain(s1)
    g1 = srv.best_path(s1)
    g2 = srv.best_path(s2)
    assert list(g1[0]) == list(o1[0]) and list(g1[1]) == list(o1[1])
    assert list(g2[0]) == list(o2[0]) and list(g2[1]) == list(o2[1])
    srv.close(s1)
    srv.close(s2)


def test_serving_get_lattice(setup):
    """Per-stream online latgen equals offline latgen exactly."""
    from kaldi_tpu.lat.generate import decode_to_lattices
    fb_opts, am, dec, _srv = setup
    srv = FusedStreamingServer(am, dec, fb_opts, n_streams=2,
                               chunk_samples=2560, t_max=256,
                               keep_loglikes=True)
    rng = np.random.default_rng(51)
    waves = [rng.standard_normal(L).astype(np.float32) * 4000
             for L in (12000, 9000)]
    slots = []
    for w in waves:
        s = srv.open()
        srv.feed(s, w)
        srv.input_finished(s)
        slots.append(s)
    for s in slots:
        srv.drain(s)
    for w, s in zip(waves, slots):
        feats = np.asarray(fbank(jnp.asarray(w), fb_opts))
        ll = am.loglikes_np(feats[None])
        off = decode_to_lattices(dec, ll,
                                 np.array([feats.shape[0]], np.int32),
                                 6.0)[0]
        lat = srv.get_lattice(s, 6.0)
        assert (lat is None) == (off is None)
        if lat is None:
            continue
        po = {(wd, t): round(c, 2)
              for (wd, t, c) in off.paths(max_paths=100000)}
        pg = {(wd, t): round(c, 2)
              for (wd, t, c) in lat.paths(max_paths=100000)}
        assert po == pg


def test_serving_sharded_over_mesh(setup):
    """Stream-axis sharding over a device mesh (SURVEY §2.11): one
    lockstep serving batch spans all 8 virtual devices; results equal
    the single-device server exactly."""
    from kaldi_tpu.parallel.mesh import make_mesh
    fb_opts, am, dec, _srv = setup
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    srv = FusedStreamingServer(am, dec, fb_opts, n_streams=8,
                               chunk_samples=2560, t_max=256,
                               mesh=mesh)
    rng = np.random.default_rng(61)
    waves = [rng.standard_normal(int(L)).astype(np.float32) * 4000
             for L in rng.integers(8000, 16000, size=8)]
    offline = [_offline(am, dec, w, fb_opts) for w in waves]
    slots = [srv.open() for _ in waves]
    for s, w in zip(slots, waves):
        srv.feed(s, w)
        srv.input_finished(s)
    for s in slots:
        srv.drain(s)
    for s, (ow, ot, oc) in zip(slots, offline):
        w, t, c = srv.best_path(s)
        assert list(w) == list(ow)
        assert list(t) == list(ot)
        assert c == pytest.approx(oc, rel=1e-4, abs=1e-2)
        srv.close(s)


def test_serving_near_capacity_with_idle_slot(setup):
    """A stream decoded to within ndmax frames of t_max, with a second
    in-use-but-idle slot present across dispatches.

    Regression twin of test_fused_near_capacity_utterance: per-slot arena
    writes are fixed ndmax-row blocks at d0 and clamp without the pad —
    and an idle in-use slot writes identity records at its d0 on EVERY
    dispatch, which used to clobber a finished near-capacity stream's
    tail records."""
    fb_opts, am, dec, _srv = setup
    rng = np.random.default_rng(41)
    wave = rng.standard_normal(40000).astype(np.float32) * 4000
    total = np.asarray(fbank(jnp.asarray(wave), fb_opts)).shape[0]
    srv = FusedStreamingServer(am, dec, fb_opts, n_streams=2,
                               chunk_samples=2560, t_max=total)
    off_w, off_t, off_c = _offline(am, dec, wave, fb_opts)
    s_long = srv.open()
    s_idle = srv.open()          # never fed: idle identity writes
    srv.feed(s_long, wave)
    srv.input_finished(s_long)
    srv.drain(s_long)
    # extra dispatches after s_long finished: the idle slot writes must
    # not disturb s_long's finished arena
    srv.feed(s_idle, rng.standard_normal(6000).astype(np.float32) * 4000)
    srv.step()
    srv.step()
    got = srv.best_path(s_long)
    assert got is not None
    w, t, c = got
    assert list(w) == list(off_w)
    assert list(t) == list(off_t)
    assert c == pytest.approx(off_c, rel=1e-4, abs=1e-2)
