"""TCP streaming decode server (onlinebin demo equivalent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.online.server import AudioServer, DecodeSession, stream_wave

from test_yesno_e2e import synth_utterance, YESNO_ARPA, SR


@pytest.mark.slow
def test_tcp_server_decodes_stream():
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.ops import MfccOpts, FrameOpts
    from kaldi_tpu.steps.mono import train_mono, MonoTrainOpts
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.online.decoder import OnlineDecoder
    from kaldi_tpu.online.features import OnlineFeaturePipeline
    from kaldi_tpu.ops import mfcc, add_deltas

    rng = np.random.RandomState(33)
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
    base = BeamSearchDecoder(pack_graph(graph.fst,
                                        model.trans_model.id2pdf_array),
                             BeamSearchOpts(beam=100.0, max_active=64,
                                            acoustic_scale=0.1))

    def session():
        return DecodeSession(
            make_pipeline=lambda: OnlineFeaturePipeline(fo, delta_order=2),
            make_decoder=lambda: OnlineDecoder(base, chunk_frames=16),
            am=model.am, words=lang.words)

    server = AudioServer("127.0.0.1", 0, session)
    server.serve_in_background()
    try:
        ref = ["YES", "NO", "YES"]
        wave = synth_utterance(ref, rng)
        # the server's contract: FINAL == offline decode of the same wave
        f = featize(wave)
        offline = base.decode(model.am.loglikes_np(f[None]),
                              np.array([f.shape[0]]))[0]
        want = " ".join(lang.words.sym(w) for w in offline[0])
        lines = stream_wave("127.0.0.1", server.port, wave)
        assert lines and lines[-1].startswith("FINAL ")
        assert lines[-1] == f"FINAL {want}"
        # at least one partial update arrived before the final
        assert any(ln.startswith("PARTIAL") for ln in lines)
    finally:
        server.shutdown()


def test_tcp_server_fused_session():
    """The TCP server over FusedDecodeSession: FINAL equals offline
    decoding of the same wave through the fused single-dispatch path."""
    from kaldi_tpu.fst.fst import SymbolTable
    from kaldi_tpu.ops import FbankOpts, FrameOpts, MelOpts, fbank
    from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
    from kaldi_tpu.nnet.am_nnet import AmNnet
    from kaldi_tpu.decoder.biggraph import make_big_hclg, BigGraphConfig
    from kaldi_tpu.decoder.csr_beam import CsrBeamDecoder, CsrBeamOpts
    from kaldi_tpu.online.fused import FusedOnlineDecoder
    from kaldi_tpu.online.server import FusedDecodeSession

    fb_opts = FbankOpts(frame_opts=FrameOpts(dither=0.0),
                        mel_opts=MelOpts(num_bins=24))
    graph, _n = make_big_hclg(BigGraphConfig(
        vocab=40, avg_bigram_succ=6, num_pdfs=16, seed=3))
    cfg = TdnnConfig(feat_dim=24, num_pdfs=16, hidden_dim=64,
                     pnorm_output_dim=32, nonlinearity="relu",
                     splice_indexes=((-2, -1, 0, 1, 2), (-1, 2), (0,)))
    model = Tdnn(cfg)
    am = AmNnet(model, model.init(jax.random.PRNGKey(0)))
    dec = CsrBeamDecoder(graph, CsrBeamOpts(
        beam=11.0, max_active=128, acoustic_scale=0.1,
        expand_budget=2048, eps_budget=512, hub_threshold=64))
    words = SymbolTable()
    for k in range(1, 41):
        words.add(f"W{k}")
    fused = FusedOnlineDecoder(am, dec, fb_opts, chunk_samples=2560,
                               t_max=256)

    server = AudioServer(
        "127.0.0.1", 0, lambda: FusedDecodeSession(fused, words))
    server.serve_in_background()
    try:
        rng = np.random.RandomState(44)
        wave = (rng.randn(20000) * 4000).astype(np.float32)
        feats = np.asarray(fbank(jnp.asarray(wave), fb_opts))
        offline = dec.decode(am.loglikes_np(feats[None]),
                             np.array([feats.shape[0]]))[0]
        want = " ".join(words.sym(w) for w in offline[0])
        lines = stream_wave("127.0.0.1", server.port, wave)
        assert lines and lines[-1] == f"FINAL {want}"
    finally:
        server.shutdown()
