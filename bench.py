"""Headline benchmark: hybrid ASR decode throughput on one chip.

Measures the full inference pipeline — fbank feature extraction, TDNN
acoustic scoring, batched HCLG beam-search decode — in audio-seconds
processed per wall-clock second per chip.

Baseline: the reference decoder runs ~real-time per 2015 CPU core
(BASELINE.md: no in-tree speed numbers; the driver's north star is >=10x
audio-sec/s/chip vs a CPU host). We report vs_baseline against 1.0
audio-sec/s (reference real-time), so vs_baseline == audio-sec/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.ops import FbankOpts, FrameOpts, MelOpts, fbank
    from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
    from kaldi_tpu.fst.lang import Lexicon, prepare_lang
    from kaldi_tpu.lm.arpa import ArpaLm, arpa_to_g
    from kaldi_tpu.fst.graph import make_hclg
    from kaldi_tpu.tree.context_dep import MonophoneContextDependency
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import BeamSearchOpts
    from kaldi_tpu.decoder.dense import make_decoder

    SR = 16000.0
    B = 128           # utterances per batch
    secs = 10.0       # audio seconds per utterance
    S = int(SR * secs)

    rng = np.random.RandomState(0)
    waves = (rng.randn(B, S) * 1000).astype(np.float32)

    fb_opts = FbankOpts(frame_opts=FrameOpts(samp_freq=SR, dither=0.0),
                        mel_opts=MelOpts(num_bins=40))

    # flagship AM: nnet2-multisplice-scale TDNN
    cfg = TdnnConfig(feat_dim=40, num_pdfs=2048, hidden_dim=2048,
                     pnorm_output_dim=256)
    model = Tdnn(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # decoding graph: small-vocabulary HCLG (grows in later rounds)
    lex = Lexicon.parse("YES Y1 Y2\nNO N1 N2")
    lang = prepare_lang(lex, ["SIL"], "SIL", num_sil_states=3)
    ctx = MonophoneContextDependency.from_topo(lang.topo)
    tm = TransitionModel(lang.topo, lambda ph, pc: ctx.compute([ph], pc))
    g = arpa_to_g(ArpaLm.parse(
        "\\data\\\nngram 1=4\n\n\\1-grams:\n-1\tNO\n-1\tYES\n-99\t<s>\n-1\t</s>\n\n\\end\\\n"),
        lang.words)
    graph = make_hclg(lang, g, tm, ctx, self_loop_scale=0.1)
    # map the mono tids onto the TDNN's pdf space (identity for bench)
    packed = pack_graph(graph.fst, tm.id2pdf_array)
    # decoder factory: dense full-state path for small graphs, beam
    # search for large (ref: FasterDecoder vs LatticeFasterDecoder split)
    dec = make_decoder(packed, BeamSearchOpts(beam=16.0, max_active=128,
                                              acoustic_scale=0.1))

    @jax.jit
    def am_scores(params, waves):
        feats = fbank(waves, fb_opts)
        # bf16 GEMMs on the MXU (2x f32 throughput, f32 accumulation);
        # decode-parity checked in tests (argmax agreement > 95%)
        return model.apply(params, feats, pad_context=True,
                           compute_dtype=jnp.bfloat16)

    nf_frames = am_scores(params, jnp.asarray(waves)).shape[1]
    nf = np.full(B, nf_frames, np.int32)

    waves_dev = jnp.asarray(waves)

    def launch():
        ll = am_scores(params, waves_dev)
        # decoder consumes pdf loglikes; slice on device — the loglikes
        # never leave HBM (decode's backtrace also runs on device); the
        # finisher does the single device->host result transfer
        return dec.decode_async(ll[..., : tm.num_pdfs], nf)

    # warmup (compilation)
    launch()()

    # steady-state serving throughput: overlap batch N+1's dispatch with
    # batch N's result fetch (depth-2 software pipeline)
    n_iter = 10
    t0 = time.perf_counter()
    pending = launch()
    for _ in range(n_iter - 1):
        nxt = launch()
        out = pending()
        pending = nxt
    out = pending()
    dt = (time.perf_counter() - t0) / n_iter
    audio_per_sec = B * secs / dt

    print(json.dumps({
        "metric": "hybrid decode throughput (fbank+TDNN+HCLG beam search), 1 chip",
        "value": round(audio_per_sec, 2),
        "unit": "audio-seconds/second/chip",
        "vs_baseline": round(audio_per_sec / 1.0, 2),
    }))


if __name__ == "__main__":
    main()
