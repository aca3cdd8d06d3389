"""fMMI (fMPE features + EBW model) training step.

(ref: steps/train_mmi_fmmi.sh; egs/wsj RESULTS show fMMI+MMI beating MMI.)
"""

import numpy as np
import pytest

from kaldi_tpu.steps.fmmi import FmmiTrainOpts, train_fmmi
from kaldi_tpu.steps.mono import MonoModel
from kaldi_tpu.decoder.graph_pack import pack_graph
from kaldi_tpu.decoder.dense import make_decoder
from kaldi_tpu.decoder.beam_search import BeamSearchOpts
from kaldi_tpu.utils.wer import compute_wer

from test_discriminative import mmi_system  # noqa: F401


@pytest.mark.slow
def test_fmmi_objf_improves_and_wer_not_worse(mmi_system):
    lang, model, den_graph, train_utts, test_utts = mmi_system
    sil = {lang.phones["SIL"]}
    from kaldi_tpu.transform.fmpe import FmpeOptions
    opts = FmmiTrainOpts(num_iters=4, lattice_beam=8.0, fmpe_gauss=8,
                         fmpe=FmpeOptions(learning_rate=0.002))
    fmpe, am, hist = train_fmmi(model, den_graph, train_utts[:10], opts,
                                silence_phones=sil)
    assert len(hist) == 4
    assert np.isfinite(hist).all()
    # MMI objf should not degrade over the alternating schedule
    assert hist[-1] >= hist[0] - 0.05, hist
    # fMPE learned a nonzero projection
    assert np.abs(fmpe.M).max() > 0

    # decode test set with fMPE features + fMMI model; must not be worse
    # than the SI baseline
    dec = make_decoder(pack_graph(den_graph.fst,
                                  model.trans_model.id2pdf_array),
                       BeamSearchOpts(beam=16.0, max_active=256,
                                      acoustic_scale=0.1))
    B = len(test_utts)
    T = max(f.shape[0] for (_u, f, _w) in test_utts)
    D = test_utts[0][1].shape[1]

    def wer_of(am_, transform):
        feats = np.zeros((B, T, D), np.float32)
        nf = np.zeros(B, np.int32)
        for b, (_u, f, _w) in enumerate(test_utts):
            ft = transform(f)
            feats[b, : ft.shape[0]] = ft
            nf[b] = ft.shape[0]
        results = dec.decode(am_.loglikes_np(feats), nf)
        refs, hyps = {}, {}
        for b, (u, _f, words) in enumerate(test_utts):
            refs[u] = words
            hyps[u] = ([lang.words.sym(w) for w in results[b][0]]
                       if results[b] else [])
        return compute_wer(refs, hyps).wer

    wer_base = wer_of(model.am, lambda f: f)
    wer_fmmi = wer_of(am, lambda f: fmpe.apply(f).astype(np.float32))
    assert wer_fmmi <= wer_base + 1e-9, (wer_fmmi, wer_base)
