"""Hybrid TDNN training from GMM alignments.

(ref: steps/nnet2/train_multisplice_accel2.sh + get_egs2.sh: align with the
 GMM system, dump frame egs with context, parallel SGD, adjust priors.)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np
import jax

from kaldi_tpu.fst.lang import Lang
from kaldi_tpu.fst.graph import TrainingGraphCompiler
from kaldi_tpu.steps.mono import MonoModel
from kaldi_tpu.decoder.graph_pack import pack_graphs
from kaldi_tpu.decoder.viterbi import viterbi_align
from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
from kaldi_tpu.nnet.am_nnet import AmNnet
from kaldi_tpu.nnet.train import NnetTrainOpts, train_epochs, make_egs

log = logging.getLogger("kaldi_tpu.tdnn")


@dataclasses.dataclass
class TdnnTrainResult:
    am: AmNnet
    history: list


def align_with_gmm(model: MonoModel, utts, acoustic_scale: float = 0.1):
    """GMM forced alignment -> list of (feats, pdf_ids) for egs."""
    compiler = TrainingGraphCompiler(model.lang, model.trans_model,
                                     model.ctx_dep)
    cache: dict = {}
    graphs = []
    for (_u, _f, words) in utts:
        key = tuple(words)
        if key not in cache:
            cache[key] = compiler.compile_transcript(list(words))
        graphs.append(cache[key])
    B = len(utts)
    T = max(f.shape[0] for (_u, f, _w) in utts)
    D = utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    batch = pack_graphs(graphs, model.trans_model.id2pdf_array)
    ll = model.am.loglikes_np(feats)
    results = viterbi_align(batch, ll, nf, acoustic_scale)
    out = []
    tid2pdf = model.trans_model.id2pdf_array
    for b, res in enumerate(results):
        if res is None:
            log.warning("alignment failed for %s", utts[b][0])
            continue
        tids, _w, _c = res
        out.append((feats[b, : nf[b]], tid2pdf[tids]))
    return out


def train_tdnn(
    gmm_model: MonoModel,
    utts,
    config: TdnnConfig | None = None,
    train_opts: NnetTrainOpts = NnetTrainOpts(),
    mesh=None,
    chunk: int = 8,
    seed: int = 0,
) -> TdnnTrainResult:
    aligned = align_with_gmm(gmm_model, utts)
    num_pdfs = gmm_model.am.num_pdfs
    feat_dim = utts[0][1].shape[1]
    if config is None:
        config = TdnnConfig(feat_dim=feat_dim, num_pdfs=num_pdfs,
                            hidden_dim=256, pnorm_output_dim=64,
                            splice_indexes=((-2, -1, 0, 1, 2), (-1, 2), (0,)))
    else:
        config = dataclasses.replace(config, feat_dim=feat_dim,
                                     num_pdfs=num_pdfs)
    egs = make_egs(aligned, config.left_context, config.right_context, chunk)
    model = Tdnn(config)
    params = model.init(jax.random.PRNGKey(seed))
    params, history = train_epochs(model, params, egs, train_opts, mesh=mesh)
    am = AmNnet(model, params)
    # priors from alignment counts (ref: nnet-adjust-priors uses avg post;
    # alignment counts are the classic fallback)
    counts = np.zeros(num_pdfs, np.float64)
    for (_f, pdfs) in aligned:
        np.add.at(counts, pdfs, 1.0)
    am.set_priors_from_alignment_counts(counts)
    return TdnnTrainResult(am=am, history=history)
