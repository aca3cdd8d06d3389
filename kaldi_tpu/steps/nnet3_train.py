"""nnet3 TDNN training step over GMM alignments (steps/nnet3/train role).

(ref: egs/wsj/s5/steps/nnet3/tdnn/train.sh — generate configs, get egs
 from GMM alignments, run nnet3-train iterations, adjust priors.)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax

from kaldi_tpu.nnet3.network import Nnet3
from kaldi_tpu.nnet3.configs import make_tdnn_config
from kaldi_tpu.nnet3.training import (Nnet3TrainOpts, train_nnet3, AmNnet3)
from kaldi_tpu.nnet.train import make_egs
from kaldi_tpu.steps.tdnn import align_with_gmm


@dataclasses.dataclass
class Nnet3TrainResult:
    am: AmNnet3
    history: list


def train_tdnn3(
    gmm_model,
    utts,
    splice_indexes=((-2, -1, 0, 1, 2), (-1, 2), (0,)),
    hidden_dim: int = 256,
    pnorm_output_dim: int | None = 64,
    train_opts: Nnet3TrainOpts = Nnet3TrainOpts(),
    chunk: int = 8,
    seed: int = 0,
) -> Nnet3TrainResult:
    """GMM-aligned frame CE training of a config-defined TDNN.

    The nnet3 twin of steps/tdnn.train_tdnn: same alignments, same egs,
    but the network comes from the config language (make_tdnn_config ->
    Nnet3) and trains through the nnet3 trainer. Parity between the two
    is test-asserted on the synthetic recipe.
    """
    aligned = align_with_gmm(gmm_model, utts)
    num_pdfs = gmm_model.am.num_pdfs
    feat_dim = utts[0][1].shape[1]
    cfg_text = make_tdnn_config(
        feat_dim, num_pdfs, splice_indexes=splice_indexes,
        hidden_dim=hidden_dim,
        nonlinearity="PnormComponent",
        pnorm_output_dim=pnorm_output_dim)
    net = Nnet3(cfg_text)
    params = net.init(jax.random.PRNGKey(seed))
    egs = make_egs(aligned, net.left_context, net.right_context, chunk)
    params, history = train_nnet3(net, params, egs, train_opts)
    am = AmNnet3(net, params)
    counts = np.zeros(num_pdfs, np.float64)
    for (_f, pdfs) in aligned:
        np.add.at(counts, pdfs, 1.0)
    am.set_priors_from_alignment_counts(counts)
    return Nnet3TrainResult(am=am, history=history)


def train_lstm3(
    gmm_model,
    utts,
    cell_dim: int = 128,
    proj_dim: int = 64,
    num_layers: int = 1,
    splice=(-2, -1, 0, 1, 2),
    train_opts: Nnet3TrainOpts = Nnet3TrainOpts(),
    chunk: int = 20,
    seed: int = 0,
) -> Nnet3TrainResult:
    """GMM-aligned frame CE training of a config-built projected LSTM —
    the steps/nnet3/lstm/train.sh role. Runs through the same nnet3
    trainer; the recurrence executes in the scan executor. Longer chunks
    than the TDNN so the recurrence sees useful history (the reference's
    --chunk-width)."""
    from kaldi_tpu.nnet3.configs import make_lstm_config
    aligned = align_with_gmm(gmm_model, utts)
    num_pdfs = gmm_model.am.num_pdfs
    feat_dim = utts[0][1].shape[1]
    cfg_text = make_lstm_config(
        feat_dim, num_pdfs, cell_dim=cell_dim, proj_dim=proj_dim,
        num_layers=num_layers, splice=splice)
    net = Nnet3(cfg_text)
    params = net.init(jax.random.PRNGKey(seed))
    egs = make_egs(aligned, net.left_context, net.right_context, chunk)
    params, history = train_nnet3(net, params, egs, train_opts)
    am = AmNnet3(net, params)
    counts = np.zeros(num_pdfs, np.float64)
    for (_f, pdfs) in aligned:
        np.add.at(counts, pdfs, 1.0)
    am.set_priors_from_alignment_counts(counts)
    return Nnet3TrainResult(am=am, history=history)
