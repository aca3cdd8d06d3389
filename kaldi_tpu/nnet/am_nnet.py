"""AmNnet: a neural net + pdf priors, scoring for the hybrid decoder.

(ref: nnet2/am-nnet.h AmNnet — pseudo-loglikes = log p(pdf|x) - log prior;
 nnet2bin/nnet-adjust-priors.cc computes priors from average posteriors.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from kaldi_tpu.nnet.tdnn import Tdnn


class AmNnet:
    def __init__(self, model: Tdnn, params, priors: np.ndarray | None = None,
                 group_ids: np.ndarray | None = None,
                 lr_scales: dict | None = None):
        """group_ids: after nnet-am-mixup the final affine has M > C rows;
        group_ids [M] maps mixture rows back to pdf classes and posteriors
        are group-summed (ref: nnet2/mixup-nnet.h MixtureProbComponent).
        lr_scales: per-layer learning-rate factors set by
        nnet-modify-learning-rates, consumed by the trainer."""
        self.model = model
        self.params = params
        # free-form metadata (e.g. NG-SGD preconditioner config set by
        # nnet-am-switch-preconditioning); round-trips through save/load
        self.meta: dict = {}
        self.group_ids = (None if group_ids is None
                          else np.asarray(group_ids, np.int32))
        self.lr_scales = lr_scales
        n = self.num_pdfs if priors is None else len(np.asarray(priors))
        self.priors = (np.asarray(priors) if priors is not None
                       else np.ones(n) / n)

    @property
    def num_pdfs(self):
        if self.group_ids is not None:
            return int(self.group_ids.max()) + 1
        return self.model.config.num_pdfs

    def log_posteriors(self, feats, pad_context: bool = True) -> jnp.ndarray:
        """feats [..., T, D] -> log p(pdf|x) [..., T, num_pdfs]
        (group-summed over mixture rows if mixed up). pad_context=False
        for inputs that already carry the left/right context (egs)."""
        log_post = self.model.apply(self.params, jnp.asarray(feats),
                                    pad_context=pad_context)
        if self.group_ids is not None:
            from kaldi_tpu.nnet.combine import sum_group_log_posteriors
            log_post = sum_group_log_posteriors(
                log_post, self.group_ids, self.num_pdfs)
        return log_post

    def loglikes(self, feats) -> jnp.ndarray:
        """feats [..., T, D] -> pseudo-loglikes [..., T, num_pdfs]."""
        log_post = self.log_posteriors(feats)
        log_prior = jnp.log(jnp.asarray(
            np.maximum(self.priors, 1e-20), jnp.float32))
        return log_post - log_prior

    def loglikes_np(self, feats, scale: float = 1.0) -> np.ndarray:
        return np.asarray(self.loglikes(feats)) * scale

    def set_priors_from_posteriors(self, feats_batches):
        """nnet-adjust-priors: priors := average posterior over data."""
        acc = np.zeros(self.num_pdfs, np.float64)
        n = 0
        for feats in feats_batches:
            p = np.exp(np.asarray(self.log_posteriors(feats)))
            acc += p.reshape(-1, self.num_pdfs).sum(axis=0)
            n += int(np.prod(p.shape[:-1]))
        self.priors = (acc / max(n, 1)).astype(np.float64)

    def replace_params(self, params) -> "AmNnet":
        return AmNnet(self.model, params, self.priors,
                      group_ids=self.group_ids, lr_scales=self.lr_scales)

    def set_priors_from_alignment_counts(self, counts: np.ndarray):
        c = np.asarray(counts, np.float64) + 0.5
        self.priors = c / c.sum()
