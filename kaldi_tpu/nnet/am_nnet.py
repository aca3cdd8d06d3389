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
    def __init__(self, model: Tdnn, params, priors: np.ndarray | None = None):
        self.model = model
        self.params = params
        self.priors = (priors if priors is not None
                       else np.ones(model.config.num_pdfs) / model.config.num_pdfs)

    @property
    def num_pdfs(self):
        return self.model.config.num_pdfs

    def loglikes(self, feats) -> jnp.ndarray:
        """feats [..., T, D] -> pseudo-loglikes [..., T, num_pdfs]."""
        log_post = self.model.apply(self.params, jnp.asarray(feats),
                                    pad_context=True)
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
            p = np.exp(np.asarray(
                self.model.apply(self.params, jnp.asarray(feats))))
            acc += p.reshape(-1, self.num_pdfs).sum(axis=0)
            n += int(np.prod(p.shape[:-1]))
        self.priors = (acc / max(n, 1)).astype(np.float64)

    def replace_params(self, params) -> "AmNnet":
        return AmNnet(self.model, params, self.priors)

    def set_priors_from_alignment_counts(self, counts: np.ndarray):
        c = np.asarray(counts, np.float64) + 0.5
        self.priors = c / c.sum()
