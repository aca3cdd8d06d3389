"""Cepstral mean/variance normalization, per speaker or utterance.

(ref: transform/cmvn.h:37-60 — stats are a 2 x (D+1) matrix:
 row0 = [sum_x ..., count], row1 = [sum_x^2 ..., 0].)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class CmvnStats:
    def __init__(self, dim: int):
        self.stats = np.zeros((2, dim + 1), np.float64)

    @property
    def count(self) -> float:
        return float(self.stats[0, -1])

    def accumulate(self, feats: np.ndarray, weights=None):
        x = np.asarray(feats, np.float64)
        if weights is None:
            self.stats[0, :-1] += x.sum(axis=0)
            self.stats[1, :-1] += (x * x).sum(axis=0)
            self.stats[0, -1] += x.shape[0]
        else:
            w = np.asarray(weights, np.float64)[:, None]
            self.stats[0, :-1] += (x * w).sum(axis=0)
            self.stats[1, :-1] += (x * x * w).sum(axis=0)
            self.stats[0, -1] += w.sum()

    def add(self, other: "CmvnStats"):
        self.stats += other.stats

    def mean_var(self):
        n = max(self.count, 1.0)
        mean = self.stats[0, :-1] / n
        var = self.stats[1, :-1] / n - mean * mean
        return mean, np.maximum(var, 1e-10)


def apply_cmvn(feats, stats: CmvnStats, norm_vars: bool = False,
               reverse: bool = False):
    """(ref: transform/cmvn.cc ApplyCmvn / reverse variant)"""
    mean, var = stats.mean_var()
    mean = jnp.asarray(mean, jnp.float32)
    x = jnp.asarray(feats)
    if not reverse:
        x = x - mean
        if norm_vars:
            x = x * jnp.asarray(1.0 / np.sqrt(var), jnp.float32)
    else:
        if norm_vars:
            x = x * jnp.asarray(np.sqrt(var), jnp.float32)
        x = x + mean
    return x
