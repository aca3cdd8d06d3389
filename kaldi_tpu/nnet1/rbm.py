"""RBM pretraining with CD-1.

(ref: nnet/nnet-rbm.h Rbm/RbmBase — bernoulli|gaussian visible/hidden
 units; nnetbin/rbm-train-cd1-frmshuff.cc — contrastive divergence with
 1 Gibbs step, momentum, weight decay. All steps are GEMMs + elementwise
 sampling — one fused jit program per minibatch.)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RbmConfig:
    visible_dim: int
    hidden_dim: int
    visible_type: str = "gaussian"   # 'bernoulli' | 'gaussian'
    hidden_type: str = "bernoulli"
    learning_rate: float = 0.01
    momentum: float = 0.5
    l2_penalty: float = 2e-4


class Rbm:
    def __init__(self, cfg: RbmConfig, seed: int = 0):
        self.cfg = cfg
        rng = np.random.RandomState(seed)
        s = 0.1 if cfg.visible_type == "gaussian" else 0.01
        self.W = jnp.asarray(rng.randn(cfg.hidden_dim, cfg.visible_dim) * s,
                             jnp.float32)
        self.vis_bias = jnp.zeros((cfg.visible_dim,), jnp.float32)
        self.hid_bias = jnp.zeros((cfg.hidden_dim,), jnp.float32)
        self._vel = (jnp.zeros_like(self.W), jnp.zeros_like(self.vis_bias),
                     jnp.zeros_like(self.hid_bias))

    def propagate(self, v):
        """P(h|v) (ref: Rbm::Propagate)."""
        a = v @ self.W.T + self.hid_bias
        return jax.nn.sigmoid(a) if self.cfg.hidden_type == "bernoulli" else a

    def reconstruct(self, h):
        """E[v|h] (ref: Rbm::Reconstruct)."""
        a = h @ self.W + self.vis_bias
        return jax.nn.sigmoid(a) if self.cfg.visible_type == "bernoulli" else a

    def cd1_step(self, v_pos, key):
        """One CD-1 update on a minibatch [N, V]; returns MSE of the
        reconstruction (ref: rbm-train-cd1-frmshuff.cc main loop)."""
        cfg = self.cfg
        N = v_pos.shape[0]
        h_pos = self.propagate(v_pos)
        # sample hidden states
        if cfg.hidden_type == "bernoulli":
            h_sample = (jax.random.uniform(key, h_pos.shape)
                        < h_pos).astype(jnp.float32)
        else:
            h_sample = h_pos + jax.random.normal(key, h_pos.shape)
        v_neg = self.reconstruct(h_sample)
        h_neg = self.propagate(v_neg)

        dW = (h_pos.T @ v_pos - h_neg.T @ v_neg) / N
        dvb = jnp.mean(v_pos - v_neg, axis=0)
        dhb = jnp.mean(h_pos - h_neg, axis=0)
        mW, mvb, mhb = self._vel
        mW = cfg.momentum * mW + dW - cfg.l2_penalty * self.W
        mvb = cfg.momentum * mvb + dvb
        mhb = cfg.momentum * mhb + dhb
        self._vel = (mW, mvb, mhb)
        self.W = self.W + cfg.learning_rate * mW
        self.vis_bias = self.vis_bias + cfg.learning_rate * mvb
        self.hid_bias = self.hid_bias + cfg.learning_rate * mhb
        return float(jnp.mean((v_pos - v_neg) ** 2))

    def as_dbn_layer(self):
        """-> (W, b) of the sigmoid layer this RBM initializes
        (ref: rbm-convert-to-nnet.cc)."""
        return np.asarray(self.W), np.asarray(self.hid_bias)
