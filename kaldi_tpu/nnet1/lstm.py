"""Projected LSTM / BLSTM over lax.scan.

(ref: nnet/nnet-lstm-projected-streams.h LstmProjectedStreams — the
 'projected' LSTM of Sak et al. 2014: cell dim C, recurrent projection
 R < C fed back into the gates, optional peephole connections; multiple
 parallel streams with carried state for truncated BPTT.
 nnet/nnet-blstm-projected-streams.h for the bidirectional variant.
 The per-frame loop is a lax.scan; all four gates are one fused GEMM.)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class LstmConfig:
    input_dim: int
    cell_dim: int
    proj_dim: int
    with_peepholes: bool = True


def lstm_init(key, cfg: LstmConfig) -> dict:
    ks = jax.random.split(key, 5)
    C, R, D = cfg.cell_dim, cfg.proj_dim, cfg.input_dim
    s = 1.0 / np.sqrt(D + R)
    params = {
        "w_gifo_x": s * jax.random.normal(ks[0], (4 * C, D), jnp.float32),
        "w_gifo_r": s * jax.random.normal(ks[1], (4 * C, R), jnp.float32),
        "bias": jnp.zeros((4 * C,), jnp.float32),
        "w_r_m": (1.0 / np.sqrt(C))
        * jax.random.normal(ks[2], (R, C), jnp.float32),
    }
    if cfg.with_peepholes:
        params["peep_i"] = 0.1 * jax.random.normal(ks[3], (C,), jnp.float32)
        params["peep_f"] = 0.1 * jax.random.normal(ks[4], (C,), jnp.float32)
        params["peep_o"] = jnp.zeros((C,), jnp.float32)
    return params


def lstm_apply(params, x: jnp.ndarray, cfg: LstmConfig, state=None):
    """x [B, T, D] -> (y [B, T, R], final_state (c, r)).

    state: carried (c [B, C], r [B, R]) for truncated BPTT across chunks
    (ref: LstmProjectedStreams::ResetStreams / stream state carrying)."""
    B, T, D = x.shape
    C, R = cfg.cell_dim, cfg.proj_dim
    if state is None:
        state = (jnp.zeros((B, C), x.dtype), jnp.zeros((B, R), x.dtype))

    # precompute input contributions for all frames: one big GEMM
    xg = x @ params["w_gifo_x"].T + params["bias"]       # [B, T, 4C]

    def step(carry, xg_t):
        c, r = carry
        gates = xg_t + r @ params["w_gifo_r"].T           # [B, 4C]
        g, i, f, o = jnp.split(gates, 4, axis=-1)
        if cfg.with_peepholes:
            i = i + c * params["peep_i"]
            f = f + c * params["peep_f"]
        g = jnp.tanh(g)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        c_new = f * c + i * g
        if cfg.with_peepholes:
            o = o + c_new * params["peep_o"]
        o = jax.nn.sigmoid(o)
        m = o * jnp.tanh(c_new)
        r_new = m @ params["w_r_m"].T                     # projection
        return (c_new, r_new), r_new

    (c_fin, r_fin), ys = jax.lax.scan(step, state,
                                      jnp.swapaxes(xg, 0, 1))
    return jnp.swapaxes(ys, 0, 1), (c_fin, r_fin)


def blstm_apply(fwd_params, bwd_params, x, cfg: LstmConfig):
    """Bidirectional: concat(forward LSTM, time-reversed backward LSTM)
    (ref: nnet/nnet-blstm-projected-streams.h). -> [B, T, 2R]."""
    yf, _ = lstm_apply(fwd_params, x, cfg)
    yb, _ = lstm_apply(bwd_params, x[:, ::-1], cfg)
    return jnp.concatenate([yf, yb[:, ::-1]], axis=-1)


class LstmProjected:
    """LSTM-projected stack + softmax output (an nnet1 'Nnet')."""

    def __init__(self, cfg: LstmConfig, num_pdfs: int, num_layers: int = 1,
                 bidirectional: bool = False):
        self.cfg = cfg
        self.num_pdfs = num_pdfs
        self.num_layers = num_layers
        self.bidirectional = bidirectional

    def init(self, key) -> dict:
        params = {"layers": []}
        cfg = self.cfg
        dim_in = cfg.input_dim
        for _l in range(self.num_layers):
            lcfg = dataclasses.replace(cfg, input_dim=dim_in)
            key, k1, k2 = jax.random.split(key, 3)
            if self.bidirectional:
                params["layers"].append(
                    {"fwd": lstm_init(k1, lcfg), "bwd": lstm_init(k2, lcfg)})
                dim_in = 2 * cfg.proj_dim
            else:
                params["layers"].append({"fwd": lstm_init(k1, lcfg)})
                dim_in = cfg.proj_dim
        key, ko = jax.random.split(key)
        params["out_w"] = (1.0 / np.sqrt(dim_in)) * jax.random.normal(
            ko, (self.num_pdfs, dim_in), jnp.float32)
        params["out_b"] = jnp.zeros((self.num_pdfs,), jnp.float32)
        return params

    def apply(self, params, x, states=None):
        """-> (log-posteriors [B, T, P], new_states)."""
        cfg = self.cfg
        dim_in = cfg.input_dim
        new_states = []
        h = x
        for li, layer in enumerate(params["layers"]):
            lcfg = dataclasses.replace(cfg, input_dim=h.shape[-1])
            if self.bidirectional:
                h = blstm_apply(layer["fwd"], layer["bwd"], h, lcfg)
                new_states.append(None)
            else:
                st = states[li] if states is not None else None
                h, st_new = lstm_apply(layer["fwd"], h, lcfg, st)
                new_states.append(st_new)
        logits = h @ params["out_w"].T + params["out_b"]
        return jax.nn.log_softmax(logits, axis=-1), new_states
