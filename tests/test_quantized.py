"""Int8-quantized affine serving path (Pallas kernel + XLA fallback).

(ref: the Pallas guide's quantization pattern; correctness oracle = the
 float path, tolerance set by int8 resolution.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.nnet.quantized import (quantize_weights, qaffine,
                                      quantize_tdnn, tdnn_apply_quantized)
from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig


def test_quantize_weights_resolution():
    rng = np.random.RandomState(0)
    w = rng.randn(16, 32).astype(np.float32)
    wq, sc = quantize_weights(w)
    assert wq.dtype == np.int8 and sc.shape == (16,)
    recon = wq.astype(np.float32) * sc[:, None]
    # per-channel error bounded by half a quantization step
    step = sc[:, None]
    assert np.all(np.abs(recon - w) <= 0.51 * step)


def test_qaffine_xla_matches_float():
    rng = np.random.RandomState(1)
    K, N, M = 64, 48, 20
    w = rng.randn(N, K).astype(np.float32)
    b = rng.randn(N).astype(np.float32)
    x = rng.randn(M, K).astype(np.float32)
    wq, sc = quantize_weights(w)
    y_float = x @ w.T + b
    y_q = np.asarray(qaffine(jnp.asarray(x), wq, sc, b, force_xla=True))
    rel = np.abs(y_q - y_float).max() / (np.abs(y_float).max() + 1e-6)
    assert rel < 0.02


def test_qaffine_pallas_interpret_matches_xla():
    """The Pallas kernel (interpret mode off-TPU) must equal the XLA
    dequant matmul."""
    rng = np.random.RandomState(2)
    K, N, M = 128, 128, 40     # aligned sizes for the TPU tiling rules
    w = rng.randn(N, K).astype(np.float32)
    b = rng.randn(N).astype(np.float32)
    x = rng.randn(M, K).astype(np.float32)
    wq, sc = quantize_weights(w)
    y_xla = np.asarray(qaffine(jnp.asarray(x), wq, sc, b, force_xla=True))
    y_pl = np.asarray(qaffine(jnp.asarray(x), wq, sc, b, interpret=True))
    np.testing.assert_allclose(y_pl, y_xla, atol=1e-4)


def test_quantized_tdnn_close_to_float():
    rng = np.random.RandomState(3)
    cfg = TdnnConfig(feat_dim=8, num_pdfs=32, hidden_dim=64,
                     pnorm_output_dim=16,
                     splice_indexes=((-1, 0, 1), (-1, 1), (0,)))
    model = Tdnn(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # give the final layer nonzero weights (init is zeros)
    params["final"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), params["final"]["w"].shape)
    qp = quantize_tdnn(params)
    x = jnp.asarray(rng.randn(2, 20, 8), jnp.float32)
    y_f = np.asarray(model.apply(params, x, pad_context=True))
    y_q = np.asarray(tdnn_apply_quantized(model, qp, x, pad_context=True,
                                          force_xla=True))
    # posteriors must agree closely; argmax should rarely differ
    assert np.abs(y_q - y_f).mean() < 0.02
    agree = (y_q.argmax(-1) == y_f.argmax(-1)).mean()
    assert agree > 0.95
