"""Model averaging / combination / mixup.

(ref: nnet2bin/nnet-am-average.cc, nnet2/combine-nnet-fast.h,
 nnet2/mixup-nnet.h.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.nnet.combine import (average_params, combine_params,
                                    mixup_softmax_layer,
                                    sum_group_log_posteriors)


def test_average_params():
    a = {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}
    b = {"w": 3 * jnp.ones((2, 2)), "b": 2 * jnp.ones(2)}
    avg = average_params([a, b])
    np.testing.assert_allclose(np.asarray(avg["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg["b"]), 1.0)


def test_combine_params_beats_uniform_average():
    """Two models, one good one bad: combination should weight the good
    one and beat the plain average (the combine-nnet-fast guarantee)."""
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(200, 4), jnp.float32)
    w_true = jnp.asarray(rng.randn(4), jnp.float32)
    y = X @ w_true

    good = {"w": w_true + 0.05 * jnp.asarray(rng.randn(4), jnp.float32)}
    bad = {"w": jnp.asarray(rng.randn(4), jnp.float32)}

    def loss_fn(p):
        return jnp.mean((X @ p["w"] - y) ** 2)

    combined, final_loss = combine_params([good, bad], loss_fn,
                                          num_steps=100)
    avg_loss = float(loss_fn(average_params([good, bad])))
    assert final_loss < avg_loss
    assert final_loss <= float(loss_fn(good)) + 1e-4


def test_mixup_and_group_posteriors():
    rng = np.random.RandomState(1)
    C, D = 3, 5
    w = rng.randn(C, D)
    b = rng.randn(C)
    w2, b2, gid = mixup_softmax_layer(w, b, num_mixtures=6, perturb=0.0)
    assert w2.shape == (6, D) and gid.tolist() == [0, 0, 1, 1, 2, 2]
    # with zero perturbation, summed group posteriors == original softmax
    x = jnp.asarray(rng.randn(7, D), jnp.float32)
    orig = jax.nn.log_softmax(x @ jnp.asarray(w.T, jnp.float32)
                              + jnp.asarray(b, jnp.float32), axis=-1)
    mixed_logits = x @ jnp.asarray(w2.T, jnp.float32) + jnp.asarray(
        b2, jnp.float32)
    mixed_lp = jax.nn.log_softmax(mixed_logits, axis=-1)
    grouped = sum_group_log_posteriors(mixed_lp, gid, C)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(orig),
                               atol=1e-5)
