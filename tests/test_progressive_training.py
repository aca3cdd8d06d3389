"""Layer-wise discriminative pretraining (ref: steps/nnet2/
train_pnorm_accel2.sh growing num-hidden-layers): deep p-norm stacks
stall at the class prior when trained flat from scratch; progressive
depth growth converges them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
from kaldi_tpu.nnet.train import (NnetTrainOpts, make_optimizer,
                                  make_train_step, train_progressive)


def _spike_task(rng, cfg, B=4, T=100):
    lc, rc = cfg.left_context, cfg.right_context
    feats = np.zeros((B, T + lc + rc, cfg.feat_dim), np.float32)
    tgt = rng.randint(0, cfg.num_pdfs, (B, T)).astype(np.int32)
    for b in range(B):
        for t in range(T):
            feats[b, t + lc, tgt[b, t] % cfg.feat_dim] = 5.0
    return (jnp.asarray(feats), jnp.asarray(tgt),
            jnp.ones((B, T), jnp.float32))


def test_deep_pnorm_progressive_converges_where_flat_stalls():
    rng = np.random.RandomState(0)
    cfg = TdnnConfig(feat_dim=40, num_pdfs=64, hidden_dim=256,
                     pnorm_output_dim=32)   # 5 pnorm layers (default)
    model = Tdnn(cfg)
    feats, tgt, w = _spike_task(rng, cfg)

    # flat from-scratch training: stalls at the class prior
    params = model.init(jax.random.PRNGKey(0))
    opts = NnetTrainOpts(initial_lr=0.05, final_lr=0.01)
    optimizer = make_optimizer(opts, 300)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)
    acc = None
    for _ in range(300):
        params, opt_state, loss, acc = step(params, opt_state, feats,
                                            tgt, w)
    assert float(acc) < 0.3, float(acc)

    # progressive layer growth: converges
    params = model.init(jax.random.PRNGKey(0))
    params, hist = train_progressive(model, params, feats, tgt, w, opts,
                                     steps_per_stage=120, final_steps=240)
    assert hist[-1][0] == 5                 # all layers active at the end
    assert hist[-1][2] > 0.9, hist          # final-stage accuracy
    # the grown net is the FULL net: plain apply agrees
    log_post = model.apply(params, feats, pad_context=False)
    pred = np.asarray(jnp.argmax(log_post, -1))
    assert (pred == np.asarray(tgt)).mean() > 0.9


def test_context_of_partial_stack():
    cfg = TdnnConfig(feat_dim=40, num_pdfs=64, hidden_dim=128,
                     pnorm_output_dim=32)
    model = Tdnn(cfg)
    assert model.context_of(len(cfg.splice_indexes)) == (
        cfg.left_context, cfg.right_context)
    lc1, rc1 = model.context_of(1)
    assert (lc1, rc1) == (2, 2)             # first splice (-2..2)
