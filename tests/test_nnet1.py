"""nnet1-equivalent tests: projected LSTM/BLSTM, stream BPTT, RBM, conv.

(ref test strategy: nnet/nnet-component-test.cc checks propagate/backprop
 consistency; we rely on jax autodiff and instead verify the recurrences,
 the stream semantics, and learning behavior.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.nnet1 import (
    LstmProjected, LstmConfig, lstm_init, lstm_apply, blstm_apply,
    Rbm, RbmConfig, train_lstm_streams, StreamTrainOpts, FrameShuffler,
    xent_loss,
)
from kaldi_tpu.nnet1.conv import (Conv1dConfig, conv1d_init, conv1d_apply,
                                  max_pooling_apply)


def test_lstm_chunked_state_carry_matches_full():
    """Running [0:T] in one call == running two chunks with carried state
    (the truncated-BPTT forward contract)."""
    cfg = LstmConfig(input_dim=4, cell_dim=8, proj_dim=3)
    params = lstm_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 10, 4), jnp.float32)
    y_full, st_full = lstm_apply(params, x, cfg)
    y1, st1 = lstm_apply(params, x[:, :6], cfg)
    y2, st2 = lstm_apply(params, x[:, 6:], cfg, state=st1)
    np.testing.assert_allclose(np.asarray(y_full[:, :6]), np.asarray(y1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_full[:, 6:]), np.asarray(y2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_full[0]), np.asarray(st2[0]),
                               atol=1e-6)


def test_blstm_uses_future_context():
    cfg = LstmConfig(input_dim=3, cell_dim=6, proj_dim=2)
    kf, kb = jax.random.split(jax.random.PRNGKey(2))
    fwd, bwd = lstm_init(kf, cfg), lstm_init(kb, cfg)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 3), jnp.float32)
    y = blstm_apply(fwd, bwd, x, cfg)
    assert y.shape == (1, 8, 4)
    # changing a future frame must change earlier outputs (via bwd pass)
    x2 = x.at[0, 7].add(1.0)
    y2 = blstm_apply(fwd, bwd, x2, cfg)
    assert not np.allclose(np.asarray(y[0, 0]), np.asarray(y2[0, 0]))
    # ...but not the forward half
    np.testing.assert_allclose(np.asarray(y[0, 0, :2]),
                               np.asarray(y2[0, 0, :2]), atol=1e-6)


def test_lstm_stream_training_learns_delayed_echo():
    """Task needing memory: target at t = input class at t-2."""
    rng = np.random.RandomState(4)
    cfg = LstmConfig(input_dim=4, cell_dim=16, proj_dim=8,
                     with_peepholes=False)
    model = LstmProjected(cfg, num_pdfs=4)
    params = model.init(jax.random.PRNGKey(5))

    utts = []
    for _ in range(30):
        T = rng.randint(24, 40)
        cls = rng.randint(0, 4, T)
        x = np.eye(4, dtype=np.float32)[cls] + rng.randn(T, 4) * 0.05
        t = np.roll(cls, 2)
        t[:2] = cls[0]
        utts.append((x, t.astype(np.int32)))

    opts = StreamTrainOpts(num_streams=4, bptt_chunk=12,
                           learning_rate=0.5, num_epochs=30)
    params, hist = train_lstm_streams(model, params, utts, opts)
    assert hist[-1] < hist[0] * 0.6, hist

    # accuracy on a fresh utterance
    cls = rng.randint(0, 4, 30)
    x = np.eye(4, dtype=np.float32)[cls][None]
    t = np.roll(cls, 2)
    log_post, _ = model.apply(params, jnp.asarray(x))
    pred = np.asarray(jnp.argmax(log_post[0], -1))
    acc = (pred[4:] == t[4:]).mean()
    assert acc > 0.8, acc


def test_rbm_cd1_reduces_reconstruction_error():
    rng = np.random.RandomState(6)
    # data on a low-dim manifold
    basis = rng.randn(3, 10)
    data = rng.randn(500, 3) @ basis + rng.randn(500, 10) * 0.1
    rbm = Rbm(RbmConfig(visible_dim=10, hidden_dim=16,
                        learning_rate=0.02, momentum=0.5))
    key = jax.random.PRNGKey(7)
    first, last = None, None
    for i in range(60):
        key, sub = jax.random.split(key)
        idx = rng.randint(0, 500, 100)
        mse = rbm.cd1_step(jnp.asarray(data[idx], jnp.float32), sub)
        if i == 0:
            first = mse
        last = mse
    assert last < first * 0.8
    W, b = rbm.as_dbn_layer()
    assert W.shape == (16, 10) and b.shape == (16,)


def test_frame_shuffler():
    f = np.arange(10)[:, None].astype(np.float32)
    t = np.arange(10)
    sh = FrameShuffler(f, t, minibatch=4, seed=0)
    batches = list(sh)
    # tail wraps: every frame appears every epoch (10 -> 3 full batches)
    assert len(batches) == 3
    seen = np.concatenate([b[0][:, 0] for b in batches])
    assert set(seen.astype(int)) == set(range(10))
    for bf, bt in batches:
        np.testing.assert_array_equal(bf[:, 0].astype(int), bt)
    # a second epoch reshuffles (MatrixRandomizer refills+reshuffles)
    seen2 = np.concatenate([b[0][:, 0] for b in sh])
    assert set(seen2.astype(int)) == set(range(10))
    assert not np.array_equal(seen, seen2)


def test_conv1d_and_pooling():
    cfg = Conv1dConfig(input_dim=12, patch_dim=4, patch_step=2,
                       num_filters=3)
    assert cfg.num_patches == 5 and cfg.output_dim == 15
    params = conv1d_init(jax.random.PRNGKey(8), cfg)
    x = jnp.asarray(np.random.RandomState(9).randn(2, 7, 12), jnp.float32)
    y = conv1d_apply(params, x, cfg)
    assert y.shape == (2, 7, 15)
    # oracle: patch p, filter f = dot(filters[f], x[p*2 : p*2+4])
    xn = np.asarray(x)
    fn = np.asarray(params["filters"])
    bn = np.asarray(params["bias"])
    for p in range(5):
        for f in range(3):
            want = xn[0, 0, p * 2: p * 2 + 4] @ fn[f] + bn[f]
            got = np.asarray(y)[0, 0, p * 3 + f]
            assert got == pytest.approx(want, abs=1e-4)

    pooled = max_pooling_apply(y, pool_size=2, pool_step=1, pool_stride=3)
    # 5 patch groups of stride 3 -> 4 pools of 3
    assert pooled.shape == (2, 7, 12)
    want = np.maximum(np.asarray(y)[0, 0, 0:3], np.asarray(y)[0, 0, 3:6])
    np.testing.assert_allclose(np.asarray(pooled)[0, 0, :3], want,
                               atol=1e-6)
