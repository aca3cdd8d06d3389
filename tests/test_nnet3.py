"""nnet3-equivalent: descriptor parsing/algebra, config nets, gradients,
natural-gradient optimizer.

(ref test strategy: nnet3/nnet-derivative-test.cc (numerical vs backprop),
 nnet3/nnet-compile-test.cc (compiled == simple evaluation) — here the
 'simple evaluation' oracle is an explicit numpy computation.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_tpu.nnet3 import Nnet3, parse_descriptor
from kaldi_tpu.nnet.natural_gradient import natural_gradient, ng_sgd

TDNN_CONFIG = """
input-node name=input dim=5
component name=l1.affine type=NaturalGradientAffineComponent input-dim=15 output-dim=8
component-node name=l1a component=l1.affine input=Append(Offset(input,-1), input, Offset(input,1))
component name=l1.relu type=RectifiedLinearComponent dim=8
component-node name=l1 component=l1.relu input=l1a
component name=l2.affine type=AffineComponent input-dim=16 output-dim=6
component-node name=l2a component=l2.affine input=Append(Offset(l1,-2), Offset(l1,2))
component name=out.log type=LogSoftmaxComponent dim=6
component-node name=outl component=out.log input=l2a
output-node name=output input=outl
"""


def test_descriptor_parse_and_context():
    d = parse_descriptor("Append(Offset(input,-2), input, Offset(input,2))")
    assert d.op == "append" and len(d.args) == 3
    assert d.context() == (2, 2)
    assert d.referenced() == {"input"}
    d2 = parse_descriptor("Sum(Offset(a,-1), Scale(0.5, b))")
    assert d2.op == "sum"
    assert d2.context() == (1, 0)
    assert d2.referenced() == {"a", "b"}
    d3 = parse_descriptor("IfDefined(Offset(x,3))")
    # optional (IfDefined) dependencies are zero when absent, so they
    # impose NO required context (nnet-descriptor.h IfDefined semantics)
    assert d3.op == "ifdef"
    assert d3.context() == (0, 0)
    assert d3.referenced() == {"x"}
    assert d3.referenced(required_only=True) == set()
    assert d3.ref_offsets() == [("x", 3, True)]


def test_nnet3_shapes_and_context():
    net = Nnet3(TDNN_CONFIG)
    assert (net.left_context, net.right_context) == (3, 3)
    assert net.dims["output"] == 6
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 5), jnp.float32)
    # valid mode consumes context
    y = net.apply(params, x, pad_context=False)
    assert y.shape == (2, 20 - 6, 6)
    # padded mode preserves T
    y2 = net.apply(params, x, pad_context=True)
    assert y2.shape == (2, 20, 6)
    # log-softmax output sums to 1
    np.testing.assert_allclose(np.exp(np.asarray(y)).sum(-1), 1.0,
                               atol=1e-5)


def test_nnet3_matches_manual_computation():
    """Compiled-graph evaluation == explicit numpy oracle
    (the nnet3-compile-test analogue)."""
    cfg = """
input-node name=input dim=3
component name=a type=AffineComponent input-dim=6 output-dim=4
component-node name=an component=a input=Append(Offset(input,-1), Offset(input,1))
output-node name=output input=an
"""
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 7, 3).astype(np.float32)
    y = np.asarray(net.apply(params, jnp.asarray(x), pad_context=False))
    W = np.asarray(params["a"]["w"])
    b = np.asarray(params["a"]["b"])
    # output frame j corresponds to input frames (j, j+2)
    for j in range(5):
        inp = np.concatenate([x[0, j], x[0, j + 2]])
        np.testing.assert_allclose(y[0, j], W @ inp + b, atol=1e-5)


def test_nnet3_gradients_match_numerical():
    """(ref: nnet3/nnet-derivative-test.cc)"""
    net = Nnet3(TDNN_CONFIG)
    params = net.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 12, 5), jnp.float32)
    targets = jnp.asarray(rng.randint(0, 6, (2, 6)))

    def loss(p):
        y = net.apply(p, x, pad_context=False)
        return -jnp.mean(jnp.take_along_axis(y, targets[..., None], -1))

    g = jax.grad(loss)(params)
    w = params["l1.affine"]["w"]
    gw = np.asarray(g["l1.affine"]["w"])
    eps = 1e-3
    for (i, j) in [(0, 0), (3, 7), (7, 14)]:
        wp = w.at[i, j].add(eps)
        wm = w.at[i, j].add(-eps)
        pp = {**params, "l1.affine": {**params["l1.affine"], "w": wp}}
        pm = {**params, "l1.affine": {**params["l1.affine"], "w": wm}}
        num = (loss(pp) - loss(pm)) / (2 * eps)
        assert gw[i, j] == pytest.approx(float(num), abs=2e-3)


def test_nnet3_trains_with_nnet_trainer():
    """Config-defined nets plug into the nnet trainer (the nnet3-train
    role: same Train() loop, jax.jit as the compiler)."""
    from kaldi_tpu.nnet.train import NnetTrainOpts, train_epochs

    cfg = """
input-node name=input dim=6
component name=a1 type=NaturalGradientAffineComponent input-dim=18 output-dim=64
component-node name=a1n component=a1 input=Append(Offset(input,-1), input, Offset(input,1))
component name=r1 type=RectifiedLinearComponent dim=64
component-node name=r1n component=r1 input=a1n
component name=a2 type=AffineComponent input-dim=64 output-dim=4
component-node name=a2n component=a2 input=r1n
component name=lsm type=LogSoftmaxComponent dim=4
component-node name=out component=lsm input=a2n
output-node name=output input=out
"""
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    # class = argmax of a fixed random projection of the CENTER frame
    Wc = rng.randn(6, 4)
    N, chunk = 256, 4
    ctx = net.left_context + net.right_context
    feats = rng.randn(N, chunk + ctx, 6).astype(np.float32)
    targets = np.argmax(feats[:, 1:1 + chunk] @ Wc, axis=-1).astype(np.int32)
    weights = np.ones((N, chunk), np.float32)
    egs = {"feats": feats, "targets": targets, "weights": weights}
    params, hist = train_epochs(net, params, egs,
                                NnetTrainOpts(num_epochs=80,
                                              minibatch_size=64,
                                              initial_lr=0.05,
                                              final_lr=0.01),
                                log_every=1)
    accs = [h[3] for h in hist]
    assert accs[-1] > 0.8, accs[-1]


@pytest.mark.slow
def test_natural_gradient_preserves_norm_and_direction_quality():
    """NG preconditioning keeps the Frobenius norm (the reference's
    scale-preserving contract) and beats SGD on an ill-conditioned
    quadratic."""
    tx = natural_gradient(alpha=1.0, update_period=1)
    params = {"layer": {"w": jnp.zeros((4, 3))}}
    state = tx.init(params)
    rng = np.random.RandomState(0)
    g = {"layer": {"w": jnp.asarray(rng.randn(4, 3), jnp.float32)}}
    out, state = tx.update(g, state)
    assert np.linalg.norm(out["layer"]["w"]) == pytest.approx(
        np.linalg.norm(g["layer"]["w"]), rel=1e-4)

    # stochastic linear regression with ill-conditioned input covariance:
    # the Fisher's input factor IS E[x xᵀ]; NG whitens it (the exact
    # scenario nnet2's online preconditioner targets)
    scale = np.sqrt(np.array([100.0, 10.0, 1.0, 0.1], np.float32))
    w_star = jnp.asarray(rng.randn(3, 4), jnp.float32)

    def minibatch(key):
        x = jax.random.normal(key, (64, 4)) * scale
        return x

    def loss(w, x):
        return 0.5 * jnp.mean(jnp.sum((x @ (w - w_star).T) ** 2, -1))

    import optax
    ng = ng_sgd(0.01, alpha=0.2, update_period=2)
    sgd = optax.sgd(0.01)

    def train(opt):
        w = jnp.zeros((3, 4))
        st = opt.init({"m": {"w": w}})
        key = jax.random.PRNGKey(0)
        for i in range(150):
            key, sub = jax.random.split(key)
            x = minibatch(sub)
            g = jax.grad(loss)(w, x)
            upd, st = opt.update({"m": {"w": g}}, st)
            w = optax.apply_updates({"m": {"w": w}}, upd)["m"]["w"]
        xe = jax.random.normal(jax.random.PRNGKey(99), (512, 4)) * scale
        return float(loss(w, xe))

    assert train(ng) < train(sgd)


def test_zero_param_stddev_respected():
    """param-stddev=0 is the zero-init-final-layer idiom; the falsy-or
    coercion bug turned it into random init (regression)."""
    cfg = ("input-node name=input dim=4\n"
           "component name=a type=NaturalGradientAffineComponent "
           "input-dim=4 output-dim=3 param-stddev=0 bias-stddev=0\n"
           "component-node name=an component=a input=input\n"
           "output-node name=output input=an\n")
    net = Nnet3(cfg)
    params = net.init(jax.random.PRNGKey(0))
    assert float(jnp.abs(params["a"]["w"]).max()) == 0.0
    assert float(jnp.abs(params["a"]["b"]).max()) == 0.0


def test_make_tdnn_config_pnorm():
    """PnormComponent configs must carry input-dim/output-dim and reduce
    the layer dim (regression: KeyError 'output-dim' at apply time)."""
    from kaldi_tpu.nnet3.configs import make_tdnn_config
    text = make_tdnn_config(8, 5, splice_indexes=((-1, 0, 1), (0,)),
                            hidden_dim=16, nonlinearity="PnormComponent",
                            pnorm_output_dim=4)
    net = Nnet3(text)
    assert net.dims["output"] == 5
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 9, 8), jnp.float32)
    y = net.apply(params, x, pad_context=True)
    assert y.shape == (2, 9, 5)
    assert np.isfinite(np.asarray(y)).all()
    # the second affine consumes the REDUCED pnorm dim
    assert params["tdnn1.affine"]["w"].shape[-1] == 4


def test_nnet3_quadratic_objective_and_ng_optimizer():
    """Output-node objective=quadratic trains a regression net through
    the nnet3 trainer with the NG preconditioner active
    (ref: nnet3/nnet-training.cc:262 ComputeObjectiveFunction kQuadratic)."""
    from kaldi_tpu.nnet3.training import (Nnet3TrainOpts, train_nnet3,
                                          nnet3_objective)

    cfg = """
input-node name=input dim=4
component name=a1 type=NaturalGradientAffineComponent input-dim=4 output-dim=16
component-node name=a1n component=a1 input=input
component name=r1 type=RectifiedLinearComponent dim=16
component-node name=r1n component=r1 input=a1n
component name=a2 type=AffineComponent input-dim=16 output-dim=3
component-node name=a2n component=a2 input=r1n
output-node name=output input=a2n objective=quadratic
"""
    net = Nnet3(cfg)
    assert net.by_name["output"].objective == "quadratic"
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    W = rng.randn(4, 3).astype(np.float32)
    N, T = 256, 2
    feats = rng.randn(N, T, 4).astype(np.float32)
    targets = feats @ W
    weights = np.ones((N, T), np.float32)
    egs = {"feats": feats, "targets": targets, "weights": weights}
    l0, _ = nnet3_objective(net, params, feats, targets, weights)
    params, hist = train_nnet3(
        net, params, egs,
        Nnet3TrainOpts(initial_lr=0.05, final_lr=0.01, num_epochs=60,
                       minibatch_size=64), log_every=1)
    l1, _ = nnet3_objective(net, params, feats, targets, weights)
    assert float(l1) < 0.3 * float(l0), (float(l0), float(l1))
