"""Model surgery: widen/shrink/limit-rank/fix/replace-last-layers.

(ref test strategy: nnet2's surgery tools are exercised by the recipe
 scripts rather than unit tests; here each op gets a functional contract
 check — widen preserves the network function, limit-rank approximates it,
 fix rescales exactly the flagged units, shrink does not degrade held-out
 loss.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
from kaldi_tpu.nnet import surgery


def _relu_net():
    cfg = TdnnConfig(feat_dim=5, num_pdfs=7,
                     splice_indexes=((-1, 0, 1), (-1, 1), (0,)),
                     hidden_dim=16, nonlinearity="relu")
    model = Tdnn(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # non-degenerate output layer
    params["final"]["w"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(5), params["final"]["w"].shape)
    return cfg, model, params


def test_widen_preserves_function():
    cfg, model, params = _relu_net()
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 5))
    before = model.apply(params, feats)
    wide = surgery.widen(params, cfg, 24, jax.random.PRNGKey(2))
    cfg2 = TdnnConfig(**{**cfg.__dict__, "hidden_dim": 24})
    after = Tdnn(cfg2).apply(wide, feats)
    # new units have zero outgoing weights -> identical function
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               atol=2e-5)
    assert wide["layers"][0]["w"].shape[1] == 24
    assert wide["layers"][1]["w"].shape[0] == 24 * 2  # 2 splice offsets


def test_widen_rejects_pnorm():
    cfg = TdnnConfig(feat_dim=5, num_pdfs=7, hidden_dim=16,
                     pnorm_output_dim=4,
                     splice_indexes=((0,),), nonlinearity="pnorm")
    params = Tdnn(cfg).init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        surgery.widen(params, cfg, 32, jax.random.PRNGKey(1))


def test_limit_rank_approximates():
    cfg, model, params = _relu_net()
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 5))
    before = model.apply(params, feats)
    # full rank -> exact
    full, factors = surgery.limit_rank(params, rank=10_000)
    after = model.apply(full, feats)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               atol=1e-4)
    a, b = factors[0]
    np.testing.assert_allclose(a @ b, np.asarray(full["layers"][0]["w"]),
                               atol=1e-5)
    # low rank -> right shapes, finite outputs
    lo, f2 = surgery.limit_rank(params, rank=3)
    assert f2[0][0].shape[1] == 3
    assert np.isfinite(np.asarray(model.apply(lo, feats))).all()


def test_fix_rescales_dead_units():
    cfg, model, params = _relu_net()
    # kill unit 0 of layer 0: tiny incoming weights
    params["layers"][0]["w"] = params["layers"][0]["w"].at[:, 0].mul(1e-6)
    params["layers"][0]["b"] = params["layers"][0]["b"].at[0].set(0.0)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 20, 5))
    fixed = surgery.fix(params, cfg, model.hidden_mean_abs, feats,
                        parameter_factor=4.0)
    # the dead unit's weights grew by the cap factor
    ratio = np.abs(np.asarray(fixed["layers"][0]["w"][:, 0])) / np.maximum(
        np.abs(np.asarray(params["layers"][0]["w"][:, 0])), 1e-30)
    np.testing.assert_allclose(ratio, 4.0, rtol=1e-4)
    # healthy mid-range units untouched
    stats = model.hidden_mean_abs(params, feats)
    rel = np.asarray(stats[0]) / np.asarray(stats[0]).mean()
    healthy = np.where((rel > 0.5) & (rel < 1.5))[0]
    assert len(healthy) > 0
    j = int(healthy[0])
    np.testing.assert_allclose(np.asarray(fixed["layers"][0]["w"][:, j]),
                               np.asarray(params["layers"][0]["w"][:, j]))


@pytest.mark.slow
def test_shrink_improves_or_holds_loss():
    cfg, model, params = _relu_net()
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(3, 15, 5), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 7, (3, 15)))
    # blow the params up so plain scaling clearly helps
    big = jax.tree_util.tree_map(lambda p: p * 3.0, params)

    def loss(p):
        lp = model.apply(p, feats)
        return float(-jnp.mean(jnp.take_along_axis(lp, labels[..., None],
                                                   axis=-1)))

    shrunk = surgery.shrink(model.apply, big, feats, labels, num_steps=40)
    assert loss(shrunk) <= loss(big) + 1e-6


def test_replace_last_layers_and_lr_labels():
    cfg, model, params = _relu_net()
    out = surgery.replace_last_layers(params, cfg, 11, jax.random.PRNGKey(3))
    assert out["final"]["w"].shape == (16, 11)
    assert out["layers"][0] is params["layers"][0]

    tx = surgery.layerwise_optimizer(params, 0.1,
                                     {"final": 0.0, "layer0": 1.0})
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(g, st, params)
    assert float(jnp.abs(upd["final"]["w"]).max()) == 0.0
    assert float(jnp.abs(upd["layers"][0]["w"]).max()) > 0.0
