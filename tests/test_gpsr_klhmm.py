"""GPSR L1-QP solver + KL-HMM layer."""

import numpy as np

from kaldi_tpu.utils.gpsr import gpsr, gpsr_optimality_gap
from kaldi_tpu.nnet1.kl_hmm import KlHmm


def test_gpsr_solves_l1_qp():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 8
        A = rng.randn(n + 4, n)
        H = A.T @ A + 0.1 * np.eye(n)
        g = rng.randn(n) * 2.0
        tau = 0.5
        x = gpsr(H, g, tau)
        assert gpsr_optimality_gap(H, g, tau, x) < 1e-4, trial
        # objective beats both the zero vector and the unregularized optimum
        def obj(z):
            return 0.5 * z @ H @ z - g @ z + tau * np.abs(z).sum()
        assert obj(x) <= obj(np.zeros(n)) + 1e-10
        assert obj(x) <= obj(np.linalg.solve(H, g)) + 1e-10


def test_gpsr_produces_sparsity():
    H = np.eye(3)
    g = np.array([2.0, 0.05, -0.5])
    x = gpsr(H, g, tau=0.3)
    # soft-threshold oracle for identity H: x = sign(g)*max(|g|-tau, 0)
    np.testing.assert_allclose(x, [1.7, 0.0, -0.2], atol=1e-6)


def test_kl_hmm_scores_favor_matching_state():
    rng = np.random.RandomState(1)
    D, S, T = 6, 3, 300
    # three well-separated state-conditional posterior prototypes
    proto = np.full((S, D), 0.1 / (D - 2))
    for s in range(S):
        proto[s, 2 * s: 2 * s + 2] = 0.45
    ali = rng.randint(0, S, T)
    noise = rng.dirichlet(np.ones(D), size=T)
    post = 0.85 * proto[ali] + 0.15 * noise
    m = KlHmm(D, S)
    m.accumulate(post, ali)
    dists = m.state_dists()
    np.testing.assert_allclose(dists.sum(1), 1.0, atol=1e-9)
    sc = np.asarray(m.scores(post))
    assert sc.shape == (T, S)
    # the aligned state should win on most frames
    acc = (sc.argmax(1) == ali).mean()
    assert acc > 0.8
    # untrained model: uniform dists, all states tie
    m2 = KlHmm(D, S)
    sc2 = np.asarray(m2.scores(post[:5]))
    np.testing.assert_allclose(sc2[:, 0], sc2[:, 1], atol=1e-5)


def test_dct_component_matches_oracle():
    import jax.numpy as jnp
    from kaldi_tpu.nnet.components_extra import dct_component, dct_matrix
    rng = np.random.RandomState(0)
    x = rng.randn(4, 12).astype(np.float32)
    M = dct_matrix(4)
    # block-major: 3 blocks of 4
    y = np.asarray(dct_component(jnp.asarray(x), dct_dim=4))
    want = np.concatenate([x[:, 4 * b: 4 * b + 4] @ M.T for b in range(3)],
                          axis=1)
    np.testing.assert_allclose(y, want, atol=1e-5)
    # keep only 2 coefficients per block
    y2 = np.asarray(dct_component(jnp.asarray(x), dct_dim=4,
                                  dct_keep_dim=2))
    assert y2.shape == (4, 6)
    np.testing.assert_allclose(y2[:, :2], want[:, :2], atol=1e-5)
    # orthonormality: full DCT preserves norms
    np.testing.assert_allclose((y ** 2).sum(), (x ** 2).sum(), rtol=1e-5)


def test_block_affine_matches_dense_blocks():
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.nnet.components_extra import (block_affine_init,
                                                 block_affine_apply)
    params = block_affine_init(jax.random.PRNGKey(0), 6, 4, num_blocks=2)
    x = jnp.asarray(np.random.RandomState(0).randn(5, 6), jnp.float32)
    y = np.asarray(block_affine_apply(params, x))
    w = np.asarray(params["w"])
    want0 = np.asarray(x[:, :3]) @ w[0]
    want1 = np.asarray(x[:, 3:]) @ w[1]
    np.testing.assert_allclose(y, np.concatenate([want0, want1], axis=1),
                               atol=1e-5)


def test_additive_noise():
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.nnet.components_extra import additive_noise
    x = jnp.zeros((1000,), jnp.float32)
    y = np.asarray(additive_noise(jax.random.PRNGKey(0), x, 0.5))
    assert abs(y.std() - 0.5) < 0.05
