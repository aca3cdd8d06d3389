"""Disk-backed egs pipeline: dump, buffered-shuffle read, training smoke.

(ref: steps/nnet2/get_egs2.sh, nnet2bin/nnet-shuffle-egs.)
"""

import numpy as np
import pytest

from kaldi_tpu.steps.egs import dump_egs, egs_minibatches


def _aligned(rng, n_utts=6, T=40, D=5):
    out = []
    for _ in range(n_utts):
        f = rng.randn(T, D).astype(np.float32)
        p = rng.randint(0, 4, T)
        out.append((f, p))
    return out


def test_dump_and_read_coverage(tmp_path):
    rng = np.random.RandomState(0)
    aligned = _aligned(rng)
    n_arch = dump_egs(aligned, left_context=2, right_context=2, chunk=8,
                      out_dir=str(tmp_path), num_archives=3,
                      compress=True)
    assert n_arch == 3
    # 6 utts × 5 chunks = 30 examples; mb=5 -> 6 batches/epoch
    batches = list(egs_minibatches(str(tmp_path), minibatch=5,
                                   num_archives=3, num_epochs=1,
                                   buffer_size=16))
    assert len(batches) == 6
    for x, y in batches:
        assert x.shape == (5, 8 + 4, 5)
        assert y.shape == (5, 8)
        assert y.dtype == np.int32

    # two epochs yield twice the batches, different order
    b2 = list(egs_minibatches(str(tmp_path), minibatch=5, num_archives=3,
                              num_epochs=2, buffer_size=16, seed=1))
    assert len(b2) == 12


def test_compressed_egs_close_to_original(tmp_path):
    rng = np.random.RandomState(1)
    aligned = _aligned(rng, n_utts=1, T=16)
    dump_egs(aligned, 1, 1, 8, str(tmp_path), num_archives=1,
             compress=True)
    batches = list(egs_minibatches(str(tmp_path), minibatch=1,
                                   num_archives=1, buffer_size=4))
    assert len(batches) == 2          # T=16, chunk=8 -> 2 examples
    # lossy codec: close but not exact
    f = aligned[0][0]
    padded = np.pad(f, ((1, 1), (0, 0)), mode="edge")
    for x, _y in batches:
        diffs = [np.abs(x[0] - padded[lo:lo + 10]).max() for lo in (0, 8)]
        assert min(diffs) < 0.08


def test_training_from_egs(tmp_path):
    """End-to-end: dump egs, train the TDNN from streamed minibatches."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
    from kaldi_tpu.nnet.train import cross_entropy_loss

    rng = np.random.RandomState(2)
    W = rng.randn(5, 4)
    aligned = []
    for _ in range(8):
        f = rng.randn(48, 5).astype(np.float32)
        p = np.argmax(f @ W, axis=1)
        aligned.append((f, p))
    dump_egs(aligned, 2, 2, 8, str(tmp_path), num_archives=2)

    cfg = TdnnConfig(feat_dim=5, num_pdfs=4, hidden_dim=32,
                     pnorm_output_dim=8,
                     splice_indexes=((-1, 0, 1), (-1, 1), (0,)))
    model = Tdnn(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(0.01)
    st = tx.init(params)

    @jax.jit
    def step(params, st, x, y):
        (loss, acc), g = jax.value_and_grad(
            lambda p: cross_entropy_loss(model, p, x, y,
                                         jnp.ones_like(y, jnp.float32)),
            has_aux=True)(params)
        upd, st = tx.update(g, st)
        return optax.apply_updates(params, upd), st, loss, acc

    accs = []
    for x, y in egs_minibatches(str(tmp_path), minibatch=8,
                                num_archives=2, num_epochs=30,
                                buffer_size=32):
        params, st, loss, acc = step(params, st, jnp.asarray(x),
                                     jnp.asarray(y))
        accs.append(float(acc))
    assert np.mean(accs[-5:]) > np.mean(accs[:5]) + 0.2
