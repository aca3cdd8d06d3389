"""nnet1 trainers: frame-shuffled per-frame and multi-stream BPTT.

(ref: nnet/nnet-randomizer.h:66 MatrixRandomizer (GPU frame shuffling),
 nnet/nnet-loss.h:59 Xent / :112 Mse with per-frame weights,
 nnetbin/nnet-train-lstm-streams.cc — S parallel utterance streams,
 truncated-BPTT chunks with carried LSTM state, per-stream reset when an
 utterance ends.)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax


def xent_loss(log_post, targets, weights):
    """(ref: nnet-loss.h:59 Xent — per-frame weighted cross-entropy)."""
    ll = jnp.take_along_axis(log_post, targets[..., None], -1)[..., 0]
    w = jnp.maximum(weights.sum(), 1.0)
    loss = -(ll * weights).sum() / w
    acc = ((jnp.argmax(log_post, -1) == targets) * weights).sum() / w
    return loss, acc


def mse_loss(pred, targets, weights):
    """(ref: nnet-loss.h:112 Mse)."""
    w = jnp.maximum(weights.sum(), 1.0)
    return 0.5 * ((pred - targets) ** 2).sum(-1).dot(weights.reshape(-1)) / w \
        if pred.ndim == 2 else \
        0.5 * (((pred - targets) ** 2).sum(-1) * weights).sum() / w


class FrameShuffler:
    """Host-side analogue of MatrixRandomizer: shuffle frames across
    utterances, emit fixed-size minibatches."""

    def __init__(self, feats: np.ndarray, targets: np.ndarray,
                 minibatch: int = 256, seed: int = 0):
        self.rng = np.random.RandomState(seed)
        self.feats, self.targets = feats, targets
        self.minibatch = minibatch

    def __iter__(self):
        # fresh permutation per pass (the reference's MatrixRandomizer
        # refills+reshuffles each epoch); the tail wraps with frames from
        # the permutation head so every frame is trained on every epoch
        order = self.rng.permutation(len(self.feats))
        n = len(order)
        if n >= self.minibatch and n % self.minibatch:
            order = np.concatenate(
                [order, order[: self.minibatch - n % self.minibatch]])
        for lo in range(0, len(order) - self.minibatch + 1,
                        self.minibatch):
            idx = order[lo: lo + self.minibatch]
            yield self.feats[idx], self.targets[idx]


@dataclasses.dataclass
class StreamTrainOpts:
    num_streams: int = 4          # S parallel utterances
    bptt_chunk: int = 20          # truncated-BPTT length (frames)
    learning_rate: float = 1e-2
    num_epochs: int = 1
    grad_clip: float = 5.0


def train_lstm_streams(model, params, utts, opts: StreamTrainOpts):
    """Multi-stream truncated BPTT (ref: nnet-train-lstm-streams.cc).

    utts: list of (feats [T, D], targets [T]). Streams are filled with
    utterances; each step consumes `bptt_chunk` frames per stream with the
    LSTM state carried (gradient stopped) across chunks, reset per stream
    when its utterance changes.

    Returns (params, history of per-epoch mean loss).
    """
    tx = optax.chain(optax.clip_by_global_norm(opts.grad_clip),
                     optax.sgd(opts.learning_rate))
    opt_state = tx.init(params)
    S, K = opts.num_streams, opts.bptt_chunk
    D = utts[0][0].shape[1]

    @jax.jit
    def step(params, opt_state, states, x, t, w):
        def loss_fn(p):
            log_post, new_states = model.apply(p, x, states)
            loss, _acc = xent_loss(log_post, t, w)
            return loss, new_states

        (loss, new_states), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # stop gradient across chunk boundary (truncated BPTT)
        new_states = jax.tree.map(
            lambda s: jax.lax.stop_gradient(s) if s is not None else None,
            new_states, is_leaf=lambda s: s is None)
        return params, opt_state, new_states, loss

    hist = []
    for _epoch in range(opts.num_epochs):
        queue = list(utts)
        cur = [None] * S        # per-stream (feats, targets, position)
        states = None           # model states; reset lazily per stream
        losses = []
        zero_states = None
        while True:
            # refill streams
            for s in range(S):
                if cur[s] is None or cur[s][2] >= len(cur[s][0]):
                    if queue:
                        f, t = queue.pop(0)
                        cur[s] = (f, t, 0)
                        if states is not None:
                            # reset this stream's carried state
                            states = [
                                tuple(st_part.at[s].set(0.0)
                                      for st_part in layer_st)
                                if layer_st is not None else None
                                for layer_st in states]
                    else:
                        cur[s] = None
            if all(c is None for c in cur):
                break
            x = np.zeros((S, K, D), np.float32)
            t = np.zeros((S, K), np.int32)
            w = np.zeros((S, K), np.float32)
            for s in range(S):
                if cur[s] is None:
                    continue
                f, tt, pos = cur[s]
                n = min(K, len(f) - pos)
                x[s, :n] = f[pos: pos + n]
                t[s, :n] = tt[pos: pos + n]
                w[s, :n] = 1.0
                cur[s] = (f, tt, pos + n)
            params, opt_state, states, loss = step(
                params, opt_state, states, jnp.asarray(x), jnp.asarray(t),
                jnp.asarray(w))
            losses.append(float(loss))
        hist.append(float(np.mean(losses)) if losses else 0.0)
    return params, hist
