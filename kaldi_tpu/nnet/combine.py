"""Model averaging / combination / mixup for parallel-SGD training.

(ref: nnet2bin/nnet-am-average.cc — the reduce step of the reference's
 parallel training (steps/nnet2/train_multisplice_accel2.sh:529-532);
 nnet2/combine-nnet-fast.h — LBFGS over per-(model, layer) interpolation
 weights on a validation set; nnet2/mixup-nnet.h — turn softmax rows into
 mixtures. Combination here optimizes the same per-layer weights with
 full-batch Adam on the validation loss under jit — equivalent optimum,
 simpler machinery.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax


def average_params(params_list):
    """(ref: nnet-am-average.cc) — elementwise mean over model pytrees."""
    return jax.tree.map(lambda *xs: sum(xs) / len(xs), *params_list)


def combine_params(
    params_list,
    loss_fn,                    # loss_fn(params) -> scalar (validation set)
    num_steps: int = 50,
    learning_rate: float = 0.1,
):
    """Learn per-(model, leaf) interpolation weights minimizing the
    validation loss; weights init at uniform (the reference inits at the
    last model + uniform direction). Returns (combined_params, final_loss).
    """
    N = len(params_list)
    leaves0, treedef = jax.tree_util.tree_flatten(params_list[0])
    L = len(leaves0)
    stacked = [jnp.stack([jax.tree_util.tree_leaves(p)[i] for p in
                          params_list]) for i in range(L)]
    w0 = jnp.zeros((N, L))      # softmax logits per (model, leaf)

    def build(w):
        probs = jax.nn.softmax(w, axis=0)        # [N, L]
        leaves = [jnp.tensordot(probs[:, i], stacked[i], axes=1)
                  for i in range(L)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def objective(w):
        return loss_fn(build(w))

    tx = optax.adam(learning_rate)
    st = tx.init(w0)

    @jax.jit
    def step(w, st):
        loss, g = jax.value_and_grad(objective)(w)
        upd, st = tx.update(g, st)
        return optax.apply_updates(w, upd), st, loss

    w = w0
    loss = None
    for _ in range(num_steps):
        w, st, loss = step(w, st)
    return build(w), float(loss)


def mixup_softmax_layer(w: np.ndarray, b: np.ndarray, num_mixtures: int,
                        perturb: float = 0.01, seed: int = 0):
    """Mix up the final affine+softmax: each output row r becomes
    `num_mixtures/num_rows`-ish copies with perturbed parameters whose
    posteriors are summed downstream (ref: nnet2/mixup-nnet.h MixupNnet —
    the SoftmaxComponent->MixtureProbComponent transformation).

    Returns (w_new [M, D], b_new [M], group_ids [M]): group_ids maps the
    expanded rows back to original classes (sum posteriors per group).
    """
    rng = np.random.RandomState(seed)
    C, D = w.shape
    copies = max(1, num_mixtures // C)
    w_new, b_new, gid = [], [], []
    for c in range(C):
        for k in range(copies):
            noise = rng.randn(D) * perturb if k > 0 else 0.0
            w_new.append(w[c] + noise)
            # split the prior mass: log(1/copies) bias offset
            b_new.append(b[c] - np.log(copies))
            gid.append(c)
    return (np.stack(w_new), np.asarray(b_new), np.asarray(gid))


def sum_group_log_posteriors(log_post: jnp.ndarray, group_ids,
                             num_groups: int) -> jnp.ndarray:
    """[..., M] mixed-up log-posteriors -> [..., C] by log-sum-exp over
    each group (the MixtureProbComponent forward)."""
    gid = jnp.asarray(group_ids)
    # segment logsumexp via max-shift
    m = jax.ops.segment_max(jnp.moveaxis(log_post, -1, 0), gid,
                            num_segments=num_groups)
    m = jnp.moveaxis(m, 0, -1)
    shifted = jnp.exp(log_post - jnp.take(m, gid, axis=-1))
    s = jax.ops.segment_sum(jnp.moveaxis(shifted, -1, 0), gid,
                            num_segments=num_groups)
    s = jnp.moveaxis(s, 0, -1)
    return m + jnp.log(jnp.maximum(s, 1e-37))
