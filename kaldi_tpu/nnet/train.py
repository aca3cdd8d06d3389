"""DNN training: synchronous data-parallel SGD with natural-gradient
preconditioning, sharded over a device mesh.

(ref: the nnet2 training loop — nnet2/nnet-update.h:46-94 NnetUpdater,
 steps/nnet2/train_multisplice_accel2.sh:466-539 parallel-SGD-with-model-
 averaging, nnet2/nnet-precondition-online.h:446 OnlinePreconditioner.
 Model averaging across jobs + NG-SGD is the reference's substitute for
 synchronous data parallelism; on the mesh we do the strictly-stronger
 thing: one global step with gradients psum'd over ICI, SURVEY.md §2.11.)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from kaldi_tpu.nnet.tdnn import Tdnn
from kaldi_tpu.parallel.mesh import tdnn_param_sharding, batch_sharding


@dataclasses.dataclass(frozen=True)
class NnetTrainOpts:
    """(ref: nnet2/nnet-trnopts + train_multisplice_accel2.sh lr schedule)"""

    initial_lr: float = 0.0015
    final_lr: float = 0.00015
    num_epochs: int = 8
    minibatch_size: int = 128
    momentum: float = 0.0
    max_grad_norm: float = 5.0
    l2_regularize: float = 0.0


def cross_entropy_loss(model: Tdnn, params, feats, targets, weights,
                       compute_dtype=None):
    """feats [B, T+ctx, D] (valid-mode), targets [B, T], weights [B, T].

    compute_dtype=jnp.bfloat16 runs the affine GEMMs (and their grads)
    in bf16 on the MXU with f32 master params — 2x MXU throughput; loss
    reduction and log-softmax stay f32."""
    # only Tdnn.apply knows compute_dtype; other models (e.g. Nnet3
    # config nets) share this loss with their own apply signature
    kw = {} if compute_dtype is None else {"compute_dtype": compute_dtype}
    log_post = model.apply(params, feats, pad_context=False, **kw)
    ll = jnp.take_along_axis(log_post, targets[..., None], axis=-1)[..., 0]
    tot_w = jnp.maximum(jnp.sum(weights), 1.0)
    loss = -jnp.sum(ll * weights) / tot_w
    acc = jnp.sum((jnp.argmax(log_post, -1) == targets) * weights) / tot_w
    return loss, acc


def make_optimizer(opts: NnetTrainOpts, num_steps: int):
    sched = optax.exponential_decay(
        opts.initial_lr, max(num_steps, 1),
        opts.final_lr / opts.initial_lr, end_value=opts.final_lr)
    chain = []
    if opts.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(opts.max_grad_norm))
    if opts.l2_regularize > 0:
        chain.append(optax.add_decayed_weights(opts.l2_regularize))
    if opts.momentum > 0:
        chain.append(optax.sgd(sched, momentum=opts.momentum))
    else:
        chain.append(optax.sgd(sched))
    return optax.chain(*chain)


def make_train_step(model: Tdnn, optimizer, mesh=None, compute_dtype=None):
    """Returns jitted step(params, opt_state, feats, targets, weights).

    With a mesh: batch shards over 'data', final layer over 'model' — XLA
    inserts the gradient all-reduce over ICI automatically.
    compute_dtype=jnp.bfloat16 selects mixed-precision GEMMs (f32 master
    params, bf16 matmuls on the MXU).
    """

    def step(params, opt_state, feats, targets, weights):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: cross_entropy_loss(model, p, feats, targets, weights,
                                         compute_dtype=compute_dtype),
            has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    if mesh is None:
        return jax.jit(step)

    return jax.jit(
        step,
        in_shardings=(None, None, batch_sharding(mesh, 3),
                      batch_sharding(mesh, 2), batch_sharding(mesh, 2)),
    )


def shard_params(params, mesh):
    """Place params with the model-parallel sharding rules."""
    shardings = tdnn_param_sharding(mesh, params)
    return jax.device_put(params, shardings), shardings


def train_epochs(
    model: Tdnn,
    params,
    egs,  # dict with feats [N, chunk+ctx, D], targets [N, chunk], weights
    opts: NnetTrainOpts = NnetTrainOpts(),
    mesh=None,
    rng: np.random.RandomState | None = None,
    log_every: int = 50,
    callback=None,
):
    """Simple in-memory trainer (recipe-scale; the streaming version feeds
    from the egs pipeline)."""
    rng = rng or np.random.RandomState(0)
    N = egs["feats"].shape[0]
    mb = opts.minibatch_size
    steps_per_epoch = max(N // mb, 1)
    optimizer = make_optimizer(opts, steps_per_epoch * opts.num_epochs)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, optimizer, mesh)
    history = []
    for epoch in range(opts.num_epochs):
        perm = rng.permutation(N)
        for k in range(steps_per_epoch):
            sel = perm[k * mb: (k + 1) * mb]
            if len(sel) < mb:
                # pad the tail minibatch to a FULL mb rows (tiling the
                # permutation if N < mb): a short batch would retrace the
                # jit program and break the 'data'-axis divisibility of
                # the mesh sharding
                pad = np.resize(perm, mb - len(sel))
                sel = np.concatenate([sel, pad])
            params, opt_state, loss, acc = step_fn(
                params, opt_state,
                jnp.asarray(egs["feats"][sel]),
                jnp.asarray(egs["targets"][sel]),
                jnp.asarray(egs["weights"][sel]))
            if k % log_every == 0:
                history.append((epoch, k, float(loss), float(acc)))
                if callback:
                    callback(epoch, k, float(loss), float(acc))
    return params, history


def make_egs(
    utts,            # list of (feats [T,D], pdf_ids [T]) aligned utterances
    left_context: int,
    right_context: int,
    chunk: int = 8,
):
    """Chunked frame examples: [N, chunk + l + r, D] with [N, chunk] targets.

    (ref: steps/nnet2/get_egs2.sh — frame egs with spliced context; chunked
    rather than single-frame so the TDNN's temporal gathers amortize.)
    """
    feats_out, tgt_out, w_out = [], [], []
    for feats, pdfs in utts:
        T, D = feats.shape
        padded = np.pad(feats, ((left_context, right_context), (0, 0)),
                        mode="edge")
        for start in range(0, T, chunk):
            end = min(start + chunk, T)
            n = end - start
            win = padded[start: start + chunk + left_context + right_context]
            if win.shape[0] < chunk + left_context + right_context:
                win = np.pad(win, ((0, chunk + left_context + right_context
                                    - win.shape[0]), (0, 0)), mode="edge")
            t = np.zeros(chunk, np.int32)
            t[:n] = pdfs[start:end]
            w = np.zeros(chunk, np.float32)
            w[:n] = 1.0
            feats_out.append(win)
            tgt_out.append(t)
            w_out.append(w)
    return {
        "feats": np.stack(feats_out).astype(np.float32),
        "targets": np.stack(tgt_out),
        "weights": np.stack(w_out),
    }
