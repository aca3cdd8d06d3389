"""nnet3 trainer: objectives at output nodes + NG-SGD over config nets.

(ref: nnet3/nnet-training.cc:37 NnetTrainer::Train — one minibatch =
 forward to the output node, objective + derivative at the output,
 backprop, natural-gradient update. Here Nnet3.apply is a pure JAX
 function, so the whole of nnet-computation/backprop collapses into
 jax.value_and_grad under jit; the NG preconditioner is the shared
 online-natural-gradient optimizer, applied to every
 NaturalGradientAffineComponent's weight matrix.)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from kaldi_tpu.nnet3.network import Nnet3
from kaldi_tpu.nnet.natural_gradient import natural_gradient
from kaldi_tpu.nnet.am_nnet import AmNnet


@dataclasses.dataclass(frozen=True)
class Nnet3TrainOpts:
    """(ref: nnet3/nnet-training.h:40 NnetTrainerOptions)"""

    initial_lr: float = 0.0015
    final_lr: float = 0.00015
    num_epochs: int = 8
    minibatch_size: int = 128
    momentum: float = 0.0
    max_grad_norm: float = 5.0
    use_natural_gradient: bool = True   # NaturalGradientAffineComponent
    ng_alpha: float = 4.0
    ng_update_period: int = 4


def nnet3_objective(net: Nnet3, params, feats, targets, weights,
                    output: str = "output"):
    """Objective + frame accuracy at an output node.

    'linear': weighted sum of the target row of the output (the CE
    objective when the output node ends in LogSoftmax — the reference's
    standard setup). 'quadratic': -0.5 * weighted squared error, with
    targets as dense vectors. (ref: nnet3/nnet-training.cc:262
    ComputeObjectiveFunction.)
    """
    node = net.by_name[output]
    y = net.apply(params, feats, output=output, pad_context=False)
    if node.objective == "quadratic":
        err = y - targets
        tot_w = jnp.maximum(jnp.sum(weights), 1.0)
        loss = 0.5 * jnp.sum(err * err * weights[..., None]) / tot_w
        return loss, jnp.zeros(())
    ll = jnp.take_along_axis(y, targets[..., None], axis=-1)[..., 0]
    tot_w = jnp.maximum(jnp.sum(weights), 1.0)
    loss = -jnp.sum(ll * weights) / tot_w
    acc = jnp.sum((jnp.argmax(y, -1) == targets) * weights) / tot_w
    return loss, acc


def make_nnet3_optimizer(net: Nnet3, opts: Nnet3TrainOpts, num_steps: int):
    """SGD schedule + global-norm clip, with the online natural-gradient
    preconditioner on NaturalGradientAffineComponent weights."""
    sched = optax.exponential_decay(
        opts.initial_lr, max(num_steps, 1),
        opts.final_lr / opts.initial_lr, end_value=opts.final_lr)
    chain = []
    if opts.use_natural_gradient:
        ng_names = {name for name, cfg in net.components.items()
                    if cfg["type"] == "NaturalGradientAffineComponent"}
        if ng_names:
            # precondition ONLY NaturalGradientAffineComponent weights
            # (params are {component_name: {"w": ..., "b": ...}}, so the
            # keystr path starts with the component name)
            def _is_ng(keystr, _names=frozenset(ng_names)):
                return any(f"'{n}'" in keystr for n in _names)
            chain.append(natural_gradient(
                alpha=opts.ng_alpha, update_period=opts.ng_update_period,
                param_filter=_is_ng))
    if opts.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(opts.max_grad_norm))
    chain.append(optax.sgd(sched, momentum=opts.momentum)
                 if opts.momentum > 0 else optax.sgd(sched))
    return optax.chain(*chain)


def make_nnet3_train_step(net: Nnet3, optimizer, output: str = "output"):
    def step(params, opt_state, feats, targets, weights):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: nnet3_objective(net, p, feats, targets, weights,
                                      output),
            has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    return jax.jit(step)


def train_nnet3(net: Nnet3, params, egs, opts: Nnet3TrainOpts =
                Nnet3TrainOpts(), output: str = "output",
                rng: np.random.RandomState | None = None,
                log_every: int = 50):
    """In-memory nnet3 training loop (the nnet3-train binary role)."""
    rng = rng or np.random.RandomState(0)
    N = egs["feats"].shape[0]
    mb = opts.minibatch_size
    steps_per_epoch = max(N // mb, 1)
    optimizer = make_nnet3_optimizer(net, opts,
                                     steps_per_epoch * opts.num_epochs)
    opt_state = optimizer.init(params)
    step_fn = make_nnet3_train_step(net, optimizer, output)
    history = []
    for epoch in range(opts.num_epochs):
        perm = rng.permutation(N)
        for k in range(steps_per_epoch):
            sel = perm[k * mb: (k + 1) * mb]
            if len(sel) < mb:
                sel = np.concatenate([sel, np.resize(perm, mb - len(sel))])
            params, opt_state, loss, acc = step_fn(
                params, opt_state,
                jnp.asarray(egs["feats"][sel]),
                jnp.asarray(egs["targets"][sel]),
                jnp.asarray(egs["weights"][sel]))
            if k % log_every == 0:
                history.append((epoch, k, float(loss), float(acc)))
    return params, history


class AmNnet3(AmNnet):
    """AmNnet over a config-defined Nnet3 (same pseudo-loglike scoring;
    ref: nnet3/am-nnet-simple.h AmNnetSimple)."""

    def __init__(self, net: Nnet3, params, priors: np.ndarray | None = None):
        self.model = net
        self.params = params
        n_pdfs = net.dims["output"]
        self.priors = (priors if priors is not None
                       else np.ones(n_pdfs) / n_pdfs)
        self.group_ids = None   # no mixed-up rows on config-defined nets

    @property
    def num_pdfs(self):
        return self.model.dims["output"]

    def replace_params(self, params) -> "AmNnet3":
        return AmNnet3(self.model, params, self.priors)
