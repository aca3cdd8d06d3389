"""nnet3 simple components as pure functions + parameter initializers.

(ref: nnet3/nnet-simple-component.h:42-842 — AffineComponent,
 NaturalGradientAffineComponent :403 (NG handled by the optimizer, see
 kaldi_tpu/nnet/natural_gradient.py), RectifiedLinear/Sigmoid/Tanh,
 PnormComponent, NormalizeComponent, LogSoftmax/Softmax,
 Fixed{Affine,Scale,Bias}Component, NoOp, Dropout.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def init_affine(key, input_dim: int, output_dim: int,
                param_stddev: float | None = None,
                bias_stddev: float = 0.0):
    if param_stddev is None:
        param_stddev = 1.0 / np.sqrt(input_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": param_stddev * jax.random.normal(kw, (output_dim, input_dim),
                                              jnp.float32),
        "b": bias_stddev * jax.random.normal(kb, (output_dim,), jnp.float32),
    }


def affine(params, x):
    return x @ params["w"].T + params["b"]


# shared with the nnet2-style stack — one implementation of the
# layout-independent component math (ref: nnet-simple-component.h
# PnormComponent / NormalizeComponent)
from kaldi_tpu.nnet.components import pnorm, normalize  # noqa: E402,F401


def _param_stddev(cfg):
    """param-stddev from a config line; None (-> 1/sqrt(in) default) only
    when the key is ABSENT. An explicit param-stddev=0 means zero init
    (the standard zero-init-final-layer idiom) and must not be coerced
    to the random default by falsy-or chains."""
    return float(cfg["param-stddev"]) if "param-stddev" in cfg else None


COMPONENT_TYPES = {
    # type -> (has_params, make_params(key, cfg), apply(params, x, cfg))
    "AffineComponent": (
        True,
        lambda key, cfg: init_affine(key, int(cfg["input-dim"]),
                                     int(cfg["output-dim"]),
                                     _param_stddev(cfg),
                                     float(cfg.get("bias-stddev", 0.0))),
        lambda p, x, cfg: affine(p, x)),
    "NaturalGradientAffineComponent": (
        True,
        lambda key, cfg: init_affine(key, int(cfg["input-dim"]),
                                     int(cfg["output-dim"]),
                                     _param_stddev(cfg),
                                     float(cfg.get("bias-stddev", 0.0))),
        lambda p, x, cfg: affine(p, x)),
    "RectifiedLinearComponent": (
        False, None, lambda p, x, cfg: jax.nn.relu(x)),
    "SigmoidComponent": (
        False, None, lambda p, x, cfg: jax.nn.sigmoid(x)),
    "TanhComponent": (
        False, None, lambda p, x, cfg: jnp.tanh(x)),
    "PnormComponent": (
        False, None,
        lambda p, x, cfg: pnorm(x, int(cfg["output-dim"]),
                                float(cfg.get("p", 2.0)))),
    "NormalizeComponent": (
        False, None,
        lambda p, x, cfg: normalize(x, float(cfg.get("target-rms", 1.0)))),
    "SoftmaxComponent": (
        False, None, lambda p, x, cfg: jax.nn.softmax(x, axis=-1)),
    "LogSoftmaxComponent": (
        False, None, lambda p, x, cfg: jax.nn.log_softmax(x, axis=-1)),
    "NoOpComponent": (False, None, lambda p, x, cfg: x),
    "MaxoutComponent": (
        # groups of input-dim/output-dim reduced by max
        # (ref: nnet2/nnet-component.h MaxoutComponent)
        False, None,
        lambda p, x, cfg: x.reshape(
            *x.shape[:-1], int(cfg["output-dim"]),
            x.shape[-1] // int(cfg["output-dim"])).max(-1)),
    "DropoutComponent": (
        # inference-mode scaling only; training-time masking is the
        # trainer's job via rng (ref: nnet2 DropoutComponent test mode)
        False, None,
        lambda p, x, cfg: x * float(cfg.get("dropout-proportion-scale",
                                            1.0))),
    "PerElementScaleComponent": (
        True,
        lambda key, cfg: {"s": jnp.ones(int(cfg["dim"]), jnp.float32)},
        lambda p, x, cfg: x * p["s"]),
    "PerElementOffsetComponent": (
        True,
        lambda key, cfg: {"o": jnp.zeros(int(cfg["dim"]), jnp.float32)},
        lambda p, x, cfg: x + p["o"]),
    "ClipGradientComponent": (False, None, lambda p, x, cfg: x),
    "ElementwiseProductComponent": (
        # input-dim = k * output-dim; output = product over the k groups
        # (ref: nnet3/nnet-simple-component.h ElementwiseProductComponent
        #  — the LSTM gate-application primitive in config-built LSTMs)
        False, None,
        lambda p, x, cfg: jnp.prod(
            x.reshape(*x.shape[:-1],
                      x.shape[-1] // int(cfg["output-dim"]),
                      int(cfg["output-dim"])), axis=-2)),
    "FixedScaleComponent": (
        False, None, lambda p, x, cfg: x * float(cfg.get("scale", 1.0))),
    "FixedBiasComponent": (
        False, None, lambda p, x, cfg: x + float(cfg.get("bias", 0.0))),
}
