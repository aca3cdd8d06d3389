"""Multisplice TDNN acoustic model.

(ref: the nnet2 online multisplice system — steps/nnet2/
 train_multisplice_accel2.sh with splice_indexes like "-2,-1,0,1,2 -1,2 -3,3
 -7,2 0", components Splice->Affine->Pnorm->Normalize per layer and a final
 Affine->Softmax; also nnet3 TDNN configs from
 steps/nnet3/make_tdnn_configs.py. This is the reference's strongest
 production AM family — LibriSpeech RESULTS:314.)

TPU-first: the whole utterance batch [B, T, D] flows through; each layer's
splice is a strided gather; affines are big GEMMs in bf16-friendly shapes.
Model parallelism: the final affine (hidden x num_pdfs, the largest matrix)
shards over the 'model' mesh axis; everything else is replicated and batch
shards over 'data' (SURVEY.md §2.11 row "tensor parallelism").
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.nnet.components import (
    splice, splice_valid, affine_init, affine_apply, pnorm, normalize,
    ACTIVATIONS,
)


@dataclasses.dataclass(frozen=True)
class TdnnConfig:
    feat_dim: int = 40
    num_pdfs: int = 2000
    # per-layer splice offsets (nnet2 multisplice notation)
    splice_indexes: tuple = ((-2, -1, 0, 1, 2), (-1, 2), (-3, 3), (-7, 2), (0,))
    hidden_dim: int = 2048        # pnorm input dim
    pnorm_output_dim: int = 256   # pnorm output dim (group 8 by default)
    nonlinearity: str = "pnorm"   # pnorm | relu
    final_hidden: int | None = None

    @property
    def left_context(self) -> int:
        return -sum(min(c) for c in self.splice_indexes if min(c) < 0)

    @property
    def right_context(self) -> int:
        return sum(max(c) for c in self.splice_indexes if max(c) > 0)


class Tdnn:
    """init(key) -> params pytree; apply(params, feats) -> log-softmax posts."""

    def __init__(self, config: TdnnConfig):
        self.config = config

    def init(self, key) -> dict:
        cfg = self.config
        params = {"layers": []}
        in_dim = cfg.feat_dim
        keys = jax.random.split(key, len(cfg.splice_indexes) + 1)
        for i, ctx in enumerate(cfg.splice_indexes):
            spliced = in_dim * len(ctx)
            if cfg.nonlinearity == "pnorm":
                layer = affine_init(keys[i], spliced, cfg.hidden_dim)
                in_dim = cfg.pnorm_output_dim
            else:
                layer = affine_init(keys[i], spliced, cfg.hidden_dim)
                in_dim = cfg.hidden_dim
            params["layers"].append(layer)
        params["final"] = affine_init(keys[-1], in_dim, cfg.num_pdfs,
                                      param_stddev=0.0, bias_stddev=0.0)
        return params

    def context_of(self, num_layers: int) -> tuple[int, int]:
        """(left, right) context of the first `num_layers` layers."""
        sp = self.config.splice_indexes[:num_layers]
        lc = -sum(min(c) for c in sp if min(c) < 0)
        rc = sum(max(c) for c in sp if max(c) > 0)
        return lc, rc

    def apply(self, params, feats: jnp.ndarray, pad_context: bool = True,
              compute_dtype=None, num_layers: int | None = None):
        """feats [..., T, D] -> log posteriors [..., T(out), num_pdfs].

        pad_context=True clamps at utterance edges (decode mode, output T
        == input T); False uses valid frames only (training on chunks that
        already carry their context).

        compute_dtype=jnp.bfloat16 runs the affine GEMMs in bf16 on the
        MXU (2x f32 throughput; accumulation stays f32 on TPU) — the
        inference fast path. Nonlinearities and the final log-softmax
        stay f32.

        num_layers runs only the first k hidden layers before the final
        affine (layer-wise discriminative pretraining, ref:
        steps/nnet2/train_pnorm_accel2.sh's growing num-hidden-layers;
        valid for pnorm/relu nets whose hidden output dim is constant).
        """
        cfg = self.config
        x = feats
        sp = splice if pad_context else splice_valid
        cast = ((lambda a: a.astype(compute_dtype))
                if compute_dtype is not None else (lambda a: a))
        if compute_dtype is not None:
            # bf16 fast path (training AND batched inference): the step
            # is HBM-bound at these dims, not MXU-bound, so the splice
            # is folded into the GEMM as a sum of per-offset slabs —
            # x@W == sum_k slice_k(x) @ W[kD:(k+1)D] — and the
            # [.., T, D*n] concat buffer never materializes. Activations
            # stay f32 through the nonlinearity/normalize: an all-bf16
            # activation variant measured slightly faster (63.9% vs
            # ~60% MFU) but quantizing the hidden representation moved
            # calibrated-corpus WER by >10 points — not a rounding-level
            # change, so it is not shipped. Measured on v5e at the bench
            # shapes: 48.7% -> ~60% bf16 MFU for the full train step
            # (WER-level parity with f32 asserted in
            # tests/test_bf16_parity.py).
            for ctx, layer in zip(cfg.splice_indexes[:num_layers],
                                  params["layers"][:num_layers]):
                w = cast(layer["w"])
                xc = cast(x)
                lo, hi = min(ctx), max(ctx)
                D = xc.shape[-1]
                if pad_context:
                    # edge-clamped splice == edge-replicated pad + slices
                    T = xc.shape[-2]
                    pads = [(0, 0)] * (xc.ndim - 2) + [(-lo, hi), (0, 0)]
                    xp = jnp.pad(xc, pads, mode="edge")
                    Tout = T
                else:
                    xp = xc
                    Tout = xc.shape[-2] - (hi - lo)
                acc = None
                for k, off in enumerate(ctx):
                    xs = jax.lax.slice_in_dim(xp, off - lo,
                                              off - lo + Tout, axis=-2)
                    part = jnp.matmul(xs, w[k * D:(k + 1) * D])
                    acc = part if acc is None else acc + part
                x = acc.astype(jnp.float32) + layer["b"]
                if cfg.nonlinearity == "pnorm":
                    x = pnorm(x, cfg.pnorm_output_dim)
                    x = normalize(x)
                else:
                    x = ACTIVATIONS["relu"](x)
                    x = normalize(x)
            logits = jnp.matmul(cast(x),
                                cast(params["final"]["w"])).astype(
                jnp.float32) + params["final"]["b"]
            return jax.nn.log_softmax(logits, axis=-1)
        for ctx, layer in zip(cfg.splice_indexes[:num_layers],
                              params["layers"][:num_layers]):
            x = sp(x, ctx)
            x = jnp.matmul(x, layer["w"]).astype(jnp.float32) \
                + layer["b"]
            if cfg.nonlinearity == "pnorm":
                x = pnorm(x, cfg.pnorm_output_dim)
                x = normalize(x)
            else:
                x = ACTIVATIONS["relu"](x)
                x = normalize(x)
        logits = jnp.matmul(x, params["final"]["w"]).astype(
            jnp.float32) + params["final"]["b"]
        return jax.nn.log_softmax(logits, axis=-1)

    def apply_logits(self, params, feats, pad_context: bool = True):
        cfg = self.config
        x = feats
        sp = splice if pad_context else splice_valid
        for ctx, layer in zip(cfg.splice_indexes, params["layers"]):
            x = sp(x, ctx)
            x = affine_apply(layer, x)
            if cfg.nonlinearity == "pnorm":
                x = pnorm(x, cfg.pnorm_output_dim)
                x = normalize(x)
            else:
                x = ACTIVATIONS["relu"](x)
                x = normalize(x)
        return affine_apply(params["final"], x)

    def hidden_mean_abs(self, params, feats, pad_context: bool = True):
        """Per-layer mean |activation| of each hidden unit (the statistic
        nnet-am-fix thresholds; ref: nnet2/nnet-fix.h FixNnet). -> list of
        [hidden_dim] arrays, one per hidden layer."""
        cfg = self.config
        x = feats
        sp = splice if pad_context else splice_valid
        stats = []
        for ctx, layer in zip(cfg.splice_indexes, params["layers"]):
            x = sp(x, ctx)
            x = affine_apply(layer, x)
            if cfg.nonlinearity == "pnorm":
                act = jnp.abs(x)
                stats.append(act.reshape(-1, act.shape[-1]).mean(axis=0))
                x = pnorm(x, cfg.pnorm_output_dim)
                x = normalize(x)
            else:
                x = ACTIVATIONS["relu"](x)
                stats.append(jnp.abs(x).reshape(-1, x.shape[-1]).mean(axis=0))
                x = normalize(x)
        return stats

    def num_params(self, params) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
