"""Deltas, splicing, shifted-delta cepstra, and sliding-window CMVN — batched.

(ref: feat/feature-functions.cc:214-343 DeltaFeatures / SpliceFrames /
 SlidingWindowCmnInternal :436-520). Deltas become a [T,T']-free gather +
 weighted sum along time (a small 1-D convolution with edge clamping);
 sliding CMVN becomes cumulative sums + per-frame window arithmetic — both
 are O(T·D) elementwise programs that XLA fuses, no Python loop over frames.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DeltaOpts:
    """(ref: feat/feature-functions.h:192-211 DeltaFeaturesOptions)"""

    order: int = 2
    window: int = 2  # actual window size is 2*window+1


@functools.lru_cache(maxsize=None)
def _delta_scales_np(order: int, window: int) -> tuple[np.ndarray, ...]:
    """Per-order regression coefficient windows (ref: feature-functions.cc:214-245)."""
    scales = [np.array([1.0], dtype=np.float64)]
    for i in range(1, order + 1):
        prev = scales[i - 1]
        prev_offset = (len(prev) - 1) // 2
        cur_offset = prev_offset + window
        cur = np.zeros(len(prev) + 2 * window, dtype=np.float64)
        normalizer = 0.0
        for j in range(-window, window + 1):
            normalizer += j * j
            for k in range(-prev_offset, prev_offset + 1):
                cur[j + k + cur_offset] += j * prev[k + prev_offset]
        cur /= normalizer
        scales.append(cur)
    return tuple(s.astype(np.float32) for s in scales)


@functools.partial(jax.jit, static_argnames=("order", "window"))
def add_deltas(feats: jnp.ndarray, order: int = 2, window: int = 2) -> jnp.ndarray:
    """[..., T, D] -> [..., T, D*(order+1)] with edge-clamped regression deltas."""
    T = feats.shape[-2]
    scales = _delta_scales_np(order, window)
    outs = []
    for scale in scales:
        offset = (len(scale) - 1) // 2
        acc = jnp.zeros_like(feats)
        for j, w in enumerate(scale):
            if w == 0.0:
                continue
            shift = j - offset
            idx = jnp.clip(jnp.arange(T) + shift, 0, T - 1)
            acc = acc + float(w) * jnp.take(feats, idx, axis=-2)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("left_context", "right_context"))
def splice_frames(
    feats: jnp.ndarray, left_context: int, right_context: int
) -> jnp.ndarray:
    """[..., T, D] -> [..., T, D*(l+r+1)], clamped at the edges.

    (ref: feature-functions.cc:389-411 SpliceFrames)
    """
    T = feats.shape[-2]
    cols = []
    for off in range(-left_context, right_context + 1):
        idx = jnp.clip(jnp.arange(T) + off, 0, T - 1)
        cols.append(jnp.take(feats, idx, axis=-2))
    return jnp.concatenate(cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("order", "window", "block_shift",
                                             "num_blocks"))
def shifted_delta(
    feats: jnp.ndarray,
    order: int = 1,
    window: int = 1,
    block_shift: int = 3,
    num_blocks: int = 7,
) -> jnp.ndarray:
    """Shifted delta cepstra for language-ID (ref: feature-functions.cc:247-285).

    Output dim = D * (1 + num_blocks): static coefficients followed by
    num_blocks delta blocks taken at t, t+P, t+2P, ...
    """
    T = feats.shape[-2]
    scale = _delta_scales_np(order, window)[order]
    offset = (len(scale) - 1) // 2
    outs = [feats]
    # each regression-window index t + b*P + j clamps to [0, T-1]
    # INDIVIDUALLY (ref: feature-functions.cc:301-313 ShiftedDeltaFeatures
    # ::Process) — clamping the block offset first and reading a
    # precomputed delta gives nonzero tails where the reference is 0
    for b in range(num_blocks):
        d = None
        for j, w in enumerate(scale):
            if w == 0.0:
                continue
            idx = jnp.clip(jnp.arange(T) + b * block_shift + (j - offset),
                           0, T - 1)
            term = float(w) * jnp.take(feats, idx, axis=-2)
            d = term if d is None else d + term
        outs.append(d if d is not None else jnp.zeros_like(feats))
    return jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass(frozen=True)
class SlidingCmvnOpts:
    """(ref: feat/feature-functions.h:311-343 SlidingWindowCmnOptions)"""

    cmn_window: int = 600
    min_window: int = 100
    normalize_mean: bool = True
    normalize_variance: bool = False
    center: bool = False


@functools.partial(jax.jit, static_argnames=("opts",))
def sliding_cmvn(feats: jnp.ndarray, opts: SlidingCmvnOpts = SlidingCmvnOpts()):
    """Per-frame sliding-window mean(/variance) normalization, [..., T, D].

    Window-bound logic matches the reference exactly
    (ref: feature-functions.cc:445-467); realized with cumulative sums so the
    whole utterance normalizes in one fused program.
    """
    T = feats.shape[-2]
    x = feats.astype(jnp.float64) if jax.config.jax_enable_x64 else feats.astype(jnp.float32)
    t = jnp.arange(T)
    if opts.center:
        start = t - opts.cmn_window // 2
        end = start + opts.cmn_window
    else:
        start = t - opts.cmn_window
        end = t + 1
    end = jnp.where(start < 0, end - start, end)
    start = jnp.maximum(start, 0)
    if not opts.center:
        end = jnp.where(end > t, jnp.maximum(t + 1, opts.min_window), end)
    start = jnp.where(end > T, jnp.maximum(start - (end - T), 0), start)
    end = jnp.minimum(end, T)

    csum = jnp.cumsum(x, axis=-2)
    zero = jnp.zeros_like(csum[..., :1, :])
    csum = jnp.concatenate([zero, csum], axis=-2)  # csum[k] = sum of first k
    win_sum = (jnp.take(csum, end, axis=-2) - jnp.take(csum, start, axis=-2))
    n = (end - start).astype(x.dtype)[..., None]
    mean = win_sum / n
    out = x - mean if opts.normalize_mean else x
    if opts.normalize_variance:
        csumsq = jnp.cumsum(jnp.square(x), axis=-2)
        csumsq = jnp.concatenate([zero, csumsq], axis=-2)
        win_sumsq = (jnp.take(csumsq, end, axis=-2)
                     - jnp.take(csumsq, start, axis=-2))
        var = win_sumsq / n - jnp.square(mean)
        var = jnp.maximum(var, 1.0e-10)
        out = jnp.where(n > 1, out * jax.lax.rsqrt(var), jnp.zeros_like(out))
    return out.astype(feats.dtype)
