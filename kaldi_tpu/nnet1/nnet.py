"""nnet1 component-stack networks: proto parsing, forward, SGD.

(ref: nnet/nnet-nnet.h:36 Nnet (a vector of components run in sequence),
 nnetbin/nnet-initialize.cc (proto -> random net), nnet/nnet-component.h
 component markers — the same `<AffineTransform> <InputDim> .. ` proto
 line format, re-derived; forward = chained Propagate.)

Components: AffineTransform, Sigmoid, Tanh, ReLU, Softmax, Splice,
AddShift, Rescale. The stack is a list of (kind, static config) plus a
params list (one dict per component, empty for parameterless ones).
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Component:
    kind: str
    in_dim: int
    out_dim: int
    extra: tuple = ()          # e.g. splice offsets


_MARKER = re.compile(r"<(\w+)>")


def parse_proto(text: str) -> list[Component]:
    comps = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or line == "<NnetProto>" \
                or line == "</NnetProto>":
            continue
        toks = line.split()
        m = _MARKER.match(toks[0])
        if not m:
            raise ValueError(f"bad proto line: {line}")
        kind = m.group(1)
        kv = {}
        i = 1
        while i < len(toks):
            key = _MARKER.match(toks[i])
            if key and i + 1 < len(toks):
                kv[key.group(1)] = toks[i + 1]
                i += 2
            else:
                i += 1
        in_dim = int(kv.get("InputDim", 0))
        out_dim = int(kv.get("OutputDim", in_dim))
        extra = ()
        if kind == "Splice":
            extra = tuple(int(t) for t in
                          kv.get("BuildVector", "0").strip("()")
                          .replace(":", " ").split())
        comps.append(Component(kind, in_dim, out_dim, extra))
    return comps


class Nnet1:
    """Sequential component stack (ref: nnet/nnet-nnet.h Nnet)."""

    PARAMETRIC = {"AffineTransform"}

    def __init__(self, components: list[Component]):
        self.components = components

    @classmethod
    def from_proto(cls, text: str) -> "Nnet1":
        return cls(parse_proto(text))

    @property
    def input_dim(self) -> int:
        return self.components[0].in_dim

    @property
    def output_dim(self) -> int:
        return self.components[-1].out_dim

    def to_proto(self) -> str:
        lines = ["<NnetProto>"]
        for c in self.components:
            extra = ""
            if c.kind == "Splice":
                extra = " <BuildVector> " + ":".join(map(str, c.extra))
            lines.append(f"<{c.kind}> <InputDim> {c.in_dim} "
                         f"<OutputDim> {c.out_dim}{extra}")
        lines.append("</NnetProto>")
        return "\n".join(lines) + "\n"

    def init(self, key, param_stddev: float = 0.1) -> list[dict]:
        params: list[dict] = []
        for c in self.components:
            if c.kind == "AffineTransform":
                key, sub = jax.random.split(key)
                params.append({
                    "w": (jax.random.normal(sub, (c.out_dim, c.in_dim))
                          * param_stddev).astype(jnp.float32),
                    "b": jnp.zeros(c.out_dim, jnp.float32)})
            elif c.kind == "AddShift":
                params.append({"b": jnp.zeros(c.in_dim, jnp.float32)})
            elif c.kind == "Rescale":
                params.append({"s": jnp.ones(c.in_dim, jnp.float32)})
            else:
                params.append({})
        return params

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x [..., T, D] -> output; Softmax yields LOG-probabilities
        (the decoder-facing convention; nnet-forward exponentiates when
        the reference's linear-domain output is requested)."""
        for c, p in zip(self.components, params):
            if c.kind == "AffineTransform":
                x = x @ p["w"].T + p["b"]
            elif c.kind == "Sigmoid":
                x = jax.nn.sigmoid(x)
            elif c.kind == "Tanh":
                x = jnp.tanh(x)
            elif c.kind == "ReLU":
                x = jax.nn.relu(x)
            elif c.kind == "Softmax":
                x = jax.nn.log_softmax(x, axis=-1)
            elif c.kind == "Splice":
                parts = []
                T = x.shape[-2]
                idx = jnp.arange(T)
                for off in c.extra:
                    j = jnp.clip(idx + off, 0, T - 1)
                    parts.append(jnp.take(x, j, axis=-2))
                x = jnp.concatenate(parts, axis=-1)
            elif c.kind == "AddShift":
                x = x + p["b"]
            elif c.kind == "Rescale":
                x = x * p["s"]
            else:
                raise ValueError(f"unknown component {c.kind}")
        return x

    def concat(self, other: "Nnet1") -> "Nnet1":
        return Nnet1(self.components + other.components)


def save_nnet1(path: str, net: Nnet1, params) -> None:
    blobs = {"proto": np.frombuffer(net.to_proto().encode(), np.uint8),
             "n": np.int64(len(params))}
    for i, p in enumerate(params):
        for k, v in p.items():
            blobs[f"c{i}.{k}"] = np.asarray(v)
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_nnet1(path: str):
    z = np.load(path)
    net = Nnet1.from_proto(z["proto"].tobytes().decode())
    params = []
    for i in range(int(z["n"])):
        p = {}
        for key in z.files:
            if key.startswith(f"c{i}."):
                p[key.split(".", 1)[1]] = jnp.asarray(z[key])
        params.append(p)
    return net, params


def train_frmshuff(net: Nnet1, params, feats: np.ndarray,
                   targets: np.ndarray, learn_rate: float = 0.008,
                   minibatch: int = 256, num_epochs: int = 1,
                   momentum: float = 0.0, seed: int = 0):
    """Frame-shuffled cross-entropy SGD
    (ref: nnetbin/nnet-train-frmshuff.cc + nnet/nnet-randomizer.h)."""
    import optax
    from kaldi_tpu.nnet1.train import FrameShuffler

    minibatch = min(minibatch, len(feats))  # tiny corpora: one batch
    tx = optax.sgd(learn_rate, momentum=momentum)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, t):
        def loss_fn(p):
            lp = net.apply(p, x)
            ll = jnp.take_along_axis(lp, t[:, None], axis=-1)[:, 0]
            loss = -jnp.mean(ll)
            acc = jnp.mean((jnp.argmax(lp, -1) == t).astype(jnp.float32))
            return loss, acc
        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss, acc

    hist = []
    for _ep in range(num_epochs):
        shuf = FrameShuffler(feats, targets, minibatch, seed=seed)
        for x, t in shuf:
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(x),
                jnp.asarray(t.astype(np.int32)))
        hist.append((float(loss), float(acc)))
    return params, hist
