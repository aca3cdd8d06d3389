"""A/B: quad vs triple tier-B row layout on the headline decode shape.

Run on the real chip. The tier-B row-gather count is budget-static
(ceil(expand_budget / arcs_per_row) rows per frame), so the relative
effect is workload-independent to first order; random acoustics are fine
for the A/B even though absolute numbers differ from the calibrated
bench corpus.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kaldi_tpu.decoder.biggraph import make_big_hclg, BigGraphConfig
from kaldi_tpu.decoder.csr_beam import CsrBeamDecoder, CsrBeamOpts

B, T, K, CB = 8, 1000, 7000, 16384


def run(force_triple: bool):
    graph, _ = make_big_hclg(BigGraphConfig(vocab=60000))
    dec = CsrBeamDecoder(graph, CsrBeamOpts(
        beam=13.0, max_active=K, acoustic_scale=0.1,
        expand_budget=CB, eps_budget=2048,
        force_b_triple=force_triple))
    print(f"layout b_apr={dec.tabs.b_apr} "
          f"brow_rows={dec.tabs.brow.shape[0]}")
    rng = np.random.RandomState(0)
    ll = jnp.asarray((rng.randn(B, T, 2048) * 3).astype(np.float32))
    nf = np.full(B, T, np.int32)
    dec.decode(ll, nf)           # compile + warm
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        dec.decode(ll, nf)
        dts.append(time.perf_counter() - t0)
    secs = T * 160 / 16000.0
    rates = [B * secs / d for d in dts]
    print(f"  audio-s/s: min={min(rates):.2f} "
          f"mean={np.mean(rates):.2f} max={max(rates):.2f}")
    return rates


if __name__ == "__main__":
    print("devices:", jax.devices())
    r3 = run(True)
    r4 = run(False)
    print(f"quad/triple speedup: {np.mean(r4) / np.mean(r3):.3f}x")
