"""Throughput sweep over hub_cap at the headline operating point.

Timing-only (random acoustics): the hub-candidate path costs are
shape-static ([B, HC] hub_rows gather + HC-wide merge/dedup share), so
the relative throughput curve is workload-independent; the ACCURACY cost
of each cap is measured separately on the calibrated corpus in bench.py.
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

graph, _ = make_big_hclg(BigGraphConfig(vocab=60000))
rng = np.random.RandomState(0)
ll = jnp.asarray((rng.randn(B, T, 2048) * 3).astype(np.float32))
nf = np.full(B, T, np.int32)
secs = T * 160 / 16000.0

for hc in (None, 4096, 2048, 1024, 512):
    dec = CsrBeamDecoder(graph, CsrBeamOpts(
        beam=13.0, max_active=K, acoustic_scale=0.1,
        expand_budget=CB, eps_budget=2048, hub_cap=hc))
    dec.decode(ll, nf)
    dts = []
    for _ in range(4):
        t0 = time.perf_counter()
        dec.decode(ll, nf)
        dts.append(time.perf_counter() - t0)
    rates = [B * secs / d for d in dts]
    print(f"hub_cap={str(hc):>5s}  audio-s/s mean={np.mean(rates):.2f} "
          f"min={min(rates):.2f} max={max(rates):.2f} "
          f"hub_ovf={int(dec.last_overflow.sum())}")
