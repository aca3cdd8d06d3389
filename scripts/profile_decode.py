"""Decompose big-graph decode frame time into per-component device costs.

Runs the headline bench's decoder program plus isolated jitted programs
for each frame-step component at the REAL shapes/tables, so the numbers
are directly comparable. Run on an otherwise-idle machine.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, f, *a, n=30):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:48s} {dt:8.3f} ms")
    return dt


def main():
    from kaldi_tpu.decoder.biggraph import make_big_hclg, BigGraphConfig
    from kaldi_tpu.decoder.csr_beam import (CsrBeamDecoder, CsrBeamOpts,
                                            _dedup_topk, _segment_map)
    from kaldi_tpu.ops.table_gather import batched_table_gather

    graph, _ = make_big_hclg(BigGraphConfig())
    K, CB = 7000, 8192
    dec = CsrBeamDecoder(graph, CsrBeamOpts(
        beam=13.0, max_active=K, acoustic_scale=0.1,
        expand_budget=CB, eps_budget=2048))
    tabs = dec.tabs
    B, T, P = 8, 998, 2048
    rng = np.random.RandomState(0)
    ll = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    nf = np.full(B, T, np.int32)

    # full decode
    r = dec.decode_raw(ll, nf)
    t0 = time.perf_counter()
    r = dec.decode_raw(ll, nf)
    jax.block_until_ready(r[0]) if isinstance(r, tuple) else None
    dt = time.perf_counter() - t0
    print(f"{'FULL decode_raw':48s} {dt*1e3:8.1f} ms "
          f"({dt/T*1e3:.3f} ms/frame)")
    per_frame = dt / T * 1e3

    CBR = -(-CB // 3)
    AH = int(tabs.hub_rows.shape[0])
    H = len(tabs.hub_bounds) - 1
    tok_state = jnp.asarray(rng.randint(0, graph.num_states, (B, K),
                                        dtype=np.int32))
    tok_score = jnp.asarray(np.sort(rng.rand(B, K).astype(np.float32)))
    ll_t = jnp.asarray(rng.randn(B, P).astype(np.float32))
    rj = jnp.asarray(rng.randint(0, max(int(tabs.brow.shape[0]), 1),
                                 (B, CBR), dtype=np.int32))
    pdfs = jnp.asarray(rng.randint(0, P, (B, 2 * K + 3 * CBR),
                                   dtype=np.int32))

    t_s = bench("srow gather [B,K] rows of 16", jax.jit(lambda s: tabs.srow[s]),
                tok_state)
    t_b = bench("brow gather [B,CBR] rows of 16",
                jax.jit(lambda i: tabs.brow[i]), rj)
    t_ll = bench("take_ll pallas [B,2K+3CBR]",
                 jax.jit(lambda t, p: batched_table_gather(t, p)), ll_t, pdfs)

    # segment map at real shapes
    deg = jnp.asarray(rng.randint(0, 6, (B, K), dtype=np.int32))
    off = jnp.cumsum(deg, axis=1) - deg
    base = jnp.asarray(rng.randint(0, 1 << 20, (B, K), dtype=np.int32))
    t_seg = bench("segment_map (scatter+scans)",
                  jax.jit(lambda o, d, b: _segment_map(o, d, CBR, K, B,
                                                       base=b)),
                  off, deg, base)

    # hub pieces
    if H:
        hs = tabs.hub_states
        hs_dev = jnp.asarray(hs.astype(np.int32))
        def hub_match(ts, tc):
            match = (ts[:, :, None] == hs_dev[None, None, :]) & \
                (tc[:, :, None] < 5e9)
            msc = jnp.where(match, tc[:, :, None], np.float32(1e10))
            return jnp.min(msc, axis=1), jnp.argmin(msc, axis=1)
        t_hm = bench(f"hub match/min [B,K,{H}]", jax.jit(hub_match),
                     tok_state, tok_score)
        if tabs.hub_onehot is not None:
            G = tabs.hub_onehot.shape[1]
            am_g = jnp.asarray(rng.randn(B, G).astype(np.float32))
            t_he = bench(f"hub one-hot einsum [{AH},{G}]x[B,{G}]",
                         jax.jit(lambda oh, a: jnp.einsum(
                             "ag,bg->ba", oh, a,
                             preferred_element_type=jnp.float32)),
                         tabs.hub_onehot, am_g)
        sc_flat = jnp.asarray(rng.randn(B, AH).astype(np.float32))
        t_hk = bench(f"hub top_k {K} of {AH}",
                     jax.jit(lambda s: jax.lax.top_k(-s, K)), sc_flat)
        idx = jnp.asarray(rng.randint(0, AH, (B, K), dtype=np.int32))
        t_hr = bench("hub_rows gather [B,K] rows of 8",
                     jax.jit(lambda i: tabs.hub_rows[i]), idx)

    # dedup at real candidate count
    NC = 2 * K + 3 * CBR + (K if H else 0)
    cst = jnp.asarray(rng.randint(0, graph.num_states, (B, NC),
                                  dtype=np.int32))
    csc = jnp.asarray(rng.randn(B, NC).astype(np.float32))
    crec = jnp.asarray(rng.randint(0, 1 << 20, (B, NC), dtype=np.int32))
    cil = jnp.asarray(rng.randint(0, 1 << 14, (B, NC), dtype=np.int32))
    t_d = bench(f"dedup 2x variadic sort [B,{NC}]",
                jax.jit(lambda a, b, c, d: _dedup_topk(a, b, c, d, K)),
                cst, csc, crec, cil)

    print(f"\nper-frame budget: {per_frame:.3f} ms; "
          f"sum of measured parts above covers the emitting round once.")


if __name__ == "__main__":
    main()
