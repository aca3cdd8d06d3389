"""Raw-lattice generation from the batched beam-search decoder.

(ref: decoder/lattice-faster-decoder.cc GetRawLattice — Tokens become
lattice states, ForwardLinks become arcs. The tensor decoder records every
round's token frontier (state, score); here we reconstruct ALL links within
lattice-beam — not just the Viterbi backpointer — by re-expanding each
round's predecessor tokens through the CSR arc tables on the host. A link
into token k whose candidate score exceeds score(k) + lattice_beam cannot
lie on any path within lattice_beam of the best, so it is dropped — same
guarantee as the reference's link pruning (PruneForwardLinks).)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.lat.lattice import Lattice
from kaldi_tpu.lat.functions import prune_lattice

BIG = 1e10


def raw_lattice_from_decode(
    dec,                    # BeamSearchDecoder
    raw,                    # output of dec.decode_raw(...)
    num_frames,
    b: int,
    lattice_beam: float = 10.0,
) -> Lattice | None:
    init_recs, recs, fstate, fscore, best_slot, best_cost, ll_scaled = raw
    graph = dec.graph
    t_il = np.asarray(dec._tabs["ilabel"])
    t_ol = np.asarray(dec._tabs["olabel"])
    t_c = np.asarray(dec._tabs["cost"])
    t_nx = np.asarray(dec._tabs["nxt"])
    t_pdf = np.asarray(dec._tabs["pdf"])
    final = np.asarray(dec._final)
    R = len(recs)
    K = recs[0][0].shape[-1]
    Tb = int(num_frames[b])
    if best_cost[b] >= BIG * 0.5:
        return None

    lat = Lattice()
    lat.start = lat.add_state()

    # sequence of rounds: ("init", r) then per frame ("frame", t, r)
    def rec_arrays(tag):
        if tag[0] == "init":
            st, sc = init_recs[tag[1]][0], init_recs[tag[1]][1]
            return np.asarray(st[b]), np.asarray(sc[b])
        _k, t, r = tag
        st, sc = recs[r][0], recs[r][1]
        return np.asarray(st[b, t]), np.asarray(sc[b, t])

    rounds = [("init", r) for r in range(len(init_recs))]
    for t in range(Tb):
        for r in range(R):
            rounds.append(("frame", t, r))

    # node per (round_idx, slot)
    nodes: dict[tuple[int, int], int] = {}

    def get_node(ri, slot):
        key = (ri, slot)
        n = nodes.get(key)
        if n is None:
            n = lat.add_state()
            nodes[key] = n
        return n

    # predecessor tokens of round 0 (init round 0) = the bare start token
    prev_states = np.full(K, -1, np.int64)
    prev_scores = np.full(K, BIG)
    prev_states[0] = graph.start
    prev_scores[0] = 0.0
    prev_nodes = {0: lat.start}

    E = t_il.shape[1]
    for ri, tag in enumerate(rounds):
        cur_states, cur_scores = rec_arrays(tag)
        alive = cur_scores < BIG * 0.5
        emitting = tag[0] == "frame" and tag[2] == 0

        # vectorized candidate generation over [P(prev alive), E] arcs:
        # after dedup the current frontier has at most one ALIVE token per
        # state, so state -> slot is a single searchsorted hit — sort by
        # (state, score) so the alive token precedes dead slots that
        # happen to carry the same state value.
        order = np.lexsort((cur_scores, cur_states))
        sorted_states = cur_states[order]
        cur_nodes: dict[int, int] = {}

        def slot_of(state_arr):
            pos = np.searchsorted(sorted_states, state_arr)
            pos = np.minimum(pos, len(sorted_states) - 1)
            slot = order[pos]
            ok = (cur_states[slot] == state_arr) & alive[slot]
            return slot, ok

        pj = np.array(sorted(prev_nodes.keys()), dtype=np.int64)
        if pj.size:
            pj = pj[prev_scores[pj] < BIG * 0.5]
        if pj.size:
            src = prev_states[pj]                      # [P]
            base = prev_scores[pj]                     # [P]
            il = t_il[src]                             # [P, E]
            w = t_c[src]
            nxt = t_nx[src]
            if emitting:
                am = -ll_scaled[b, tag[1]][t_pdf[src]]  # [P, E]
                use = (il > 0) & (w < BIG * 0.5)
            else:
                am = np.zeros_like(w)
                use = (il == 0) & (w < BIG * 0.5)
            cand = base[:, None] + w + am
            slot, ok = slot_of(nxt)
            keep = use & ok & (cand <= cur_scores[slot]
                               + lattice_beam + 1e-4)
            if not emitting:
                # identity carry-over: prev token -> same-state cur token
                c_slot, c_ok = slot_of(src)
                c_keep = c_ok & (base <= cur_scores[c_slot]
                                 + lattice_beam + 1e-4)
                for i in np.nonzero(c_keep)[0]:
                    k = int(c_slot[i])
                    dst = cur_nodes.get(k)
                    if dst is None:
                        dst = get_node(ri, k)
                        cur_nodes[k] = dst
                    lat.add_arc(prev_nodes[int(pj[i])], 0, 0, 0.0, 0.0,
                                dst)
            pidx, eidx = np.nonzero(keep)
            ols = t_ol[src]
            for i in range(len(pidx)):
                p, e = int(pidx[i]), int(eidx[i])
                k = int(slot[p, e])
                dst = cur_nodes.get(k)
                if dst is None:
                    dst = get_node(ri, k)
                    cur_nodes[k] = dst
                lat.add_arc(prev_nodes[int(pj[p])], int(il[p, e]),
                            int(ols[p, e]), float(w[p, e]),
                            float(am[p, e]), dst)
        prev_states, prev_scores = cur_states, cur_scores
        prev_nodes = cur_nodes

    # finals
    for k, n in prev_nodes.items():
        f = float(final[int(prev_states[k])])
        if f < BIG * 0.5:
            lat.set_final(n, f, 0.0)
    lat.connect()
    if lat.start < 0:
        return None
    return prune_lattice(lat, lattice_beam)


def decode_to_lattices(dec, loglikes, num_frames, lattice_beam: float = 10.0):
    """Batch decode -> list of raw lattices (None where decoding failed).

    (the tensor analogue of gmm-latgen-faster's per-utterance
    GetRawLattice + lattice-beam pruning)
    """
    raw = dec.decode_raw(loglikes, num_frames)
    B = loglikes.shape[0]
    return [raw_lattice_from_decode(dec, raw, num_frames, b, lattice_beam)
            for b in range(B)]
