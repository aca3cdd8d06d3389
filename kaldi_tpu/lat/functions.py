"""Lattice algorithms: forward-backward, pruning, best path, scaling,
posteriors, word-level determinization, LM rescoring.

(ref: lat/lattice-functions.h:44-304 — LatticeForwardBackward :62,
 PruneLattice :130, shortest path :241, AddWordInsPenToCompactLattice :246,
 Rescore{Compact,}Lattice :253,294; lat/determinize-lattice-pruned.h:255.)
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from kaldi_tpu.lat.lattice import Lattice, LatticeArc

INF = float("inf")


def _log_add(a, b):
    if a == -INF:
        return b
    if b == -INF:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(-abs(a - b)))


def lattice_scale(lat: Lattice, lm_scale: float = 1.0,
                  acoustic_scale: float = 1.0) -> Lattice:
    """(ref: latbin/lattice-scale.cc)"""
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            a.graph_cost *= lm_scale
            a.acoustic_cost *= acoustic_scale
    lat.finals = {s: (g * lm_scale, a * acoustic_scale)
                  for s, (g, a) in lat.finals.items()}
    return lat


def add_word_ins_penalty(lat: Lattice, penalty: float) -> Lattice:
    """(ref: lattice-functions.h:246 AddWordInsPenToCompactLattice)"""
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            if a.olabel != 0:
                a.graph_cost += penalty
    return lat


def lattice_best_path(lat: Lattice):
    """-> (words, tids, total_cost) via Viterbi over the (acyclic) lattice.
    (ref: latbin/lattice-best-path.cc)"""
    order = lat.topological_order()
    n = lat.num_states
    alpha = np.full(n, INF)
    back: list = [None] * n
    alpha[lat.start] = 0.0
    for s in order:
        if alpha[s] == INF:
            continue
        for a in lat.arcs[s]:
            c = alpha[s] + a.cost
            if c < alpha[a.nextstate]:
                alpha[a.nextstate] = c
                back[a.nextstate] = (s, a)
    best_s, best_c = -1, INF
    for s, (g, ac) in lat.finals.items():
        if alpha[s] + g + ac < best_c:
            best_c = alpha[s] + g + ac
            best_s = s
    if best_s < 0:
        return None
    words, tids = [], []
    s = best_s
    while back[s] is not None:
        p, a = back[s]
        if a.olabel:
            words.append(a.olabel)
        if a.ilabel:
            tids.append(a.ilabel)
        s = p
    return words[::-1], tids[::-1], best_c


def lattice_forward_backward(lat: Lattice):
    """-> (arc posteriors dict (state, arc_idx) -> gamma, total log-like,
    per-state alpha/beta in -log space).

    (ref: lattice-functions.h:62 LatticeForwardBackward — sum semiring over
    total costs.)
    """
    order = lat.topological_order()
    n = lat.num_states
    alpha = np.full(n, -INF)  # log-probs
    alpha[lat.start] = 0.0
    for s in order:
        if alpha[s] == -INF:
            continue
        for a in lat.arcs[s]:
            alpha[a.nextstate] = _log_add(alpha[a.nextstate],
                                          alpha[s] - a.cost)
    beta = np.full(n, -INF)
    for s, (g, ac) in lat.finals.items():
        beta[s] = -(g + ac)
    for s in reversed(order):
        for a in lat.arcs[s]:
            beta[s] = _log_add(beta[s], -a.cost + beta[a.nextstate])
    tot = beta[lat.start]
    post = {}
    for s in range(n):
        for i, a in enumerate(lat.arcs[s]):
            lp = alpha[s] - a.cost + beta[a.nextstate] - tot
            post[(s, i)] = math.exp(min(lp, 0.0))
    return post, tot, alpha, beta


def prune_lattice(lat: Lattice, beam: float) -> Lattice:
    """Drop arcs/states not on any path within `beam` of the best
    (ref: lattice-functions.h:130 PruneLattice — Viterbi semiring)."""
    if lat.num_states == 0 or lat.start < 0:
        return lat
    order = lat.topological_order()
    n = lat.num_states
    alpha = np.full(n, INF)
    alpha[lat.start] = 0.0
    for s in order:
        if alpha[s] == INF:
            continue
        for a in lat.arcs[s]:
            alpha[a.nextstate] = min(alpha[a.nextstate], alpha[s] + a.cost)
    beta = np.full(n, INF)
    for s, (g, ac) in lat.finals.items():
        beta[s] = g + ac
    for s in reversed(order):
        for a in lat.arcs[s]:
            beta[s] = min(beta[s], a.cost + beta[a.nextstate])
    if n == 0 or lat.start < 0:
        return lat
    best = beta[lat.start]
    cutoff = best + beam
    out = Lattice()
    for _ in range(n):
        out.add_state()
    out.start = lat.start
    for s in range(n):
        for a in lat.arcs[s]:
            if alpha[s] + a.cost + beta[a.nextstate] <= cutoff:
                out.add_arc(s, a.ilabel, a.olabel, a.graph_cost,
                            a.acoustic_cost, a.nextstate)
    for s, (g, ac) in lat.finals.items():
        if alpha[s] + g + ac <= cutoff:
            out.set_final(s, g, ac)
    return out.connect()


def determinize_lattice(lat: Lattice, beam: float | None = None) -> Lattice:
    """Word-level determinization: one path per word sequence, keeping the
    best (Viterbi) alignment and cost.

    (ref: lat/determinize-lattice-pruned.h:255 — we implement the
    capability via N-best-per-wordseq reduction, which matches the
    reference's output semantics of 'only the best path for each word
    sequence'; the subset-construction optimization can come later.)
    """
    if beam is not None:
        lat = prune_lattice(lat, beam)
    # enumerate paths grouped by word sequence, keep best per group.
    # For large lattices this is exponential — use Viterbi-style dynamic
    # programming over (state, recent-words-hash)? Round-1: path-merge via
    # best-first search bounded by a path budget.
    import heapq
    budget = 200000
    best_per_words: dict[tuple, tuple] = {}
    h = [(0.0, 0, lat.start, (), (), 0.0, 0.0)]
    seq = 0
    seen_partial: dict = {}
    while h and budget > 0:
        cost, _seq, s, words, tids, gc, ac = heapq.heappop(h)
        budget -= 1
        key = (s, words)
        prev = seen_partial.get(key)
        if prev is not None and prev <= cost - 1e-12:
            continue
        seen_partial[key] = cost
        if s in lat.finals:
            g, a = lat.finals[s]
            tot = cost + g + a
            cur = best_per_words.get(words)
            if cur is None or tot < cur[0]:
                best_per_words[words] = (tot, tids, gc + g, ac + a)
        for arc in lat.arcs[s]:
            seq += 1
            heapq.heappush(h, (
                cost + arc.cost, seq, arc.nextstate,
                words + ((arc.olabel,) if arc.olabel else ()),
                tids + ((arc.ilabel,) if arc.ilabel else ()),
                gc + arc.graph_cost, ac + arc.acoustic_cost))
    # build a word-prefix-tree lattice
    out = Lattice()
    out.start = out.add_state()
    prefix_state = {(): out.start}
    for words, (tot, tids, gc, ac) in sorted(best_per_words.items()):
        cur = ()
        for k, w in enumerate(words):
            nxt = cur + (w,)
            if nxt not in prefix_state:
                ns = out.add_state()
                prefix_state[nxt] = ns
                out.add_arc(prefix_state[cur], 0, w, 0.0, 0.0, ns)
            cur = nxt
        # terminal state carrying the path cost & alignment
        term = out.add_state()
        out.add_arc(prefix_state[cur], 0, 0, gc, ac, term)
        # stash tids on the final arc via per-arc attribute
        out.arcs[prefix_state[cur]][-1].tids = tuple(tids)  # type: ignore
        out.set_final(term, 0.0, 0.0)
    return out


def nbest(lat: Lattice, n: int):
    """-> list of (words, tids, cost), best first
    (ref: latbin/lattice-nbest / nbest-to-linear)."""
    import heapq
    if lat.num_states == 0 or lat.start < 0:
        return []
    h = [(0.0, 0, lat.start, (), ())]
    out = []
    seq = 0
    seen = defaultdict(int)
    while h and len(out) < n:
        cost, _q, s, words, tids = heapq.heappop(h)
        if s in lat.finals:
            g, a = lat.finals[s]
            out.append((list(words), list(tids), cost + g + a))
        if seen[s] >= n:
            continue
        seen[s] += 1
        for arc in lat.arcs[s]:
            seq += 1
            heapq.heappush(h, (cost + arc.cost, seq, arc.nextstate,
                               words + ((arc.olabel,) if arc.olabel else ()),
                               tids + ((arc.ilabel,) if arc.ilabel else ())))
    return out


def compose_lattice_with_lm(lat: Lattice, g, backoff_label: int,
                            lm_scale: float = 1.0) -> Lattice:
    """Compose a (word-level or tid-level) lattice with a word acceptor G,
    adding lm_scale * G-cost to the graph part.

    (ref: latbin/lattice-lmrescore.cc — run once with lm_scale=-1 on the
    old G and once with +1 on the new G to swap LM scores; backoff #0
    arcs in G are traversed freely.)
    """
    from collections import deque

    out = Lattice()
    state_map: dict = {}
    queue: deque = deque()

    def get_state(key):
        s = state_map.get(key)
        if s is None:
            s = out.add_state()
            state_map[key] = s
            queue.append(key)
        return s

    out.start = get_state((lat.start, g.start))
    INF_ = float("inf")
    while queue:
        key = queue.popleft()
        ls, gs = key
        cur = state_map[key]
        # G backoff closure handled lazily via explicit backoff arcs
        for (gi, _go, gw, gd) in g.arcs[gs]:
            if gi == backoff_label:
                out.add_arc(cur, 0, 0, lm_scale * gw, 0.0,
                            get_state((ls, gd)))
        if ls in lat.finals:
            gfin = g.final(gs)
            if gfin < INF_:
                gc, ac = lat.finals[ls]
                out.set_final(cur, gc + lm_scale * gfin, ac)
        for a in lat.arcs[ls]:
            if a.olabel == 0:
                na = out.add_arc(cur, a.ilabel, 0, a.graph_cost,
                                 a.acoustic_cost, get_state((a.nextstate, gs)))
                if hasattr(a, "tids"):
                    out.arcs[cur][-1].tids = a.tids  # type: ignore
                continue
            for (gi, _go, gw, gd) in g.arcs[gs]:
                if gi == a.olabel:
                    out.add_arc(cur, a.ilabel, a.olabel,
                                a.graph_cost + lm_scale * gw,
                                a.acoustic_cost, get_state((a.nextstate, gd)))
    return out.connect()


def rescore_nbest(paths, lm, words_table, lm_scale=1.0, old_lm_costs=None):
    """Rescore (words, tids, cost) n-best entries with an ArpaLm.

    cost' = cost - old_lm_cost + lm_scale * new_lm_cost; if old costs are
    unknown, caller should have removed graph costs already.
    """
    out = []
    for k, (words, tids, cost) in enumerate(paths):
        sent = [words_table.sym(w) for w in words]
        new_lm = -lm.score_sentence(sent)
        old = old_lm_costs[k] if old_lm_costs else 0.0
        out.append((words, tids, cost - old + lm_scale * new_lm))
    return sorted(out, key=lambda x: x[2])


def best_path_ctm(lat: Lattice):
    """Best-path word timings: [(word, start_frame, dur_frames)].

    A word starts at the frame of the arc that EMITS its olabel and ends
    where the next word starts (or the path ends) — the tid-level lattice
    has one frame per emitting (ilabel != 0) arc
    (ref: latbin/lattice-to-ctm-conf.cc one-best mode; MBR sausage times
    replace these when --decode-mbr is on).
    """
    res = lattice_best_path(lat)
    if res is None:
        return []
    order = lat.topological_order()
    n = lat.num_states
    alpha = np.full(n, INF)
    back: list = [None] * n
    alpha[lat.start] = 0.0
    for s in order:
        if alpha[s] == INF:
            continue
        for a in lat.arcs[s]:
            c = alpha[s] + a.cost
            if c < alpha[a.nextstate]:
                alpha[a.nextstate] = c
                back[a.nextstate] = (s, a)
    best_s, best_c = -1, INF
    for s, (g, ac) in lat.finals.items():
        if alpha[s] + g + ac < best_c:
            best_c, best_s = alpha[s] + g + ac, s
    arcs = []
    s = best_s
    while back[s] is not None:
        p, a = back[s]
        arcs.append(a)
        s = p
    arcs.reverse()
    ctm = []
    t = 0
    for a in arcs:
        if a.olabel:
            ctm.append([a.olabel, t, 0])
        if a.ilabel:
            t += 1
            if ctm:
                ctm[-1][2] = t - ctm[-1][1]
    # close any zero-duration word at path end
    return [(w, s0, max(d, 1)) for (w, s0, d) in ctm]
