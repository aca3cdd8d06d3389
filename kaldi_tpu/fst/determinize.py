"""Determinization with epsilon-closure and output-string divisors
("determinize-star").

(ref: fstext/determinize-star.h:86 DeterminizeStar — subset construction
where each determinized state is a normalized set of
(state, residual-weight, residual-output-string); input-epsilons are closed
over; common weight divisors and longest-common-prefix output strings are
emitted eagerly. --use-log corresponds to summing weights in the log
semiring, which preserves stochasticity of the composed graphs.)

This is our own implementation of the algorithm's semantics; output strings
longer than one label are emitted through chains of input-epsilon arcs,
like the reference.
"""

from __future__ import annotations

from collections import deque

from kaldi_tpu.fst.fst import Fst, EPS, INF, log_plus

_ROUND = 1e-6


def _norm_weight(w: float) -> float:
    return round(w / _ROUND) * _ROUND


def determinize_star(ifst: Fst, use_log: bool = False,
                     max_states: int = 10_000_000) -> Fst:
    plus = log_plus if use_log else min
    arcs = ifst.arcs

    def eps_closure(elements):
        """elements: dict (state) -> (weight, ostring). Close over input-eps."""
        # Kahn-style repeated relaxation; detect eps cycles by bounding passes.
        agenda = deque(elements.keys())
        passes = 0
        limit = 10 * (len(arcs) + 10)
        while agenda:
            passes += 1
            if passes > limit * 10:
                raise RuntimeError("epsilon cycle detected in determinize-star")
            s = agenda.popleft()
            w, ostr = elements[s]
            for (i, o, aw, d) in arcs[s]:
                if i != EPS:
                    continue
                nw = w + aw
                nstr = ostr + ((o,) if o != EPS else ())
                if d in elements:
                    ow, ostr_d = elements[d]
                    cw = plus(ow, nw)
                    # keep the string of the better (tropical) path; in log
                    # semiring the strings must agree for a functional FST.
                    better_str = nstr if nw < ow else ostr_d
                    if abs(cw - ow) > 1e-9 or better_str != ostr_d:
                        if nstr != ostr_d and abs(nw - ow) < 1e-9 and nw < INF:
                            # genuinely ambiguous strings -> not functional;
                            # tolerate by keeping lexicographically smaller
                            better_str = min(nstr, ostr_d)
                        elements[d] = (cw, better_str)
                        agenda.append(d)
                else:
                    elements[d] = (nw, nstr)
                    agenda.append(d)
        return elements

    def normalize(elements):
        """Subtract common divisor; strip common output prefix.

        -> (key, common_weight, common_prefix, residual dict)
        """
        if not elements:
            return None, INF, (), {}
        common_w = INF
        for (w, _s) in elements.values():
            common_w = plus(common_w, w)
        strings = [s for (_w, s) in elements.values()]
        prefix = strings[0]
        for s in strings[1:]:
            k = 0
            while k < len(prefix) and k < len(s) and prefix[k] == s[k]:
                k += 1
            prefix = prefix[:k]
        p = len(prefix)
        resid = {st: (_norm_weight(w - common_w), s[p:])
                 for st, (w, s) in elements.items()}
        key = tuple(sorted((st, w, s) for st, (w, s) in resid.items()))
        return key, common_w, prefix, resid

    out = Fst()
    subset_id: dict = {}
    subsets: dict[int, dict] = {}

    def get_subset(key, resid):
        sid = subset_id.get(key)
        if sid is None:
            sid = out.add_state()
            if sid > max_states:
                raise RuntimeError("determinize-star exceeded max states")
            subset_id[key] = sid
            subsets[sid] = resid
            agenda.append(sid)
        return sid

    def emit_chain(src, ilabel, ostring, w, dst):
        """Arc emitting possibly-multiple output labels via eps chain."""
        if len(ostring) == 0:
            out.add_arc(src, ilabel, EPS, w, dst)
            return
        cur = src
        for k, o in enumerate(ostring):
            last = k == len(ostring) - 1
            nxt = dst if last else out.add_state()
            out.add_arc(cur, ilabel if k == 0 else EPS, o,
                        w if k == 0 else 0.0, nxt)
            cur = nxt

    if ifst.start < 0:
        return out
    agenda: deque = deque()
    init = eps_closure({ifst.start: (0.0, ())})
    key, w0, prefix0, resid0 = normalize(init)
    # initial common weight/prefix must be empty for a well-formed start;
    # fold them into a dedicated start state if not.
    out.start = get_subset(key, resid0)
    if abs(w0) > 1e-9 or prefix0:
        real_start = out.add_state()
        emit_chain(real_start, EPS, prefix0, w0, out.start)
        out.start = real_start

    while agenda:
        sid = agenda.popleft()
        resid = subsets[sid]
        # final handling: emit residual strings through eps chains
        final_groups: dict[tuple, float] = {}
        for st, (w, s) in resid.items():
            fw = ifst.final(st)
            if fw < INF:
                tot = w + fw
                final_groups[s] = plus(final_groups.get(s, INF), tot)
        for s, w in final_groups.items():
            if not s:
                out.set_final(sid, w)
            else:
                tail = out.add_state()
                out.set_final(tail, 0.0)
                emit_chain(sid, EPS, s, w, tail)
        # gather outgoing non-eps labels
        by_label: dict[int, dict] = {}
        for st, (w, s) in resid.items():
            for (i, o, aw, d) in arcs[st]:
                if i == EPS:
                    continue
                elems = by_label.setdefault(i, {})
                nw = w + aw
                nstr = s + ((o,) if o != EPS else ())
                if d in elems:
                    ow, ostr = elems[d]
                    cw = plus(ow, nw)
                    bstr = nstr if nw < ow else ostr
                    if nstr != ostr and abs(nw - ow) < 1e-9:
                        bstr = min(nstr, ostr)
                    elems[d] = (cw, bstr)
                else:
                    elems[d] = (nw, nstr)
        for ilabel in sorted(by_label):
            elems = eps_closure(by_label[ilabel])
            key, w, prefix, resid2 = normalize(elems)
            dst = get_subset(key, resid2)
            emit_chain(sid, ilabel, prefix, w, dst)

    return out
