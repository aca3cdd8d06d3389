"""Static verification of packed decode graphs (the batched decoder's
index programs are gather-heavy; a malformed graph would read garbage
silently on TPU, where there is no bounds checking).

(ref: SURVEY.md §5 'race detection/sanitizers' — the reference's
 nnet3 ComputationChecker (nnet3/nnet-analyze.h:370-394) validates its
 compiled programs before execution; this is the same idea for our
 PackedGraph CSR tables.)
"""

from __future__ import annotations

import numpy as np


def check_packed_graph(graph, num_pdfs: int | None = None) -> None:
    """Raise ValueError on any inconsistency; silent on a valid graph.

    Checks: CSR monotonicity and coverage, next-state bounds, start/final
    validity, emitting arcs carry a valid pdf (and pdf < num_pdfs when
    given), eps arcs carry pdf -1, emitting-before-eps arc ordering per
    state (the _pad_csr/packing contract).
    """
    S = graph.num_states
    A = len(graph.ilabel)
    errs = []
    a0 = np.asarray(graph.arc_start)
    if len(a0) != S + 1:
        errs.append(f"arc_start length {len(a0)} != num_states+1 {S + 1}")
    else:
        if a0[0] != 0 or a0[-1] != A:
            errs.append("arc_start does not span [0, num_arcs]")
        if (np.diff(a0) < 0).any():
            errs.append("arc_start not monotonically nondecreasing")
    for name in ("ilabel", "olabel", "cost", "nextstate"):
        if len(getattr(graph, name)) != A:
            errs.append(f"{name} length != num_arcs")
    nxt = np.asarray(graph.nextstate)
    if A and ((nxt < 0) | (nxt >= S)).any():
        errs.append("nextstate out of range")
    if not (0 <= graph.start < S):
        errs.append(f"start state {graph.start} out of range")
    fin = np.asarray(graph.final)
    if len(fin) != S:
        errs.append("final length != num_states")
    elif not np.isfinite(fin).any():
        errs.append("no reachable final state (all finals infinite)")
    il = np.asarray(graph.ilabel)
    if graph.pdf is not None:
        pdf = np.asarray(graph.pdf)
        if len(pdf) != A:
            errs.append("pdf length != num_arcs")
        else:
            emit = il > 0
            if (pdf[emit] < 0).any():
                errs.append("emitting arc with pdf < 0")
            if num_pdfs is not None and A and (pdf[emit] >= num_pdfs).any():
                errs.append(f"emitting arc pdf >= num_pdfs ({num_pdfs})")
            if (pdf[~emit] != -1).any():
                errs.append("eps arc with pdf != -1")
    # per-state emitting-before-eps ordering (packing contract) — O(A)
    # vectorized: an eps->emitting transition inside a state is a
    # violation; transitions that cross a state boundary are exempt
    if len(a0) == S + 1 and not errs and A > 1:
        is_eps = (il == 0).astype(np.int8)
        bad = np.diff(is_eps) < 0                   # eps then emitting
        boundary = np.zeros(A - 1, bool)
        starts = a0[1:-1]                           # interior boundaries
        boundary[starts[(starts > 0) & (starts < A)] - 1] = True
        viol = np.where(bad & ~boundary)[0]
        if len(viol):
            s = int(np.searchsorted(a0, viol[0], side="right") - 1)
            errs.append(
                f"state {s}: eps arc before an emitting arc "
                "(emitting-first packing violated)")
    if errs:
        raise ValueError("packed graph verification failed:\n  "
                         + "\n  ".join(errs))
