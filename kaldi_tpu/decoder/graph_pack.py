"""CSR packing of decoding/alignment graphs into immutable arc tensors.

The decode-time counterpart of the reference's `Fst<StdArc>` (which the
LatticeFasterDecoder walks pointer-by-pointer, decoder/lattice-faster-
decoder.cc:660): here the graph becomes five flat arrays — arc_start[s],
ilabel/olabel/cost/nextstate per arc, ilabel-sorted within each state — so
the TPU decoder can expand a whole frontier with one gather.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from kaldi_tpu.fst.fst import Fst, INF


@dataclasses.dataclass
class PackedGraph:
    """CSR arc table. Emitting arcs (ilabel>0) sorted before eps arcs."""

    arc_start: np.ndarray  # [S+1] int32
    ilabel: np.ndarray     # [A] int32 (transition-ids for HCLG)
    olabel: np.ndarray     # [A] int32 (word ids)
    cost: np.ndarray       # [A] float32 (graph cost)
    nextstate: np.ndarray  # [A] int32
    final: np.ndarray      # [S] float32 (INF if not final)
    start: int
    pdf: np.ndarray | None = None  # [A] int32: pdf per arc (-1 for eps)

    @property
    def num_states(self):
        return len(self.final)

    @property
    def num_arcs(self):
        return len(self.ilabel)

    @property
    def max_out_degree(self):
        return int(np.max(np.diff(self.arc_start))) if self.num_states else 0


def pack_graph(fst: Fst, tid_to_pdf: np.ndarray | None = None) -> PackedGraph:
    n = fst.num_states
    arc_start = np.zeros(n + 1, np.int32)
    ilabels, olabels, costs, nexts = [], [], [], []
    for s in range(n):
        arcs = sorted(fst.arcs[s], key=lambda a: (a[0] == 0, a[0]))
        arc_start[s + 1] = arc_start[s] + len(arcs)
        for (i, o, w, d) in arcs:
            ilabels.append(i)
            olabels.append(o)
            costs.append(w)
            nexts.append(d)
    ilabel = np.asarray(ilabels, np.int32)
    final = np.full(n, np.float32(np.inf), np.float32)
    for s, w in fst.finals.items():
        final[s] = w
    pdf = None
    if tid_to_pdf is not None:
        pdf = np.where(ilabel > 0, tid_to_pdf[np.maximum(ilabel, 0)], -1).astype(np.int32)
    return PackedGraph(
        arc_start=arc_start,
        ilabel=ilabel,
        olabel=np.asarray(olabels, np.int32),
        cost=np.asarray(costs, np.float32),
        nextstate=np.asarray(nexts, np.int32),
        final=final,
        start=fst.start,
        pdf=pdf,
    )


@dataclasses.dataclass
class SplitCsr:
    """Emitting / epsilon arc CSR split of a PackedGraph.

    The decode-time layout for production-scale graphs: two flat CSR
    tables per state (emitting arcs, eps arcs) so ProcessEmitting and
    ProcessNonemitting each gather only the arcs they can use — memory
    stays O(arcs) with no [S, E_max] densification (the reference walks
    per-state arc lists the same way, decoder/lattice-faster-decoder.cc
    :660 ProcessEmitting / :750 ProcessNonemitting).
    """

    estart: np.ndarray   # [S+1] int32 — emitting-arc row offsets
    e_tid: np.ndarray    # [Ae] int32 transition-ids (ilabels)
    e_pdf: np.ndarray    # [Ae] int32 pdf per arc
    e_ol: np.ndarray     # [Ae] int32 word olabels
    e_cost: np.ndarray   # [Ae] float32 graph cost
    e_nxt: np.ndarray    # [Ae] int32
    zstart: np.ndarray   # [S+1] int32 — eps-arc row offsets
    z_ol: np.ndarray     # [Az] int32
    z_cost: np.ndarray   # [Az] float32
    z_nxt: np.ndarray    # [Az] int32
    final: np.ndarray    # [S] float32 (BIG-clamped, not inf)
    start: int
    max_olabel: int

    @property
    def num_states(self):
        return len(self.final)


def split_csr(graph: PackedGraph, big: float = 1e10) -> SplitCsr:
    """Vectorized emitting/eps CSR split (no per-state Python loop — a
    10M-arc HCLG must pack in seconds)."""
    S = graph.num_states
    deg = np.diff(graph.arc_start).astype(np.int64)
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    il = np.asarray(graph.ilabel)
    em = il > 0
    e_idx = np.flatnonzero(em)
    z_idx = np.flatnonzero(~em)
    # arcs are CSR-ordered by source state, so src[e_idx] is nondecreasing
    estart = np.searchsorted(src[e_idx], np.arange(S + 1)).astype(np.int32)
    zstart = np.searchsorted(src[z_idx], np.arange(S + 1)).astype(np.int32)
    if graph.pdf is not None:
        e_pdf = np.maximum(graph.pdf[e_idx], 0).astype(np.int32)
    else:
        e_pdf = np.zeros(len(e_idx), np.int32)
    final = np.where(np.isfinite(graph.final), graph.final,
                     big).astype(np.float32)
    max_ol = int(graph.olabel.max()) if graph.num_arcs else 0
    return SplitCsr(
        estart=estart,
        e_tid=il[e_idx].astype(np.int32),
        e_pdf=e_pdf,
        e_ol=graph.olabel[e_idx].astype(np.int32),
        e_cost=graph.cost[e_idx].astype(np.float32),
        e_nxt=graph.nextstate[e_idx].astype(np.int32),
        zstart=zstart,
        z_ol=graph.olabel[z_idx].astype(np.int32),
        z_cost=graph.cost[z_idx].astype(np.float32),
        z_nxt=graph.nextstate[z_idx].astype(np.int32),
        final=final,
        start=int(graph.start),
        max_olabel=max_ol,
    )


def eps_depth(graph: PackedGraph, cap: int = 8) -> int | None:
    """Longest eps-arc chain (None if cyclic or deeper than `cap`).

    Vectorized fixpoint iteration (np.maximum.at relaxation), O(cap * Az)
    — the Python-adjacency Kahn walk does not scale to multimillion-arc
    graphs. ProcessNonemitting's fixpoint count, made static per graph.
    """
    deg = np.diff(graph.arc_start).astype(np.int64)
    src = np.repeat(np.arange(graph.num_states, dtype=np.int64), deg)
    z = np.asarray(graph.ilabel) == 0
    zsrc, znxt = src[z], np.asarray(graph.nextstate)[z].astype(np.int64)
    if len(zsrc) == 0:
        return 0
    nodes = np.unique(np.concatenate([zsrc, znxt]))
    zsrc = np.searchsorted(nodes, zsrc)
    znxt = np.searchsorted(nodes, znxt)
    depth = np.zeros(len(nodes), np.int64)
    for _ in range(cap + 1):
        new = depth.copy()
        np.maximum.at(new, znxt, depth[zsrc] + 1)
        if np.array_equal(new, depth):
            return int(depth.max())
        depth = new
        if depth.max() > cap:
            return None   # too deep to bound usefully, or cyclic
    return None


@dataclasses.dataclass
class PackedGraphBatch:
    """A batch of graphs padded to common [S, A] so one jit program serves all.

    Padding arcs are self-loops on a dead state with +inf cost; padding
    states have no arcs and +inf final.
    """

    arc_start: np.ndarray  # [B, S+1]
    ilabel: np.ndarray     # [B, A]
    olabel: np.ndarray     # [B, A]
    cost: np.ndarray       # [B, A]
    nextstate: np.ndarray  # [B, A]
    src: np.ndarray        # [B, A] source state of each arc (for scatter-free DP)
    pdf: np.ndarray        # [B, A]
    final: np.ndarray      # [B, S]
    start: np.ndarray      # [B]
    num_states: np.ndarray  # [B]
    num_arcs: np.ndarray    # [B]


def pack_graphs(fsts: list[Fst], tid_to_pdf: np.ndarray,
                pad_states: int | None = None,
                pad_arcs: int | None = None) -> PackedGraphBatch:
    packed = [pack_graph(f, tid_to_pdf) for f in fsts]
    S = pad_states or max(p.num_states for p in packed)
    A = pad_arcs or max(p.num_arcs for p in packed)
    B = len(packed)
    arc_start = np.zeros((B, S + 1), np.int32)
    ilabel = np.zeros((B, A), np.int32)
    olabel = np.zeros((B, A), np.int32)
    cost = np.full((B, A), np.float32(1e10), np.float32)
    nextstate = np.zeros((B, A), np.int32)
    src = np.zeros((B, A), np.int32)
    pdf = np.zeros((B, A), np.int32)
    final = np.full((B, S), np.float32(np.inf), np.float32)
    start = np.zeros(B, np.int32)
    ns = np.zeros(B, np.int32)
    na = np.zeros(B, np.int32)
    for b, p in enumerate(packed):
        n, a = p.num_states, p.num_arcs
        assert n <= S and a <= A
        arc_start[b, : n + 1] = p.arc_start
        arc_start[b, n + 1:] = p.arc_start[n]
        ilabel[b, :a] = p.ilabel
        olabel[b, :a] = p.olabel
        cost[b, :a] = p.cost
        nextstate[b, :a] = p.nextstate
        pdf[b, :a] = np.maximum(p.pdf, 0)
        final[b, :n] = p.final
        start[b] = p.start
        ns[b] = n
        na[b] = a
        for s in range(n):
            src[b, p.arc_start[s]: p.arc_start[s + 1]] = s
    return PackedGraphBatch(arc_start, ilabel, olabel, cost, nextstate, src,
                            pdf, final, start, ns, na)
