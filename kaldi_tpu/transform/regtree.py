"""Regression-tree MLLR / fMLLR: per-class transforms with occupancy backoff.

(ref: transform/regression-tree.h RegressionTree — binary tree over the
 acoustic model's Gaussians built by clustering means;
 transform/regtree-mllr-diag-gmm.h RegtreeMllrDiagGmm (mean-only MLLR),
 transform/regtree-fmllr-diag-gmm.h RegtreeFmllrDiagGmm. A node's
 transform is estimated only when its occupancy passes a threshold,
 else the parent's transform applies.)
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.transform.fmllr import FmllrStats, estimate_fmllr


class RegressionTree:
    """Binary tree over all Gaussians of an AmDiagGmm; leaves = base classes.

    Built by recursive 2-means on Gaussian means (the reference clusters
    with GaussClusterable; means-only 2-means gives the same tree shape)."""

    def __init__(self, am, num_base_classes: int = 4, seed: int = 0):
        means, owner = [], []
        for pdf, g in enumerate(am.pdfs):
            for m in range(g.num_gauss):
                means.append(g.means[m])
                owner.append((pdf, m))
        self.means = np.asarray(means)
        self.owner = owner
        G = len(means)
        rng = np.random.RandomState(seed)

        # nodes: list of dicts {parent, gauss_indices}; node 0 = root
        self.parent = [-1]
        members = [np.arange(G)]
        leaves = [0]
        unsplittable: list = []
        while leaves and len(leaves) + len(unsplittable) < num_base_classes:
            # split the largest splittable leaf; an unsplittable one
            # (identical means) is set aside, NOT a reason to stop
            leaves.sort(key=lambda n: -len(members[n]))
            node = leaves.pop(0)
            idx = members[node]
            lab = _two_means(self.means[idx], rng) if len(idx) >= 2 else None
            if lab is None or lab.all() or not lab.any():
                unsplittable.append(node)
                continue
            for side in (0, 1):
                self.parent.append(node)
                members.append(idx[lab == side])
                leaves.append(len(self.parent) - 1)
        self.members = members
        self.leaves = sorted(leaves + unsplittable)
        # gaussian -> leaf node
        self.gauss2leaf = np.zeros(G, np.int64)
        for leaf in self.leaves:
            self.gauss2leaf[members[leaf]] = leaf

    @property
    def num_nodes(self) -> int:
        return len(self.parent)

    def ancestors(self, node: int):
        out = [node]
        while self.parent[out[-1]] >= 0:
            out.append(self.parent[out[-1]])
        return out


class RegtreeStats:
    """Per-node fMLLR (or MLLR) stats, accumulated at leaves then summed
    up the tree."""

    def __init__(self, tree: RegressionTree, dim: int):
        self.tree = tree
        self.stats = [FmllrStats(dim) for _ in range(tree.num_nodes)]

    def accumulate(self, am, feats: np.ndarray, post):
        """post[t] = [(pdf, weight)] pdf-level posteriors; within-pdf
        component posteriors computed from the model.

        Batched: frames are grouped by pdf, component posteriors computed
        in one call per pdf, and each leaf's stats accumulated with one
        vectorized FmllrStats.accumulate over that pdf's component subset
        (instead of per-(frame, component) 1x1 calls)."""
        tree = self.tree
        offsets = {}
        off = 0
        for pdf, g in enumerate(am.pdfs):
            offsets[pdf] = off
            off += g.num_gauss
        by_pdf: dict = {}
        for t, frame in enumerate(post):
            for pdf, w in frame:
                by_pdf.setdefault(pdf, []).append((t, w))
        for pdf, items in by_pdf.items():
            g = am.pdfs[pdf]
            rows = np.array([t for (t, _w) in items])
            w = np.array([wt for (_t, wt) in items])
            x = feats[rows]                               # [N, D]
            comp_post = g.posteriors(x) * w[:, None]      # [N, M]
            leaves = tree.gauss2leaf[offsets[pdf]: offsets[pdf]
                                     + g.num_gauss]
            for leaf in np.unique(leaves):
                sel = leaves == leaf
                self.stats[leaf].accumulate(
                    x, g.means[sel], g.vars[sel], comp_post[:, sel])

    def summed_up(self):
        """Propagate leaf stats to ancestors; -> list of FmllrStats."""
        tree = self.tree
        out = [FmllrStats(self.stats[0].K.shape[0])
               for _ in range(tree.num_nodes)]
        for leaf in tree.leaves:
            for node in tree.ancestors(leaf):
                out[node].add(self.stats[leaf])
        return out


def estimate_regtree_fmllr(acc: RegtreeStats, min_count: float = 200.0):
    """-> transforms: gaussian-flat-index -> [D, D+1] transform. A leaf
    uses the deepest ancestor (including itself) with enough occupancy;
    identity if even the root is under min_count
    (ref: regtree-fmllr-diag-gmm.h RegtreeFmllrDiagGmmAccs::Update)."""
    tree = acc.tree
    summed = acc.summed_up()
    D = summed[0].K.shape[0]
    ident = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    node_xform: dict = {}

    def xform_of(node):
        if node in node_xform:
            return node_xform[node]
        if summed[node].beta >= min_count:
            W, _i, _c = estimate_fmllr(summed[node], min_count=min_count)
            node_xform[node] = W
        elif tree.parent[node] >= 0:
            node_xform[node] = xform_of(tree.parent[node])
        else:
            node_xform[node] = ident
        return node_xform[node]

    return {int(g): xform_of(int(tree.gauss2leaf[g]))
            for g in range(len(tree.gauss2leaf))}


class MllrStats:
    """Mean-only MLLR stats: mu' = W [mu; 1]
    (ref: transform/regtree-mllr-diag-gmm.h). Per-dim normal equations:
    G_d = Σ_m γ_m/σ²_md μ+ μ+ᵀ ; k_d = Σ_{t,m} γ_tm x_td/σ²_md μ+."""

    def __init__(self, dim: int):
        self.beta = 0.0
        self.K = np.zeros((dim, dim + 1))
        self.G = np.zeros((dim, dim + 1, dim + 1))

    def accumulate(self, feats, means, variances, posteriors):
        T, D = feats.shape
        mu_p = np.concatenate([means, np.ones((len(means), 1))], axis=1)
        gamma_m = posteriors.sum(axis=0)
        self.beta += gamma_m.sum()
        inv_var = 1.0 / variances
        gx = posteriors.T @ feats        # [M, D]
        for d in range(D):
            w = gamma_m * inv_var[:, d]
            self.G[d] += (mu_p * w[:, None]).T @ mu_p
            self.K[d] += (gx[:, d] * inv_var[:, d]) @ mu_p


def estimate_mllr(stats: MllrStats, min_count: float = 100.0) -> np.ndarray:
    D = stats.K.shape[0]
    ident = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    if stats.beta < min_count:
        return ident
    W = np.zeros((D, D + 1))
    for d in range(D):
        W[d] = np.linalg.solve(
            stats.G[d] + 1e-8 * np.eye(D + 1), stats.K[d])
    return W


def apply_mllr_to_means(am, W: np.ndarray):
    """Return a copy of the AM with transformed means mu' = W [mu;1]."""
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.am_gmm import AmDiagGmm
    out = []
    for g in am.pdfs:
        mu_p = np.concatenate([g.means, np.ones((g.num_gauss, 1))], axis=1)
        out.append(DiagGmm(g.weights.copy(), mu_p @ W.T, g.vars.copy()))
    return AmDiagGmm(out)


def _two_means(x: np.ndarray, rng, iters: int = 10):
    n = len(x)
    c = x[rng.choice(n, 2, replace=False)]
    lab = np.zeros(n, np.int64)
    for _ in range(iters):
        d0 = ((x - c[0]) ** 2).sum(1)
        d1 = ((x - c[1]) ** 2).sum(1)
        lab = (d1 < d0).astype(np.int64)
        for s in (0, 1):
            if (lab == s).any():
                c[s] = x[lab == s].mean(0)
    return lab


class RegtreeMllrStats:
    """Per-node MLLR (mean-transform) stats: k_d = Σ γ (x_d/σ²_d) ξ,
    G_d = Σ γ (1/σ²_d) ξ ξᵀ with ξ = [μ; 1] the extended mean
    (ref: transform/regtree-mllr-diag-gmm.h RegtreeMllrDiagGmmAccs)."""

    def __init__(self, tree: RegressionTree, dim: int):
        self.tree = tree
        self.dim = dim
        self.K = np.zeros((tree.num_nodes, dim, dim + 1))
        self.G = np.zeros((tree.num_nodes, dim, dim + 1, dim + 1))
        self.beta = np.zeros(tree.num_nodes)

    def accumulate(self, am, feats: np.ndarray, post):
        """post[t] = [(pdf, weight)]."""
        tree = self.tree
        offsets = {}
        off = 0
        for pdf, g in enumerate(am.pdfs):
            offsets[pdf] = off
            off += g.num_gauss
        by_pdf: dict = {}
        for t, frame in enumerate(post):
            for pdf, w in frame:
                by_pdf.setdefault(pdf, []).append((t, w))
        for pdf, items in by_pdf.items():
            g = am.pdfs[pdf]
            rows = np.array([t for (t, _w) in items])
            w = np.array([wt for (_t, wt) in items])
            x = feats[rows]                               # [N, D]
            comp_post = g.posteriors(x) * w[:, None]      # [N, M]
            xi = np.concatenate([g.means, np.ones((g.num_gauss, 1))],
                                axis=1)                   # [M, D+1]
            inv_var = 1.0 / g.vars                        # [M, D]
            leaves = tree.gauss2leaf[offsets[pdf]: offsets[pdf]
                                     + g.num_gauss]
            gamma_m = comp_post.sum(axis=0)               # [M]
            sum_gx = comp_post.T @ x                      # [M, D]
            for leaf in np.unique(leaves):
                sel = np.flatnonzero(leaves == leaf)
                for m in sel:
                    self.K[leaf] += np.outer(
                        sum_gx[m] * inv_var[m], xi[m])
                    self.G[leaf] += (gamma_m[m] * inv_var[m])[
                        :, None, None] * np.outer(xi[m], xi[m])[None]
                self.beta[leaf] += gamma_m[sel].sum()

    def summed_up(self):
        """-> (K, G, beta) propagated to ancestors."""
        tree = self.tree
        K = np.zeros_like(self.K)
        G = np.zeros_like(self.G)
        beta = np.zeros_like(self.beta)
        for leaf in tree.leaves:
            for node in tree.ancestors(leaf):
                K[node] += self.K[leaf]
                G[node] += self.G[leaf]
                beta[node] += self.beta[leaf]
        return K, G, beta


def estimate_regtree_mllr(acc: RegtreeMllrStats, min_count: float = 200.0):
    """-> {gauss-flat-index: [D, D+1] mean transform}: rows solve
    W_d = k_d G_d⁻¹; occupancy backoff up the tree, identity below
    min_count (ref: regtree-mllr-diag-gmm.cc RegtreeMllrDiagGmmAccs::
    Update)."""
    tree = acc.tree
    K, G, beta = acc.summed_up()
    D = acc.dim
    ident = np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)
    node_xform: dict = {}

    def xform_of(node):
        if node in node_xform:
            return node_xform[node]
        if beta[node] >= min_count:
            W = np.zeros((D, D + 1))
            for d in range(D):
                W[d] = np.linalg.solve(
                    G[node, d] + 1e-6 * np.eye(D + 1), K[node, d])
            node_xform[node] = W
        elif tree.parent[node] >= 0:
            node_xform[node] = xform_of(tree.parent[node])
        else:
            node_xform[node] = ident
        return node_xform[node]

    out = {}
    for g, leaf in enumerate(tree.gauss2leaf):
        out[g] = xform_of(int(leaf))
    return out


def unstack_transforms(tree: RegressionTree, stacked: np.ndarray,
                       dim: int) -> dict:
    """Invert the [L*D, D+1] stacking written by gmm-est-regtree-fmllr:
    -> {leaf: [D, D+1]} in sorted-leaf order."""
    leaves = sorted(set(int(l) for l in tree.gauss2leaf))
    out = {}
    for i, leaf in enumerate(leaves):
        out[leaf] = np.asarray(stacked[i * dim: (i + 1) * dim],
                               np.float64)
    return out


def regtree_fmllr_loglikes(am, tree: RegressionTree, by_leaf: dict,
                           feats: np.ndarray) -> np.ndarray:
    """[T, num_pdfs] loglikes under per-class feature transforms:
    each Gaussian is scored on its class's transformed features plus
    log|A_class| (ref: gmm/decodable-am-diag-gmm-regtree.h
    DecodableAmDiagGmmRegtreeFmllr)."""
    T = feats.shape[0]
    x = np.asarray(feats, np.float64)
    D = x.shape[1]
    xt = {}
    logdet = {}
    for leaf, W in by_leaf.items():
        A, b = W[:, :D], W[:, D]
        xt[leaf] = x @ A.T + b
        sign, ld = np.linalg.slogdet(A)
        logdet[leaf] = float(ld)
    out = np.zeros((T, am.num_pdfs))
    off = 0
    for j, g in enumerate(am.pdfs):
        leaves = tree.gauss2leaf[off: off + g.num_gauss]
        ll = np.full((T, g.num_gauss), -np.inf)
        for leaf in np.unique(leaves):
            sel = np.flatnonzero(leaves == leaf)
            xx = xt.get(int(leaf), x)
            mu, var = g.means[sel], g.vars[sel]
            q = (np.log(np.maximum(g.weights[sel], 1e-30))[None]
                 - 0.5 * np.sum(np.log(2 * np.pi * var), axis=1)[None]
                 - 0.5 * ((xx[:, None, :] - mu[None]) ** 2
                          / var[None]).sum(-1))
            ll[:, sel] = q + logdet.get(int(leaf), 0.0)
        m = ll.max(axis=1, keepdims=True)
        out[:, j] = (m + np.log(np.exp(ll - m).sum(axis=1,
                                                   keepdims=True)))[:, 0]
        off += g.num_gauss
    return out


def apply_regtree_mllr(am, tree: RegressionTree, by_leaf: dict):
    """-> deep copy of am with per-class MLLR mean transforms applied:
    μ' = A_c μ + b_c (ref: regtree-mllr-diag-gmm.h
    RegtreeMllrDiagGmm::TransformModel)."""
    import copy
    out = copy.deepcopy(am)
    off = 0
    for g in out.pdfs:
        leaves = tree.gauss2leaf[off: off + g.num_gauss]
        D = g.dim
        for leaf in np.unique(leaves):
            W = by_leaf.get(int(leaf))
            if W is None:
                continue
            sel = leaves == leaf
            g.means[sel] = g.means[sel] @ W[:, :D].T + W[:, D]
        off += g.num_gauss
    out.invalidate()
    return out
