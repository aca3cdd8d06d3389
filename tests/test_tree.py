"""Decision-tree subsystem tests (clustering oracles + synthetic tree
builds, style of tree/build-tree-test.cc / cluster-utils-test.cc)."""

import numpy as np
import pytest

from kaldi_tpu.tree.clustering import (GaussStats, cluster_bottom_up,
                                       cluster_kmeans, tree_cluster,
                                       sum_stats)
from kaldi_tpu.tree.event_map import (ConstantEventMap, TableEventMap,
                                      SplitEventMap, KPDF_CLASS)
from kaldi_tpu.tree.build_tree import (Questions, build_tree,
                                       obtain_questions)
from kaldi_tpu.tree.context_dep import TreeContextDependency


def make_stats(rng, centers, n_per=50, dim=3, spread=0.3):
    """One GaussStats per (center index, sample block)."""
    out = []
    for ci, c in enumerate(centers):
        st = GaussStats(dim)
        for _ in range(n_per):
            st.accumulate(c + rng.randn(dim) * spread)
        out.append(st)
    return out


def test_gauss_stats_objf_merge():
    rng = np.random.RandomState(0)
    a = GaussStats(2)
    b = GaussStats(2)
    for _ in range(100):
        a.accumulate(rng.randn(2))
        b.accumulate(rng.randn(2) + 10.0)  # far away
    # merging far clusters costs a lot; merging near splits of one costs ~0
    assert a.distance(b) > 100.0
    a1 = GaussStats(2)
    a2 = GaussStats(2)
    for _ in range(100):
        a1.accumulate(rng.randn(2))
        a2.accumulate(rng.randn(2))
    assert a1.distance(a2) < 10.0


def test_cluster_bottom_up_groups():
    rng = np.random.RandomState(1)
    centers = [np.zeros(3), np.ones(3) * 8, -np.ones(3) * 8]
    stats = make_stats(rng, centers * 3)  # 9 stats, 3 groups
    clusters, assign = cluster_bottom_up(stats, min_clust=3)
    assert len(clusters) == 3
    # same-center stats share a cluster
    for k in range(3):
        assert assign[k] == assign[k + 3] == assign[k + 6]


def test_cluster_kmeans():
    rng = np.random.RandomState(2)
    centers = [np.zeros(2), np.ones(2) * 10]
    stats = make_stats(rng, centers * 5, dim=2)
    clusters, assign = cluster_kmeans(stats, 2, seed=3)
    assert len(clusters) == 2
    g0 = {assign[i] for i in range(0, 10, 2)}
    g1 = {assign[i] for i in range(1, 10, 2)}
    assert len(g0) == 1 and len(g1) == 1 and g0 != g1


def test_tree_cluster_question_sets():
    rng = np.random.RandomState(3)
    centers = [np.zeros(2), np.zeros(2) + 0.5, np.ones(2) * 10,
               np.ones(2) * 10.5]
    stats = make_stats(rng, centers, dim=2)
    assign, node_sets = tree_cluster(stats, max_clust=4)
    # root contains everything
    assert sorted(node_sets[0]) == [0, 1, 2, 3]
    # some node should separate {0,1} from {2,3}
    sets = {tuple(sorted(s)) for s in node_sets}
    assert (0, 1) in sets and (2, 3) in sets


def test_build_tree_synthetic():
    """Phones 1..4 in 2 acoustic groups; the tree should tie by group but
    split where the data differs."""
    rng = np.random.RandomState(4)
    dim = 3
    stats = {}
    # phone 1,2 sound alike; 3,4 sound alike but differ by pdf-class
    for phone, base in [(1, 0.0), (2, 0.0), (3, 8.0), (4, 8.0)]:
        for pdf_class in range(3):
            st = GaussStats(dim)
            mean = np.full(dim, base + 2.0 * pdf_class)
            for _ in range(200):
                st.accumulate(mean + rng.randn(dim) * 0.2)
            ev = frozenset([(KPDF_CLASS, pdf_class), (0, 0), (1, phone),
                            (2, 0)])
            stats[ev] = st
    questions = Questions([[1], [2], [3], [4], [1, 2], [3, 4], [1, 2, 3, 4]],
                          num_pdf_classes=3)
    # phones sharing a root CAN tie; separate roots never tie (reference
    # semantics: ClusterEventMapRestrictedByMap over the stub roots)
    tree, n_leaves = build_tree(
        stats, questions, [[1, 2], [3, 4]],
        {p: 3 for p in [1, 2, 3, 4]},
        max_leaves=8, thresh=10.0, cluster_thresh=10.0)
    assert 4 <= n_leaves <= 8
    # phones 1,2 with same pdf-class map to the same leaf; phone 3 differs
    ctx = TreeContextDependency(3, 1, tree, n_leaves)
    assert ctx.compute([0, 1, 0], 0) == ctx.compute([0, 2, 0], 0)
    assert ctx.compute([0, 1, 0], 0) != ctx.compute([0, 3, 0], 0)
    # pdf-class split present
    assert ctx.compute([0, 1, 0], 0) != ctx.compute([0, 1, 0], 2)


def test_build_tree_two_level():
    """Fine tree refines the coarse tree; the fine->coarse map groups fine
    leaves under the coarse codebooks (ref: build-tree.h:145)."""
    from kaldi_tpu.tree.build_tree import build_tree_two_level
    rng = np.random.RandomState(6)
    dim = 3
    stats = {}
    for phone, base in [(1, 0.0), (2, 0.5), (3, 8.0), (4, 8.5)]:
        for pdf_class in range(3):
            st = GaussStats(dim)
            mean = np.full(dim, base + 2.0 * pdf_class)
            for _ in range(200):
                st.accumulate(mean + rng.randn(dim) * 0.2)
            ev = frozenset([(KPDF_CLASS, pdf_class), (0, 0), (1, phone),
                            (2, 0)])
            stats[ev] = st
    questions = Questions([[1], [2], [3], [4], [1, 2], [3, 4]],
                          num_pdf_classes=3)
    fine, n_fine, coarse, n_coarse, f2c = build_tree_two_level(
        stats, questions, [[1, 2], [3, 4]], {p: 3 for p in (1, 2, 3, 4)},
        max_leaves_first=4, max_leaves_second=12, thresh=1.0)
    assert n_coarse <= 4 and n_fine > n_coarse
    assert len(f2c) == n_fine
    assert set(f2c) <= set(range(n_coarse))
    # events that share a fine leaf share its coarse leaf through the map
    for ev in stats:
        d = dict(ev)
        lf, lc = fine.map(d), coarse.map(d)
        if lf is not None and lc is not None:
            assert f2c[lf] == lc


def test_obtain_questions():
    rng = np.random.RandomState(5)
    stats = {}
    for phone, base in [(1, 0.0), (2, 0.5), (3, 10.0), (4, 10.5)]:
        st = GaussStats(2)
        for _ in range(100):
            st.accumulate(np.full(2, base) + rng.randn(2) * 0.3)
        stats[frozenset([(KPDF_CLASS, 0), (0, 0), (1, phone), (2, 0)])] = st
    qs = obtain_questions(stats, P=1)
    qsets = {tuple(q) for q in qs}
    assert (1, 2, 3, 4) in qsets
    assert (1, 2) in qsets and (3, 4) in qsets


def test_build_tree_cluster_thresh_negative_uses_smallest_split():
    """cluster_thresh < 0 must activate leaf clustering at the smallest
    split gain (ref: build-tree.cc convention), not silently skip it
    (regression: any non-positive value skipped clustering)."""
    import numpy as np
    from kaldi_tpu.tree.build_tree import build_tree, Questions
    from kaldi_tpu.tree.clustering import GaussStats
    from kaldi_tpu.tree.event_map import KPDF_CLASS
    rng = np.random.RandomState(0)
    stats = {}
    # one phone (id 5) at center position 1, 1 pdf-class; left contexts
    # that barely differ -> splits happen at tiny gains, then negative
    # cluster_thresh merges some back
    for left in (1, 2, 3, 4):
        s = GaussStats(2)
        for _ in range(50):
            s.accumulate(rng.randn(2) * 0.1 + 0.001 * left)
        ev = frozenset([(0, left), (1, 5), (2, 0), (KPDF_CLASS, 0)])
        stats[ev] = s
    questions = Questions([[1], [1, 2], [1, 2, 3], [0]], num_pdf_classes=1)
    _t_skip, n_skip = build_tree(stats, questions, [[5]], {5: 1},
                                 max_leaves=10, thresh=1e-6,
                                 cluster_thresh=0.0)
    _t_neg, n_neg = build_tree(stats, questions, [[5]], {5: 1},
                               max_leaves=10, thresh=1e-6,
                               cluster_thresh=-1.0)
    assert n_skip > 1          # splitting actually happened
    assert n_neg <= n_skip     # negative thresh clustered leaves back


def test_tree_stats_back_to_back_one_state_phone():
    """Two consecutive instances of a 1-state phone must form two
    segments, each seeing the other as context (regression: the
    hmm-state-decreasing heuristic merged them; ref: hmm-utils.cc
    SplitToPhonesInternal)."""
    import numpy as np
    from kaldi_tpu.hmm.topology import HmmTopology
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.tree.build_tree import accumulate_tree_stats
    topo = HmmTopology.three_state([1], num_states=1)
    tm = TransitionModel(topo, lambda ph, pc: 0)
    # transition-state 1 = (phone 1, state 0, pdf 0): tids
    fwd = None
    sl = tm.self_loop_of(1)
    for tid in range(1, tm.num_transition_ids + 1):
        if not tm.is_self_loop(tid):
            fwd = tid
    assert fwd is not None and sl != 0 and fwd != sl
    # two instances: [fwd, sl | fwd, sl]  (reordered convention)
    ali = np.array([fwd, sl, fwd, sl])
    feats = np.arange(8, dtype=np.float64).reshape(4, 2)
    stats = accumulate_tree_stats(feats, ali, tm, N=3, P=1)
    # each instance must see phone 1 as its neighbour on one side
    lefts = {dict(ev)[0] for ev in stats}
    rights = {dict(ev)[2] for ev in stats}
    assert 1 in lefts, "second instance lost its left context"
    assert 1 in rights, "first instance lost its right context"
