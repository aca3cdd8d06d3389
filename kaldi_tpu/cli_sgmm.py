"""SGMM / SGMM2 long-tail CLI subcommands.

The sgmmbin/sgmm2bin surface beyond the core train/est/decode loop
already in kaldi_tpu.cli: model init/copy/surgery, Gaussian-level
posteriors (gpost), fMLLR + fMLLR-basis estimation, pre-transforms,
lattice rescoring, state distances, normalization. Registered into the
main parser by kaldi_tpu.cli.main via register(sub).

Legacy-SGMM note: AmSgmm2 without the u_i speaker weight projection IS
the v1 model (sgmm/am-sgmm.h) — the legacy sgmm-* binaries map onto the
same implementations (model files tagged kind='sgmm'); aliases live in
kaldi_tpu.cli._ALIASES.

(ref: sgmmbin/*.cc, sgmm2bin/*.cc — cited per command.)
"""

from __future__ import annotations

import sys

import numpy as np


def _load(path):
    from kaldi_tpu.io.model_io import load_sgmm2
    return load_sgmm2(path)


def _save(path, am):
    from kaldi_tpu.io.model_io import save_sgmm2
    save_sgmm2(path, am, kind=getattr(am, "kind", "sgmm2"))


def _occs_from_accs(path):
    from kaldi_tpu.io.model_io import load_sgmm2_accs
    return load_sgmm2_accs(path).state_occs()


def _pdf_posts(args, post_in):
    """Yield (utt, pdf-level posterior) joining posts with the GMM
    system's transition model."""
    from kaldi_tpu.cli import _post_to_pdf_post
    from kaldi_tpu.io.model_io import load_gmm_system
    from kaldi_tpu.hmm.posterior import read_post_ark
    tm = load_gmm_system(args.gmm_model).trans_model
    for utt, post in read_post_ark(post_in):
        yield utt, _post_to_pdf_post(post, tm)


# ----------------------------------------------------------- model tools

def cmd_sgmm2_init(args):
    """Initialize an SGMM from a (full-covariance) UBM; state count from
    the GMM system's tree (ref: sgmm2bin/sgmm2-init.cc — topology/tree/
    UBM in, flat SGMM out; --kind=sgmm writes the legacy-v1 tag)."""
    from kaldi_tpu.io.model_io import load_gmm_system, load_ubm
    from kaldi_tpu.gmm.full_gmm import FullGmm
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.sgmm.model import AmSgmm2
    from kaldi_tpu.steps.sgmm_steps import SgmmAm
    gmm = load_gmm_system(args.gmm_model)
    ubm = load_ubm(args.ubm)
    if isinstance(ubm, DiagGmm):
        ubm = FullGmm.from_diag(ubm.weights, ubm.means, ubm.vars)
    num_states = gmm.am.num_pdfs
    sgmm = AmSgmm2(ubm, num_states, args.phn_dim, spk_dim=args.spk_dim,
                   seed=args.seed)
    am = SgmmAm(sgmm, args.num_gselect)
    am.kind = args.kind
    _save(args.sgmm_out, am)
    print(f"sgmm2-init: {num_states} states, {sgmm.num_gauss} gauss, "
          f"phn-dim {args.phn_dim}, spk-dim {args.spk_dim}",
          file=sys.stderr)


def cmd_sgmm2_copy(args):
    """(ref: sgmm2bin/sgmm2-copy.cc)"""
    _save(args.model_out, _load(args.model))
    print("sgmm2-copy: done", file=sys.stderr)


def cmd_sgmm_write_ubm(args):
    """Extract the shared full-covariance UBM: means M_i's first column,
    weights from the first weight-projection column
    (ref: sgmmbin/sgmm-write-ubm.cc)."""
    from kaldi_tpu.io.model_io import save_ubm
    from kaldi_tpu.gmm.full_gmm import FullGmm
    s = _load(args.model).sgmm
    w = np.exp(s.w[:, 0] - np.logaddexp.reduce(s.w[:, 0]))
    ubm = FullGmm(w, s.M[:, :, 0], np.linalg.inv(s.Sigma_inv))
    save_ubm(args.ubm_out, ubm)
    print(f"sgmm-write-ubm: {s.num_gauss} gauss, dim {s.dim}",
          file=sys.stderr)


def cmd_sgmm_mixup(args):
    """Substate splitting and subspace-dimension surgery
    (ref: sgmmbin/sgmm-mixup.cc)."""
    am = _load(args.model)
    s = am.sgmm
    if args.increase_phn_dim:
        s.increase_phn_dim(args.increase_phn_dim, seed=args.seed)
    if args.increase_spk_dim:
        s.increase_spk_dim(args.increase_spk_dim, seed=args.seed)
    if args.remove_speaker_space:
        s.remove_speaker_space()
    if args.num_substates:
        occs = _occs_from_accs(args.read_occs) if args.read_occs else None
        s.split_substates(args.num_substates, perturb=args.perturb_factor,
                          state_occs=occs, seed=args.seed)
    _save(args.model_out, am)
    tot = sum(len(c) for c in s.c)
    print(f"sgmm-mixup: {tot} substates, phn-dim {s.phn_dim}, "
          f"spk-dim {s.spk_dim}", file=sys.stderr)


def cmd_sgmm_normalize(args):
    """Renormalize weights within subsets of UBM Gaussians (typically
    gender): subset masses sum to one per substate
    (ref: sgmmbin/sgmm-normalize.cc, am-sgmm.cc:782
    ComputeNormalizersNormalized)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    am = _load(args.model)
    I = am.sgmm.num_gauss
    set_ids = np.full(I, -1, np.int64)
    for n, (_name, idx) in enumerate(open_rspecifier(
            args.gaussians_rspecifier)):
        ii = np.asarray(idx, np.int64).reshape(-1)
        if np.any(set_ids[ii] >= 0):
            raise SystemExit("sgmm-normalize: sets are not disjoint")
        set_ids[ii] = n
    if np.any(set_ids < 0):
        raise SystemExit("sgmm-normalize: sets do not cover all Gaussians")
    am.sgmm.norm_set_ids = set_ids
    _save(args.model_out, am)
    print(f"sgmm-normalize: {set_ids.max() + 1} subsets over {I} "
          f"Gaussians", file=sys.stderr)


def cmd_sgmm_calc_distances(args):
    """Approximate inter-state KL divergence matrix
    (ref: sgmmbin/sgmm-calc-distances.cc)."""
    from kaldi_tpu.io.kaldi_io import write_ark
    from kaldi_tpu.sgmm.prexform import state_distances
    am = _load(args.model)
    d = state_distances(am.sgmm, _occs_from_accs(args.occs))
    write_ark(args.distances_out, {"distances": d.astype(np.float32)})
    print(f"sgmm-calc-distances: [{d.shape[0]} x {d.shape[1]}]",
          file=sys.stderr)


def cmd_sgmm_init_from_tree_stats(args):
    """New SGMM over a (re-built) tree, globals carried from an existing
    SGMM (ref: sgmmbin/sgmm-init-from-tree-stats.cc — states restart at
    v = e1 so the new model is the carried UBM tied across the new
    tree's leaves)."""
    from kaldi_tpu.io.model_io import load_tree
    from kaldi_tpu.sgmm.model import AmSgmm2
    from kaldi_tpu.steps.sgmm_steps import SgmmAm
    old = _load(args.old_sgmm)
    ctx = load_tree(args.tree)
    J = ctx.num_pdfs
    s = AmSgmm2.__new__(AmSgmm2)
    s.Sigma_inv = old.sgmm.Sigma_inv.copy()
    s.M = old.sgmm.M.copy()
    s.w = old.sgmm.w.copy()
    s.N = None if old.sgmm.N is None else old.sgmm.N.copy()
    S = s.M.shape[2]
    s.v = [[np.eye(S)[0].copy()] for _ in range(J)]
    s.c = [np.ones(1) for _ in range(J)]
    s._update_derived()
    am = SgmmAm(s, old.num_gselect)
    am.kind = getattr(old, "kind", "sgmm")
    _save(args.sgmm_out, am)
    print(f"sgmm-init-from-tree-stats: {J} states", file=sys.stderr)


def cmd_sgmm2_project(args):
    """Apply a (rectangular slice of a) full LDA-type transform to the
    model: Σ → TΣTᵀ, M → TM, N → TN; writes the projection used
    (ref: sgmm2bin/sgmm2-project.cc — the dim range selects rows of the
    full inverse-LDA matrix)."""
    from kaldi_tpu.io.kaldi_io import read_ark, write_ark
    am = _load(args.model)
    s = am.sgmm
    T_full = np.asarray(next(iter(read_ark(args.lda_mat)))[1], np.float64)
    end = args.end_dim if args.end_dim > 0 else T_full.shape[0]
    T = T_full[args.start_dim:end, :s.dim]
    Sigma = np.linalg.inv(s.Sigma_inv)
    s.Sigma_inv = np.linalg.inv(
        np.einsum("ab,ibc,dc->iad", T, Sigma, T))
    s.M = np.einsum("ab,ibs->ias", T, s.M)
    if s.N is not None:
        s.N = np.einsum("ab,ibt->iat", T, s.N)
    s._update_derived()
    _save(args.model_out, am)
    write_ark(args.proj_out, {"proj": T.astype(np.float32)})
    print(f"sgmm2-project: dims [{args.start_dim}, {end}) -> "
          f"feature dim {T.shape[0]}", file=sys.stderr)


# ----------------------------------------------------------- gpost tools

def cmd_sgmm2_post_to_gpost(args):
    """State posteriors -> Gaussian-level posteriors
    (ref: sgmm2bin/sgmm2-post-to-gpost.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.sgmm.gpost import compute_gpost, write_gpost_ark
    am = _load(args.model)
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    out = {}
    for utt, pdf_post in _pdf_posts(args, args.post_in):
        if utt not in feats:
            continue
        out[utt] = compute_gpost(am.sgmm,
                                 feats[utt].astype(np.float64),
                                 pdf_post, num_gselect=am.num_gselect)
    write_gpost_ark(args.gpost_out, out)
    print(f"sgmm2-post-to-gpost: {len(out)} utts", file=sys.stderr)


def cmd_sgmm2_acc_stats_gpost(args):
    """EM stats from precomputed Gaussian-level posteriors
    (ref: sgmm2bin/sgmm2-acc-stats-gpost.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import save_sgmm2_accs
    from kaldi_tpu.sgmm.estimate import Sgmm2Accs
    from kaldi_tpu.sgmm.gpost import read_gpost_ark
    am = _load(args.model)
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    accs = Sgmm2Accs(am.sgmm)
    n = 0
    for utt, gpost in read_gpost_ark(args.gpost_in):
        if utt not in feats:
            continue
        accs.accumulate_gpost(am.sgmm, feats[utt].astype(np.float64),
                              gpost)
        n += 1
    save_sgmm2_accs(args.accs_out, accs)
    print(f"sgmm2-acc-stats-gpost: {n} utts", file=sys.stderr)


def cmd_sgmm2_acc_stats2(args):
    """Numerator and denominator stats in one pass: positive posterior
    weights feed the num accs, negative weights (absolute value) the den
    accs (ref: sgmm2bin/sgmm2-acc-stats2.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import save_sgmm2_accs
    from kaldi_tpu.sgmm.estimate import Sgmm2Accs
    am = _load(args.model)
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    num = Sgmm2Accs(am.sgmm)
    den = Sgmm2Accs(am.sgmm)
    n = 0
    for utt, pdf_post in _pdf_posts(args, args.post_in):
        if utt not in feats:
            continue
        f = feats[utt].astype(np.float64)
        pos = [[(j, w) for (j, w) in fr if w > 0] for fr in pdf_post]
        neg = [[(j, -w) for (j, w) in fr if w < 0] for fr in pdf_post]
        num.accumulate(am.sgmm, f, pos, num_gselect=am.num_gselect)
        if any(neg):
            den.accumulate(am.sgmm, f, neg, num_gselect=am.num_gselect)
        n += 1
    save_sgmm2_accs(args.num_accs_out, num)
    save_sgmm2_accs(args.den_accs_out, den)
    print(f"sgmm2-acc-stats2: {n} utts", file=sys.stderr)


def cmd_sgmm_acc_stats_ali(args):
    """EM stats from a hard alignment (transition-ids)
    (ref: sgmmbin/sgmm-acc-stats-ali.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import load_gmm_system, save_sgmm2_accs
    from kaldi_tpu.sgmm.estimate import Sgmm2Accs
    am = _load(args.model)
    tm = load_gmm_system(args.gmm_model).trans_model
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    accs = Sgmm2Accs(am.sgmm)
    n = 0
    for utt, ali in open_rspecifier(args.ali_rspecifier):
        if utt not in feats:
            continue
        pdfs = tm.id2pdf_array[np.asarray(ali, np.int64)]
        post = [[(int(p), 1.0)] for p in pdfs]
        accs.accumulate(am.sgmm, feats[utt].astype(np.float64), post,
                        num_gselect=am.num_gselect)
        n += 1
    save_sgmm2_accs(args.accs_out, accs)
    print(f"sgmm-acc-stats-ali: {n} utts, avg loglike/frame "
          f"{accs.tot_like / max(accs.tot_frames, 1.0):.4f}",
          file=sys.stderr)


def cmd_sgmm_est_multi(args):
    """Update several SGMMs whose global parameters are tied: global
    stats (Y/Q/S) are pooled across models, per-state stats stay per
    model (ref: sgmmbin/sgmm-est-multi.cc)."""
    from kaldi_tpu.io.model_io import load_sgmm2_accs
    from kaldi_tpu.sgmm.estimate import update_sgmm2
    trip = args.models_accs_outs
    if len(trip) % 3 != 0:
        raise SystemExit("sgmm-est-multi: need model,accs,out triples")
    items = [(trip[i], trip[i + 1], trip[i + 2])
             for i in range(0, len(trip), 3)]
    loaded = [( _load(m), load_sgmm2_accs(a), o) for (m, a, o) in items]
    # pool the global stats
    Y = sum(a.Y for (_m, a, _o) in loaded)
    Q = sum(a.Q for (_m, a, _o) in loaded)
    S = sum(a.S_centered for (_m, a, _o) in loaded)
    for am, accs, out in loaded:
        accs.Y, accs.Q, accs.S_centered = Y, Q, S
        am.sgmm = update_sgmm2(am.sgmm, accs,
                               update_flags=args.update_flags)
        _save(out, am)
    # tie the updated globals: copy the first model's into the rest
    first = _load(loaded[0][2])
    for _am, _accs, out in loaded[1:]:
        am = _load(out)
        am.sgmm.M = first.sgmm.M.copy()
        am.sgmm.w = first.sgmm.w.copy()
        am.sgmm.Sigma_inv = first.sgmm.Sigma_inv.copy()
        am.sgmm._update_derived()
        _save(out, am)
    print(f"sgmm-est-multi: {len(loaded)} models", file=sys.stderr)


# ----------------------------------------------------------- fMLLR tools

def cmd_sgmm2_est_fmllr(args):
    """Per-speaker fMLLR transforms under the SGMM
    (ref: sgmm2bin/sgmm2-est-fmllr.cc, fmllr-sgmm2.h)."""
    from kaldi_tpu.cli import _read_utt2spk
    from kaldi_tpu.io.kaldi_io import open_rspecifier, open_wspecifier
    from kaldi_tpu.sgmm.fmllr import FmllrSgmm2Accs, estimate_sgmm2_fmllr
    am = _load(args.model)
    utt2spk = _read_utt2spk(args.utt2spk)
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    by_spk: dict = {}
    for utt, pdf_post in _pdf_posts(args, args.post_in):
        if utt not in feats:
            continue
        spk = utt2spk.get(utt, utt)
        st = by_spk.setdefault(spk, FmllrSgmm2Accs(am.sgmm))
        st.accumulate(am.sgmm, feats[utt].astype(np.float64), pdf_post,
                      num_gselect=am.num_gselect)
    n = 0
    with open_wspecifier(args.wspecifier) as out:
        for spk, st in sorted(by_spk.items()):
            W, impr = estimate_sgmm2_fmllr(st, am.sgmm,
                                           min_count=args.fmllr_min_count)
            out.write(spk, np.asarray(W, np.float32))
            print(f"sgmm2-est-fmllr: {spk} auxf impr/frame {impr:.4f} "
                  f"over {st.beta:.0f} frames", file=sys.stderr)
            n += 1
    print(f"sgmm2-est-fmllr: {n} speakers", file=sys.stderr)


def cmd_sgmm2_comp_prexform(args):
    """Compute the fMLLR pre-transform / inverse / mean scatter and
    store them with the model (ref: sgmm2bin/sgmm2-comp-prexform.cc)."""
    from kaldi_tpu.sgmm.prexform import compute_prexform
    am = _load(args.model)
    pre, inv, scat = compute_prexform(am.sgmm, _occs_from_accs(args.occs))
    am.pre_xform, am.inv_xform, am.mean_scatter = pre, inv, scat
    _save(args.model_out, am)
    print(f"sgmm2-comp-prexform: dim {pre.shape[0]}", file=sys.stderr)


def cmd_sgmm_acc_fmllrbasis_ali(args):
    """Per-speaker fMLLR stats for basis training, from alignments
    (ref: sgmmbin/sgmm-acc-fmllrbasis-ali.cc). Writes a pickle of
    per-speaker (beta, K, G) stats."""
    import pickle
    from kaldi_tpu.cli import _read_utt2spk
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import load_gmm_system
    from kaldi_tpu.sgmm.fmllr import FmllrSgmm2Accs
    am = _load(args.model)
    tm = load_gmm_system(args.gmm_model).trans_model
    utt2spk = _read_utt2spk(args.utt2spk)
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    by_spk: dict = {}
    for utt, ali in open_rspecifier(args.ali_rspecifier):
        if utt not in feats:
            continue
        pdfs = tm.id2pdf_array[np.asarray(ali, np.int64)]
        post = [[(int(p), 1.0)] for p in pdfs]
        spk = utt2spk.get(utt, utt)
        st = by_spk.setdefault(spk, FmllrSgmm2Accs(am.sgmm))
        st.accumulate(am.sgmm, feats[utt].astype(np.float64), post,
                      num_gselect=am.num_gselect)
    with open(args.stats_out, "wb") as f:
        pickle.dump({s: (st.beta, st.K, st.G)
                     for s, st in by_spk.items()}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    print(f"sgmm-acc-fmllrbasis-ali: {len(by_spk)} speakers",
          file=sys.stderr)


def cmd_sgmm_est_fmllrbasis(args):
    """Estimate the fMLLR basis from per-speaker stats and store it in
    the model (ref: sgmmbin/sgmm-est-fmllrbasis.cc)."""
    import pickle
    from kaldi_tpu.sgmm.fmllr import FmllrSgmm2Accs
    from kaldi_tpu.sgmm.prexform import estimate_fmllr_basis
    am = _load(args.model)
    spk_accs = []
    for p in args.stats_in:
        with open(p, "rb") as f:
            for _spk, (beta, K, G) in pickle.load(f).items():
                st = FmllrSgmm2Accs(am.sgmm)
                st.beta, st.K, st.G = beta, K, G
                spk_accs.append(st)
    basis = estimate_fmllr_basis(am.sgmm, spk_accs,
                                 num_bases=args.num_bases)
    am.fmllr_basis = basis
    _save(args.model_out, am)
    print(f"sgmm-est-fmllrbasis: {basis.shape[0]} bases from "
          f"{len(spk_accs)} speakers", file=sys.stderr)


# --------------------------------------------------------------- rescore

def cmd_sgmm2_rescore_lattice(args):
    """Replace lattice acoustic costs with SGMM likelihoods
    (ref: sgmm2bin/sgmm2-rescore-lattice.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import load_gmm_system
    from kaldi_tpu.lat.io import read_lattice_ark, write_lattice_ark
    from kaldi_tpu.lat.posteriors import rescore_lattice
    am = _load(args.model)
    tm = load_gmm_system(args.gmm_model).trans_model
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    out = {}
    for key, lat in read_lattice_ark(args.lattice_ark):
        if key not in feats:
            continue
        ll = am.loglikes_np(feats[key].astype(np.float32)[None])[0]
        out[key] = rescore_lattice(lat, ll.astype(np.float64), tm,
                                   acoustic_scale=args.acoustic_scale)
    write_lattice_ark(args.out_ark, out)
    print(f"sgmm2-rescore-lattice: {len(out)}", file=sys.stderr)


# ------------------------------------------------------------ registration

def register(sub):
    def add(name, func, *arg_specs):
        q = sub.add_parser(name)
        for (a_args, a_kw) in arg_specs:
            q.add_argument(*a_args, **a_kw)
        q.set_defaults(func=func)

    def a(*args, **kw):
        return (args, kw)

    add("sgmm2-init", cmd_sgmm2_init,
        a("gmm_model"), a("ubm"), a("sgmm_out"),
        a("--phn-dim", type=int, default=10),
        a("--spk-dim", type=int, default=0),
        a("--num-gselect", type=int, default=8),
        a("--seed", type=int, default=0),
        a("--kind", default="sgmm2", choices=["sgmm2", "sgmm"]))
    add("sgmm2-copy", cmd_sgmm2_copy, a("model"), a("model_out"))
    add("sgmm-write-ubm", cmd_sgmm_write_ubm, a("model"), a("ubm_out"))
    add("sgmm-mixup", cmd_sgmm_mixup,
        a("model"), a("model_out"),
        a("--num-substates", type=int, default=0),
        a("--read-occs", default=""),
        a("--increase-phn-dim", type=int, default=0),
        a("--increase-spk-dim", type=int, default=0),
        a("--remove-speaker-space", action="store_true"),
        a("--perturb-factor", type=float, default=0.01),
        a("--seed", type=int, default=0))
    add("sgmm-normalize", cmd_sgmm_normalize,
        a("model"), a("gaussians_rspecifier"), a("model_out"))
    add("sgmm-calc-distances", cmd_sgmm_calc_distances,
        a("model"), a("occs"), a("distances_out"))
    add("sgmm-init-from-tree-stats", cmd_sgmm_init_from_tree_stats,
        a("old_sgmm"), a("tree"), a("sgmm_out"))
    add("sgmm2-project", cmd_sgmm2_project,
        a("model"), a("lda_mat"), a("model_out"), a("proj_out"),
        a("--start-dim", type=int, default=0),
        a("--end-dim", type=int, default=-1))
    add("sgmm2-post-to-gpost", cmd_sgmm2_post_to_gpost,
        a("model"), a("gmm_model"), a("rspecifier"), a("post_in"),
        a("gpost_out"))
    add("sgmm2-acc-stats-gpost", cmd_sgmm2_acc_stats_gpost,
        a("model"), a("rspecifier"), a("gpost_in"), a("accs_out"))
    add("sgmm2-acc-stats2", cmd_sgmm2_acc_stats2,
        a("model"), a("gmm_model"), a("rspecifier"), a("post_in"),
        a("num_accs_out"), a("den_accs_out"))
    add("sgmm-acc-stats-ali", cmd_sgmm_acc_stats_ali,
        a("model"), a("gmm_model"), a("rspecifier"),
        a("ali_rspecifier"), a("accs_out"))
    add("sgmm-est-multi", cmd_sgmm_est_multi,
        a("models_accs_outs", nargs="+"),
        a("--update-flags", default="vMwSc"))
    add("sgmm2-est-fmllr", cmd_sgmm2_est_fmllr,
        a("model"), a("gmm_model"), a("rspecifier"), a("post_in"),
        a("wspecifier"),
        a("--utt2spk", default=""),
        a("--fmllr-min-count", type=float, default=100.0))
    add("sgmm2-comp-prexform", cmd_sgmm2_comp_prexform,
        a("model"), a("occs"), a("model_out"))
    add("sgmm-acc-fmllrbasis-ali", cmd_sgmm_acc_fmllrbasis_ali,
        a("model"), a("gmm_model"), a("rspecifier"),
        a("ali_rspecifier"), a("stats_out"),
        a("--utt2spk", default=""))
    add("sgmm-est-fmllrbasis", cmd_sgmm_est_fmllrbasis,
        a("model"), a("model_out"), a("stats_in", nargs="+"),
        a("--num-bases", type=int, default=50))
    add("sgmm2-rescore-lattice", cmd_sgmm2_rescore_lattice,
        a("model"), a("gmm_model"), a("lattice_ark"), a("rspecifier"),
        a("out_ark"),
        a("--acoustic-scale", type=float, default=0.1))
