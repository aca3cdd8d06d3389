"""Adaptation + decode-variant long-tail CLI subcommands.

Global-GMM fMLLR / LVTLN / MLLT, HLDA, fMLLR-basis accumulation,
regression-tree MLLR/fMLLR estimation and decoding, N-best decoding,
MAP-adapted decoding, and lattice-tracking decoding. Registered into
the main parser by kaldi_tpu.cli.main via register(sub).

(ref: gmmbin/*.cc, featbin/get-full-lda-mat.cc — cited per command.)
"""

from __future__ import annotations

import pickle
import sys

import numpy as np


def _ubm_diag(path):
    """load_ubm as a DiagGmm (full covariances diagonalized: the fMLLR /
    MLLT stats here are diagonal-model statistics)."""
    from kaldi_tpu.io.model_io import load_ubm
    from kaldi_tpu.gmm.full_gmm import FullGmm
    ubm = load_ubm(path)
    return ubm.to_diag() if isinstance(ubm, FullGmm) else ubm


def _by_spk_global_fmllr_stats(ubm, rspecifier, utt2spk_path):
    from kaldi_tpu.cli import _read_utt2spk
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.transform.fmllr import FmllrStats
    utt2spk = _read_utt2spk(utt2spk_path)
    by_spk: dict = {}
    for utt, feats in open_rspecifier(rspecifier):
        x = np.asarray(feats, np.float64)
        spk = utt2spk.get(utt, utt)
        st = by_spk.setdefault(spk, FmllrStats(x.shape[1]))
        post = np.asarray(ubm.posteriors(x.astype(np.float32)),
                          np.float64)
        st.accumulate(x, ubm.means, ubm.vars, post)
    return by_spk


def cmd_gmm_est_fmllr_global(args):
    """Per-speaker fMLLR against a single global GMM — posteriors come
    from the GMM itself, no alignment needed
    (ref: gmmbin/gmm-est-fmllr-global.cc)."""
    from kaldi_tpu.io.kaldi_io import open_wspecifier
    from kaldi_tpu.transform.fmllr import estimate_fmllr
    ubm = _ubm_diag(args.model)
    by_spk = _by_spk_global_fmllr_stats(ubm, args.rspecifier,
                                        args.utt2spk)
    n = 0
    with open_wspecifier(args.wspecifier) as out:
        for spk, st in sorted(by_spk.items()):
            W, impr, count = estimate_fmllr(st, min_count=args.min_count)
            out.write(spk, np.asarray(W, np.float32))
            print(f"gmm-est-fmllr-global: {spk} impr/frame "
                  f"{impr / max(count, 1.0):.4f}", file=sys.stderr)
            n += 1
    print(f"gmm-est-fmllr-global: {n} speakers", file=sys.stderr)


def cmd_gmm_global_est_lvtln_trans(args):
    """Per-speaker LVTLN class selection against a global GMM
    (ref: gmmbin/gmm-global-est-lvtln-trans.cc)."""
    from kaldi_tpu.cli import _load_lvtln
    from kaldi_tpu.io.kaldi_io import open_wspecifier
    ubm = _ubm_diag(args.model)
    lv = _load_lvtln(args.lvtln)
    by_spk = _by_spk_global_fmllr_stats(ubm, args.rspecifier,
                                        args.utt2spk)
    n = 0
    with open_wspecifier(args.wspecifier) as out:
        for spk, st in sorted(by_spk.items()):
            c, W, _auxfs = lv.select_class(st)
            out.write(spk, np.asarray(W, np.float32))
            print(f"gmm-global-est-lvtln-trans: {spk} class {c} warp "
                  f"{lv.warp_of(c)}", file=sys.stderr)
            n += 1
    print(f"gmm-global-est-lvtln-trans: {n} speakers", file=sys.stderr)


def cmd_gmm_acc_mllt_global(args):
    """Global-STC stats from a single GMM
    (ref: gmmbin/gmm-acc-mllt-global.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.transform.mllt import MlltStats
    ubm = _ubm_diag(args.model)
    stats = MlltStats(ubm.dim)
    n = 0
    for _utt, feats in open_rspecifier(args.rspecifier):
        x = np.asarray(feats, np.float64)
        post = np.asarray(ubm.posteriors(x.astype(np.float32)),
                          np.float64)
        stats.accumulate(x, ubm.means, ubm.vars, post)
        n += 1
    np.savez(open(args.accs_out, "wb"), G=stats.G,
             beta=np.float64(stats.beta))
    print(f"gmm-acc-mllt-global: {n} utts, beta {stats.beta:.0f}",
          file=sys.stderr)


def cmd_gmm_acc_hlda(args):
    """HLDA stats from alignments: class = aligned pdf
    (ref: gmmbin/gmm-acc-hlda.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import load_gmm_system
    from kaldi_tpu.transform.hlda import HldaStats
    model = load_gmm_system(args.model)
    tm = model.trans_model
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    stats = None
    n = 0
    for utt, ali in open_rspecifier(args.ali_rspecifier):
        if utt not in feats:
            continue
        x = np.asarray(feats[utt], np.float64)
        if stats is None:
            stats = HldaStats(x.shape[1])
        pdfs = tm.id2pdf_array[np.asarray(ali, np.int64)]
        T = min(len(pdfs), len(x))
        stats.accumulate(x[:T], pdfs[:T], model.am.num_pdfs)
        n += 1
    if stats is None:
        raise SystemExit("gmm-acc-hlda: no utterances")
    np.savez(open(args.accs_out, "wb"), beta=np.float64(stats.beta),
             mean_acc=stats.mean_acc, total_2nd=stats.total_2nd,
             class_beta=np.asarray(stats.class_beta),
             class_mean_acc=np.stack(stats.class_mean_acc))
    print(f"gmm-acc-hlda: {n} utts", file=sys.stderr)


def cmd_gmm_est_hlda(args):
    """HLDA transform from summed stats
    (ref: gmmbin/gmm-est-hlda.cc, transform/hlda.h)."""
    from kaldi_tpu.io.kaldi_io import write_ark
    from kaldi_tpu.transform.hlda import HldaStats, estimate_hlda
    stats = None
    for p in args.accs_in:
        z = np.load(p)
        if stats is None:
            stats = HldaStats(z["mean_acc"].shape[0])
        stats.beta += float(z["beta"])
        stats.mean_acc += z["mean_acc"]
        stats.total_2nd += z["total_2nd"]
        cb, cm = z["class_beta"], z["class_mean_acc"]
        while len(stats.class_beta) < len(cb):
            stats.class_beta.append(0.0)
            stats.class_mean_acc.append(np.zeros(stats.dim))
        for c in range(len(cb)):
            stats.class_beta[c] += cb[c]
            stats.class_mean_acc[c] += cm[c]
    A, impr = estimate_hlda(stats, args.keep_dims)
    write_ark(args.transform_out, {"hlda": np.asarray(A, np.float32)})
    print(f"gmm-est-hlda: [{A.shape[0]} x {A.shape[1]}], objf impr "
          f"{impr:.4f}/frame", file=sys.stderr)


def cmd_gmm_basis_fmllr_accs(args):
    """Per-speaker fMLLR gradient scatter for basis training
    (ref: gmmbin/gmm-basis-fmllr-accs.cc; the -gpost variant aliases
    here — posteriors arrive pre-computed either way)."""
    from kaldi_tpu.cli import _fmllr_stats_by_spk
    from kaldi_tpu.io.model_io import load_gmm_system
    from kaldi_tpu.transform.basis_fmllr import BasisFmllrAccus
    model = load_gmm_system(args.model)
    by_spk = _fmllr_stats_by_spk(model, args.rspecifier, args.post_in,
                                 args.utt2spk)
    accus = BasisFmllrAccus(model.am.dim)
    for _spk, st in sorted(by_spk.items()):
        accus.accumulate_from_speaker(st)
    np.savez(open(args.accs_out, "wb"), grad_scatter=accus.grad_scatter,
             H=accus.H, beta=np.float64(accus.beta),
             dim=np.int64(accus.dim))
    print(f"gmm-basis-fmllr-accs: {len(by_spk)} speakers",
          file=sys.stderr)


def cmd_get_full_lda_mat(args):
    """LDA+MLLT rows + the remaining rows of the full LDA matrix, plus
    the inverse (ref: featbin/get-full-lda-mat.cc)."""
    from kaldi_tpu.io.kaldi_io import read_ark, write_ark
    lda_mllt = np.asarray(next(iter(read_ark(args.lda_mllt)))[1],
                          np.float64)
    full = np.asarray(next(iter(read_ark(args.full_lda)))[1], np.float64)
    d = lda_mllt.shape[0]
    D = full.shape[0]
    # accept affine [d, D+1] LDA+MLLT rows: keep the linear part only
    lin = lda_mllt[:, :D]
    out = np.concatenate([lin, full[d:]], axis=0)
    write_ark(args.full_out, {"full_lda_mllt": out.astype(np.float32)})
    if args.inv_out:
        write_ark(args.inv_out,
                  {"inv": np.linalg.inv(out).astype(np.float32)})
    print(f"get-full-lda-mat: [{D} x {D}]", file=sys.stderr)


# -------------------------------------------------------- regtree tools

def _load_regtree(path):
    return pickle.loads(np.load(path)["__host__"].tobytes())


def cmd_gmm_est_regtree_mllr(args):
    """Per-speaker regression-tree MLLR mean transforms
    (ref: gmmbin/gmm-est-regtree-mllr.cc)."""
    from kaldi_tpu.cli import _read_utt2spk, _post_to_pdf_post
    from kaldi_tpu.io.kaldi_io import open_rspecifier, open_wspecifier
    from kaldi_tpu.io.model_io import load_gmm_system
    from kaldi_tpu.hmm.posterior import read_post_ark
    from kaldi_tpu.transform.regtree import (RegtreeMllrStats,
                                             estimate_regtree_mllr)
    model = load_gmm_system(args.model)
    tree = _load_regtree(args.regtree)
    utt2spk = _read_utt2spk(args.utt2spk)
    feats = {k: v for (k, v) in open_rspecifier(args.rspecifier)}
    by_spk: dict = {}
    D = model.am.dim
    for utt, post in read_post_ark(args.post_in):
        if utt not in feats:
            continue
        spk = utt2spk.get(utt, utt)
        acc = by_spk.setdefault(spk, RegtreeMllrStats(tree, D))
        acc.accumulate(model.am, np.asarray(feats[utt], np.float64),
                       _post_to_pdf_post(post, model.trans_model))
    n = 0
    with open_wspecifier(args.wspecifier) as out:
        for spk, acc in sorted(by_spk.items()):
            xf = estimate_regtree_mllr(acc, min_count=args.min_count)
            leaves = sorted({int(l) for l in tree.gauss2leaf})
            stack = np.concatenate(
                [xf[int(np.flatnonzero(tree.gauss2leaf == lf)[0])]
                 for lf in leaves], axis=0)
            out.write(spk, stack.astype(np.float32))
            n += 1
    print(f"gmm-est-regtree-mllr: {n} speakers", file=sys.stderr)


def cmd_gmm_est_regtree_fmllr_ali(args):
    """Regression-tree fMLLR from hard alignments
    (ref: gmmbin/gmm-est-regtree-fmllr-ali.cc): alignments -> posts,
    then the posterior-driven estimator."""
    import argparse as _ap
    import tempfile
    from kaldi_tpu.cli import cmd_gmm_est_regtree_fmllr
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.hmm.posterior import write_post_line
    with tempfile.NamedTemporaryFile("w", suffix=".post",
                                     delete=False) as f:
        for utt, ali in open_rspecifier(args.ali_rspecifier):
            write_post_line(f, utt, [[(int(t), 1.0)]
                                     for t in np.asarray(ali, np.int64)])
        post_path = f.name
    fwd = _ap.Namespace(model=args.model, regtree=args.regtree,
                        rspecifier=args.rspecifier, post_in=post_path,
                        wspecifier=args.wspecifier,
                        utt2spk=args.utt2spk, min_count=args.min_count)
    cmd_gmm_est_regtree_fmllr(fwd)


def _regtree_decode(args, mode: str, latgen: bool):
    """Shared regtree-adapted decode: per-speaker transforms produce
    adapted loglikes, then the standard latgen tail."""
    from kaldi_tpu.cli import (_read_utt2spk, _latgen_from_loglikes)
    from kaldi_tpu.io.kaldi_io import open_rspecifier, read_ark
    from kaldi_tpu.io.model_io import load_gmm_system, load_hclg
    from kaldi_tpu.transform.regtree import (
        unstack_transforms, regtree_fmllr_loglikes, apply_regtree_mllr)
    model = load_gmm_system(args.model)
    tree = _load_regtree(args.regtree)
    packed = load_hclg(args.graph)
    utt2spk = _read_utt2spk(args.utt2spk)
    trans = {k: np.asarray(v, np.float64)
             for (k, v) in read_ark(args.transforms)}
    items = list(open_rspecifier(args.rspecifier))
    D = model.am.dim
    B = len(items)
    T = max(f.shape[0] for (_k, f) in items)
    ll = np.full((B, T, model.am.num_pdfs), -1e10, np.float32)
    nf = np.zeros(B, np.int32)
    adapted_cache: dict = {}
    for b, (k, f) in enumerate(items):
        spk = utt2spk.get(k, k)
        nf[b] = f.shape[0]
        if spk not in trans:
            ll[b, : nf[b]] = model.am.loglikes_np(
                f.astype(np.float32)[None])[0]
            continue
        by_leaf = unstack_transforms(tree, trans[spk], D)
        if mode == "fmllr":
            ll[b, : nf[b]] = regtree_fmllr_loglikes(
                model.am, tree, by_leaf, f).astype(np.float32)
        else:
            am = adapted_cache.get(spk)
            if am is None:
                am = apply_regtree_mllr(model.am, tree, by_leaf)
                adapted_cache[spk] = am
            ll[b, : nf[b]] = am.loglikes_np(
                f.astype(np.float32)[None])[0]
    _latgen_from_loglikes(packed, [k for (k, _f) in items], ll, nf,
                          args, sym=model.lang.words.sym)


def cmd_gmm_decode_faster_regtree_fmllr(args):
    """(ref: gmmbin/gmm-decode-faster-regtree-fmllr.cc)"""
    _regtree_decode(args, "fmllr", latgen=False)


def cmd_gmm_decode_faster_regtree_mllr(args):
    """(ref: gmmbin/gmm-decode-faster-regtree-mllr.cc)"""
    _regtree_decode(args, "mllr", latgen=False)


def cmd_gmm_latgen_faster_regtree_fmllr(args):
    """(ref: gmmbin/gmm-latgen-faster-regtree-fmllr.cc)"""
    _regtree_decode(args, "fmllr", latgen=True)


# ------------------------------------------------------- decode variants

def cmd_gmm_decode_nbest(args):
    """N-best decoding: lattices -> top-N paths, keys '<utt>-<rank>'
    (ref: gmmbin/gmm-decode-nbest.cc)."""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import load_gmm_system, load_hclg
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.lat.generate import decode_to_lattices
    from kaldi_tpu.lat.functions import nbest as lat_nbest
    model = load_gmm_system(args.model)
    packed = load_hclg(args.graph)
    items = list(open_rspecifier(args.rspecifier))
    B = len(items)
    T = max(f.shape[0] for (_k, f) in items)
    D = items[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_k, f) in enumerate(items):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    ll = np.array(model.am.loglikes_np(feats), np.float32)
    for b in range(B):
        ll[b, nf[b]:] = -1e10
    dec = BeamSearchDecoder(packed, BeamSearchOpts(
        beam=args.beam, max_active=args.max_active,
        acoustic_scale=args.acoustic_scale))
    lats = decode_to_lattices(dec, ll, nf,
                              lattice_beam=args.lattice_beam)
    out = open(args.transcription_out, "w") if args.transcription_out \
        else sys.stdout
    for b, (k, _f) in enumerate(items):
        if lats[b] is None:
            continue
        for rank, (words, _tids, cost) in enumerate(
                lat_nbest(lats[b], args.n)):
            txt = " ".join(model.lang.words.sym(w) for w in words)
            out.write(f"{k}-{rank + 1} {txt}\n")
    if args.transcription_out:
        out.close()
    print(f"gmm-decode-nbest: {B} utts", file=sys.stderr)


def cmd_gmm_latgen_map(args):
    """Latgen with per-speaker MAP-adapted models from a gmm-adapt-map
    output directory (ref: gmmbin/gmm-latgen-map.cc)."""
    import os
    from kaldi_tpu.cli import _read_utt2spk, _latgen_from_loglikes
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import load_gmm_system, load_hclg
    model = load_gmm_system(args.model)
    packed = load_hclg(args.graph)
    utt2spk = _read_utt2spk(args.utt2spk)
    items = list(open_rspecifier(args.rspecifier))
    B = len(items)
    T = max(f.shape[0] for (_k, f) in items)
    ll = np.full((B, T, model.am.num_pdfs), -1e10, np.float32)
    nf = np.zeros(B, np.int32)
    cache: dict = {}
    for b, (k, f) in enumerate(items):
        spk = utt2spk.get(k, k)
        nf[b] = f.shape[0]
        m = cache.get(spk)
        if m is None:
            p = os.path.join(args.gmms_dir, f"{spk}.npz")
            m = load_gmm_system(p) if os.path.exists(p) else model
            cache[spk] = m
        ll[b, : nf[b]] = m.am.loglikes_np(f.astype(np.float32)[None])[0]
    _latgen_from_loglikes(packed, [k for (k, _f) in items], ll, nf,
                          args, sym=model.lang.words.sym)


def cmd_lattice_arcgraph(args):
    """Project lattices onto per-utterance arc graphs (tid acceptors,
    costs dropped) for tracking decodes (ref: latbin/lattice-arcgraph.cc
    — the reference tracks HCLG arc ids; the tid projection spans the
    same search space for the tracking pass)."""
    from kaldi_tpu.lat.io import read_lattice_ark
    from kaldi_tpu.fst.fst import Fst
    from kaldi_tpu.cli_fst import _write_fst_ark
    out = []
    for key, lat in read_lattice_ark(args.lattice_ark):
        f = Fst()
        for _ in range(lat.num_states):
            f.add_state()
        f.start = lat.start
        for s in range(lat.num_states):
            for a in lat.arcs[s]:
                f.add_arc(s, a.ilabel, a.olabel, 0.0, a.nextstate)
        for s, (_g, _ac) in lat.finals.items():
            f.set_final(s, 0.0)
        out.append((key, f))
    _write_fst_ark(args.arcs_out, out)
    print(f"lattice-arcgraph: {len(out)} graphs", file=sys.stderr)


def _latgen_tracking(args, ll_by_utt):
    """Tracking decode: per-utterance graphs from first-pass arc graphs
    (search restricted to the first pass's arcs, widened by the extra
    beam) (ref: gmmbin/gmm-latgen-tracking.cc,
    decoder/lattice-tracking-decoder.h)."""
    from kaldi_tpu.io.model_io import load_gmm_system
    from kaldi_tpu.cli_fst import _read_fst_ark, _strip_ark
    from kaldi_tpu.decoder.graph_pack import pack_graph
    from kaldi_tpu.decoder.beam_search import (BeamSearchDecoder,
                                               BeamSearchOpts)
    from kaldi_tpu.lat.generate import decode_to_lattices
    from kaldi_tpu.lat.io import write_lattice_ark
    from kaldi_tpu.lat.functions import lattice_best_path
    model = load_gmm_system(args.model)
    arcs = dict(_read_fst_ark(_strip_ark(args.arcs_rspecifier)))
    keys = [k for k in ll_by_utt if k in arcs]
    if not keys:
        raise SystemExit("latgen-tracking: no utterances joined")
    B = len(keys)
    opts = BeamSearchOpts(
        beam=args.beam + args.extra_beam, max_active=args.max_active,
        acoustic_scale=args.acoustic_scale)
    lats = []
    for k in keys:
        # per-utterance graph: the first pass's arc set IS the search
        # space, so each utterance decodes against its own packed graph
        packed = pack_graph(arcs[k], model.trans_model.id2pdf_array)
        x = ll_by_utt[k][None]
        nf1 = np.array([x.shape[1]], np.int32)
        dec = BeamSearchDecoder(packed, opts)
        lats.extend(decode_to_lattices(dec, x, nf1,
                                       lattice_beam=args.lattice_beam))
    if args.lattice_out:
        write_lattice_ark(args.lattice_out,
                          dict(zip(keys, lats)))
    out = open(args.transcription_out, "w") if args.transcription_out \
        else sys.stdout
    for k, lat in zip(keys, lats):
        if lat is None:
            out.write(f"{k}\n")
            continue
        res = lattice_best_path(lat)
        ws = res[0] if res else []
        out.write(f"{k} " + " ".join(
            model.lang.words.sym(w) for w in ws) + "\n")
    if args.transcription_out:
        out.close()
    print(f"latgen-tracking: {B} utts", file=sys.stderr)


def cmd_gmm_latgen_tracking(args):
    """(ref: gmmbin/gmm-latgen-tracking.cc)"""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    from kaldi_tpu.io.model_io import load_gmm_system
    model = load_gmm_system(args.model)
    ll = {}
    for utt, f in open_rspecifier(args.rspecifier):
        ll[utt] = model.am.loglikes_np(
            np.asarray(f, np.float32)[None])[0]
    _latgen_tracking(args, ll)


def cmd_latgen_tracking_mapped(args):
    """(ref: gmmbin/latgen-tracking-mapped.cc — loglikes in directly)"""
    from kaldi_tpu.io.kaldi_io import open_rspecifier
    ll = {utt: np.asarray(x, np.float32)
          for (utt, x) in open_rspecifier(args.rspecifier)}
    _latgen_tracking(args, ll)


# ------------------------------------------------------------ registration

def register(sub):
    def add(name, func, *arg_specs):
        q = sub.add_parser(name)
        for (a_args, a_kw) in arg_specs:
            q.add_argument(*a_args, **a_kw)
        q.set_defaults(func=func)

    def a(*args, **kw):
        return (args, kw)

    def decode_opts(*extra):
        return (a("--beam", type=float, default=16.0),
                a("--max-active", type=int, default=7000),
                a("--acoustic-scale", type=float, default=0.1),
                a("--lattice-beam", type=float, default=10.0),
                a("--determinize-lattice", action="store_true"),
                a("--lattice-out", default=""),
                a("--transcription-out", default=""), *extra)

    for name in ("gmm-est-fmllr-global", "gmm-global-est-fmllr"):
        add(name, cmd_gmm_est_fmllr_global,
            a("model"), a("rspecifier"), a("wspecifier"),
            a("--utt2spk", default=""),
            a("--min-count", type=float, default=100.0))
    add("gmm-global-est-lvtln-trans", cmd_gmm_global_est_lvtln_trans,
        a("model"), a("lvtln"), a("rspecifier"), a("wspecifier"),
        a("--utt2spk", default=""))
    add("gmm-acc-mllt-global", cmd_gmm_acc_mllt_global,
        a("model"), a("rspecifier"), a("accs_out"))
    add("gmm-acc-hlda", cmd_gmm_acc_hlda,
        a("model"), a("rspecifier"), a("ali_rspecifier"), a("accs_out"))
    add("gmm-est-hlda", cmd_gmm_est_hlda,
        a("transform_out"), a("accs_in", nargs="+"),
        a("--keep-dims", type=int, default=40))
    for name in ("gmm-basis-fmllr-accs", "gmm-basis-fmllr-accs-gpost"):
        add(name, cmd_gmm_basis_fmllr_accs,
            a("model"), a("rspecifier"), a("post_in"), a("accs_out"),
            a("--utt2spk", default=""))
    add("get-full-lda-mat", cmd_get_full_lda_mat,
        a("lda_mllt"), a("full_lda"), a("full_out"),
        a("inv_out", nargs="?", default=""))
    add("gmm-est-regtree-mllr", cmd_gmm_est_regtree_mllr,
        a("model"), a("regtree"), a("rspecifier"), a("post_in"),
        a("wspecifier"),
        a("--utt2spk", default=""),
        a("--min-count", type=float, default=200.0))
    add("gmm-est-regtree-fmllr-ali", cmd_gmm_est_regtree_fmllr_ali,
        a("model"), a("regtree"), a("rspecifier"), a("ali_rspecifier"),
        a("wspecifier"),
        a("--utt2spk", default=""),
        a("--min-count", type=float, default=200.0))
    for name, fn in (
            ("gmm-decode-faster-regtree-fmllr",
             cmd_gmm_decode_faster_regtree_fmllr),
            ("gmm-decode-faster-regtree-mllr",
             cmd_gmm_decode_faster_regtree_mllr),
            ("gmm-latgen-faster-regtree-fmllr",
             cmd_gmm_latgen_faster_regtree_fmllr)):
        add(name, fn,
            a("model"), a("regtree"), a("graph"), a("rspecifier"),
            a("transforms"),
            a("--utt2spk", default=""), *decode_opts())
    add("gmm-decode-nbest", cmd_gmm_decode_nbest,
        a("model"), a("graph"), a("rspecifier"),
        a("--n", type=int, default=10),
        a("--beam", type=float, default=16.0),
        a("--max-active", type=int, default=7000),
        a("--acoustic-scale", type=float, default=0.1),
        a("--lattice-beam", type=float, default=10.0),
        a("--transcription-out", default=""))
    add("gmm-latgen-map", cmd_gmm_latgen_map,
        a("model"), a("gmms_dir"), a("graph"), a("rspecifier"),
        a("--utt2spk", default=""), *decode_opts())
    add("lattice-arcgraph", cmd_lattice_arcgraph,
        a("lattice_ark"), a("arcs_out"))
    for name, fn in (("gmm-latgen-tracking", cmd_gmm_latgen_tracking),
                     ("latgen-tracking-mapped",
                      cmd_latgen_tracking_mapped)):
        add(name, fn,
            a("model"), a("rspecifier"), a("arcs_rspecifier"),
            a("--extra-beam", type=float, default=4.0),
            *decode_opts())
