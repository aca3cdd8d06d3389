"""train_lda_mllt: splice → LDA → tied-triphone GMM with iterative MLLT.

(ref: egs/wsj/s5/steps/train_lda_mllt.sh — splice ±3 raw MFCC, est-lda on
 alignment pdf classes, train triphones on the projected features,
 periodically est-mllt + gmm-transform-means + compose-transforms; the
 final feature transform is M_mllt · A_lda.)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np
import jax.numpy as jnp

from kaldi_tpu.steps.mono import MonoModel, _accumulate, _update
from kaldi_tpu.steps.deltas import (DeltasTrainOpts, build_triphone_tree,
                                    init_am_from_leaf_stats)
from kaldi_tpu.fst.graph import TrainingGraphCompiler
from kaldi_tpu.decoder.graph_pack import pack_graphs
from kaldi_tpu.decoder.viterbi import viterbi_align
from kaldi_tpu.transform.lda import LdaStats, estimate_lda
from kaldi_tpu.transform.mllt import MlltStats, update_mllt
from kaldi_tpu.transform.fmllr import apply_affine_transform
from kaldi_tpu.ops import splice_frames

log = logging.getLogger("kaldi_tpu.lda_mllt")


@dataclasses.dataclass
class LdaMlltTrainOpts(DeltasTrainOpts):
    splice_left: int = 3
    splice_right: int = 3
    lda_dim: int = 40
    mllt_iters: tuple = (2, 4, 6, 12)


def _align(lang, model: MonoModel, utts, acoustic_scale: float):
    compiler = TrainingGraphCompiler(lang, model.trans_model, model.ctx_dep)
    cache: dict = {}
    graphs = []
    for (_u, _f, words) in utts:
        key = tuple(words)
        if key not in cache:
            cache[key] = compiler.compile_transcript(list(words))
        graphs.append(cache[key])
    B = len(utts)
    T = max(f.shape[0] for (_u, f, _w) in utts)
    D = utts[0][1].shape[1]
    feats = np.zeros((B, T, D), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(utts):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    batch = pack_graphs(graphs, model.trans_model.id2pdf_array)
    ll = model.am.loglikes_np(feats)
    return viterbi_align(batch, ll, nf, acoustic_scale)


def accumulate_mllt_from_alignment(am, feats, pdf_ids, stats: MlltStats):
    """Per-frame aligned-pdf component posteriors → MLLT G stats."""
    from kaldi_tpu.gmm.estimation import _aligned_posteriors
    packed, seg = am.pack()
    post, _ll = _aligned_posteriors(
        jnp.asarray(feats, jnp.float32), jnp.asarray(pdf_ids),
        jnp.asarray(np.ones(len(feats), np.float32)),
        jnp.asarray(packed), jnp.asarray(seg))
    post = np.asarray(post, np.float64)
    means = np.concatenate([p.means for p in am.pdfs], axis=0)
    variances = np.concatenate([p.vars for p in am.pdfs], axis=0)
    stats.accumulate(np.asarray(feats, np.float64), means, variances, post)


@dataclasses.dataclass
class LdaMlltModel:
    model: MonoModel
    transform: np.ndarray      # [lda_dim, D_spliced + 1] — full feature map

    def transform_feats(self, raw_feats: np.ndarray,
                        opts: "LdaMlltTrainOpts") -> np.ndarray:
        spliced = np.asarray(splice_frames(jnp.asarray(raw_feats),
                                           opts.splice_left,
                                           opts.splice_right))
        return np.asarray(apply_affine_transform(spliced, self.transform),
                          np.float32)


def train_lda_mllt(
    lang,
    utts_align,     # [(utt, feats_for_ali_model, words)]
    utts_raw,       # [(utt, raw_feats, words)] same order
    ali_model: MonoModel,
    opts: LdaMlltTrainOpts = LdaMlltTrainOpts(),
) -> LdaMlltModel:
    # 1. alignments with the previous system
    align = _align(lang, ali_model, utts_align, opts.acoustic_scale)
    tid2pdf = ali_model.trans_model.id2pdf_array

    # 2. LDA on spliced raw features, classes = aligned pdf ids
    spliced = [np.asarray(splice_frames(jnp.asarray(f), opts.splice_left,
                                        opts.splice_right))
               for (_u, f, _w) in utts_raw]
    D_spl = spliced[0].shape[1]
    lda_stats = LdaStats(ali_model.am.num_pdfs, D_spl)
    for b, res in enumerate(align):
        if res is None:
            continue
        tids, _w, _c = res
        T = min(len(tids), spliced[b].shape[0])
        lda_stats.accumulate(spliced[b][:T], tid2pdf[tids[:T]])
    lda_dim = min(opts.lda_dim, D_spl)
    A, _evals = estimate_lda(lda_stats, lda_dim)          # [lda_dim, D+1]
    transform = np.asarray(A, np.float64)

    def project(b):
        return np.asarray(apply_affine_transform(spliced[b], transform),
                          np.float32)

    utts_t = [(u, project(b), w)
              for b, (u, _f, w) in enumerate(utts_raw)]

    # 3. tree on old-system alignments with projected-feature stats
    # (acc-tree-stats on the new feature space, train_lda_mllt.sh:~90)
    ctx, tm, leaf_stats = build_triphone_tree(
        lang, ali_model, utts_align, opts,
        stats_feats=[f for (_u, f, _w) in utts_t])
    am = init_am_from_leaf_stats(leaf_stats, lda_dim)
    model = MonoModel(am, tm, ctx, lang)

    # 4. EM with periodic MLLT
    compiler = TrainingGraphCompiler(lang, tm, ctx, opts.transition_scale,
                                     opts.self_loop_scale)
    cache: dict = {}
    graphs = []
    for (_u, _f, words) in utts_t:
        key = tuple(words)
        if key not in cache:
            cache[key] = compiler.compile_transcript(list(words))
        graphs.append(cache[key])
    B = len(utts_t)
    T = max(f.shape[0] for (_u, f, _w) in utts_t)
    feats = np.zeros((B, T, lda_dim), np.float32)
    nf = np.zeros(B, np.int32)
    for b, (_u, f, _w) in enumerate(utts_t):
        feats[b, : f.shape[0]] = f
        nf[b] = f.shape[0]
    batch = pack_graphs(graphs, tm.id2pdf_array)

    cur_align = None
    cur_gauss = am.total_gauss
    inc = max(0, (opts.totgauss - cur_gauss) // max(opts.max_iter_inc, 1))
    for it in range(1, opts.num_iters):
        if cur_align is None or it in opts.realign_iters:
            ll = model.am.loglikes_np(feats)
            cur_align = viterbi_align(batch, ll, nf, opts.acoustic_scale)
        if it in opts.mllt_iters:
            mllt_stats = MlltStats(lda_dim)
            for b, res in enumerate(cur_align):
                if res is None:
                    continue
                tids = res[0]
                accumulate_mllt_from_alignment(
                    model.am, feats[b, : nf[b]], tm.id2pdf_array[tids],
                    mllt_stats)
            M, impr = update_mllt(mllt_stats)
            log.info("MLLT iter %d: objf impr/frame %.4f", it,
                     impr / max(mllt_stats.beta, 1))
            # compose into the global transform; rotate feats & means
            transform = M @ transform
            feats = np.einsum("de,bte->btd", M, feats).astype(np.float32)
            for g in model.am.pdfs:
                g.means = g.means @ M.T
            model.am.invalidate()
        acc, tcounts, n_ok = _accumulate(model, feats, nf, cur_align)
        target = (min(opts.totgauss, cur_gauss + inc)
                  if it <= opts.max_iter_inc else None)
        _update(model, acc, tcounts, opts, target)
        cur_gauss = model.am.total_gauss
        if it % 5 == 0 or it == 1:
            log.info("lda_mllt iter %d: %d/%d aligned, ll/frame %.4f, "
                     "gauss %d", it, n_ok, B,
                     acc.tot_like / max(acc.tot_frames, 1), cur_gauss)
    return LdaMlltModel(model=model, transform=transform)


