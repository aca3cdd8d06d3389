"""Model file I/O: single-file save/load for trained systems.

(ref: the reference's 'everything is a file' contract — models are
 single-object Kaldi binary files written every iteration and read back by
 ReadKaldiObject (util/kaldi-io.h:234, SURVEY.md §5). Here: one .npz per
 model holding all arrays + a JSON header for structure; host-side graph
 objects (topology, tree) ride along pickled inside the npz, versioned.)
"""

from __future__ import annotations

import io
import json
import pickle

import numpy as np

FORMAT_VERSION = 1


def save_gmm_system(path: str, model) -> None:
    """Save a MonoModel-shaped system (am, trans_model, ctx_dep, lang)."""
    am = model.am
    blobs = {
        "__version__": np.int64(FORMAT_VERSION),
        "num_pdfs": np.int64(am.num_pdfs),
        "trans_log_probs": np.asarray(model.trans_model.log_probs),
    }
    for i, g in enumerate(am.pdfs):
        blobs[f"pdf{i}_weights"] = g.weights
        blobs[f"pdf{i}_means"] = g.means
        blobs[f"pdf{i}_vars"] = g.vars
    host = pickle.dumps({
        "topo": model.lang.topo,
        "ctx_dep": model.ctx_dep,
        "lang": model.lang,
    }, protocol=pickle.HIGHEST_PROTOCOL)
    blobs["__host__"] = np.frombuffer(host, dtype=np.uint8)
    # write through a file handle: np.savez(str) appends '.npz' when the
    # suffix is missing, which would break load(path-verbatim) round-trips
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_gmm_system(path: str):
    """-> MonoModel."""
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.am_gmm import AmDiagGmm
    from kaldi_tpu.hmm.transition_model import TransitionModel
    from kaldi_tpu.steps.mono import MonoModel

    z = np.load(path, allow_pickle=False)
    assert int(z["__version__"]) == FORMAT_VERSION
    host = pickle.loads(z["__host__"].tobytes())
    lang, ctx = host["lang"], host["ctx_dep"]
    pdfs = []
    for i in range(int(z["num_pdfs"])):
        pdfs.append(DiagGmm(z[f"pdf{i}_weights"], z[f"pdf{i}_means"],
                            z[f"pdf{i}_vars"]))
    am = AmDiagGmm(pdfs)
    tm = TransitionModel(lang.topo, lambda ph, pc: _pdfs_of(ctx, ph, pc))
    tm.load_log_probs(z["trans_log_probs"])
    return MonoModel(am, tm, ctx, lang)


def _pdfs_of(ctx, phone, pdf_class):
    """Rebuild the (phone, pdf_class)->pdfs mapping from the saved tree
    (the ContextDependency::GetPdfInfo role)."""
    from kaldi_tpu.tree.context_dep import MonophoneContextDependency
    if isinstance(ctx, MonophoneContextDependency):
        return ctx.compute([phone], pdf_class)
    from kaldi_tpu.tree.event_map import KPDF_CLASS
    return ctx.event_map.multi_map(
        {KPDF_CLASS: pdf_class, ctx.central_position: phone})


def save_hclg(path: str, packed) -> None:
    """Save a PackedGraph (the immutable decode graph artifact)."""
    with open(path, "wb") as f:  # no implicit '.npz' suffix (see above)
        np.savez(f,
                 __version__=np.int64(FORMAT_VERSION),
                 start=np.int64(packed.start),
                 arc_start=packed.arc_start, ilabel=packed.ilabel,
                 olabel=packed.olabel, cost=packed.cost,
                 nextstate=packed.nextstate,
                 pdf=(packed.pdf if packed.pdf is not None
                      else np.zeros(0, np.int32)),
                 final=packed.final)


def load_hclg(path: str):
    from kaldi_tpu.decoder.graph_pack import PackedGraph
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    pdf = z["pdf"] if z["pdf"].size else None
    return PackedGraph(start=int(z["start"]), arc_start=z["arc_start"],
                       ilabel=z["ilabel"], olabel=z["olabel"],
                       cost=z["cost"], nextstate=z["nextstate"],
                       pdf=pdf, final=z["final"])


def save_am_nnet(path: str, am) -> None:
    """Save an AmNnet (Tdnn + params + priors) as one npz
    (ref: nnet2/am-nnet.h Write — model + priors in one object)."""
    import dataclasses as _dc
    cfg = _dc.asdict(am.model.config)
    blobs = {
        "__version__": np.int64(FORMAT_VERSION),
        "__kind__": np.frombuffer(b"am_nnet2", dtype=np.uint8),
        "config_json": np.frombuffer(
            json.dumps(cfg).encode(), dtype=np.uint8),
        "priors": np.asarray(am.priors, np.float64),
        "final_w": np.asarray(am.params["final"]["w"]),
        "final_b": np.asarray(am.params["final"]["b"]),
        "n_layers": np.int64(len(am.params["layers"])),
    }
    if getattr(am, "group_ids", None) is not None:
        blobs["group_ids"] = np.asarray(am.group_ids, np.int32)
    if getattr(am, "lr_scales", None):
        blobs["lr_scales_json"] = np.frombuffer(
            json.dumps(am.lr_scales).encode(), dtype=np.uint8)
    if getattr(am, "meta", None):
        blobs["meta_json"] = np.frombuffer(
            json.dumps(am.meta).encode(), dtype=np.uint8)
    for i, layer in enumerate(am.params["layers"]):
        for k, v in layer.items():
            blobs[f"layer{i}.{k}"] = np.asarray(v)
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_am_nnet(path: str):
    """-> AmNnet."""
    from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
    from kaldi_tpu.nnet.am_nnet import AmNnet
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    cfg = json.loads(z["config_json"].tobytes().decode())
    cfg["splice_indexes"] = tuple(tuple(x) for x in cfg["splice_indexes"])
    model = Tdnn(TdnnConfig(**cfg))
    n = int(z["n_layers"])
    params = {
        "final": {"w": z["final_w"], "b": z["final_b"]},
        "layers": [
            {k.split(".", 1)[1]: z[k] for k in z.files
             if k.startswith(f"layer{i}.")}
            for i in range(n)
        ],
    }
    gid = z["group_ids"] if "group_ids" in z.files else None
    lr = (json.loads(z["lr_scales_json"].tobytes().decode())
          if "lr_scales_json" in z.files else None)
    am = AmNnet(model, params, z["priors"], group_ids=gid, lr_scales=lr)
    if "meta_json" in z.files:
        am.meta = json.loads(z["meta_json"].tobytes().decode())
    return am


def save_raw_nnet(path: str, model, params) -> None:
    """Save a raw nnet (Tdnn + params, no priors / transition info)
    (ref: nnet2bin/nnet-to-raw-nnet.cc — the 'raw' representation used
    for feature-transform stacks and layer transplants)."""
    import dataclasses as _dc
    blobs = {
        "__version__": np.int64(FORMAT_VERSION),
        "__kind__": np.frombuffer(b"raw_nnet2", dtype=np.uint8),
        "config_json": np.frombuffer(
            json.dumps(_dc.asdict(model.config)).encode(), dtype=np.uint8),
        "final_w": np.asarray(params["final"]["w"]),
        "final_b": np.asarray(params["final"]["b"]),
        "n_layers": np.int64(len(params["layers"])),
    }
    for i, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            blobs[f"layer{i}.{k}"] = np.asarray(v)
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_raw_nnet(path: str):
    """-> (Tdnn, params)."""
    from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    cfg = json.loads(z["config_json"].tobytes().decode())
    cfg["splice_indexes"] = tuple(tuple(x) for x in cfg["splice_indexes"])
    n = int(z["n_layers"])
    params = {
        "final": {"w": z["final_w"], "b": z["final_b"]},
        "layers": [
            {k.split(".", 1)[1]: z[k] for k in z.files
             if k.startswith(f"layer{i}.")}
            for i in range(n)
        ],
    }
    return Tdnn(TdnnConfig(**cfg)), params


def save_am_nnet3(path: str, am) -> None:
    """Save an AmNnet3 (config-defined net + params + priors): the nnet3
    write contract is the config text plus raw parameters
    (ref: nnet3/nnet-nnet.h Write — config lines + component params)."""
    blobs = {
        "__version__": np.int64(FORMAT_VERSION),
        "__kind__": np.frombuffer(b"am_nnet3", dtype=np.uint8),
        "config_text": np.frombuffer(
            am.model.config_text.encode(), dtype=np.uint8),
        "priors": np.asarray(am.priors, np.float64),
    }
    for comp, leaf in am.params.items():
        for k, v in leaf.items():
            blobs[f"param:{comp}:{k}"] = np.asarray(v)
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_am_nnet3(path: str):
    """-> AmNnet3."""
    from kaldi_tpu.nnet3.network import Nnet3
    from kaldi_tpu.nnet3.training import AmNnet3
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    net = Nnet3(z["config_text"].tobytes().decode())
    params: dict = {}
    for key in z.files:
        if key.startswith("param:"):
            _tag, comp, k = key.split(":", 2)
            params.setdefault(comp, {})[k] = z[key]
    return AmNnet3(net, params, z["priors"])


def save_ivector_extractor(path: str, ext) -> None:
    """Save an IvectorExtractor (UBM params + factor loading matrix)
    (ref: ivector/ivector-extractor.h IvectorExtractor::Write)."""
    with open(path, "wb") as f:
        np.savez(f,
                 __version__=np.int64(FORMAT_VERSION),
                 __kind__=np.frombuffer(b"ivector_extractor", np.uint8),
                 means=ext.means, inv_covars=ext.inv_covars,
                 weights=ext.weights, M=ext.M,
                 prior_offset=np.float64(ext.prior_offset))


def load_ivector_extractor(path: str):
    """-> IvectorExtractor."""
    from kaldi_tpu.ivector.extractor import IvectorExtractor
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    means = z["means"]
    I, D = means.shape
    # rebuild through a placeholder UBM, then overwrite the real params
    dummy = DiagGmm(np.full(I, 1.0 / I), means, np.ones((I, D)))
    ext = IvectorExtractor(dummy, ivector_dim=z["M"].shape[2],
                           prior_offset=float(z["prior_offset"]))
    ext.means = z["means"]
    ext.inv_covars = z["inv_covars"]
    ext.weights = z["weights"]
    ext.M = z["M"]
    return ext


def save_const_arpa(path: str, clm) -> None:
    """Save a built ConstArpaLm (the arpa-to-const-arpa artifact;
    ref: lm/const-arpa-lm.h ConstArpaLm::Write — packed arrays + the
    host-side history index rides pickled like the lang bundle)."""
    host = pickle.dumps({
        "_hist_index": clm._hist_index,
        "_ext_index": clm._ext_index,
        "_state_hist": clm._state_hist,
        "order": clm.order, "bos": clm.bos, "eos": clm.eos,
        "unk_cost": clm.unk_cost,
    }, protocol=pickle.HIGHEST_PROTOCOL)
    with open(path, "wb") as f:
        np.savez(f,
                 __version__=np.int64(FORMAT_VERSION),
                 __kind__=np.frombuffer(b"const_arpa", np.uint8),
                 backoff_cost=clm.backoff_cost,
                 backoff_state=clm.backoff_state,
                 row_lo=clm.row_lo, col_word=clm.col_word,
                 col_cost=clm.col_cost, col_next=clm.col_next,
                 __host__=np.frombuffer(host, dtype=np.uint8))


def load_const_arpa(path: str):
    """-> ConstArpaLm (without re-parsing/re-packing the ARPA)."""
    from kaldi_tpu.lm.const_arpa import ConstArpaLm
    z = np.load(path, allow_pickle=False)
    assert int(z["__version__"]) == FORMAT_VERSION
    host = pickle.loads(z["__host__"].tobytes())
    clm = ConstArpaLm.__new__(ConstArpaLm)
    for k, v in host.items():
        setattr(clm, k, v)
    for k in ("backoff_cost", "backoff_state", "row_lo", "col_word",
              "col_cost", "col_next"):
        setattr(clm, k, z[k])
    return clm


def save_ubm(path: str, ubm) -> None:
    """Save a DiagGmm or FullGmm UBM (ref: gmm-global-copy /
    fgmm-global-* single-object files)."""
    from kaldi_tpu.gmm.full_gmm import FullGmm
    blobs = {"__version__": np.int64(FORMAT_VERSION),
             "weights": np.asarray(ubm.weights),
             "means": np.asarray(ubm.means)}
    if isinstance(ubm, FullGmm):
        blobs["__kind__"] = np.frombuffer(b"full_ubm", np.uint8)
        blobs["covars"] = np.asarray(ubm.covars)
    else:
        blobs["__kind__"] = np.frombuffer(b"diag_ubm", np.uint8)
        blobs["vars"] = np.asarray(ubm.vars)
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_ubm(path: str):
    """-> DiagGmm or FullGmm."""
    from kaldi_tpu.gmm.diag_gmm import DiagGmm
    from kaldi_tpu.gmm.full_gmm import FullGmm
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    kind = z["__kind__"].tobytes()
    if kind == b"full_ubm":
        return FullGmm(z["weights"], z["means"], z["covars"])
    return DiagGmm(z["weights"], z["means"], z["vars"])


def save_plda(path: str, plda) -> None:
    """(ref: ivector/plda.h Plda::Write)"""
    with open(path, "wb") as f:
        np.savez(f,
                 __version__=np.int64(FORMAT_VERSION),
                 __kind__=np.frombuffer(b"plda", np.uint8),
                 mean=np.asarray(plda.mean),
                 transform=np.asarray(plda.transform),
                 psi=np.asarray(plda.psi))


def load_plda(path: str):
    from kaldi_tpu.ivector.plda import Plda
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    return Plda(mean=z["mean"], transform=z["transform"], psi=z["psi"])


def save_gmm_accs(path: str, acc, trans_counts=None) -> None:
    """Save AccumAmDiagGmm stats (+ optional transition counts) — the
    artifact gmm-acc-stats-ali writes and gmm-sum-accs/gmm-est read
    (ref: gmmbin/gmm-acc-stats-ali.cc writes {TransitionAccs, GmmAccs})."""
    blobs = {"__version__": np.int64(FORMAT_VERSION),
             "__kind__": np.frombuffer(b"gmm_accs", np.uint8),
             "num_pdfs": np.int64(len(acc.accs)),
             "tot_like": np.float64(acc.tot_like),
             "tot_frames": np.float64(acc.tot_frames)}
    for i, a in enumerate(acc.accs):
        blobs[f"acc{i}_occ"] = a.occ
        blobs[f"acc{i}_mean"] = a.mean_acc
        blobs[f"acc{i}_var"] = a.var_acc
    if trans_counts is not None:
        blobs["trans_counts"] = np.asarray(trans_counts, np.float64)
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_gmm_accs(path: str):
    """-> (AccumAmDiagGmm-shaped object, trans_counts or None)."""
    from kaldi_tpu.gmm.estimation import AccumAmDiagGmm, AccumDiagGmm
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    assert z["__kind__"].tobytes() == b"gmm_accs", "not a gmm accs file"
    acc = AccumAmDiagGmm.__new__(AccumAmDiagGmm)
    acc.accs = []
    for i in range(int(z["num_pdfs"])):
        occ = z[f"acc{i}_occ"]
        a = AccumDiagGmm(occ.shape[0], z[f"acc{i}_mean"].shape[1])
        a.occ, a.mean_acc, a.var_acc = occ, z[f"acc{i}_mean"], z[f"acc{i}_var"]
        acc.accs.append(a)
    acc.tot_like = float(z["tot_like"])
    acc.tot_frames = float(z["tot_frames"])
    tc = z["trans_counts"] if "trans_counts" in z.files else None
    return acc, tc


def save_tree_stats(path: str, stats: dict, context_width: int,
                    central_position: int) -> None:
    """Tree-accumulation stats: {event frozenset -> GaussStats} — the
    acc-tree-stats output build-tree consumes (ref: bin/acc-tree-stats.cc
    writes BuildTreeStatsType)."""
    import pickle
    payload = pickle.dumps({
        "N": int(context_width), "P": int(central_position),
        "stats": {ev: (st.count, st.x, st.x2, st.var_floor)
                  for ev, st in stats.items()},
    }, protocol=pickle.HIGHEST_PROTOCOL)
    blobs = {"__version__": np.int64(FORMAT_VERSION),
             "__kind__": np.frombuffer(b"tree_stats", np.uint8),
             "__host__": np.frombuffer(payload, np.uint8)}
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_tree_stats(path: str):
    """-> (stats dict, context_width, central_position)."""
    import pickle
    from kaldi_tpu.tree.clustering import GaussStats
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    assert z["__kind__"].tobytes() == b"tree_stats", "not a tree stats file"
    host = pickle.loads(z["__host__"].tobytes())
    stats = {ev: GaussStats(count=c, x=x, x2=x2, var_floor=vf)
             for ev, (c, x, x2, vf) in host["stats"].items()}
    return stats, host["N"], host["P"]


def save_tree(path: str, ctx) -> None:
    """Decision tree / context dependency (ref: the 'tree' file
    build-tree writes and gmm-init-model reads)."""
    import pickle
    payload = pickle.dumps(ctx, protocol=pickle.HIGHEST_PROTOCOL)
    blobs = {"__version__": np.int64(FORMAT_VERSION),
             "__kind__": np.frombuffer(b"tree", np.uint8),
             "__host__": np.frombuffer(payload, np.uint8)}
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_tree(path: str):
    import pickle
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    assert z["__kind__"].tobytes() == b"tree", "not a tree file"
    return pickle.loads(z["__host__"].tobytes())


#: optional SGMM sidecar arrays round-tripped verbatim when set on the
#: SgmmAm adapter (ref: Sgmm2FmllrGlobalParams riding in the model file,
#: sgmm2bin/sgmm2-comp-prexform.cc / sgmmbin/sgmm-est-fmllrbasis.cc)
_SGMM_EXTRAS = ("pre_xform", "inv_xform", "mean_scatter", "fmllr_basis")


def save_sgmm2(path: str, sgmm_am, kind: str = "sgmm2") -> None:
    """Save an SGMM acoustic model (SgmmAm adapter around AmSgmm2)
    (ref: sgmm2/am-sgmm2.h AmSgmm2::Write — global params Sigma_inv/M/w/N
    plus ragged per-state substate vectors v_j / weights c_j). kind
    'sgmm' tags the legacy-SGMM variant (same math: AmSgmm2 without the
    u_i speaker weights IS the v1 model, sgmm/am-sgmm.h)."""
    sgmm = sgmm_am.sgmm
    blobs = {
        "__version__": np.int64(FORMAT_VERSION),
        "__kind__": np.frombuffer(kind.encode(), dtype=np.uint8),
        "Sigma_inv": sgmm.Sigma_inv, "M": sgmm.M, "w": sgmm.w,
        "num_states": np.int64(sgmm.num_states),
        "num_gselect": np.int64(sgmm_am.num_gselect),
    }
    if sgmm.N is not None:
        blobs["N"] = sgmm.N
    if getattr(sgmm, "norm_set_ids", None) is not None:
        blobs["norm_set_ids"] = np.asarray(sgmm.norm_set_ids, np.int64)
    for name in _SGMM_EXTRAS:
        val = getattr(sgmm_am, name, None)
        if val is not None:
            blobs[f"__extra_{name}"] = np.asarray(val)
    for j in range(sgmm.num_states):
        blobs[f"v{j}"] = np.stack(sgmm.v[j])
        blobs[f"c{j}"] = np.asarray(sgmm.c[j])
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_sgmm2(path: str):
    """-> SgmmAm (decoder-facing adapter); accepts both the sgmm2 and
    the legacy sgmm kinds (adapter carries .kind)."""
    from kaldi_tpu.sgmm.model import AmSgmm2
    from kaldi_tpu.steps.sgmm_steps import SgmmAm
    z = np.load(path)
    assert int(z["__version__"]) == FORMAT_VERSION
    kind = z["__kind__"].tobytes().decode()
    assert kind in ("sgmm2", "sgmm"), "not an sgmm/sgmm2 file"
    sgmm = AmSgmm2.__new__(AmSgmm2)
    sgmm.Sigma_inv = z["Sigma_inv"]
    sgmm.M = z["M"]
    sgmm.w = z["w"]
    sgmm.N = z["N"] if "N" in z.files else None
    J = int(z["num_states"])
    sgmm.v = [[row for row in z[f"v{j}"]] for j in range(J)]
    sgmm.c = [z[f"c{j}"] for j in range(J)]
    if "norm_set_ids" in z.files:
        sgmm.norm_set_ids = z["norm_set_ids"]
    sgmm._update_derived()
    am = SgmmAm(sgmm, int(z["num_gselect"]))
    am.kind = kind
    for name in _SGMM_EXTRAS:
        if f"__extra_{name}" in z.files:
            setattr(am, name, z[f"__extra_{name}"])
    return am


def save_sgmm2_accs(path: str, accs) -> None:
    """Save Sgmm2Accs (ref: MleAmSgmm2Accs::Write — per-state ragged
    gamma/y plus global Y/Q/S stats)."""
    blobs = {
        "__version__": np.int64(FORMAT_VERSION),
        "__kind__": np.frombuffer(b"sgmm2_accs", dtype=np.uint8),
        "Y": accs.Y, "Q": accs.Q, "S_centered": accs.S_centered,
        "tot_like": np.float64(accs.tot_like),
        "tot_frames": np.float64(accs.tot_frames),
        "num_states": np.int64(len(accs.gamma)),
    }
    for j in range(len(accs.gamma)):
        blobs[f"gamma{j}"] = accs.gamma[j]
        blobs[f"y{j}"] = accs.y[j]
    with open(path, "wb") as f:
        np.savez(f, **blobs)


def load_sgmm2_accs(path: str):
    """-> an Sgmm2Accs-shaped object (no model needed: shapes ride in)."""
    from kaldi_tpu.sgmm.estimate import Sgmm2Accs
    z = np.load(path)
    assert z["__kind__"].tobytes() == b"sgmm2_accs", "not sgmm2 accs"
    accs = Sgmm2Accs.__new__(Sgmm2Accs)
    J = int(z["num_states"])
    accs.gamma = [z[f"gamma{j}"].copy() for j in range(J)]
    accs.y = [z[f"y{j}"].copy() for j in range(J)]
    accs.Y = z["Y"].copy()
    accs.Q = z["Q"].copy()
    accs.S_centered = z["S_centered"].copy()
    accs.tot_like = float(z["tot_like"])
    accs.tot_frames = float(z["tot_frames"])
    return accs
