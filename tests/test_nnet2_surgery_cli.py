"""nnet2 model-surgery / compute CLI layer.

(ref: nnet2bin/{nnet-am-widen,nnet-am-shrink,nnet-am-mixup,
 nnet-am-limit-rank,nnet-am-fix,nnet-insert,nnet-replace-last-layers,
 nnet-to-raw-nnet,raw-nnet-*,nnet-compute,nnet-logprob,nnet-gradient,
 nnet-show-progress,nnet-limit-degradation,
 nnet-modify-learning-rates}.cc.)
"""

import jax
import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.io.kaldi_io import read_ark, write_ark
from kaldi_tpu.io.model_io import load_am_nnet, save_am_nnet
from kaldi_tpu.nnet.am_nnet import AmNnet
from kaldi_tpu.nnet.tdnn import Tdnn, TdnnConfig
from kaldi_tpu.steps.egs import dump_egs

D, P_PDFS, HID = 5, 7, 16


@pytest.fixture()
def setup(tmp_path):
    cfg = TdnnConfig(feat_dim=D, num_pdfs=P_PDFS, hidden_dim=HID,
                     splice_indexes=((-1, 0, 1), (0,)),
                     nonlinearity="relu")
    net = Tdnn(cfg)
    params = net.init(jax.random.PRNGKey(0))
    am = AmNnet(net, params)
    mdl = str(tmp_path / "am.npz")
    save_am_nnet(mdl, am)

    rng = np.random.RandomState(0)
    aligned = [(rng.randn(20, D).astype(np.float32),
                rng.randint(0, P_PDFS, 20)) for _ in range(6)]
    egs_dir = str(tmp_path / "egs")
    dump_egs(aligned, cfg.left_context, cfg.right_context, 5, egs_dir,
             num_archives=1)

    feats_ark = str(tmp_path / "feats.ark")
    write_ark(feats_ark, {f"u{i}": rng.randn(12, D).astype(np.float32)
                          for i in range(3)})
    return tmp_path, mdl, egs_dir, feats_ark, am


def _loglikes(mdl_path, feats):
    am = load_am_nnet(mdl_path)
    return np.asarray(am.loglikes(feats[None])[0])


def test_widen_preserves_function(setup):
    tmp, mdl, egs, feats_ark, am = setup
    out = str(tmp / "wide.npz")
    main(["nnet-am-widen", mdl, out, "--hidden-dim", "24"])
    x = np.random.RandomState(1).randn(10, D).astype(np.float32)
    np.testing.assert_allclose(_loglikes(mdl, x), _loglikes(out, x),
                               rtol=1e-4, atol=1e-4)
    assert load_am_nnet(out).model.config.hidden_dim == 24


def test_mixup_group_posteriors(setup):
    tmp, mdl, egs, feats_ark, am = setup
    out = str(tmp / "mix.npz")
    main(["nnet-am-mixup", mdl, out, "--num-mixtures", "21",
          "--perturb", "0.0"])
    mixed = load_am_nnet(out)
    assert mixed.num_pdfs == P_PDFS
    assert mixed.model.config.num_pdfs == 21
    x = np.random.RandomState(1).randn(10, D).astype(np.float32)
    # zero perturbation + uniform mass split => exact posterior identity
    np.testing.assert_allclose(_loglikes(mdl, x), _loglikes(out, x),
                               rtol=1e-4, atol=1e-4)
    # mixed-up model round-trips through training-side save too
    main(["nnet-am-copy", out, str(tmp / "mix2.npz")])
    assert load_am_nnet(str(tmp / "mix2.npz")).group_ids is not None


def test_limit_rank_full_rank_identity(setup):
    tmp, mdl, egs, feats_ark, am = setup
    out = str(tmp / "lr.npz")
    main(["nnet-am-limit-rank", mdl, out, "--rank", str(HID)])
    x = np.random.RandomState(2).randn(8, D).astype(np.float32)
    np.testing.assert_allclose(_loglikes(mdl, x), _loglikes(out, x),
                               rtol=1e-3, atol=1e-3)
    main(["nnet-am-limit-rank-final", mdl, str(tmp / "lrf.npz"),
          "--rank", "2"])
    w = np.asarray(load_am_nnet(str(tmp / "lrf.npz")).params["final"]["w"])
    assert np.linalg.matrix_rank(w, tol=1e-4) <= 2


def test_surgery_pipeline_runs(setup):
    tmp, mdl, egs, feats_ark, am = setup
    for cmd, out in (
            (["nnet-am-shrink", mdl, egs, "s.npz", "--num-steps", "5"],
             "s.npz"),
            (["nnet-am-fix", mdl, egs, "f.npz"], "f.npz"),
            (["nnet-am-rescale", mdl, egs, "r.npz",
              "--num-iters", "1"], "r.npz"),
            (["nnet-normalize-stddev", mdl, "n.npz"], "n.npz"),
            (["nnet-am-switch-preconditioning", mdl, "p.npz"], "p.npz"),
    ):
        cmd = [c if not c.endswith(".npz") or c == mdl
               else str(tmp / c) for c in cmd]
        main(cmd)
        assert load_am_nnet(str(tmp / out)) is not None
    assert load_am_nnet(str(tmp / "p.npz")).meta["precond"]["rank_in"] == 20


def test_raw_nnet_roundtrip_and_insert(setup, capsys):
    tmp, mdl, egs, feats_ark, am = setup
    raw = str(tmp / "raw.npz")
    main(["nnet-to-raw-nnet", mdl, raw])
    main(["raw-nnet-copy", raw, str(tmp / "raw2.npz")])
    capsys.readouterr()
    main(["raw-nnet-info", str(tmp / "raw2.npz")])
    info = capsys.readouterr().out
    assert f"input-dim {D}" in info and f"output-dim {P_PDFS}" in info

    # build a 1-hidden-layer raw net HID->HID to insert
    cfg_i = TdnnConfig(feat_dim=HID, num_pdfs=HID, hidden_dim=HID,
                       splice_indexes=((0,),), nonlinearity="relu")
    net_i = Tdnn(cfg_i)
    from kaldi_tpu.io.model_io import save_raw_nnet
    pi = net_i.init(jax.random.PRNGKey(3))
    save_raw_nnet(str(tmp / "ins.npz"), net_i, pi)
    main(["nnet-insert", mdl, str(tmp / "ins.npz"), str(tmp / "bigger.npz")])
    big = load_am_nnet(str(tmp / "bigger.npz"))
    assert len(big.params["layers"]) == 3
    x = np.random.RandomState(1).randn(9, D).astype(np.float32)
    assert np.asarray(big.loglikes(x[None])).shape[-1] == P_PDFS

    # replace-last-layers: swap the whole stack for the raw net
    main(["nnet-replace-last-layers", mdl, raw, str(tmp / "repl.npz"),
          "--remove-layers", "2"])
    repl = load_am_nnet(str(tmp / "repl.npz"))
    assert repl.model.config.num_pdfs == P_PDFS


def test_compute_and_logprob(setup, capsys):
    tmp, mdl, egs, feats_ark, am = setup
    main(["nnet-am-compute", mdl, f"ark:{feats_ark}",
          f"ark:{tmp / 'out.ark'}"])
    outs = dict(read_ark(str(tmp / "out.ark")))
    assert len(outs) == 3
    # log-posteriors: rows sum to 1 in prob domain
    np.testing.assert_allclose(np.exp(outs["u0"]).sum(-1), 1.0, atol=1e-3)
    main(["nnet-logprob2", mdl, f"ark:{feats_ark}",
          f"ark:{tmp / 'p.ark'}", f"ark:{tmp / 'll.ark'}"])
    probs = dict(read_ark(str(tmp / "p.ark")))
    lls = dict(read_ark(str(tmp / "ll.ark")))
    lp = np.log(np.maximum(probs["u1"], 1e-20))
    np.testing.assert_allclose(
        lls["u1"], lp - np.log(np.maximum(am.priors, 1e-20)),
        rtol=1e-3, atol=1e-3)
    capsys.readouterr()
    main(["nnet-compute-prob", mdl, egs])
    assert "log-prob-per-frame" in capsys.readouterr().out


def test_progress_gradient_degradation(setup, capsys):
    tmp, mdl, egs, feats_ark, am = setup
    # a perturbed 'new' model
    params2 = jax.tree_util.tree_map(
        lambda v: np.asarray(v) + 0.5 * np.random.RandomState(5)
        .randn(*np.shape(v)).astype(np.float32), am.params)
    save_am_nnet(str(tmp / "new.npz"), am.replace_params(params2))
    capsys.readouterr()
    main(["nnet-show-progress", mdl, str(tmp / "new.npz"), egs])
    out = capsys.readouterr().out
    assert "param-change" in out and "objf" in out

    main(["nnet-gradient", mdl, egs, str(tmp / "grad.npz")])
    g = load_am_nnet(str(tmp / "grad.npz"))
    assert float(np.abs(np.asarray(g.params["final"]["w"])).sum()) > 0

    main(["nnet-limit-degradation", mdl, str(tmp / "new.npz"), egs,
          str(tmp / "lim.npz"), "--max-degradation", "0.001"])
    from test_nnet2_surgery_cli import _loglikes as _ll  # self-import ok
    lim = load_am_nnet(str(tmp / "lim.npz"))
    # limited model must be at least as good as the raw perturbed one
    from kaldi_tpu.cli_nnet import _egs_objf, _read_egs
    e = _read_egs(egs)
    assert _egs_objf(lim, e)[0] >= _egs_objf(
        am.replace_params(params2), e)[0] - 1e-6

    main(["nnet-modify-learning-rates", mdl, str(tmp / "new.npz"),
          str(tmp / "mlr.npz")])
    mlr = load_am_nnet(str(tmp / "mlr.npz"))
    assert mlr.lr_scales and "final" in mlr.lr_scales


def test_egs_tools(setup):
    tmp, mdl, egs, feats_ark, am = setup
    from kaldi_tpu.cli_nnet import _read_egs
    import glob

    # utt-keyed egs for relabel
    rng = np.random.RandomState(3)
    aligned = [(rng.randn(20, D).astype(np.float32),
                rng.randint(0, P_PDFS, 20)) for _ in range(4)]
    cfg = am.model.config
    dump_egs(aligned, cfg.left_context, cfg.right_context, 5,
             str(tmp / "uegs"), num_archives=1,
             utt_names=[f"u{i}" for i in range(4)])

    main(["nnet-select-egs", str(tmp / "uegs"), str(tmp / "sel"),
          "--n", "2", "--k", "1"])
    n_all = len(_read_egs(str(tmp / "uegs"))["feats"])
    n_sel = len(_read_egs(str(tmp / "sel"))["feats"])
    assert n_sel == n_all // 2

    # relabel from a new alignment: all-zero pdfs
    with open(tmp / "newali.ark", "w") as f:
        pass
    write_ark(str(tmp / "newali.ark"),
              {f"u{i}": np.zeros(20, np.float32) for i in range(4)})
    main(["nnet-relabel-egs", f"ark:{tmp / 'newali.ark'}",
          str(tmp / "uegs"), str(tmp / "relab")])
    assert (_read_egs(str(tmp / "relab"))["targets"] == 0).all()

    # perturb: different feats, same targets
    write_ark(str(tmp / "chol.ark"),
              {"L": np.eye(D, dtype=np.float32)})
    main(["nnet-perturb-egs", str(tmp / "chol.ark"),
          str(tmp / "uegs"), str(tmp / "pert"),
          "--noise-factor", "0.5"])
    e0, e1 = _read_egs(str(tmp / "uegs")), _read_egs(str(tmp / "pert"))
    assert not np.allclose(e0["feats"], e1["feats"])
    assert (e0["targets"] == e1["targets"]).all()

    # weighted egs from posteriors
    from kaldi_tpu.hmm.posterior import write_post_line
    feats_d = {f"w{i}": np.random.RandomState(i).randn(10, D)
               .astype(np.float32) for i in range(2)}
    write_ark(str(tmp / "wfeats.ark"), feats_d)
    post = {u: [[(int(i % P_PDFS), 0.5)] for i in range(10)]
            for u in feats_d}
    with open(tmp / "post.ark", "w") as f:
        for u, p in post.items():
            write_post_line(f, u, p)
    write_ark(str(tmp / "fw.ark"),
              {u: np.full(10, 2.0, np.float32) for u in feats_d})
    main(["nnet-get-weighted-egs", f"ark:{tmp / 'wfeats.ark'}",
          str(tmp / "post.ark"), f"ark:{tmp / 'fw.ark'}",
          str(tmp / "wegs"), "--left-context", "1",
          "--right-context", "1", "--chunk", "5",
          "--num-archives", "1"])
    we = _read_egs(str(tmp / "wegs"))
    np.testing.assert_allclose(we["weights"], 1.0)  # 0.5 post * 2.0 frame
    assert glob.glob(str(tmp / "wegs" / "weights.*.ark"))


def test_feature_transform_and_perturbed_train(setup):
    tmp, mdl, egs, feats_ark, am = setup
    # LDA-acc npz in the est-lda format
    rng = np.random.RandomState(0)
    from kaldi_tpu.transform.lda import LdaStats
    stats = LdaStats(P_PDFS, D)
    for c in range(P_PDFS):
        x = rng.randn(30, D) + c
        stats.zero_acc[c] += 30
        stats.first_acc[c] += x.sum(0)
        stats.total_second += x.T @ x
    np.savez(tmp / "lda_acc.npz", zero_acc=stats.zero_acc,
             first_acc=stats.first_acc, total_second=stats.total_second)
    main(["nnet-get-feature-transform", str(tmp / "ft.ark"),
          str(tmp / "lda_acc.npz")])
    W = dict(read_ark(str(tmp / "ft.ark")))["transform"]
    assert W.shape == (D, D + 1)

    main(["nnet-train-simple-perturbed", mdl, egs,
          str(tmp / "tp.npz"), "--num-epochs", "2",
          "--minibatch-size", "8"])
    assert load_am_nnet(str(tmp / "tp.npz")) is not None

    main(["nnet-train-ensemble", egs, mdl, mdl,
          str(tmp / "e1.npz"), str(tmp / "e2.npz"),
          "--num-epochs", "2", "--minibatch-size", "8",
          "--seed", "5"])
    p1 = load_am_nnet(str(tmp / "e1.npz")).params["final"]["w"]
    p2 = load_am_nnet(str(tmp / "e2.npz")).params["final"]["w"]
    assert not np.allclose(p1, p2)  # distinct shuffles -> diverse members


def test_nnet1_to_raw(setup, tmp_path):
    tmp, mdl, egs, feats_ark, am = setup
    from kaldi_tpu.nnet1.nnet import Nnet1, parse_proto, save_nnet1
    proto = (f"<AffineTransform> <InputDim> {D} <OutputDim> 8\n"
             "<ReLU> <InputDim> 8 <OutputDim> 8\n"
             f"<AffineTransform> <InputDim> 8 <OutputDim> {P_PDFS}\n"
             f"<Softmax> <InputDim> {P_PDFS} <OutputDim> {P_PDFS}\n")
    net = Nnet1(parse_proto(proto))
    params = net.init(jax.random.PRNGKey(0))
    save_nnet1(str(tmp / "n1.npz"), net, params)
    main(["nnet1-to-raw-nnet", str(tmp / "n1.npz"), str(tmp / "r1.npz")])
    from kaldi_tpu.io.model_io import load_raw_nnet
    model, p = load_raw_nnet(str(tmp / "r1.npz"))
    assert model.config.feat_dim == D
    assert model.config.num_pdfs == P_PDFS
    assert len(p["layers"]) == 1
