"""End-to-end CLI tests on synthetic data shaped like pptr (in-process main()
with a temp data pickle — no TPU, tiny iteration counts)."""

import pickle

import numpy as np
import pytest

from zigp_tpu.experiments.cli import main


@pytest.fixture
def synth_pptr(tmp_path, rng):
    N, Nt = 300, 80
    def gen(n):
        X = np.stack([59.8 + 10 * rng.rand(n), 20 + 11 * rng.rand(n), 4368 + 1079 * rng.rand(n)], 1)
        Y = np.maximum(np.sin(X[:, 2:3] / 100) * (rng.rand(n, 1) > 0.6), 0.0)
        return X, Y
    Xtr, Ytr = gen(N)
    Xte, Yte = gen(Nt)
    p = tmp_path / "pptr.pickle"
    with open(p, "wb") as f:
        pickle.dump({"Xtrain": Xtr, "Ytrain": Ytr, "Xtest": Xte, "Ytest": Yte}, f)
    return str(p)


def test_cli_cvsplits(synth_pptr, tmp_path):
    rc = main(["cvsplits", "--data", synth_pptr, "--out", str(tmp_path / "cv")])
    assert rc == 0
    assert (tmp_path / "cv" / "5" / "data.pickle").exists()


def test_cli_onoff_then_classifier_then_downstream(synth_pptr, tmp_path):
    wd = str(tmp_path / "runs")
    assert main(["onoff", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "10", "--batch", "64"]) == 0
    assert (tmp_path / "runs" / "1" / "results_onoff.pickle").exists()

    assert main(["classifier", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "10", "--batch", "64"]) == 0
    assert main(["svgp", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "10", "--batch", "64"]) == 0
    assert main(["hurdle", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "10", "--batch", "32"]) == 0
    assert main(["zi", "--fold", "1", "--data", synth_pptr, "--workdir", wd]) == 0
    assert (tmp_path / "runs" / "1" / "results_zi.pickle").exists()


def test_cli_hurdle_joint_and_likelihood_flags(synth_pptr, tmp_path):
    wd = str(tmp_path / "runs")
    # jointly-trained hurdle: no classifier prerequisite
    assert main(["hurdle", "--joint", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "10", "--batch", "32",
                 "--likelihood", "gamma"]) == 0
    assert (tmp_path / "runs" / "1" / "results_hurdlej.pickle").exists()
    # two-stage hurdle with a positive-support amount head
    assert main(["classifier", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "10", "--batch", "64"]) == 0
    assert main(["hurdle", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "10", "--batch", "32",
                 "--likelihood", "lognormal"]) == 0


def test_cli_svgp_and_classifier_accept_natgrad(synth_pptr, tmp_path):
    """--optimizer natgrad must actually reach the svgp/classifier runs (their
    configs previously lacked the natgrad fields, so the flag was silently
    dropped by the hasattr gate in cli.main)."""
    from zigp_tpu.experiments.configs import ClassifierPptrConfig, SvgpPptrConfig

    for cfg_cls in (SvgpPptrConfig, ClassifierPptrConfig):
        assert cfg_cls().optimizer == "adam"
        assert hasattr(cfg_cls(), "natgrad_gamma")

    wd = str(tmp_path / "runs")
    assert main(["svgp", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "12", "--batch", "64",
                 "--optimizer", "natgrad", "--natgrad-gamma", "0.05",
                 "--whiten"]) == 0
    assert (tmp_path / "runs" / "1" / "results_svgp.pickle").exists()
    assert main(["classifier", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "12", "--batch", "64",
                 "--optimizer", "natgrad"]) == 0


def test_cli_cv_command(synth_pptr, tmp_path):
    wd = str(tmp_path / "cvrun")
    rc = main(["cv", "--models", "classifier,svgp,zi", "--data", synth_pptr,
               "--workdir", wd, "--iters", "10", "--batch", "64"])
    assert rc == 0
    assert (tmp_path / "cvrun" / "cv_summary.json").exists()


def test_cli_cv_preset_and_precision(synth_pptr, tmp_path):
    """`cv --preset best --solve-precision mixed` reaches the tuned configs
    and the global precision policy (previously only the per-fold commands
    exposed either, so the champion 5-fold protocol wasn't reproducible in
    one CLI invocation)."""
    from zigp_tpu.ops import linalg

    wd = str(tmp_path / "cvbest")
    try:
        rc = main(["cv", "--models", "onoff", "--data", synth_pptr,
                   "--workdir", wd, "--iters", "10", "--batch", "64",
                   "--preset", "best", "--solve-precision", "mixed"])
        assert rc == 0
        assert linalg._BULK_PRECISION != linalg._SOLVE_PRECISION  # mixed took
    finally:
        linalg.set_solve_precision("highest")
    assert (tmp_path / "cvbest" / "cv_summary.json").exists()
    # the best-preset onoff config (champion family) actually reached the run
    with open(tmp_path / "cvbest" / "1" / "results_onoff.pickle", "rb") as f:
        res = pickle.load(f)
    assert "test_rmse" in res


def test_cli_cv_kernel_flags(synth_pptr, tmp_path):
    """`cv --kernel-temporal/--kernel-period` reach every variant's configs
    (previously only the per-fold commands exposed the kernel zoo, so a
    zoo-kernel 5-fold protocol wasn't reproducible in one invocation)."""
    wd = str(tmp_path / "cvzoo")
    rc = main(["cv", "--models", "onoff,svgp", "--data", synth_pptr,
               "--workdir", wd, "--iters", "10", "--batch", "64",
               "--kernel-temporal", "periodic*rbf",
               "--kernel-period", "0.001"])
    assert rc == 0
    assert (tmp_path / "cvzoo" / "cv_summary.json").exists()
    # the periodic component actually reached the built kernels: the
    # end-of-run learned-hyperparameter summary names its period parameter
    log_text = (tmp_path / "cvzoo" / "modelsumm_cv.log").read_text()
    assert "period" in log_text


def test_cli_predict_roundtrip(synth_pptr, tmp_path):
    """`predict` restores the latest checkpoint written by a training run and
    writes predictions without training (reference onofftf/*pred.py flow)."""
    wd = str(tmp_path / "runs")
    assert main(["onoff", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "60", "--batch", "64"]) == 0
    assert main(["predict", "--model", "onoff", "--fold", "1",
                 "--data", synth_pptr, "--workdir", wd, "--batch", "64",
                 "--samples", "6"]) == 0
    ppath = tmp_path / "runs" / "1" / "predictions_onoff.pickle"
    assert ppath.exists()
    import numpy as np

    with open(ppath, "rb") as f:
        preds = pickle.load(f)
    s = preds["y_samples"]
    assert s.shape[0] == 6 and s.ndim == 3 and s.shape[2] == 1
    assert np.isfinite(s).all()

    # no checkpoint for svgp in this workdir -> clean error
    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["predict", "--model", "svgp", "--fold", "1",
              "--data", synth_pptr, "--workdir", wd, "--batch", "64"])


def test_cli_hyper_every_plumbing(synth_pptr, tmp_path):
    """--hyper-every reaches the per-fold and cv drivers; guard rails fire
    for the unsupported combinations."""
    wd = str(tmp_path / "alt")
    assert main(["onoff", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "40", "--batch", "32",
                 "--sampler", "device", "--hyper-every", "10",
                 "--scan-inner", "20", "--kern-lr", "0.02"]) == 0
    assert (tmp_path / "alt" / "1" / "results_onoff.pickle").exists()

    # alternating without the device sampler is a clear error
    with pytest.raises(SystemExit, match="sampler device"):
        main(["onoff", "--fold", "1", "--data", synth_pptr,
              "--workdir", wd, "--iters", "50", "--batch", "32",
              "--hyper-every", "10"])

    # the batched stack trainer runs the schedule too (vmapped members)
    assert main(["cv", "--models", "onoff", "--data", synth_pptr,
                 "--workdir", str(tmp_path / "cvalt"), "--iters", "50",
                 "--batch", "32", "--batched", "--hyper-every", "10"]) == 0
    assert (tmp_path / "cvalt" / "cv_summary.json").exists()


def test_cli_export_artifact(synth_pptr, tmp_path):
    """`export` writes a standalone serving artifact from the latest
    checkpoint; the artifact serves arbitrary batch sizes and matches the
    restored model's predictions."""
    import numpy as np

    from zigp_tpu.io.export import load_predictor

    wd = str(tmp_path / "runs")
    assert main(["onoff", "--fold", "1", "--data", synth_pptr,
                 "--workdir", wd, "--iters", "60", "--batch", "64"]) == 0
    assert main(["export", "--model", "onoff", "--fold", "1",
                 "--data", synth_pptr, "--workdir", wd]) == 0
    art = tmp_path / "runs" / "1" / "export_onoff.zigp"
    assert art.exists()

    served = load_predictor(str(art))
    with open(synth_pptr, "rb") as f:
        X = pickle.load(f)["Xtest"]
    out = served(np.asarray(X[:17]))
    assert set(out) >= {"gfmean", "gfvar", "pgmean"}
    assert all(np.isfinite(v).all() for v in out.values())

    # no checkpoint -> clean error
    with pytest.raises(SystemExit, match="no checkpoint"):
        main(["export", "--model", "svgp", "--fold", "1",
              "--data", synth_pptr, "--workdir", wd])
