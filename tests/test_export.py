"""AOT export (io.export): serialize a trained model's predict function to a
standalone StableHLO artifact and serve it without model code or checkpoint.

The reference's serving path rebuilds the full TF1 graph in-process and
Saver.restores it (onofftf/onoffpred.py:15-106); the exported artifact
replaces that entire dance."""

import numpy as np
import pytest

from zigp_tpu.experiments.builders import (
    binarize_targets,
    build_classifier_pptr,
    build_onoff_pptr,
    build_svgp_pptr,
)
from zigp_tpu.experiments.configs import (
    ClassifierPptrConfig,
    KronGridConfig,
    OnOffPptrConfig,
    SvgpPptrConfig,
)
from zigp_tpu.io.datasets import Split
from zigp_tpu.io.export import export_predictor, load_predictor


@pytest.fixture
def split(rng):
    def gen(N):
        X = rng.rand(N, 3)
        Y = np.maximum(np.sin(4 * X[:, 2:3]) * (rng.rand(N, 1) > 0.5), 0.0)
        return X, Y

    Xtr, Ytr = gen(150)
    Xte, Yte = gen(40)
    return Split(Xtr, Ytr, Xte, Yte)


def _grid():
    return KronGridConfig(num_spatial=3, num_temporal=6)


def test_export_svgp_roundtrip_symbolic_batch(split, tmp_path):
    model = build_svgp_pptr(SvgpPptrConfig(grid=_grid()), split)
    path = str(tmp_path / "svgp.zigp")
    export_predictor(model, "svgp", 3, path)

    served = load_predictor(path)
    assert served.meta["kind"] == "svgp"
    assert served.meta["batch_size"] is None
    assert served.meta["outputs"] == ["fmean", "fvar"]

    # symbolic batch: two different request sizes through one artifact
    for n in (7, 23):
        X = np.asarray(split.Xtest[:n])
        out = served(X)
        mean, var = model.predict_f(X)
        np.testing.assert_allclose(out["fmean"], np.asarray(mean), rtol=1e-10)
        np.testing.assert_allclose(out["fvar"], np.asarray(var), rtol=1e-10)


def test_export_hurdlej_roundtrip(split, tmp_path):
    from zigp_tpu.experiments.builders import build_hurdle_joint_pptr
    from zigp_tpu.experiments.configs import HurdleJointConfig

    model = build_hurdle_joint_pptr(HurdleJointConfig(grid=_grid()), split)
    path = str(tmp_path / "hurdlej.zigp")
    export_predictor(model, "hurdlej", 3, path)
    served = load_predictor(path)
    assert served.meta["outputs"] == sorted(
        ["p_on", "fmean", "fvar", "gmean", "gvar"]
    )

    X = np.asarray(split.Xtest[:13])
    out = served(X)
    ref = model.predict(X)._asdict()
    for k, v in ref.items():
        np.testing.assert_allclose(out[k], np.asarray(v), rtol=1e-8)


def test_export_onoff_full_prediction_tuple(split, tmp_path):
    model = build_onoff_pptr(OnOffPptrConfig(grid=_grid()), split)
    path = str(tmp_path / "onoff.zigp")
    export_predictor(model, "onoff", 3, path)
    served = load_predictor(path)

    X = np.asarray(split.Xtest[:11])
    out = served(X)
    ref = model.predict(X)._asdict()
    assert set(out) == set(ref)  # the reference build_predict 9-tuple
    for k in ref:
        np.testing.assert_allclose(out[k], np.asarray(ref[k]), rtol=1e-10)


def test_export_classifier_and_fixed_batch(split, tmp_path):
    clf_split = Split(
        split.Xtrain,
        binarize_targets(split.Ytrain),
        split.Xtest,
        binarize_targets(split.Ytest),
    )
    model = build_classifier_pptr(ClassifierPptrConfig(grid=_grid()), clf_split)
    path = str(tmp_path / "clf.zigp")
    export_predictor(model, "classifier", 3, path, batch_size=8)
    served = load_predictor(path)

    X = np.asarray(clf_split.Xtest[:8])
    out = served(X)
    np.testing.assert_allclose(
        out["p"], np.asarray(model.predict_prob(X)), rtol=1e-10
    )
    # a fixed-batch artifact rejects other request sizes with a clear error
    with pytest.raises(ValueError, match="fixed batch"):
        served(np.asarray(clf_split.Xtest[:5]))


def test_export_input_validation(split, tmp_path):
    model = build_svgp_pptr(SvgpPptrConfig(grid=_grid()), split)
    path = str(tmp_path / "svgp.zigp")
    export_predictor(model, "svgp", 3, path)
    served = load_predictor(path)
    with pytest.raises(ValueError, match="expected"):
        served(np.zeros((4, 2)))

    bad = tmp_path / "bad.zigp"
    bad.write_bytes(b"not an artifact\njunk")
    with pytest.raises(ValueError, match="not a zigp export artifact"):
        load_predictor(str(bad))

    with pytest.raises(ValueError, match="unknown export kind"):
        export_predictor(model, "nope", 3, str(tmp_path / "x.zigp"))
