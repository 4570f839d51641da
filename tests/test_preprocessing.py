import numpy as np

from zigp_tpu.io.datasets import Preprocessing, Split


def _split(rng):
    Xtr = np.stack([59 + 11 * rng.rand(50), 20 + 11 * rng.rand(50), 4000 + 1500 * rng.rand(50)], 1)
    Xte = np.stack([59 + 11 * rng.rand(20), 20 + 11 * rng.rand(20), 4000 + 1500 * rng.rand(20)], 1)
    return Split(Xtr, rng.rand(50, 1) * 3, Xte, rng.rand(20, 1) * 3)


def test_filter_time(rng):
    s = _split(rng)
    p = Preprocessing(s).filter_time(min_idx=4368, max_idx=5447)
    md = p.model_data
    assert np.all(md.Xtrain[:, 2] >= 4368) and np.all(md.Xtrain[:, 2] <= 5447)
    assert md.Xtrain.shape[0] == md.Ytrain.shape[0]


def test_scale_minmax_and_params(rng):
    s = _split(rng)
    p = Preprocessing(s).scale(scale_loc=True, scale_time=True)
    md = p.model_data
    allX = np.concatenate([md.Xtrain, md.Xtest])
    for c in range(3):
        assert allX[:, c].min() >= -1e-12 and allX[:, c].max() <= 1 + 1e-12
    assert set(p.scale_params.mins) == {"lat", "lon", "ndatehour"}


def test_kernel_params_heuristic(rng):
    s = _split(rng)
    p = Preprocessing(s).scale(scale_loc=True, scale_time=True)
    var, ells = p.kernel_params
    assert var == float(np.max(p.model_data.Ytrain))
    assert len(ells) == 3
    # lengthscale = round(3/range, 4) per scaled dim (utils_pptr.py:110-122)
    np.testing.assert_allclose(ells[0], round(3.0 / p.scale_params.ranges["lat"], 4))


def test_unscaled_defaults(rng):
    s = _split(rng)
    p = Preprocessing(s)
    var, ells = p.kernel_params
    assert ells == [3.0, 3.0, 3.0]


def test_profiling_smoke():
    import jax.numpy as jnp

    from zigp_tpu.utils.profiling import StepTimer, time_fn

    import jax

    f = jax.jit(lambda x: jnp.sum(x * 2))
    sec, out = time_fn(f, jnp.ones(16), iters=3)
    assert sec >= 0 and float(out) == 32.0
    t = StepTimer()
    t.tick(out)
    assert t.tick() >= 0
