import numpy as np
import pytest

from zigp_tpu.io import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_batcher_row_alignment_and_coverage():
    x = np.arange(42, dtype=np.float64).reshape(14, 3)
    y = np.arange(14, dtype=np.float64).reshape(14, 1) * 10
    ds = native.NativeDataSet(x, y, seed=3)
    seen = set()
    for _ in range(6):
        bx, by = ds.next_batch(5)
        assert bx.shape == (5, 3) and by.shape == (5, 1)
        for r in range(5):
            row = int(by[r, 0] // 10)
            np.testing.assert_array_equal(bx[r], x[row])
        seen.update((by[:, 0] // 10).astype(int).tolist())
    assert seen == set(range(14))  # 30 draws over 14 rows: full coverage
    assert ds.epochs_completed >= 2


def test_native_batcher_epoch_is_permutation():
    x = np.arange(10, dtype=np.float64).reshape(10, 1)
    ds = native.NativeDataSet(x, x, seed=0)
    bx, _ = ds.next_batch(10)
    assert sorted(bx[:, 0].tolist()) == list(range(10))


def test_native_block_matches_sequential():
    x = np.random.RandomState(0).rand(20, 3)
    y = np.random.RandomState(1).rand(20, 1)
    a = native.NativeDataSet(x, y, seed=7)
    b = native.NativeDataSet(x, y, seed=7)
    Xs, Ys = a.next_block(6, 4)
    for k in range(4):
        bx, by = b.next_batch(6)
        np.testing.assert_array_equal(Xs[k], bx)
        np.testing.assert_array_equal(Ys[k], by)


def test_make_dataset_fallback():
    x = np.random.rand(8, 2)
    y = np.random.rand(8, 1)
    ds = native.make_dataset(x, y, prefer_native=False)
    bx, by = ds.next_batch(4)
    assert bx.shape == (4, 2)
