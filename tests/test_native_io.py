"""Native C++ shard-streaming runtime vs the pure-Python fallback: identical
sample sets, correct shapes/dtypes, deterministic under a fixed seed."""

import numpy as np
import pytest

from supernet_tpu.data import ShardDataset, write_shards
from supernet_tpu.native import native_available


def _make_shards(tmp_path, n=37, h=8, c=2, shard_size=10, n_classes=3):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (n, h, h, c)).astype(np.float32)
    y = rng.integers(0, n_classes, (n, h, h)).astype(np.int32)
    write_shards(str(tmp_path), x, y, shard_size=shard_size)
    return x, y


def _collect(ds, batch_size, epoch=0):
    xs, ys = [], []
    for xb, yb in ds.batches(batch_size, epoch=epoch):
        assert xb.dtype == np.float32 and yb.dtype == np.int32
        assert len(xb) == batch_size and len(yb) == batch_size
        xs.append(xb)
        ys.append(yb)
    return np.concatenate(xs), np.concatenate(ys)


def test_python_fallback_covers_all_samples(tmp_path):
    x, y = _make_shards(tmp_path)
    ds = ShardDataset(str(tmp_path), use_native=False, seed=1)
    xb, yb = _collect(ds, 5)
    assert len(xb) == (37 // 5) * 5
    # every yielded sample is one of the originals (match by x payload)
    orig = {x[i].tobytes() for i in range(len(x))}
    got = {xb[i].tobytes() for i in range(len(xb))}
    assert got <= orig
    assert len(got) == len(xb)  # no duplicates


def test_shard_dir_name_containing_x_prefix(tmp_path):
    """y-paths are derived from the basename only — a directory whose own
    name contains 'x_' (e.g. .../x_set/) must still pair shards."""
    d = tmp_path / "x_set"
    x, y = _make_shards(d, n=12, shard_size=6)
    ds = ShardDataset(str(d), use_native=False, shuffle=False)
    assert len(ds) == 12
    xb, yb = _collect(ds, 6)
    np.testing.assert_array_equal(xb, x)
    np.testing.assert_array_equal(yb, y)


def test_batches_override_does_not_mutate(tmp_path):
    _make_shards(tmp_path, n=12, shard_size=6)
    ds = ShardDataset(str(tmp_path), use_native=False, shuffle=True, seed=5)
    list(ds.batches(4, shuffle=False, seed=9))
    assert ds.shuffle is True and ds.seed == 5


@pytest.mark.skipif(not native_available(), reason="g++/native lib missing")
def test_native_loader_matches_python_sample_set(tmp_path):
    x, y = _make_shards(tmp_path, n=40, shard_size=8)
    nat = ShardDataset(str(tmp_path), use_native=True, seed=3)
    pyd = ShardDataset(str(tmp_path), use_native=False, seed=3)
    xn, yn = _collect(nat, 8)
    xp, yp = _collect(pyd, 8)
    assert xn.shape == xp.shape == (40, 8, 8, 2)
    # same multiset of samples regardless of shuffle order
    sn = sorted(xn[i].tobytes() for i in range(len(xn)))
    sp = sorted(xp[i].tobytes() for i in range(len(xp)))
    assert sn == sp
    # label rows travel with their images
    pairs_orig = {(x[i].tobytes(), y[i].tobytes()) for i in range(len(x))}
    for i in range(len(xn)):
        assert (xn[i].tobytes(), yn[i].tobytes()) in pairs_orig


@pytest.mark.skipif(not native_available(), reason="g++/native lib missing")
def test_native_no_shuffle_preserves_order(tmp_path):
    x, y = _make_shards(tmp_path, n=20, shard_size=7)
    ds = ShardDataset(str(tmp_path), shuffle=False, use_native=True)
    xb, yb = _collect(ds, 4)
    np.testing.assert_array_equal(xb, x[: len(xb)])
    np.testing.assert_array_equal(yb, y[: len(yb)])


@pytest.mark.skipif(not native_available(), reason="g++/native lib missing")
def test_native_multiple_epochs(tmp_path):
    _make_shards(tmp_path, n=16, shard_size=16)
    ds = ShardDataset(str(tmp_path), use_native=True, seed=0)
    a = _collect(ds, 4, epoch=0)
    b = _collect(ds, 4, epoch=1)
    assert a[0].shape == b[0].shape == (16, 8, 8, 2)


def test_write_shards_onehot_label_resolution(tmp_path):
    """4-D labels: one-hot (any dtype, incl. integer) are argmax'd to class
    ids; volumetric=True passes cube labels [N, S, S, S] through unchanged."""
    x2 = np.zeros((4, 8, 8, 1), np.float32)
    onehot_int = np.eye(3, dtype=np.uint8)[
        np.random.default_rng(1).integers(0, 3, (4, 8, 8))
    ]
    from supernet_tpu.data.shards import write_shards

    write_shards(str(tmp_path / "a"), x2, onehot_int)
    y = np.load(str(tmp_path / "a" / "y_00000.npy"))
    assert y.shape == (4, 8, 8) and y.dtype == np.int32
    np.testing.assert_array_equal(y, np.argmax(onehot_int, axis=-1))

    x3 = np.zeros((2, 6, 6, 6, 1), np.float32)
    cubes = np.random.default_rng(2).integers(0, 3, (2, 6, 6, 6))
    write_shards(str(tmp_path / "b"), x3, cubes, volumetric=True)
    y3 = np.load(str(tmp_path / "b" / "y_00000.npy"))
    assert y3.shape == (2, 6, 6, 6)
    np.testing.assert_array_equal(y3, cubes)
