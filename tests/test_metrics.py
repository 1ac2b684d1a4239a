"""Metric parity tests: our NumPy metrics vs direct transliterations of the
reference formulas (`Hippocampus_functions.py:183-309`,
`Brats_functions.py:372-484`) on random masks."""

import numpy as np
import pytest

from supernet_tpu import metrics as M

RNG = np.random.default_rng(1)


def _masks(b=4, h=12, w=12, p=0.3):
    t = (RNG.random((b, h, w)) < p).astype(np.float32)
    q = (RNG.random((b, h, w)) < p).astype(np.float32)
    return t, q


def test_dice_matches_reference_form():
    t, p = _masks()
    mean, per = M.dice(t, p)
    a = t.sum((1, 2))
    b = p.sum((1, 2))
    inter = (t * p).sum((1, 2))
    want = 2 * inter / (a + b)
    np.testing.assert_allclose(per, want, rtol=1e-6)
    assert abs(mean - np.ma.masked_invalid(want).mean()) < 1e-6


def test_dice_empty_masks_are_nan_and_dropped():
    t = np.zeros((3, 5, 5), np.float32)
    p = np.zeros((3, 5, 5), np.float32)
    t[0, 1, 1] = p[0, 1, 1] = 1.0  # image 0: perfect dice
    mean, per = M.dice(t, p)
    assert np.isnan(per[1]) and np.isnan(per[2])
    assert mean == pytest.approx(1.0)


def test_sensitivity_precision_specificity():
    t, p = _masks()
    tp = (t * p).sum((1, 2))
    np.testing.assert_allclose(
        M.sensitivity(t, p), np.mean(tp / t.sum((1, 2)))
    )
    np.testing.assert_allclose(M.precision(t, p), np.mean(tp / p.sum((1, 2))))
    tn = ((t == 0) & (p == 0)).sum((1, 2))
    neg = (t == 0).sum((1, 2))
    np.testing.assert_allclose(M.specificity(t, p), np.mean(tn / neg))


def test_rvd_os_us():
    t, p = _masks()
    a, b = t.sum((1, 2)), p.sum((1, 2))
    inter = (t * p).sum((1, 2))
    np.testing.assert_allclose(M.rvd(t, p), np.mean((b - a) / a), rtol=1e-6)
    over, under = M.os_and_us(t, p)
    union = a + b - inter
    np.testing.assert_allclose(over, np.mean((b - inter) / union), rtol=1e-6)
    np.testing.assert_allclose(
        under, np.mean((a - inter) / union), rtol=1e-6
    )


def test_c_score_sign():
    # c_score formula with sign flip when p < q (Hippocampus_functions.py:281)
    d = lambda p, q: 2 * p * (1 - q) / (p + (1 - q)) + 2 * (1 - p) * q / (
        (1 - p) + q
    )
    assert M.c_score(0.3, 0.1) == pytest.approx(d(0.3, 0.1))
    assert M.c_score(0.1, 0.3) == pytest.approx(-d(0.1, 0.3))


def test_hausdorff_row_vector_semantics():
    """The reference passes the [H, W] mask straight to directed_hausdorff,
    so points are rows; identical masks give 0, one moved row gives the
    euclidean distance between row vectors."""
    t = np.zeros((1, 4, 4), np.float32)
    p = np.zeros((1, 4, 4), np.float32)
    t[0, 1, 1] = 1.0
    p[0, 1, 1] = 1.0
    assert M.compute_H(t[0:1], p[0:1]) == 0.0
    p2 = np.zeros((1, 4, 4), np.float32)
    p2[0, 1, 2] = 1.0  # same row index, different column
    # t's row 1 = e1; its NEAREST p2 row is an all-zero row (distance 1),
    # not p2's e2 row (distance sqrt 2) — and symmetrically for p2's row 1.
    assert M.compute_H(t, p2) == pytest.approx(1.0)


def test_binarize_hippocampus():
    y = np.asarray([[[0, 1], [2, 1]]])
    np.testing.assert_array_equal(
        M.binarize(y, "anterior", "hippocampus"), [[[0, 1], [0, 1]]]
    )
    np.testing.assert_array_equal(
        M.binarize(y, "posterior", "hippocampus"), [[[0, 0], [1, 0]]]
    )


def test_binarize_brats():
    y = np.asarray([[[0, 1], [2, 4]]])
    np.testing.assert_array_equal(
        M.binarize(y, "tumor", "brats"), [[[0, 1], [1, 1]]]
    )
    np.testing.assert_array_equal(
        M.binarize(y, "core", "brats"), [[[0, 1], [0, 1]]]
    )
    np.testing.assert_array_equal(
        M.binarize(y, "enhancing", "brats"), [[[0, 0], [0, 1]]]
    )


def test_structure_metrics_nine_tuple():
    """The maskers return the full 9-tuple the reference callers unpack
    (`Hippocampus.py:968` — SURVEY §2.7.3)."""
    t, p = _masks()
    sm = M.mask_anterior((t > 0.5).astype(np.int32), (p > 0.5).astype(np.int32))
    assert len(sm) == 9
    assert 0.0 <= sm.dice <= 1.0 or np.isnan(sm.dice)


def test_uncertainty_at_prediction():
    sigma = RNG.random((2, 3, 3, 4)).astype(np.float32)
    pred = RNG.integers(0, 4, (2, 3, 3))
    got = M.uncertainty_at_prediction(sigma, pred)
    for b in range(2):
        for i in range(3):
            for j in range(3):
                assert got[b, i, j] == sigma[b, i, j, pred[b, i, j]]


def test_dice_jax_matches_numpy():
    import jax.numpy as jnp

    t, p = _masks()
    mean, per = M.dice(t, p)
    got = float(M.dice_jax(jnp.asarray(t), jnp.asarray(p)))
    # all masks non-empty with p=0.3 at 12x12 -> no invalid entries
    assert got == pytest.approx(mean, rel=1e-6)
