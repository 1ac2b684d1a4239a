"""Utility + reporting components: progress bar (C35), uncert_for_corr
(C33), saliency rendering (C20), artifact round-trips (C31/C32)."""

import io
import os
import sys

import numpy as np

from supernet_tpu import reports
from supernet_tpu.utils import softplus_np, uncert_for_corr, update_progress


def test_update_progress_renders(capsys):
    update_progress(0.5)
    out = capsys.readouterr().out
    assert "Percent" in out and "50.00%" in out
    update_progress(1.5)
    assert "Done" in capsys.readouterr().out
    update_progress(-1.0)
    assert "Halt" in capsys.readouterr().out


def test_softplus_np_matches_definition():
    x = np.linspace(-20, 20, 41)
    np.testing.assert_allclose(softplus_np(x), np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0), rtol=1e-12)


def test_uncert_for_corr_per_structure():
    pred = np.zeros((2, 4, 4), np.int32)
    pred[0, :2, :2] = 1  # anterior region in image 0 only
    unc = np.ones((2, 4, 4), np.float32) * 2.0
    out = uncert_for_corr(unc, pred, dataset="hippocampus")
    assert set(out) == {"anterior", "posterior"}
    assert out["anterior"][0] == 2.0
    assert np.isnan(out["anterior"][1])  # structure absent -> NaN
    assert np.isnan(out["posterior"][0])


def test_saliency_maps_written(tmp_path):
    h = 8
    x = np.random.default_rng(0).normal(0, 1, (h, h, 4)).astype(np.float32)
    g = np.random.default_rng(1).normal(0, 1, (h, h, 4)).astype(np.float32)
    reports.save_saliency_maps(
        str(tmp_path), x, g, np.maximum(g, 0), index=7,
        mask=(x[..., 0] > 0).astype(np.float32),
    )
    assert os.path.exists(tmp_path / "7_saliency.png")


def test_uncertainty_artifact_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    probs = rng.random((3, 6, 6, 3)).astype(np.float32)
    sigma = rng.random((3, 6, 6, 3)).astype(np.float32)
    imgs = rng.random((3, 6, 6, 1)).astype(np.float32)
    labels = rng.integers(0, 3, (3, 6, 6)).astype(np.int32)
    p = reports.save_uncertainty_artifact(
        str(tmp_path), probs, sigma, imgs, labels, acc=0.5
    )
    payload = reports.load_uncertainty_artifact(p)
    assert len(payload) == 5 and payload[4] == 0.5
    np.testing.assert_array_equal(payload[0], probs)
    # offline re-render path (save_uncertainty, Hippocampus.py:1549-1568)
    out = reports.save_uncertainty_from_artifact(
        p, images_n=0, dataset="hippocampus"
    )
    assert "mean" in out and np.isfinite(out["mean"])
    assert os.path.exists(tmp_path / "Predictive_variance_tasks.txt")

def test_uncertainty_accumulator_streaming_equals_oneshot(tmp_path):
    """Feeding the accumulator batch-by-batch must reproduce the one-shot
    report byte-for-byte (VERDICT r3 #5: eval protocols stream with
    O(batch) host memory), with the render stash bounded by images_n."""
    rng = np.random.default_rng(3)
    n, h, c = 11, 6, 3
    probs = rng.random((n, h, h, c)).astype(np.float32)
    sigma = rng.random((n, h, h, c)).astype(np.float32)
    imgs = rng.random((n, h, h, 1)).astype(np.float32)
    labels = rng.integers(0, c, (n, h, h)).astype(np.int32)

    for dataset in ("hippocampus", "brats"):
        np.random.seed(0)  # sample_indices draws from global state
        one = str(tmp_path / f"one_{dataset}")
        ref = reports.save_uncertainty_report(
            one, imgs, imgs, probs, labels, sigma,
            images_n=3, adversarial=True, targeted=True, dataset=dataset,
        )
        np.random.seed(0)
        acc = reports.UncertaintyAccumulator(
            n, images_n=3, dataset=dataset, adversarial=True, targeted=True
        )
        for i in range(0, n, 4):  # uneven batches: 4, 4, 3
            acc.update(
                imgs[i:i + 4], probs[i:i + 4], labels[i:i + 4],
                sigma[i:i + 4], adv=imgs[i:i + 4], masked=labels[i:i + 4],
            )
        assert acc.n_stashed <= 3  # the ONLY per-sample memory held
        streamed = str(tmp_path / f"str_{dataset}")
        out = acc.finalize(streamed)
        assert out.keys() == ref.keys()
        for k in ref:
            np.testing.assert_allclose(out[k], ref[k], rtol=1e-12, err_msg=k)
        for d in (one, streamed):
            assert os.path.exists(os.path.join(d, "Predictive_variance_tasks.txt"))
        with open(os.path.join(one, "Predictive_variance_tasks.txt")) as f:
            a = f.read()
        with open(os.path.join(streamed, "Predictive_variance_tasks.txt")) as f:
            b = f.read()
        assert a == b
