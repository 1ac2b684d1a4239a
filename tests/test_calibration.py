"""Uncertainty-quality analysis (`calibration.py`, net-new — runs the
correlation study the reference's unused `uncert_for_corr`
(`Brats_functions.py:154-174`) was written for, plus AUSE and ECE):
closed-form checks on synthetic data with KNOWN calibration, then an e2e
run through the model + CLI."""

import json
import os
import pickle

import numpy as np
import pytest

from supernet_tpu.calibration import (
    analyze,
    ause,
    expected_calibration_error,
    run_calibration,
    sparsification_curve,
)


def test_sparsification_perfect_ranking_has_zero_ause():
    """Uncertainty == error -> curve equals oracle -> AUSE 0."""
    rng = np.random.default_rng(0)
    errors = (rng.uniform(size=4000) < 0.3).astype(np.float64)
    np.testing.assert_allclose(ause(errors, errors.copy()), 0.0, atol=1e-12)


def test_sparsification_anticorrelated_worse_than_random():
    """Anti-correlated uncertainty (confident exactly on the wrong pixels)
    must score worse than an uninformative constant uncertainty."""
    rng = np.random.default_rng(1)
    errors = (rng.uniform(size=4000) < 0.3).astype(np.float64)
    bad = 1.0 - errors  # removes CORRECT pixels first
    flat = np.zeros_like(errors)  # uninformative (stable sort keeps order)
    assert ause(errors, bad) > ause(errors, flat) > 0.0


def test_sparsification_curve_monotone_for_perfect():
    errors = np.array([0, 0, 0, 0, 1, 1], np.float64)
    fracs, curve, oracle = sparsification_curve(errors, errors.copy(), 7)
    np.testing.assert_allclose(curve, oracle)
    assert curve[0] == pytest.approx(2 / 6)
    assert curve[-1] == 0.0  # the two errors removed first


def test_ece_perfectly_calibrated_is_small():
    """Pixels correct with probability == confidence -> ECE ~ 0."""
    rng = np.random.default_rng(2)
    conf = rng.uniform(0.5, 1.0, 200_000)
    correct = (rng.uniform(size=conf.size) < conf).astype(np.float64)
    ece, rel = expected_calibration_error(conf, correct, n_bins=10)
    assert ece < 0.01
    nz = rel["counts"] > 0
    np.testing.assert_allclose(
        rel["accuracy"][nz], rel["confidence"][nz], atol=0.02
    )


def test_ece_overconfident_known_value():
    """Constant confidence 0.9 with 60% accuracy -> ECE = 0.3 exactly."""
    n = 10_000
    conf = np.full(n, 0.9)
    correct = np.zeros(n)
    correct[: int(0.6 * n)] = 1.0
    ece, _ = expected_calibration_error(conf, correct, n_bins=10)
    assert ece == pytest.approx(0.3, abs=1e-9)


def test_analyze_prefers_informative_uncertainty():
    """A model whose sigma is high exactly on wrong pixels gets lower AUSE
    and positive uncertainty-error correlation vs a shuffled sigma."""
    rng = np.random.default_rng(3)
    n, h, c = 24, 10, 3
    labels = rng.integers(0, c, (n, h, h))
    pred = labels.copy()
    wrong = rng.uniform(size=(n, h, h)) < rng.uniform(0.05, 0.4, (n, 1, 1))
    pred[wrong] = (labels[wrong] + 1) % c
    probs = np.full((n, h, h, c), 0.05)
    np.put_along_axis(probs, pred[..., None], 0.9, axis=-1)
    sig_good = np.full((n, h, h, c), 0.01)
    sig_good[wrong] = 1.0  # variance at every class of the wrong pixels
    good = analyze(probs, sig_good, labels, "hippocampus")
    shuffled = sig_good.reshape(-1, c)[rng.permutation(n * h * h)].reshape(
        sig_good.shape
    )
    rand = analyze(probs, shuffled, labels, "hippocampus")
    assert good["ause"] < rand["ause"]
    assert good["corr_pearson"] > 0.9
    assert good["mean_uncertainty_incorrect"] > good[
        "mean_uncertainty_correct"
    ]
    # per-structure fields from the C33 correlation study are present
    assert "corr_pearson_anterior" in good
    assert np.isfinite(good["mean_uncertainty_anterior"])


def test_run_calibration_e2e_and_cli(tmp_path, capsys):
    """Tiny model + synthetic data through run_calibration and the CLI
    `calibrate` subcommand: scalars finite, artifact set written."""
    import dataclasses

    import jax

    from supernet_tpu import cli
    from supernet_tpu.checkpoint import save_params_npz
    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.models import init_params

    exp = dataclasses.replace(
        HIPPOCAMPUS,
        model=dataclasses.replace(
            HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
        ),
        train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=4),
    )
    x, y = synthetic_dataset(exp.model, 10, seed=0)
    ds = PickleDataset(x, y, 1)
    params = init_params(jax.random.PRNGKey(0), exp.model)

    out = str(tmp_path / "cal")
    res = run_calibration(exp, params, ds, out_dir=out)
    for k in ("ause", "ece", "pixel_error_rate", "corr_spearman"):
        assert isinstance(res[k], float)
    assert np.isfinite(res["ause"]) and np.isfinite(res["ece"])
    assert os.path.exists(os.path.join(out, "calibration.pkl"))
    assert os.path.exists(os.path.join(out, "Calibration_report.txt"))
    assert os.path.exists(os.path.join(out, "sparsification.png"))
    assert os.path.exists(os.path.join(out, "reliability_diagram.png"))
    with open(os.path.join(out, "calibration.pkl"), "rb") as f:
        blob = pickle.load(f)
    assert len(blob["sparsification_curve"]) == 20

    # CLI path from a saved .npz checkpoint (full-size hippocampus model;
    # the forward compile rides the persistent cache from the e2e tests)
    full_params = init_params(jax.random.PRNGKey(0), HIPPOCAMPUS.model)
    npz = str(tmp_path / "params.npz")
    save_params_npz(npz, full_params)
    rc = cli.main(
        [
            "calibrate",
            "--config", "hippocampus",
            "--synthetic", "8",
            "--checkpoint", npz,
            "--out-dir", str(tmp_path / "cal_cli"),
            "--bins", "10",
        ]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "ause" in line and "ece" in line


def test_mc_ensemble_eval_mode(tmp_path):
    """`mc_samples > 0` evaluates the Monte-Carlo weight-sampling baseline
    through the SAME testing/calibration protocol (the paper's comparison:
    propagation vs sampling), producing the full metric set."""
    import dataclasses

    import jax

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.evaluate import run_testing
    from supernet_tpu.models import init_params

    exp = dataclasses.replace(
        HIPPOCAMPUS,
        model=dataclasses.replace(
            HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
        ),
        train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=4),
    )
    x, y = synthetic_dataset(exp.model, 8, seed=0)
    ds = PickleDataset(x, y, 1)
    params = init_params(jax.random.PRNGKey(0), exp.model)

    res = run_testing(
        exp, params, ds, out_dir=str(tmp_path / "mc"), mc_samples=8
    )
    assert res["mc_samples"] == 8
    assert np.isfinite(res["accuracy"])
    assert np.isfinite(res["mean_predictive_variance"])
    assert os.path.exists(res["artifact"])

    cal = run_calibration(
        exp, params, ds, out_dir=str(tmp_path / "mc_cal"), mc_samples=8
    )
    assert cal["mc_samples"] == 8 and np.isfinite(cal["ause"])

    # deterministic: same seed -> same numbers
    res2 = run_testing(exp, params, ds, mc_samples=8)
    assert res2["accuracy"] == res["accuracy"]

    # mesh + MC is an explicit error, not silent single-device fallback
    from supernet_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="single-device"):
        run_testing(exp, params, ds, mesh=make_mesh(2), mc_samples=4)


def test_fit_variance_scale_recovers_known_misscale():
    """sigma fed at 1/4 of the true residual variance -> fitted scale ~4,
    and rescaling strictly improves the Gaussian NLL."""
    from supernet_tpu.calibration import fit_variance_scale, gaussian_nll

    rng = np.random.default_rng(0)
    n, h, w, c = 8, 12, 12, 3
    labels = rng.integers(0, c, (n, h, w))
    y = np.eye(c)[labels]
    true_sigma = 0.04
    # no clipping: the fit only sees residuals, and clipping the y=0
    # half-tails would shrink E[r^2] by exactly 1/2 for those entries
    probs = y + rng.normal(0, np.sqrt(true_sigma), y.shape)
    sigma = np.full(y.shape, true_sigma / 4.0)
    s = fit_variance_scale(labels, probs, sigma)
    assert 3.0 < s < 5.0
    before = gaussian_nll(labels, probs, sigma)
    after = gaussian_nll(labels, probs, sigma * s)
    assert after < before


def test_fit_temperature_recovers_overconfidence():
    """Labels drawn from softmax(z) but probabilities reported as
    softmax(2z) (over-confident by 2x in logit space): fitted T ~ 2 and
    temperature-scaled ECE improves."""
    from supernet_tpu.calibration import (
        apply_temperature,
        expected_calibration_error,
        fit_temperature,
    )

    rng = np.random.default_rng(1)
    n, c = 20000, 4
    z = rng.normal(0, 1.5, (n, c))

    def softmax(a):
        e = np.exp(a - a.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    p_true = softmax(z)
    labels = np.array([rng.choice(c, p=p) for p in p_true])
    probs = softmax(2.0 * z)  # over-confident model output
    t = fit_temperature(labels, probs)
    assert 1.5 < t < 2.6
    correct = (np.argmax(probs, -1) == labels).astype(np.float64)
    ece_before, _ = expected_calibration_error(probs.max(-1), correct)
    ece_after, _ = expected_calibration_error(
        apply_temperature(probs, t).max(-1), correct
    )
    assert ece_after < ece_before


def test_analyze_reports_posthoc_fits():
    from supernet_tpu.calibration import analyze

    rng = np.random.default_rng(2)
    n, h, w, c = 4, 10, 10, 3
    labels = rng.integers(0, c, (n, h, w))
    probs = rng.dirichlet(np.ones(c), (n, h, w))
    sigma = np.abs(rng.normal(0.01, 0.005, (n, h, w, c)))
    res = analyze(probs, sigma, labels, "hippocampus")
    assert res["fitted_variance_scale"] > 0
    assert res["fitted_temperature"] > 0
    assert res["gaussian_nll_rescaled"] <= res["gaussian_nll"] + 1e-9
    assert np.isfinite(res["ece_after_temperature"])
