"""Volumetric evaluation drivers (`evaluate3d.py`, net-new — the reference
evaluates 2-D slices only): the noise ``testing`` protocol, the adversarial
branch, and the calibration report on whole volumes; plus the 3-D
generalization of `perturb.apply_noise` (crop-frame clip range + SNR)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS, AttackConfig, NoiseConfig
from supernet_tpu.models import init_params3d
from supernet_tpu.ops.moments3d import crop_center3d

CFG = dataclasses.replace(
    HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2, depth=2
)


def _exp(**kw):
    return HIPPOCAMPUS.replace(
        model=CFG,
        train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=2),
        **kw,
    )


def _volumes(n=5, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.3, (n, 16, 16, 16, 1)).astype(np.float32)
    y = np.zeros((n, 16, 16, 16), np.int32)
    y[:, 5:11, 5:11, 5:11] = 1
    y[:, 7:9, 7:9, 7:9] = 2
    x[..., 0] += 0.5 * (y > 0)
    return x, y


@pytest.fixture(scope="module")
def params():
    return init_params3d(jax.random.PRNGKey(0), CFG)


def test_apply_noise_3d_crop_frame_semantics():
    """5-D input: the clip range is the min/max of the CENTER-CROPPED clean
    batch and the SNR compares the cropped frames — the per-axis analog of
    `Hippocampus.py:1270-1271,1302-1307`; region masks select labeled
    voxels only."""
    from supernet_tpu import perturb

    x, y = _volumes(2, seed=3)
    xb, yb = jnp.asarray(x), jnp.asarray(y)
    nc = NoiseConfig(kind="gaussian", std=5.0, region="A")
    noisy, snr = perturb.apply_noise(
        jax.random.PRNGKey(0), xb, yb, nc, "hippocampus", crop_size=10
    )
    noisy = np.asarray(noisy)
    # outside the anterior region (label == 1) voxels receive no noise —
    # but the final clip applies frame-wide (the reference clips the WHOLE
    # noisy frame to the cropped range, Hippocampus.py:1298), so clean
    # border voxels outside the cropped range saturate too
    x_crop = np.asarray(crop_center3d(xb, 10, 10, 10))
    mask = (y == 1)[..., None]
    np.testing.assert_array_equal(
        noisy[~mask], np.clip(x, x_crop.min(), x_crop.max())[~mask]
    )
    # clipped to the CROPPED clean range (std=5 guarantees saturation)
    assert noisy.max() <= x_crop.max() + 1e-6
    assert noisy.min() >= x_crop.min() - 1e-6
    # SNR on cropped frames, recomputed by hand
    n_crop = np.asarray(crop_center3d(jnp.asarray(noisy), 10, 10, 10))
    want = 10 * np.log10(
        np.sum(x_crop**2) / np.sum((x_crop - n_crop) ** 2)
    )
    assert float(snr) == pytest.approx(float(want), rel=1e-4)


def test_run_testing3d_clean_and_noise(tmp_path, params):
    """Clean + region-masked noise runs over a non-divisible volume count
    (5 % 2 != 0): the full metric surface, artifacts, and a finite SNR."""
    from supernet_tpu.evaluate3d import run_testing3d

    exp = _exp()
    x, y = _volumes(5)
    res = run_testing3d(
        exp, params, x, y, out_dir=str(tmp_path / "clean"), images_n=1
    )
    assert 0.0 <= res["accuracy"] <= 1.0
    assert res["snr_db"] == float("inf")
    for s in ("anterior", "posterior"):
        assert f"dice_{s}" in res and f"c_score_{s}" in res
    assert os.path.exists(
        os.path.join(res["out_dir"], "uncertainty_info.pkl")
    )
    assert os.path.exists(
        os.path.join(res["out_dir"], "Related_hyperparameters.txt")
    )
    # reference-format per-structure variance report, volumetric analog
    pv = os.path.join(res["out_dir"], "Predictive_variance_tasks.txt")
    assert os.path.exists(pv)
    with open(pv) as f:
        assert "anterior structures" in f.read()

    res_n = run_testing3d(
        exp, params, x, y,
        NoiseConfig(kind="gaussian", std=0.2, region="P"),
        out_dir=str(tmp_path / "noise"),
        images_n=0,
    )
    assert np.isfinite(res_n["snr_db"])
    assert res_n["mean_predictive_variance"] >= 0.0


def test_run_adversarial3d_pgd(tmp_path, params):
    """Targeted PGD through the volumetric forward: the attack perturbs the
    volume within the epsilon ball and the report surface is complete."""
    from supernet_tpu.evaluate3d import run_adversarial3d

    exp = _exp(
        attack=AttackConfig(
            targeted=True, epsilon=0.1, max_adv_step=2, step_size=0.05
        )
    )
    x, y = _volumes(2)
    res = run_adversarial3d(
        exp, params, x, y, out_dir=str(tmp_path / "adv"), images_n=0
    )
    assert 0.0 <= res["accuracy"] <= 1.0
    assert np.isfinite(res["snr_db"])  # nonzero perturbation
    assert "dice_anterior" in res
    # targeted attacks append the per-structure variance fields
    assert "predictive_variance_anterior" in res
    assert os.path.exists(
        os.path.join(res["out_dir"],
                     "Related_hyperparameters_adversarial.txt")
    )
    assert os.path.exists(
        os.path.join(res["out_dir"], "Predictive_variance_tasks.txt")
    )


def test_adversarial3d_perturbation_bounded(params):
    """The 3-D attack respects the epsilon ball and the data range."""
    from supernet_tpu.attacks import make_fgsm_attack
    from supernet_tpu.models import forward3d
    from supernet_tpu.train import one_hot_flatten

    ac = AttackConfig(epsilon=0.05)
    attack = make_fgsm_attack(CFG, ac, forward_fn=forward3d)
    x, y = _volumes(2)
    xb = jnp.asarray(x)
    y_crop = jnp.asarray(np.asarray(crop_center3d(y, 10, 10, 10)))
    y_flat = one_hot_flatten(y_crop, CFG.n_classes)
    adv = attack(params, xb, y_flat, jnp.min(xb), jnp.max(xb))
    d = np.abs(np.asarray(adv) - x)
    assert d.max() <= 0.05 + 1e-6
    assert d.max() > 0.0  # the gradient is not degenerate
    assert np.asarray(adv).max() <= x.max() + 1e-6


def test_run_calibration3d(tmp_path, params):
    """Voxel-wise calibration statistics + artifact set on volumes."""
    from supernet_tpu.evaluate3d import run_calibration3d

    exp = _exp()
    x, y = _volumes(4)
    res = run_calibration3d(
        exp, params, x, y, out_dir=str(tmp_path / "cal"), n_bins=5
    )
    assert 0.0 <= res["ece"] <= 1.0
    assert np.isfinite(res["ause"])
    assert 0.0 <= res["pixel_error_rate"] <= 1.0
    assert os.path.exists(
        os.path.join(res["out_dir"], "Calibration_report.txt")
    )
    assert os.path.exists(os.path.join(res["out_dir"], "calibration.pkl"))


def test_forward_sampled3d_is_mc_ground_truth(params):
    """FULL-MODEL Monte-Carlo ground truth for the 3-D family (the
    volumetric analog of `test_moments.test_full_model_monte_carlo`):
    (a) with a collapsed posterior one draw reproduces forward3d's mean;
    (b) an N-draw ensemble's empirical moments match the propagated pair —
    mean tightly, variance positively correlated and median-calibrated to
    within the method's approximation error (first-order relu/softmax,
    diagonal covariance over 27-element windows; measured ~2.9x over at
    this tiny depth-2 16^3 config vs 1.005 on the 2-D depth-3 model)."""
    from supernet_tpu.models import forward3d, forward_sampled3d, sample_weights

    x, _ = _volumes(1, seed=11)
    xb = jnp.asarray(x)

    # (a) collapse the posterior: softplus(-25) ~ 1e-11, so the single
    # draw IS w_mu and the twin must equal the propagated mean tightly
    tight = {
        n: {"w_mu": p["w_mu"], "w_sigma": jnp.full_like(p["w_sigma"], -25.0)}
        for n, p in params.items()
    }
    p_ref, s_ref = forward3d(tight, xb, CFG)
    p_one = forward_sampled3d(
        sample_weights(tight, jax.random.PRNGKey(0)), xb, CFG
    )
    np.testing.assert_allclose(
        np.asarray(p_one), np.asarray(p_ref), rtol=1e-4, atol=1e-6
    )
    # the propagated variance collapses with the posterior (softplus(-25)
    # ~ 1.4e-11 per weight; a few orders accumulate across layers)
    assert float(jnp.max(s_ref)) < 1e-4

    # (b) shift the raw sigmas up so weight variance dominates MC noise
    # (same device as the 2-D full-model test)
    shifted = {
        n: {"w_mu": p["w_mu"], "w_sigma": p["w_sigma"] + 3.0}
        for n, p in params.items()
    }
    p_vdp, s_vdp = forward3d(shifted, xb, CFG)
    n = 800
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    f = jax.jit(
        lambda k: forward_sampled3d(sample_weights(shifted, k), xb, CFG)
    )
    draws = jax.lax.map(f, keys)
    mc_mean = np.asarray(jnp.mean(draws, 0))
    mc_var = np.asarray(jnp.var(draws, 0))
    p_np, s_np = np.asarray(p_vdp), np.asarray(s_vdp)
    assert np.abs(mc_mean - p_np).max() < 0.05
    assert np.abs(mc_mean - p_np).mean() < 0.01
    corr = np.corrcoef(mc_var.ravel(), s_np.ravel())[0, 1]
    assert corr > 0.6
    m = mc_var.ravel() > 1e-8
    ratio = np.median(s_np.ravel()[m] / mc_var.ravel()[m])
    assert 0.3 < ratio < 5.0


def test_run_testing3d_mc_mode(tmp_path, params):
    """mc_samples > 0: the MC ensemble baseline drives the same protocol
    and report surface."""
    from supernet_tpu.evaluate3d import run_testing3d

    exp = _exp()
    x, y = _volumes(2)
    res = run_testing3d(
        exp, params, x, y, out_dir=str(tmp_path / "mc"), images_n=0,
        mc_samples=4,
    )
    assert res["mc_samples"] == 4
    assert 0.0 <= res["accuracy"] <= 1.0
    assert res["mean_predictive_variance"] >= 0.0


def test_cli_eval3d_attack3d_calibrate3d(tmp_path, capsys):
    """The full 3-D CLI loop: train3d --synthetic, then eval3d (noise),
    attack3d, and calibrate3d all restore the same epoch checkpoint and
    emit their JSON result lines + artifact directories."""
    import json

    from supernet_tpu import cli

    out = str(tmp_path / "run3d")
    shape = ["--cube-size", "16", "--depth", "2", "--base-kernels", "2"]
    rc = cli.main(
        ["train3d", "--config", "hippocampus", "--synthetic", "4",
         "--batch-size", "2", "--epochs", "1", "--val-frac", "0",
         *shape, "--out-dir", out]
    )
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(
        ["eval3d", "--config", "hippocampus", "--synthetic", "4",
         "--batch-size", "2", *shape, "--checkpoint", out,
         "--noise-kind", "gaussian", "--noise-std", "0.1",
         "--noise-region", "A", "--images-n", "0",
         "--out-dir", str(tmp_path / "ev")]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= line["accuracy"] <= 1.0 and np.isfinite(line["snr_db"])

    rc = cli.main(
        ["attack3d", "--config", "hippocampus", "--synthetic", "2",
         "--batch-size", "2", *shape, "--checkpoint", out,
         "--epsilon", "0.05", "--max-adv-step", "2", "--images-n", "0",
         "--out-dir", str(tmp_path / "atk")]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(line["snr_db"])

    rc = cli.main(
        ["calibrate3d", "--config", "hippocampus", "--synthetic", "4",
         "--batch-size", "2", *shape, "--checkpoint", out,
         "--bins", "5", "--out-dir", str(tmp_path / "cal")]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= line["ece"] <= 1.0
    assert os.path.exists(str(tmp_path / "cal" / "calibration.pkl"))


def test_run_testing3d_brats_modalities(tmp_path):
    """BraTS-style volumetric eval: 4 input modalities, 5 classes, the
    asymmetric (1, 0) bottleneck pre-pad, object-region noise, and the
    3-structure (tumor/core/enhancing) metric surface."""
    from supernet_tpu.configs import BRATS
    from supernet_tpu.evaluate3d import run_testing3d
    from supernet_tpu.train3d import derive_out_size3d

    cfg = dataclasses.replace(
        BRATS.model, image_size=16, base_kernels=2, depth=2,
        bottleneck_pre_pad=(1, 0),
    )
    cfg = dataclasses.replace(cfg, out_size=derive_out_size3d(cfg))
    exp = BRATS.replace(
        model=cfg, train=dataclasses.replace(BRATS.train, batch_size=2)
    )
    rng = np.random.default_rng(4)
    x = rng.normal(0, 0.3, (2, 16, 16, 16, 4)).astype(np.float32)
    y = np.zeros((2, 16, 16, 16), np.int32)
    y[:, 4:12, 4:12, 4:12] = 2
    y[:, 6:10, 6:10, 6:10] = 1
    y[:, 7:9, 7:9, 7:9] = 4  # enhancing
    p = init_params3d(jax.random.PRNGKey(1), cfg)
    res = run_testing3d(
        exp, p, x, y,
        NoiseConfig(kind="speckle", std=0.1, region="O"),
        out_dir=str(tmp_path / "brats"), images_n=0,
    )
    assert np.isfinite(res["snr_db"])
    for s in ("tumor", "core", "enhancing"):
        assert f"dice_{s}" in res and f"hausdorff_{s}" in res


def test_run_noise_sweep3d(tmp_path, params):
    """The volumetric module-level sweep: clean + each level x region,
    each in its own reference-scheme directory."""
    from supernet_tpu.evaluate3d import run_noise_sweep3d

    exp = _exp(
        noise_levels=(0.1,), noise_regions=("P",), out_dir=str(tmp_path)
    )
    x, y = _volumes(2)
    results = run_noise_sweep3d(exp, params, x, y, images_n=0)
    assert len(results) == 2
    assert results[0]["snr_db"] == float("inf")
    assert np.isfinite(results[1]["snr_db"])
    assert results[0]["out_dir"].endswith("clean")
    assert results[1]["out_dir"].endswith("gaussian_0.1/on_posterior")


def test_cli_eval3d_val_frac_scores_heldout_only(tmp_path, capsys):
    """eval3d on a NIfTI task dir defaults to the trailing train3d
    holdout (same _val_count formula), so metrics are on unseen volumes;
    --val-frac 0 scores everything."""
    import json

    from supernet_tpu import cli
    from supernet_tpu.data import write_nifti

    rng = np.random.default_rng(9)
    task = tmp_path / "Task98"
    (task / "imagesTr").mkdir(parents=True)
    (task / "labelsTr").mkdir()
    for i in range(4):
        img = rng.uniform(0, 800, (18, 18, 18)).astype(np.float32)
        lbl = np.zeros((18, 18, 18), np.int16)
        lbl[5:12, 5:12, 5:12] = 1 + (i % 2)
        write_nifti(str(task / "imagesTr" / f"v{i}.nii.gz"), img)
        write_nifti(str(task / "labelsTr" / f"v{i}.nii.gz"), lbl)

    shape = ["--cube-size", "16", "--depth", "2", "--base-kernels", "2"]
    rc = cli.main(
        ["eval3d", "--config", "hippocampus", "--data", str(task),
         "--batch-size", "2", "--val-frac", "0.5", *shape,
         "--images-n", "0", "--out-dir", str(tmp_path / "ev")]
    )
    assert rc == 0
    cap = capsys.readouterr()
    assert "trailing 2 held-out volumes" in cap.err
    line = json.loads(cap.out.strip().splitlines()[-1])
    assert 0.0 <= line["accuracy"] <= 1.0

    rc = cli.main(
        ["eval3d", "--config", "hippocampus", "--data", str(task),
         "--batch-size", "2", "--val-frac", "0", *shape,
         "--images-n", "0", "--out-dir", str(tmp_path / "ev_all")]
    )
    assert rc == 0
    cap = capsys.readouterr()
    assert "held-out" not in cap.err


def test_run_testing3d_mesh_matches_single(tmp_path, params):
    """Spatially-sharded (D-axis over the 8-device mesh) testing equals the
    single-device run metric-for-metric."""
    from supernet_tpu.evaluate3d import run_testing3d
    from supernet_tpu.parallel import make_mesh

    exp = _exp()
    x, y = _volumes(4)
    nc = NoiseConfig(kind="gaussian", std=0.1, region="all")
    ref = run_testing3d(
        exp, params, x, y, nc, out_dir=str(tmp_path / "ref"), images_n=0,
        seed=7,
    )
    got = run_testing3d(
        exp, params, x, y, nc, out_dir=str(tmp_path / "mesh"), images_n=0,
        seed=7, mesh=make_mesh(8),
    )
    for k in ("accuracy", "snr_db", "dice_anterior", "dice_posterior",
              "mean_predictive_variance"):
        assert got[k] == pytest.approx(ref[k], rel=1e-4, abs=1e-7), k


def test_cli_saliency3d(tmp_path, capsys):
    """saliency3d: volumetric input gradient, center-slice renders via the
    2-D saliency saver."""
    import json

    from supernet_tpu import cli

    rc = cli.main(
        ["saliency3d", "--config", "hippocampus", "--synthetic", "2",
         "--batch-size", "2", "--cube-size", "16", "--depth", "2",
         "--base-kernels", "2", "--images-n", "2",
         "--out-dir", str(tmp_path / "sal")]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["saliency_maps"] == 2
    pngs = list((tmp_path / "sal").glob("*.png"))
    assert len(pngs) >= 1


def test_cli_convert_to_cubes_then_train3d(tmp_path, capsys):
    """convert --from-nifti --to-cubes writes cube .npy shards (4-D int
    labels NOT argmax'd by the one-hot heuristic); train3d and eval3d
    read the shard dir directly."""
    import json

    from supernet_tpu import cli
    from supernet_tpu.data import write_nifti

    rng = np.random.default_rng(2)
    task = tmp_path / "Task97"
    (task / "imagesTr").mkdir(parents=True)
    (task / "labelsTr").mkdir()
    for i in range(4):
        img = rng.uniform(0, 500, (18, 17, 16)).astype(np.float32)
        lbl = np.zeros((18, 17, 16), np.int16)
        lbl[5:12, 5:12, 4:10] = 1 + (i % 2)
        write_nifti(str(task / "imagesTr" / f"v{i}.nii.gz"), img)
        write_nifti(str(task / "labelsTr" / f"v{i}.nii.gz"), lbl)

    shards = str(tmp_path / "cubes")
    rc = cli.main(
        ["convert", "--config", "hippocampus", "--data", str(task),
         "--from-nifti", "--to-cubes", "--cube-size", "16",
         "--out", shards]
    )
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["volumes"] == 4 and meta["cube"] == 16
    ys = np.load(str(tmp_path / "cubes" / "y_00000.npy"))
    assert ys.ndim == 4 and set(np.unique(ys)) == {0, 1, 2}

    out = str(tmp_path / "run")
    rc = cli.main(
        ["train3d", "--config", "hippocampus", "--data", shards,
         "--batch-size", "2", "--epochs", "1", "--val-frac", "0",
         "--cube-size", "16", "--depth", "2", "--base-kernels", "2",
         "--out-dir", out]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(line["train_loss"])


def test_saliency3d_mesh_matches_single_device(params):
    """make_saliency_map with a scan-axis-sharded mesh (the cli saliency3d
    --data-parallel regime, P(None, "data") over D) produces the same
    gradients as the plain single-device jit."""
    from jax.sharding import PartitionSpec as P

    from supernet_tpu.attacks import make_saliency_map
    from supernet_tpu.models import forward3d
    from supernet_tpu.parallel import make_mesh, replicate

    x, _ = _volumes(2, seed=11)
    cmask = jnp.asarray([0.0, 1.0, 1.0], jnp.float32)
    sal = make_saliency_map(CFG, forward_fn=forward3d)
    g_ref, gr_ref = sal(params, jnp.asarray(x), cmask)

    mesh = make_mesh(8)
    sal_m = make_saliency_map(
        CFG, forward_fn=forward3d, mesh=mesh, x_spec=P(None, "data")
    )
    g, gr = sal_m(replicate(mesh, params), jnp.asarray(x), cmask)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gr), np.asarray(gr_ref), rtol=1e-5, atol=1e-7
    )


def test_cli_saliency3d_data_parallel(tmp_path, capsys):
    """cli saliency3d --data-parallel actually uses the mesh (no silent
    single-device fallback) and renders the same artifact set."""
    import json

    from supernet_tpu import cli

    rc = cli.main(
        ["saliency3d", "--config", "hippocampus", "--synthetic", "2",
         "--batch-size", "2", "--cube-size", "16", "--depth", "2",
         "--base-kernels", "2", "--images-n", "2", "--data-parallel",
         "--out-dir", str(tmp_path / "sal")]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["saliency_maps"] == 2
    assert list((tmp_path / "sal").glob("*.png"))


def test_cli_convert_flag_validation(tmp_path):
    """convert rejects meaningless flag combinations loudly instead of
    silently writing the wrong shard family."""
    from supernet_tpu import cli

    with pytest.raises(SystemExit, match="from-nifti"):
        cli.main(["convert", "--config", "hippocampus",
                  "--data", "x.pkl", "--to-cubes",
                  "--out", str(tmp_path / "s")])
    with pytest.raises(SystemExit, match="slice extraction"):
        cli.main(["convert", "--config", "hippocampus",
                  "--data", "task/", "--from-nifti", "--to-cubes",
                  "--split", "test", "--out", str(tmp_path / "s")])
    with pytest.raises(SystemExit, match="slice extraction"):
        cli.main(["convert", "--config", "hippocampus",
                  "--data", "task/", "--from-nifti", "--to-cubes",
                  "--keep-empty", "--out", str(tmp_path / "s")])


def test_saliency3d_parser_has_val_frac():
    """saliency3d exposes --val-frac like the other 3-D eval commands (the
    holdout default PARITY.md documents)."""
    from supernet_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["saliency3d", "--val-frac", "0.5"]
    )
    assert args.val_frac == 0.5
    # and the default matches eval3d's
    d = build_parser().parse_args(["saliency3d"])
    assert d.val_frac == pytest.approx(0.2)

def test_run_testing3d_streams_with_artifact_cap(tmp_path, params):
    """`artifact_max_samples` bounds the per-volume host buffers (the only
    full-set surface) while metrics + the variance report accumulate
    online over ALL volumes (VERDICT r3 #5)."""
    from supernet_tpu.evaluate3d import run_testing3d

    exp = _exp()
    x, y = _volumes(5)
    full = run_testing3d(
        exp, params, x, y, out_dir=str(tmp_path / "full"), images_n=0
    )
    capped = run_testing3d(
        exp, params, x, y, out_dir=str(tmp_path / "capped"), images_n=0,
        artifact_max_samples=2,
    )
    assert full["artifact_samples"] == 5
    assert capped["artifact_samples"] == 2
    for k in ("accuracy", "mean_predictive_variance", "dice_anterior"):
        np.testing.assert_allclose(capped[k], full[k], rtol=1e-6, err_msg=k)
    with open(tmp_path / "full" / "Predictive_variance_tasks.txt") as f:
        a = f.read()
    with open(tmp_path / "capped" / "Predictive_variance_tasks.txt") as f:
        b = f.read()
    assert a == b


def test_sweep3d_threads_artifact_cap_signature():
    """run_noise_sweep3d and the eval3d --sweep CLI path accept and forward
    artifact_max_samples (VERDICT r4 #4) — fast signature pin; the cap's
    behavior itself is covered by the run_testing3d cap test above."""
    import inspect

    from supernet_tpu.cli import build_parser
    from supernet_tpu.evaluate3d import run_noise_sweep3d

    assert "artifact_max_samples" in inspect.signature(
        run_noise_sweep3d
    ).parameters
    args = build_parser().parse_args(
        ["sweep", "--artifact-max-samples", "3"]
    )
    assert args.artifact_max_samples == 3
    args3 = build_parser().parse_args(
        ["eval3d", "--sweep", "--artifact-max-samples", "3"]
    )
    assert args3.artifact_max_samples == 3
