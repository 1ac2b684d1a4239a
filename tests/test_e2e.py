"""End-to-end smoke tests (SURVEY.md §4.6): tiny train run on synthetic data
with finite decreasing loss, eval protocol producing the full artifact set,
and the CLI wiring."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS, NoiseConfig
from supernet_tpu.data import PickleDataset, synthetic_dataset
from supernet_tpu.evaluate import run_adversarial, run_testing
from supernet_tpu.models import init_params
from supernet_tpu.trainer import Trainer

EXP = HIPPOCAMPUS.replace(
    model=dataclasses.replace(
        HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
    ),
    train=dataclasses.replace(
        HIPPOCAMPUS.train, batch_size=4, epochs=2, log_every=100
    ),
    attack=dataclasses.replace(
        HIPPOCAMPUS.attack, max_adv_step=2, epsilon=0.01
    ),
)


def _ds(n=8, seed=0):
    x, y = synthetic_dataset(EXP.model, n, seed=seed)
    return PickleDataset(x, y, 1)


def test_train_smoke(tmp_path):
    tr = Trainer(EXP, _ds(8), _ds(4, seed=1), out_dir=str(tmp_path / "run"))
    tr.run(epochs=2, log=lambda *_: None)
    assert len(tr.history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in tr.history["train_loss"])
    # loss should not explode epoch-over-epoch on this tiny task
    assert tr.history["train_loss"][1] <= tr.history["train_loss"][0] * 2
    # checkpoints + artifacts exist
    from supernet_tpu import checkpoint as ckpt

    assert ckpt.latest_epoch(str(tmp_path / "run")) == 1
    assert os.path.exists(tmp_path / "run" / "Related_hyperparameters.txt")
    assert os.path.exists(tmp_path / "run" / "history.pkl")
    # per-epoch per-structure curves (`Hippocampus.py:640-742`)
    for s in ("anterior", "posterior"):
        assert len(tr.history[f"train_dice_{s}"]) == 2
        assert len(tr.history[f"val_dice_{s}"]) == 2
        assert len(tr.history[f"train_haus_{s}"]) == 2
        assert len(tr.history[f"val_haus_{s}"]) == 2
    # the reference's named artifact set (`Hippocampus.py:744-796`)
    import pickle

    with open(tmp_path / "run" / "training_validation_acc_error.pkl", "rb") as f:
        tacc, vacc, terr, verr = pickle.load(f)
    assert len(tacc) == len(verr) == 2
    for png in (
        "VDP_UNET_Data_acc.png",
        "VDP_UNET_Data_error.png",
        "VDP_UNET_Data_DICE.png",
        "VDP_UNET_Data_Haus.png",
    ):
        assert os.path.exists(tmp_path / "run" / png), png


def test_testing_protocol_clean_and_noisy(tmp_path):
    params = init_params(jax.random.PRNGKey(0), EXP.model)
    ds = _ds(8)
    res = run_testing(
        EXP, params, ds, NoiseConfig(), out_dir=str(tmp_path / "clean")
    )
    assert np.isfinite(res["accuracy"])
    assert res["snr_db"] == float("inf")
    assert os.path.exists(res["artifact"])
    assert os.path.exists(
        os.path.join(res["out_dir"], "Predictive_variance_tasks.txt")
    )
    assert "dice_anterior" in res and "hausdorff_posterior" in res
    assert "c_score_anterior" in res and "c_score_posterior" in res

    noisy = run_testing(
        EXP,
        params,
        ds,
        NoiseConfig(kind="gaussian", std=0.1, region="A"),
        out_dir=str(tmp_path / "noisy"),
    )
    assert np.isfinite(noisy["snr_db"])
    assert noisy["snr_db"] > 0


def test_adversarial_protocol(tmp_path):
    params = init_params(jax.random.PRNGKey(0), EXP.model)
    res = run_adversarial(
        EXP, params, _ds(4), out_dir=str(tmp_path / "adv")
    )
    assert np.isfinite(res["accuracy"])
    assert os.path.exists(res["artifact"])
    assert os.path.exists(
        os.path.join(res["out_dir"], "Related_hyperparameters_adversarial.txt")
    )
    # full reference report surface (`Hippocampus.py:1051-1118`): SNR of the
    # perturbation, per-structure dice std / sens / prec / spec / RVD /
    # over-under / c_score, per-structure predictive variance
    assert np.isfinite(res["snr_db"]) and res["snr_db"] > 0
    for s in ("anterior", "posterior"):
        for f in (
            "dice_{}_std",
            "sensitivity_{}",
            "precision_{}",
            "specificity_{}",
            "rvd_{}",
            "over_seg_{}",
            "under_seg_{}",
            "c_score_{}",
            "predictive_variance_{}",
        ):
            assert f.format(s) in res, f.format(s)
    txt = open(
        os.path.join(res["out_dir"], "Related_hyperparameters_adversarial.txt")
    ).read()
    assert "snr_db" in txt and "c_score_anterior" in txt


def test_cli_eval_synthetic(tmp_path, capsys):
    from supernet_tpu.cli import main

    rc = main(
        [
            "eval",
            "--config",
            "hippocampus",
            "--synthetic",
            "4",
            "--batch-size",
            "4",
            "--images-n",
            "0",
            "--out-dir",
            str(tmp_path / "cli"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(out)
    assert "accuracy" in payload


def test_trainer_rolls_back_on_nonfinite_loss(tmp_path, monkeypatch):
    """Failure recovery (SURVEY §5): a diverged epoch restores the last good
    checkpoint instead of continuing from corrupted state."""
    tr = Trainer(EXP, _ds(8), None, out_dir=str(tmp_path / "run"))
    orig_epoch = Trainer._train_epoch
    calls = {"n": 0}

    def flaky_epoch(self, state, epoch, log):
        state = orig_epoch(self, state, epoch, log)
        calls["n"] += 1
        if calls["n"] == 2:  # poison the second epoch's recorded loss
            self.history["train_loss"][-1] = float("nan")
        return state

    monkeypatch.setattr(Trainer, "_train_epoch", flaky_epoch)
    logs = []
    tr.run(epochs=3, log=logs.append)
    assert any("rolling back to epoch 0" in str(m) for m in logs), logs
    # epochs 0 and 2 completed fine; epoch 1 was rolled back
    from supernet_tpu import checkpoint as ckpt

    assert ckpt.latest_epoch(str(tmp_path / "run")) == 2


def test_trainer_with_streaming_pickle_dataset(tmp_path):
    """The BraTS-style streaming loader must accept the Trainer's uniform
    batches() kwargs (shuffle/seed/epoch) — regression for a crash where
    streaming training died on unexpected keyword arguments."""
    import pickle

    from supernet_tpu.data import StreamingPickleDataset

    rng = np.random.default_rng(0)
    for i in range(2):
        x = rng.normal(0, 1, (4, 1, 32, 32)).astype(np.float32)  # NCHW
        y = rng.integers(0, 3, (4, 32, 32)).astype(np.uint8)
        with open(tmp_path / f"training_batch_{i}.pkl", "wb") as f:
            pickle.dump((x, y), f)
    ds = StreamingPickleDataset(
        str(tmp_path / "training_batch_*.pkl"), in_channels=1
    )
    tr = Trainer(EXP, ds, None, out_dir=str(tmp_path / "run"))
    tr.run(epochs=1, log=lambda *_: None)
    assert np.isfinite(tr.history["train_loss"][0])


def test_steps_per_dispatch_trailing_batches_trained(tmp_path):
    """With K>1 and a batch count not divisible by K, the trailing batches
    run through the single-step path (nothing dropped): epoch losses and
    final params match a steps_per_dispatch=1 run."""
    tr1 = Trainer(EXP, _ds(12), None, out_dir=str(tmp_path / "a"))
    s1 = tr1.run(epochs=1, log=lambda *_: None)
    tr2 = Trainer(
        EXP, _ds(12), None, out_dir=str(tmp_path / "b"), steps_per_dispatch=2
    )
    logs = []
    s2 = tr2.run(epochs=1, log=logs.append)
    assert any("single-step path" in str(m) for m in logs), logs
    np.testing.assert_allclose(
        tr1.history["train_loss"], tr2.history["train_loss"], rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_noise_sweep_protocol(tmp_path):
    """The module-level sweep driver (`Hippocampus.py:1578-1601`): clean
    eval first, then gaussian noise at each level x region, each with the
    full artifact set in its noise-mode-specific directory."""
    from supernet_tpu.evaluate import run_noise_sweep

    exp = EXP.replace(
        out_dir=str(tmp_path),
        noise_levels=(0.1,),
        noise_regions=("A", "all"),
    )
    params = init_params(jax.random.PRNGKey(0), EXP.model)
    results = run_noise_sweep(exp, params, _ds(8), images_n=0)
    assert len(results) == 1 + 1 * 2  # clean + levels x regions
    assert results[0]["snr_db"] == float("inf")  # clean
    assert np.isfinite(results[1]["snr_db"])  # noisy
    # region-specific directory scheme preserved
    assert results[1]["out_dir"].endswith("gaussian_0.1/on_anterior")
    assert results[2]["out_dir"].endswith("gaussian_0.1/on_all")
    # noise-mode-specific artifact filenames (`Hippocampus.py:1408-1449`)
    assert os.path.basename(results[0]["artifact"]) == "uncertainty_info.pkl"
    assert (
        os.path.basename(results[1]["artifact"])
        == "uncertainty_info_on_anterior_noise_0.1.pkl"
    )
    assert (
        os.path.basename(results[2]["artifact"])
        == "uncertainty_info_noise_0.1.pkl"
    )
    for r in results:
        assert os.path.exists(r["artifact"])
        assert os.path.exists(
            os.path.join(r["out_dir"], "Related_hyperparameters.txt")
        )
    # save_uncertainty re-renders from the noise-mode-specific artifact
    # (`Hippocampus.py:1549-1568`)
    from supernet_tpu import reports

    unc = reports.save_uncertainty(
        results[1]["out_dir"], images_n=0, noise=0.1, where_noise="A",
        dataset="hippocampus",
    )
    assert np.isfinite(unc["mean"])


def test_adversarial_untargeted_brats_branch(tmp_path):
    """Untargeted non-Hippocampus attacks take the single-step FGSM path
    (`Brats.py:984-991`) and the BraTS reporting branch (per-class +
    correct/incorrect predictive variance)."""
    from supernet_tpu.configs import BRATS
    from supernet_tpu.evaluate import run_adversarial

    exp = BRATS.replace(
        model=dataclasses.replace(
            BRATS.model,
            image_size=32,
            out_size=22,
            base_kernels=4,
            depth=3,
            bottleneck_pre_pad=None,
        ),
        train=dataclasses.replace(BRATS.train, batch_size=4),
        attack=dataclasses.replace(BRATS.attack, targeted=False, epsilon=0.01),
        out_dir=str(tmp_path),
    )
    x, y = synthetic_dataset(exp.model, 4, seed=0)
    # synthetic labels are 0..2; lift some pixels to classes 3/4 so the
    # BraTS structure maskers (core/enhancing) see non-empty masks
    y = y.copy()
    y[0, :8, :8] = 4
    y[1, :8, :8] = 3
    ds = PickleDataset(np.repeat(x, [1, 1, 1, 1], axis=0), y, 4)
    params = init_params(jax.random.PRNGKey(0), exp.model)
    res = run_adversarial(exp, params, ds, images_n=0)
    assert np.isfinite(res["accuracy"])
    for s in ("tumor", "core", "enhancing"):
        assert f"dice_{s}" in res
    assert os.path.exists(
        os.path.join(res["out_dir"], "Predictive_variance_tasks.txt")
    )
    txt = open(
        os.path.join(res["out_dir"], "Predictive_variance_tasks.txt")
    ).read()
    assert "correct" in txt and "class 4" in txt


def test_lungs_config_train_eval_smoke(tmp_path):
    """The third dataset config (Lungs CT, README.md:18 — same protocol as
    Hippocampus at CT geometry): train + clean eval run end-to-end with a
    shrunken geometry, exercising the 2-class structure path ('lung')."""
    from supernet_tpu.configs import LUNGS

    exp = LUNGS.replace(
        model=dataclasses.replace(
            LUNGS.model, image_size=32, out_size=22, base_kernels=4
        ),
        train=dataclasses.replace(
            LUNGS.train, batch_size=4, epochs=1, log_every=100
        ),
    )
    x, y = synthetic_dataset(exp.model, 8, seed=0)
    ds = PickleDataset(x, y, 1)
    tr = Trainer(exp, ds, PickleDataset(*synthetic_dataset(exp.model, 4,
                 seed=1), 1), out_dir=str(tmp_path / "run"))
    state = tr.run(epochs=1, log=lambda *_: None)
    assert np.isfinite(tr.history["train_loss"][-1])
    res = run_testing(
        exp, jax.device_get(state.params), ds, images_n=0,
        out_dir=str(tmp_path / "eval"),
    )
    assert np.isfinite(res["accuracy"])
    # the lungs structure metrics ride the same per-structure machinery
    assert any(k.startswith("dice_") for k in res)


def test_cli_train_ensemble_contract(tmp_path, monkeypatch, capsys):
    """`cli train --ensemble K --ensemble-mode sequential` trains K
    members with incrementing init seeds into member_{k}/ dirs and prints
    the comma checkpoint_arg that serving consumes. (The default mode is
    now `vmap` — one compiled K-member program, tested end-to-end in
    test_ensemble_train.py; this pins the sequential fallback's contract.)
    The Trainer is stubbed: the real member loop runs end-to-end in the
    3-D CLI test (full geometry is too slow here)."""
    import supernet_tpu.trainer as trainer_mod

    runs = []

    class _StubTrainer:
        def __init__(self, exp, train_ds, val_ds, out_dir=None,
                     mesh=None, steps_per_dispatch=1):
            runs.append((exp.train.seed, out_dir))
            self.history = {"train_loss": [1.0]}

        def run(self):
            return None

    monkeypatch.setattr(trainer_mod, "Trainer", _StubTrainer)
    from supernet_tpu import cli

    base = str(tmp_path / "ens2d")
    rc = cli.main([
        "train", "--config", "hippocampus", "--synthetic", "8",
        "--batch-size", "4", "--epochs", "1",
        "--out-dir", base, "--ensemble", "3",
        "--ensemble-mode", "sequential",
    ])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["mode"] == "sequential"
    assert [s for s, _ in runs] == [0, 1, 2]
    assert [d for _, d in runs] == [f"{base}/member_{k}" for k in range(3)]
    assert meta["members"] == 3
    assert meta["checkpoint_arg"] == ",".join(meta["dirs"])
    assert len(meta["final"]) == 3


def test_run_testing_ensemble_members(tmp_path):
    """run_testing accepts a LIST of member params: the mixture's
    uncertainty is >= the mean member variance in aggregate, the full
    metric dict is produced, and mesh / mc_samples modes reject."""
    p1 = init_params(jax.random.PRNGKey(3), EXP.model)
    p2 = init_params(jax.random.PRNGKey(4), EXP.model)
    ds = _ds(4)
    res_e = run_testing(EXP, [p1, p2], ds, images_n=0,
                        out_dir=str(tmp_path / "ens"))
    assert 0.0 <= res_e["accuracy"] <= 1.0
    assert np.isfinite(res_e["mean_predictive_variance"])
    singles = [
        run_testing(EXP, p, ds, images_n=0,
                    out_dir=str(tmp_path / f"s{i}"))
        for i, p in enumerate((p1, p2))
    ]
    mean_member = np.mean(
        [s["mean_predictive_variance"] for s in singles])
    assert res_e["mean_predictive_variance"] >= mean_member - 1e-8

    with pytest.raises(ValueError, match="single-device"):
        run_testing(EXP, [p1, p2], ds, mc_samples=3)
    from supernet_tpu.evaluate import run_adversarial

    with pytest.raises(ValueError, match="ONE member"):
        run_adversarial(EXP, [p1, p2], ds)


def test_cli_ensemble_checkpoint_guards():
    """Single-member commands reject a comma --checkpoint list with a
    legible error instead of a FileNotFoundError on 'a,b'."""
    from supernet_tpu import cli

    class _A:
        checkpoint = "a,b"
        cmd = "export"

    with pytest.raises(SystemExit, match="ONE checkpoint"):
        cli._load_maybe_ensemble(lambda *a, **k: None, None, _A(),
                                 cmd_ok=False)
    # a single path loads through load_one unchanged
    assert cli._load_maybe_ensemble(
        lambda e, a: "loaded", None, type("B", (), {"checkpoint": "x"})(),
        cmd_ok=False) == "loaded"

def test_run_testing_streams_with_artifact_cap(tmp_path):
    """`artifact_max_samples` bounds the only full-set host buffer while
    metrics and the variance report stay exact over ALL samples (they
    accumulate online — VERDICT r3 #5)."""
    params = init_params(jax.random.PRNGKey(0), EXP.model)
    ds = _ds(8)
    full = run_testing(
        EXP, params, ds, NoiseConfig(), out_dir=str(tmp_path / "full"),
        images_n=0,
    )
    capped = run_testing(
        EXP, params, ds, NoiseConfig(), out_dir=str(tmp_path / "capped"),
        images_n=0, artifact_max_samples=3,
    )
    assert full["artifact_samples"] == len(ds)
    assert capped["artifact_samples"] == 3
    from supernet_tpu import reports

    probs, _, imgs, labels, _ = reports.load_uncertainty_artifact(
        capped["artifact"]
    )
    assert len(probs) == len(imgs) == len(labels) == 3
    # full-set metrics are NOT affected by the artifact cap
    for k in ("accuracy", "mean_predictive_variance", "dice_anterior",
              "hausdorff_posterior"):
        np.testing.assert_allclose(capped[k], full[k], rtol=1e-6, err_msg=k)
    with open(tmp_path / "full" / "Predictive_variance_tasks.txt") as f:
        a = f.read()
    with open(tmp_path / "capped" / "Predictive_variance_tasks.txt") as f:
        b = f.read()
    assert a == b


def test_sweep_threads_artifact_cap(tmp_path):
    """The noise sweep — the highest-volume caller of run_testing (clean +
    levels x regions full-set passes) — reaches the same streaming cap the
    single-run path has (VERDICT r4 #4): every run in the sweep keeps only
    `artifact_max_samples` rows while its metrics stay exact."""
    from supernet_tpu.evaluate import run_noise_sweep

    params = init_params(jax.random.PRNGKey(0), EXP.model)
    ds = _ds(8)
    exp = EXP.replace(
        noise_levels=(0.05,), noise_regions=("A",),
        out_dir=str(tmp_path),
    )
    full = run_noise_sweep(exp, params, ds, images_n=0)
    capped = run_noise_sweep(exp, params, ds, images_n=0,
                             artifact_max_samples=2)
    assert len(full) == len(capped) == 2  # clean + 1 level x 1 region
    for f, c in zip(full, capped):
        assert f["artifact_samples"] == len(ds)
        assert c["artifact_samples"] == 2
        # full-set metrics are unaffected by the artifact cap
        for k in ("accuracy", "mean_predictive_variance", "dice_anterior"):
            np.testing.assert_allclose(c[k], f[k], rtol=1e-6, err_msg=k)


def test_run_adversarial_streams_with_artifact_cap(tmp_path):
    params = init_params(jax.random.PRNGKey(0), EXP.model)
    ds = _ds(6)
    full = run_adversarial(
        EXP, params, ds, out_dir=str(tmp_path / "full"), images_n=0
    )
    capped = run_adversarial(
        EXP, params, ds, out_dir=str(tmp_path / "capped"), images_n=0,
        artifact_max_samples=2,
    )
    assert capped["artifact_samples"] == 2
    np.testing.assert_allclose(
        capped["mean_predictive_variance"], full["mean_predictive_variance"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(capped["accuracy"], full["accuracy"], rtol=1e-6)


def test_study_parser_flags():
    """Fast pin of the study subcommand surface (the one-command
    convergence study, VERDICT r4 #3)."""
    from supernet_tpu.cli import build_parser

    a = build_parser().parse_args(
        ["study", "--config", "hippocampus", "--synthetic", "16",
         "--epochs", "2", "--skip-train", "--artifact-max-samples", "2"]
    )
    assert a.cmd == "study" and a.skip_train and a.epochs == 2
    assert a.artifact_max_samples == 2


def test_study_end_to_end(tmp_path):
    """`cli study` chains train -> eval -> sweep -> attack -> calibrate
    through the REAL subcommand paths and writes a parseable study.json
    + headline JSON with dice/ECE/AUSE."""
    import contextlib
    import io

    from supernet_tpu import cli

    out = str(tmp_path / "study")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([
            "study", "--config", "hippocampus", "--synthetic", "6",
            "--batch-size", "3", "--epochs", "1", "--images-n", "1",
            "--artifact-max-samples", "2", "--out-dir", out,
        ])
    assert rc == 0
    head = json.loads(buf.getvalue().strip().splitlines()[-1])
    for k in ("accuracy", "dice_anterior", "ece", "ause",
              "total_seconds"):
        assert k in head, k
    with open(os.path.join(out, "study.json")) as f:
        summary = json.load(f)
    assert set(summary["stages"]) == {
        "train", "eval", "sweep", "attack", "calibrate"
    }
    # every stage captured at least one parseable result line
    for name, st in summary["stages"].items():
        assert st["results"], name
    # the sweep ran clean + levels x regions through the real subcommand
    assert len(summary["stages"]["sweep"]["results"]) == 7
    # artifact cap threaded everywhere
    assert summary["stages"]["eval"]["results"][0]["artifact_samples"] == 2
    # skip-train mode reuses the checkpoints
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc = cli.main([
            "study", "--config", "hippocampus", "--synthetic", "6",
            "--batch-size", "3", "--images-n", "1", "--skip-train",
            "--artifact-max-samples", "2", "--out-dir", out,
        ])
    assert rc == 0
    with open(os.path.join(out, "study.json")) as f:
        summary2 = json.load(f)
    assert "train" not in summary2["stages"]
    assert len(summary2["stages"]) == 4
