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
    for r in results:
        assert os.path.exists(os.path.join(r["out_dir"], "uncertainty_info.pkl"))
        assert os.path.exists(
            os.path.join(r["out_dir"], "Related_hyperparameters.txt")
        )


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
