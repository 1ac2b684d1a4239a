"""Attack and noise-protocol tests (SURVEY.md §4.4): FGSM/PGD semantics on a
tiny model, targeted relabeling, and region-masked noise application."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu import perturb
from supernet_tpu.attacks import (
    attack_loss,
    fgsm_sign,
    make_fgsm_attack,
    make_pgd_attack,
    retarget_labels,
)
from supernet_tpu.configs import AttackConfig, HIPPOCAMPUS, NoiseConfig
from supernet_tpu.models import init_params
from supernet_tpu.train import one_hot_flatten

CFG = dataclasses.replace(
    HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
)


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    params = init_params(jax.random.PRNGKey(1), CFG)
    x = jnp.asarray(
        rng.normal(0, 1, (2, 32, 32, 1)).astype(np.float32)
    )
    y_img = jnp.asarray(
        rng.integers(0, 3, (2, CFG.out_size, CFG.out_size)).astype(np.int32)
    )
    return params, x, one_hot_flatten(y_img, CFG.n_classes), y_img


def test_retarget_labels():
    y = jnp.asarray([[0, 2, 1, 2]])
    got = retarget_labels(y, targeted_class=2, adv_class=3)
    np.testing.assert_array_equal(np.asarray(got), [[0, 3, 1, 3]])


def test_fgsm_sign_values():
    params, x, y, _ = _setup()
    s = fgsm_sign(params, x, y, CFG, AttackConfig())
    vals = np.unique(np.asarray(s))
    assert set(vals).issubset({-1.0, 0.0, 1.0})


def test_fgsm_increases_attack_loss():
    params, x, y, _ = _setup()
    ac = AttackConfig(epsilon=0.05, targeted=False)
    atk = make_fgsm_attack(CFG, ac)
    adv = atk(params, x, y, jnp.min(x), jnp.max(x))
    l0 = float(attack_loss(params, x, y, CFG, ac))
    l1 = float(attack_loss(params, adv, y, CFG, ac))
    assert l1 >= l0


def test_pgd_respects_epsilon_ball_and_range():
    params, x, y, _ = _setup()
    ac = AttackConfig(epsilon=0.01, step_size=0.5, max_adv_step=3)
    atk = make_pgd_attack(CFG, ac)
    x_min, x_max = jnp.min(x), jnp.max(x)
    adv = atk(params, x, y, x_min, x_max)
    delta = np.abs(np.asarray(adv - x))
    assert delta.max() <= ac.epsilon + 1e-6
    assert float(jnp.min(adv)) >= float(x_min) - 1e-6
    assert float(jnp.max(adv)) <= float(x_max) + 1e-6


# ------------------------------------------------------------------- noise


def test_region_mask_hippocampus():
    y = jnp.asarray([[[0, 1], [2, 1]]])
    np.testing.assert_array_equal(
        np.asarray(perturb.region_mask(y, "A", "hippocampus")),
        [[[0, 1], [0, 1]]],
    )
    np.testing.assert_array_equal(
        np.asarray(perturb.region_mask(y, "P", "hippocampus")),
        [[[0, 0], [1, 0]]],
    )
    assert perturb.region_mask(y, "all", "hippocampus") is None


def test_region_mask_brats():
    y = jnp.asarray([[[0, 1], [2, 4]]])
    np.testing.assert_array_equal(
        np.asarray(perturb.region_mask(y, "O", "brats")), [[[0, 1], [1, 1]]]
    )
    np.testing.assert_array_equal(
        np.asarray(perturb.region_mask(y, "B", "brats")), [[[1, 0], [0, 0]]]
    )


def test_gaussian_noise_region_selective():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 4, 4, 1))
    y = jnp.zeros((1, 4, 4), jnp.int32).at[0, 1, 1].set(1)
    nc = NoiseConfig(kind="gaussian", std=0.5, region="A")
    noisy, snr = perturb.apply_noise(key, x, y, nc, "hippocampus")
    diff = np.asarray(noisy - x)[0, :, :, 0]
    # only the anterior pixel may change (up to clipping)
    changed = np.nonzero(diff != 0)
    assert set(zip(*changed)).issubset({(1, 1)})
    assert np.isfinite(float(snr))


def test_clip_to_clean_range():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 4, 4, 1))
    y = jnp.zeros((1, 4, 4), jnp.int32)
    nc = NoiseConfig(kind="gaussian", std=10.0, region="all")
    noisy, _ = perturb.apply_noise(key, x, y, nc, "hippocampus")
    assert float(jnp.min(noisy)) >= 0.0 and float(jnp.max(noisy)) <= 1.0


def test_salt_and_pepper_additive_clip_semantics():
    """Reference semantics (Brats_functions.py:565-582 + Brats.py:1255-1275):
    the S&P array is ADDED to x and the result clipped to the clean batch
    range — salted pixels saturate at the batch max, peppered pixels add
    low_clip=0 (unchanged) on non-negative data."""
    key = jax.random.PRNGKey(3)
    x = jnp.asarray(
        np.linspace(0.0, 1.0, 256, dtype=np.float32).reshape(1, 16, 16, 1)
    )
    y = jnp.zeros((1, 16, 16), jnp.int32)
    nc = NoiseConfig(kind="salt_and_pepper", std=0.5, region="all")
    noisy, _ = perturb.apply_noise(key, x, y, nc, "brats")
    xn, nn = np.asarray(x), np.asarray(noisy)
    changed = nn != xn
    assert changed.any()  # with p=0.5 on 256 pixels, salt flips occur
    # every changed pixel is a salted flip: x+1 clipped to max(x)=1
    np.testing.assert_allclose(nn[changed], 1.0)
    assert (nn >= xn - 1e-7).all()  # pepper never lowers non-negative data


def test_salt_and_pepper_signed_low_clip():
    """Signed input selects low_clip=-1 (Brats_functions.py:571-575)."""
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.linspace(-1.0, 1.0, 64, dtype=np.float32).reshape(1, 8, 8, 1)
    )
    delta = perturb.salt_and_pepper(key, x, p=0.7, q=0.5)
    vals = set(np.unique(np.asarray(delta)).tolist())
    assert vals.issubset({-1.0, 0.0, 1.0})
    assert -1.0 in vals and 1.0 in vals


def test_snr_db():
    x = jnp.ones((1, 2, 2, 1))
    noisy = x + 0.1
    # SNR = 10 log10(sum x^2 / sum (x - noisy)^2) = 10 log10(4 / 0.04) = 20
    assert float(perturb.snr_db(x, noisy)) == pytest.approx(20.0, abs=1e-3)


def test_speckle_scales_with_signal():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 4, 4, 1))
    y = jnp.zeros((1, 4, 4), jnp.int32)
    nc = NoiseConfig(kind="speckle", std=0.5, region="all")
    noisy, _ = perturb.apply_noise(key, x, y, nc, "hippocampus")
    # speckle noise on zero signal is zero
    np.testing.assert_array_equal(np.asarray(noisy), np.asarray(x))


def test_cropped_frame_clip_and_snr_semantics():
    """The reference clips noisy images to the min/max of the CENTER-CROPPED
    clean batch (`max_val = np.amax(x1)`, `Hippocampus.py:1270-1271,1298`)
    and computes SNR on the cropped frames (`t_x = x1; diff = x_crop - t_x`,
    `Hippocampus.py:1302-1307`). Pinned with a deterministic S&P (+1
    everywhere) batch whose border values lie outside the crop range."""
    B, H, crop = 1, 6, 4
    x = np.full((B, H, H, 1), -3.0, np.float32)  # border below crop min
    x[0, 0, 0, 0] = 7.0  # and above crop max
    interior = np.linspace(0.0, 1.0, crop * crop, dtype=np.float32).reshape(
        crop, crop
    )
    x[0, 1:5, 1:5, 0] = interior
    y = np.zeros((B, H, H), np.int32)
    # p=1, q=1: every pixel salted -> delta = +1 everywhere (deterministic)
    nc = NoiseConfig(kind="salt_and_pepper", std=1.0, sp_ratio=1.0,
                     region="all")
    noisy, snr = perturb.apply_noise(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y), nc, "brats",
        crop_size=crop,
    )
    nn = np.asarray(noisy)[0, :, :, 0]
    # clip range is the CROP frame's [0, 1], not the full frame's [-3, 7]
    expected = np.clip(x[0, :, :, 0] + 1.0, 0.0, 1.0)
    np.testing.assert_allclose(nn, expected, rtol=1e-6)
    # SNR compares only the cropped frames (all-ones after the clip)
    noisy_c = expected[1:5, 1:5]
    exp_snr = 10.0 * np.log10(
        np.sum(interior**2) / np.sum((noisy_c - interior) ** 2)
    )
    assert float(snr) == pytest.approx(float(exp_snr), abs=1e-4)


def test_apply_noise_without_crop_matches_full_frame():
    """crop_size=0 (or == frame) keeps the old full-frame behavior."""
    key = jax.random.PRNGKey(1)
    x = jnp.asarray(
        np.linspace(0, 1, 36, dtype=np.float32).reshape(1, 6, 6, 1)
    )
    y = jnp.zeros((1, 6, 6), jnp.int32)
    nc = NoiseConfig(kind="gaussian", std=0.3, region="all")
    n0, s0 = perturb.apply_noise(key, x, y, nc, "hippocampus")
    n1, s1 = perturb.apply_noise(key, x, y, nc, "hippocampus", crop_size=6)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    assert float(s0) == pytest.approx(float(s1))
