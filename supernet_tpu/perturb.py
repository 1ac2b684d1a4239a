"""Test-time corruption: gaussian / speckle / salt-and-pepper noise with
region-selective application and SNR accounting.

Reference: the noise branches of ``testing`` (`Hippocampus.py:1272-1307`,
`Brats.py:1248-1276`) and ``salt_and_pepper`` (`Brats_functions.py:565-582`).

Semantics preserved:
- gaussian: ``x + N(0, std)``; speckle: ``x + x * N(0, std)``;
  salt&pepper: additive — with flip prob ``p``, salt (ratio ``q``) pixels
  get +1 (saturating at the batch max after the clip), pepper +low_clip
  (0 for non-negative data, i.e. unchanged; -1 for signed).
- region masks are built from the *label*: Hippocampus ``'A'`` = anterior
  only (label == 1), ``'P'`` = posterior only (label == 2)
  (`Hippocampus.py:1278-1299`); BraTS ``'O'`` = object/tumor (label > 0),
  ``'B'`` = background (label == 0) (`Brats.py:1257-1276`); anything else =
  everywhere.
- after adding noise the image is clipped to the [min, max] of the
  CENTER-CROPPED clean batch (``max_val = np.amax(x1)`` where ``x1`` is the
  crop to the model's output size, `Hippocampus.py:1270-1271,1298`) — pass
  ``crop_size`` to ``apply_noise`` for this.
- SNR per batch on the CROPPED frames:
  ``10 * log10(sum(x1^2) / sum((x_crop - x1)^2))``
  (`Hippocampus.py:1302-1307`).

All of it is jittable and runs on-device; the reference round-trips every
batch through host NumPy masked arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from supernet_tpu.configs import NoiseConfig

Array = jax.Array


def region_mask(y: Array, region: str, dataset: str) -> Optional[Array]:
    """0/1 mask [B, H, W] of pixels that receive noise, or None for 'all'.

    ``y`` is the integer label map [B, H, W]; labels are anatomical classes
    (Hippocampus: 0 bg, 1 anterior, 2 posterior; BraTS: 0 bg, >0 tumor).
    """
    if dataset == "hippocampus":
        if region == "A":
            return (y == 1).astype(jnp.float32)
        if region == "P":
            return (y == 2).astype(jnp.float32)
        return None
    # brats / lungs follow the object/background convention (Brats.py:1257)
    if region == "O":
        return (y > 0).astype(jnp.float32)
    if region == "B":
        return (y == 0).astype(jnp.float32)
    return None


def gaussian_noise(key: Array, x: Array, std: float) -> Array:
    return std * jax.random.normal(key, x.shape, x.dtype)


def speckle_noise(key: Array, x: Array, std: float) -> Array:
    return x * (std * jax.random.normal(key, x.shape, x.dtype))


def salt_and_pepper(key: Array, x: Array, p: float, q: float = 0.5) -> Array:
    """Additive S&P array per `Brats_functions.py:565-582`: with flip
    probability ``p`` and salt ratio ``q``, flipped&salted pixels get +1,
    flipped&peppered get +low_clip (0 for non-negative data, -1 for signed),
    everything else +0. The reference then ADDS this to x and clips to the
    clean batch's [min, max] (`Brats.py:1255-1275`), so salted pixels
    saturate at the batch max and peppered pixels are unchanged on
    non-negative data — ``apply_noise`` applies that clip for every kind.
    """
    k1, k2 = jax.random.split(key)
    flipped = jax.random.bernoulli(k1, p, x.shape)
    salted = jax.random.bernoulli(k2, q, x.shape)
    low_clip = jnp.where(
        jnp.min(x) < 0, jnp.asarray(-1.0, x.dtype), jnp.asarray(0.0, x.dtype)
    )
    out = jnp.where(salted, jnp.asarray(1.0, x.dtype), low_clip)
    return jnp.where(flipped, out, jnp.zeros_like(x))


def apply_noise(
    key: Array,
    x: Array,
    y: Array,
    nc: NoiseConfig,
    dataset: str = "hippocampus",
    crop_size: int = 0,
) -> Tuple[Array, Array]:
    """Corrupt ``x`` per the protocol; returns (noisy_x, snr_db).

    ``x``: [B, H, W, C] full-frame images (or [B, D, H, W, C] volumes for
    the 3-D family — every kind/mask/clip rule generalizes voxel-wise);
    ``y``: [B, H, W] ([B, D, H, W]) integer labels (same spatial size as x —
    the reference builds the region mask from the FULL-frame label,
    `Hippocampus.py:1279-1292`).

    ``crop_size`` > 0 reproduces the reference's cropped-frame semantics
    exactly: the clip range is the min/max of the CENTER-CROPPED clean batch
    (``max_val = np.amax(x1)`` where ``x1`` is the crop,
    `Hippocampus.py:1270-1271,1298`) and the SNR compares the CROPPED clean
    vs cropped noisy frames (``t_x = x1; diff = x_crop - t_x``,
    `Hippocampus.py:1302-1307`). With ``crop_size=0`` both use the full
    frame (crop == frame).
    """
    if nc.kind == "none" or nc.std == 0.0:
        return x, jnp.asarray(jnp.inf, jnp.float32)

    if nc.kind == "gaussian":
        delta = gaussian_noise(key, x, nc.std)
    elif nc.kind == "speckle":
        delta = speckle_noise(key, x, nc.std)
    elif nc.kind == "salt_and_pepper":
        delta = salt_and_pepper(key, x, nc.std, nc.sp_ratio)
    else:
        raise ValueError(f"unknown noise kind {nc.kind!r}")

    mask = region_mask(y, nc.region, dataset)
    if mask is not None:
        delta = delta * mask[..., None]

    if crop_size and crop_size != x.shape[1]:
        if x.ndim == 5:  # [B, D, H, W, C] volumes: crop all three axes
            from supernet_tpu.ops.moments3d import crop_center3d

            def _crop(a):
                return crop_center3d(a, crop_size, crop_size, crop_size)

        else:
            from supernet_tpu.ops.moments import crop_center

            def _crop(a):
                return crop_center(a, crop_size, crop_size)

        x_ref = _crop(x)
    else:

        def _crop(a):
            return a

        x_ref = x
    # every kind — including S&P — is clipped to the CROP frame's range
    # (Hippocampus.py:1270-1271,1298; Brats.py:1264/1271/1275 clip in all
    # branches). Salt&pepper's low_clip, by contrast, keys off the FULL
    # frame: the reference calls salt_and_pepper on the uncropped batch
    # (Brats.py:1253), so its sign test sees the full-frame min.
    noisy = jnp.clip(x + delta, jnp.min(x_ref), jnp.max(x_ref))
    noisy_ref = _crop(noisy)
    snr = snr_db(x_ref, noisy_ref)
    return noisy, snr


def snr_db(x: Array, noisy: Array) -> Array:
    """``10 log10(sum x^2 / sum (x - noisy)^2)`` (`Hippocampus.py:1302-1307`)."""
    num = jnp.sum(jnp.square(x))
    den = jnp.sum(jnp.square(x - noisy))
    return 10.0 * jnp.log10(num / jnp.maximum(den, 1e-30))
