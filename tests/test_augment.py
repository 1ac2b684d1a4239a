"""On-device augmentation (`data/augment.py`, net-new — the reference
trains from a pre-augmented pickle, `Hippocampus.py:479-481`): rotation
parity vs np.rot90, image/label spatial consistency, crop commutation,
sharding-invariant randomness (single-device == GSPMD jit == shard_map),
and a train-step smoke with augmentation on."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS, AugmentConfig
from supernet_tpu.data import augment_batch, augment_train_batch
from supernet_tpu.data.augment import _spatial_one
from supernet_tpu.train import (
    create_train_state,
    make_train_step,
    one_hot_flatten,
)
from supernet_tpu.models import init_params

CFG = dataclasses.replace(
    HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
)


def _xy(b=8, seed=0, h=32, hy=22, c=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (b, h, h, c)).astype(np.float32))
    y = jnp.asarray(
        rng.integers(0, 3, (b, hy, hy)).astype(np.int32)
    )
    return x, y


def test_rot90_matches_numpy():
    """_spatial_one's rotation algebra == np.rot90 for every k (pinned by
    driving the per-image key until all four draws appear)."""
    cfg = AugmentConfig(hflip=False, vflip=False, rot90=True)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(0, 1, (6, 6, 2)).astype(np.float32))
    seen = set()
    for i in range(40):
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        rk = int(jax.random.randint(k, (3,), 0, 4)[0])
        got = np.asarray(_spatial_one(k, img, cfg))
        want = np.rot90(np.asarray(img), k=rk, axes=(0, 1))
        np.testing.assert_array_equal(got, want)
        seen.add(rk)
        if seen == {0, 1, 2, 3}:
            break
    assert seen == {0, 1, 2, 3}, "all four rotations exercised"


def test_image_label_spatial_consistency():
    """The label gets EXACTLY the image's spatial transform: encode the
    label pattern into an image channel and check they move together."""
    _, y = _xy()
    x = y[..., None].astype(jnp.float32)  # image IS the label pattern
    cfg = AugmentConfig(rot90=True)  # flips + rotations, no intensity
    xa, ya = augment_batch(jax.random.PRNGKey(3), x, y, cfg)
    np.testing.assert_array_equal(
        np.asarray(xa[..., 0]).astype(np.int32), np.asarray(ya)
    )
    # something actually moved
    assert not np.array_equal(np.asarray(ya), np.asarray(y))


def test_spatial_ops_commute_with_center_crop():
    """Augmenting the full frame then center-cropping equals cropping then
    augmenting — the property that makes augmenting the full-size image and
    the pre-cropped label with shared draws geometrically consistent."""
    from supernet_tpu.ops.moments import crop_center

    x, _ = _xy(b=4, h=32)
    cfg = AugmentConfig(rot90=True)
    key = jax.random.PRNGKey(7)
    full_then_crop = crop_center(augment_batch(key, x, None, cfg)[0], 22, 22)
    crop_then_aug = augment_batch(key, crop_center(x, 22, 22), None, cfg)[0]
    np.testing.assert_array_equal(
        np.asarray(full_then_crop), np.asarray(crop_then_aug)
    )


def test_intensity_and_noise_touch_image_only():
    x, y = _xy()
    cfg = AugmentConfig(
        hflip=False, vflip=False, rot90=False,
        intensity_scale=0.2, intensity_shift=0.1, noise_std=0.05,
    )
    xa, ya = augment_batch(jax.random.PRNGKey(0), x, y, cfg)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(y))
    assert not np.array_equal(np.asarray(xa), np.asarray(x))


def test_flattened_onehot_label_roundtrip():
    """augment_train_batch handles the flattened one-hot label form the
    multi-step scan path feeds and returns it in the same form."""
    x, y = _xy()
    y1h = one_hot_flatten(y, 3)
    cfg = AugmentConfig(rot90=True)
    xa, ya = augment_train_batch(jnp.int32(5), x, y1h, 22, cfg, seed=0)
    assert ya.shape == y1h.shape
    # consistent with augmenting the int form under the same step key
    xb, yb = augment_train_batch(jnp.int32(5), x, y, 22, cfg, seed=0)
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ya).reshape(8, 22, 22, 3), -1),
        np.asarray(yb),
    )


def test_sharding_invariant_randomness():
    """The same global batch augments identically on one device and as 8
    shard_map shards (per-image keys from the GLOBAL index)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from supernet_tpu.parallel import make_mesh

    assert jax.device_count() >= 8
    x, y = _xy(b=8)
    cfg = AugmentConfig(rot90=True, intensity_scale=0.1, noise_std=0.01)
    key = jax.random.PRNGKey(11)
    ref_x, ref_y = augment_batch(key, x, y, cfg)

    mesh = make_mesh(8)
    f = shard_map(
        lambda xs, ys: augment_batch(key, xs, ys, cfg, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    got_x, got_y = f(x, y)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(ref_x))
    np.testing.assert_array_equal(np.asarray(got_y), np.asarray(ref_y))


def test_train_step_with_augmentation_runs_and_differs():
    tc = dataclasses.replace(
        HIPPOCAMPUS.train, batch_size=4,
        augment=AugmentConfig(rot90=True, noise_std=0.01),
    )
    x, y = _xy(b=4)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, tc)
    step = make_train_step(CFG, tc)
    new_state, m = step(state, x, y)
    assert np.isfinite(float(m.loss))
    # identical inputs at a different step counter draw different
    # augmentations -> different loss
    _, m2 = step(new_state, x, y)
    assert float(m2.loss) != float(m.loss)


def test_dp_paths_match_with_augmentation():
    """GSPMD-jit and shard_map train steps produce identical updates with
    augmentation enabled (the global-index key derivation)."""
    from supernet_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )

    assert jax.device_count() >= 8
    tc = dataclasses.replace(
        HIPPOCAMPUS.train, batch_size=8,
        augment=AugmentConfig(rot90=True, intensity_scale=0.1),
    )
    x, y = _xy(b=8)
    results = []
    for use_shard_map in (False, True):
        mesh = make_mesh(8)
        params = init_params(jax.random.PRNGKey(0), CFG)
        state, _ = create_train_state(params, tc)
        state = replicate(mesh, state)
        xs, ys = shard_batch(mesh, x, y)
        step = make_sharded_train_step(
            CFG, tc, mesh, use_shard_map=use_shard_map
        )
        new_state, metrics = step(state, xs, ys)
        results.append((new_state, metrics))
    (s0, m0), (s1, m1) = results
    assert float(m0.loss) == pytest.approx(float(m1.loss), rel=1e-6)
    for name in s0.params:
        for w in ("w_mu", "w_sigma"):
            np.testing.assert_allclose(
                np.asarray(s0.params[name][w]),
                np.asarray(s1.params[name][w]),
                rtol=2e-6,
                atol=1e-7,
                err_msg=f"{name}/{w}",
            )


def test_trainer_disables_train_curves_with_augment(tmp_path, capsys):
    """With augmentation on, the Trainer must not record per-structure
    TRAIN curves (the step's predictions are of the augmented batch, the
    host labels are not) — validation curves stay on."""
    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.trainer import Trainer

    exp = dataclasses.replace(
        HIPPOCAMPUS,
        model=CFG,
        train=dataclasses.replace(
            HIPPOCAMPUS.train, batch_size=4, epochs=1,
            augment=AugmentConfig(),
        ),
    )
    x, y = synthetic_dataset(CFG, 8, seed=0)
    ds = PickleDataset(x, y, 1)
    tr = Trainer(exp, ds, ds, out_dir=str(tmp_path / "run"))
    assert tr.track_train_curves is False and tr.track_curves is True
    tr.run()
    assert "train_dice_anterior" not in tr.history  # no corrupted curves
    assert len(tr.history["val_dice_anterior"]) == 1  # val intact
    assert np.isfinite(tr.history["train_loss"][-1])


def test_augment_volumes_consistency_and_crop_commute():
    """3-D augmentation: label moves exactly with the image; spatial ops
    commute with the symmetric center crop; intensity touches x only."""
    from supernet_tpu.data import augment_volumes
    from supernet_tpu.ops.moments3d import crop_center3d

    rng = np.random.default_rng(9)
    y = jnp.asarray(rng.integers(0, 3, (4, 12, 12, 12)).astype(np.int32))
    x = y[..., None].astype(jnp.float32)
    cfg = AugmentConfig(rot90=True)
    xa, ya = augment_volumes(jax.random.PRNGKey(2), x, y, cfg)
    np.testing.assert_array_equal(
        np.asarray(xa[..., 0]).astype(np.int32), np.asarray(ya)
    )
    assert not np.array_equal(np.asarray(ya), np.asarray(y))

    key = jax.random.PRNGKey(5)
    full_then_crop = crop_center3d(
        augment_volumes(key, x, None, cfg)[0], 8, 8, 8
    )
    crop_then_aug = augment_volumes(
        key, crop_center3d(x, 8, 8, 8), None, cfg
    )[0]
    np.testing.assert_array_equal(
        np.asarray(full_then_crop), np.asarray(crop_then_aug)
    )


def test_trainer3d_with_augmentation_runs():
    from supernet_tpu.data import synthetic_volumes
    from supernet_tpu.train3d import make_train_step3d
    from supernet_tpu.train import create_train_state
    from supernet_tpu.models import init_params3d

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    tc = dataclasses.replace(
        HIPPOCAMPUS.train, batch_size=2,
        augment=AugmentConfig(rot90=True, noise_std=0.01),
    )
    x, y = synthetic_volumes(cfg, 2, seed=0)
    yc = y[:, 3:13, 3:13, 3:13]
    params = init_params3d(jax.random.PRNGKey(0), cfg)
    state, _ = create_train_state(params, tc)
    step = make_train_step3d(cfg, tc)
    state, m = step(state, jnp.asarray(x), jnp.asarray(yc))
    assert np.isfinite(float(m.loss))
    _, m2 = step(state, jnp.asarray(x), jnp.asarray(yc))
    assert float(m2.loss) != float(m.loss)  # step-keyed draws differ


def test_volume_flip_flags_gate_their_documented_axes():
    """AugmentConfig axis semantics in the 3-D path: dflip = scan (D),
    vflip = H, hflip = W — each flag alone can only change its own axis
    (regression: hflip used to gate BOTH in-plane axes and vflip the D
    axis, contradicting the config's field docs)."""
    from supernet_tpu.data import augment_volumes

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (8, 6, 6, 6, 1)).astype(np.float32))

    def _changed_axes(cfg):
        xa = np.asarray(augment_volumes(jax.random.PRNGKey(0), x, None,
                                        cfg)[0])
        xn = np.asarray(x)
        axes = set()
        for i in range(len(xn)):
            if np.array_equal(xa[i], xn[i]):
                continue
            for ax, flipped in (("D", xn[i, ::-1]),
                                ("H", xn[i, :, ::-1]),
                                ("W", xn[i, :, :, ::-1])):
                if np.array_equal(xa[i], flipped):
                    axes.add(ax)
        return axes

    base = dict(hflip=False, vflip=False, dflip=False)
    assert _changed_axes(
        AugmentConfig(**{**base, "dflip": True})) <= {"D"}
    assert _changed_axes(
        AugmentConfig(**{**base, "vflip": True})) <= {"H"}
    assert _changed_axes(
        AugmentConfig(**{**base, "hflip": True})) <= {"W"}
    # with 8 volumes at p=0.5 per volume, at least one flip fires
    assert _changed_axes(AugmentConfig(**{**base, "dflip": True}))
