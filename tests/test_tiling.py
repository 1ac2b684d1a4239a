"""Sliding-window whole-volume inference (`tiling.py`,
`serving.InferenceSession.predict_volume`, `cli predict3d`) — net-new: the
reference predicts fixed-size frames only; full-frame volumetric maps come
from tiling overlapping model cubes and blending the moment pairs."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.models import forward3d, init_params3d
from supernet_tpu.tiling import (
    output_margins,
    predict_volume,
    tile_positions,
)

TINY = dataclasses.replace(
    HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2, depth=2
)
RNG = np.random.default_rng(7)


def test_tile_positions_cover_and_clamp():
    pos = tile_positions(25, 10, 8)
    assert pos == [0, 8, 15]  # last window clamped flush (15+10=25)
    assert pos[-1] + 10 == 25
    # exact fit -> single window
    assert tile_positions(10, 10, 3) == [0]
    # full coverage at any stride
    for stride in range(1, 10):
        pos = tile_positions(23, 10, stride)
        covered = np.zeros(23, bool)
        for p in pos:
            covered[p : p + 10] = True
        assert covered.all()
    with pytest.raises(ValueError):
        tile_positions(8, 10, 4)  # tile > size: caller pads first
    with pytest.raises(ValueError):
        tile_positions(20, 10, 0)


def test_output_margins():
    assert output_margins(16, 10) == (3, 3)
    assert output_margins(17, 10) == (3, 4)  # odd shrink: front gets floor
    with pytest.raises(ValueError):
        output_margins(8, 10)


def _aligned_stub(t: int, o: int):
    """predict stub whose output tile is EXACTLY the input tile's aligned
    center crop — so a correct grid/blend reconstructs the original volume
    verbatim at every voxel, for ANY overlap and weighting (all
    contributing tiles agree everywhere)."""
    lo, _ = output_margins(t, o)

    def predict(tiles: np.ndarray):
        crop = tiles[:, lo : lo + o, lo : lo + o, lo : lo + o, 0]
        probs = np.stack([crop, 1.0 - crop], axis=-1)
        return probs, 2.0 * probs
    return predict


@pytest.mark.parametrize("weight", ["uniform", "gaussian"])
@pytest.mark.parametrize("overlap", [0, 4, 7])
def test_blend_reconstructs_aligned_stub(weight, overlap):
    t, o = 16, 10
    # anisotropic, odd, one axis smaller than the output cube
    vol = RNG.uniform(0.1, 0.9, (23, 17, 8)).astype(np.float32)
    probs, sigma = predict_volume(
        _aligned_stub(t, o), vol, t, o, overlap=overlap, weight=weight
    )
    assert probs.shape == vol.shape + (2,)
    assert sigma.shape == vol.shape + (2,)
    np.testing.assert_allclose(probs[..., 0], vol, rtol=0, atol=1e-5)
    np.testing.assert_allclose(sigma[..., 0], 2.0 * vol, rtol=0, atol=1e-5)
    np.testing.assert_allclose(
        probs.sum(axis=-1), 1.0, rtol=0, atol=1e-6
    )


def test_single_tile_equals_direct_forward():
    """A volume of exactly out_size^3 with zero padding is ONE tile whose
    input equals the hand-padded cube — predict_volume must reproduce the
    direct forward bit-for-bit (pins the grid/margin/blend indexing)."""
    t, o = TINY.image_size, TINY.out_size
    lo, hi = output_margins(t, o)
    params = init_params3d(jax.random.PRNGKey(0), TINY)
    vol = RNG.uniform(0, 1, (o, o, o, 1)).astype(np.float32)

    def predict(tiles):
        p, s = forward3d(params, tiles, TINY)
        shape = (len(tiles), o, o, o, TINY.n_classes)
        return np.asarray(p).reshape(shape), np.asarray(s).reshape(shape)

    probs, sigma = predict_volume(
        predict, vol, t, o, overlap=0, weight="gaussian",
        pad_mode="constant",
    )
    x = np.pad(vol, ((lo, hi), (lo, hi), (lo, hi), (0, 0)))[None]
    p_ref, s_ref = predict(x)
    np.testing.assert_allclose(probs, p_ref[0], rtol=0, atol=1e-6)
    np.testing.assert_allclose(sigma, s_ref[0], rtol=0, atol=1e-6)


def test_session_predict_volume_multi_tile():
    """InferenceSession.predict_volume on a volume larger than the model
    cube on two axes: full-frame simplex probs + positive finite sigma."""
    from supernet_tpu.serving import InferenceSession

    params = init_params3d(jax.random.PRNGKey(1), TINY)
    sess = InferenceSession(params, TINY, batch_size=4, volumetric=True)
    vol = RNG.uniform(0, 1, (20, 14, 9)).astype(np.float32)
    probs, sigma = sess.predict_volume(vol, overlap=4)
    assert probs.shape == (20, 14, 9, TINY.n_classes)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    assert np.isfinite(probs).all() and np.isfinite(sigma).all()
    assert (sigma >= 0).all() and sigma.max() > 0
    with pytest.raises(ValueError):
        InferenceSession(params, TINY, batch_size=4).predict_volume(vol)


def test_streaming_groups_equal_single_call():
    """tiles_per_call only bounds memory — any group size blends to the
    same result."""
    from supernet_tpu.tiling import predict_tiled

    t, o = 16, 10
    stub = _aligned_stub(t, o)
    vol = RNG.uniform(0.1, 0.9, (23, 17, 12, 1)).astype(np.float32)
    ref = predict_tiled(stub, vol, t, o, overlap=4, tiles_per_call=10_000)
    for n in (1, 3, 4):
        got = predict_tiled(stub, vol, t, o, overlap=4, tiles_per_call=n)
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])


@pytest.mark.parametrize("weight", ["uniform", "gaussian"])
def test_blend_reconstructs_aligned_stub_2d(weight):
    """The N-D core through the 2-D wrapper: same reconstruction identity
    with rank-2 tiles."""
    from supernet_tpu.tiling import predict_image

    t, o = 16, 10
    lo, _ = output_margins(t, o)

    def predict(tiles):
        crop = tiles[:, lo : lo + o, lo : lo + o, 0]
        probs = np.stack([crop, 1.0 - crop], axis=-1)
        return probs, 3.0 * probs

    img = RNG.uniform(0.1, 0.9, (27, 13)).astype(np.float32)
    probs, sigma = predict_image(predict, img, t, o, overlap=5,
                                 weight=weight)
    assert probs.shape == img.shape + (2,)
    np.testing.assert_allclose(probs[..., 0], img, atol=1e-5)
    np.testing.assert_allclose(sigma[..., 0], 3.0 * img, atol=1e-5)


def test_session_predict_image_2d():
    """A 2-D InferenceSession tiles an off-protocol slice size through the
    fixed 64->54 Hippocampus geometry."""
    from supernet_tpu.models import init_params
    from supernet_tpu.serving import InferenceSession

    cfg = HIPPOCAMPUS.model  # 64 -> 54
    params = init_params(jax.random.PRNGKey(2), cfg)
    sess = InferenceSession(params, cfg, batch_size=4)
    img = RNG.uniform(0, 1, (80, 47)).astype(np.float32)
    probs, sigma = sess.predict_image(img, overlap=10)
    assert probs.shape == (80, 47, cfg.n_classes)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    assert np.isfinite(sigma).all() and (sigma >= 0).all()
    with pytest.raises(ValueError):
        params3 = init_params3d(jax.random.PRNGKey(0), TINY)
        InferenceSession(
            params3, TINY, batch_size=4, volumetric=True
        ).predict_image(img)


def test_cli_predict3d_npy(tmp_path, capsys):
    """cli predict3d end-to-end on a .npy volume: segmentation +
    uncertainty maps written, JSON summary printed."""
    from supernet_tpu import cli

    vol = RNG.uniform(0, 1, (18, 12, 12)).astype(np.float32)
    vpath = os.path.join(tmp_path, "vol.npy")
    np.save(vpath, vol)
    out = os.path.join(tmp_path, "out")
    rc = cli.main([
        "predict3d", "--config", "hippocampus", "--volume", vpath,
        "--cube-size", "16", "--base-kernels", "2", "--depth", "2",
        "--overlap", "2", "--out-dir", out, "--save-probs",
    ])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    meta = json.loads(line)
    seg = np.load(os.path.join(out, "segmentation.npy"))
    unc = np.load(os.path.join(out, "uncertainty.npy"))
    probs = np.load(os.path.join(out, "probs.npy"))
    assert seg.shape == vol.shape and seg.dtype == np.int32
    assert unc.shape == vol.shape and (unc >= 0).all()
    assert probs.shape == vol.shape + (3,)
    assert meta["volume"] == [18, 12, 12, 1]
    assert sum(meta["class_voxels"]) == vol.size
    # uncertainty map is sigma at the predicted class
    np.testing.assert_allclose(
        unc,
        np.take_along_axis(
            np.load(os.path.join(out, "sigma.npy")),
            seg[..., None], axis=-1,
        )[..., 0],
        atol=0,
    )


def test_cli_predict3d_directory(tmp_path, capsys):
    """Directory mode: every volume under --volume is segmented through
    ONE compiled session; outputs are per-case prefixed."""
    from supernet_tpu import cli

    vdir = os.path.join(tmp_path, "imagesTs")
    os.makedirs(vdir)
    for name, shape in (("caseA", (12, 12, 12)), ("caseB", (14, 11, 12))):
        np.save(os.path.join(vdir, f"{name}.npy"),
                RNG.uniform(0, 1, shape).astype(np.float32))
    out = os.path.join(tmp_path, "out")
    rc = cli.main([
        "predict3d", "--config", "hippocampus", "--volume", vdir,
        "--cube-size", "16", "--base-kernels", "2", "--depth", "2",
        "--out-dir", out,
    ])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2
    assert np.load(os.path.join(out, "caseA_segmentation.npy")).shape == \
        (12, 12, 12)
    assert np.load(os.path.join(out, "caseB_uncertainty.npy")).shape == \
        (14, 11, 12)


def test_cli_train3d_ensemble_then_predict3d(tmp_path, capsys):
    """The deep-ensemble loop: train3d --ensemble 2 writes member_{k}/
    checkpoint dirs and a checkpoint_arg comma list that predict3d
    serves as one mixture (EnsembleSession); the ensemble uncertainty
    map covers the whole volume and differs from member 0 alone."""
    from supernet_tpu import cli

    shape = ["--cube-size", "16", "--depth", "2", "--base-kernels", "2"]
    base = os.path.join(tmp_path, "ens")
    rc = cli.main([
        "train3d", "--config", "hippocampus", "--synthetic", "4",
        "--batch-size", "2", "--epochs", "1", "--val-frac", "0",
        *shape, "--out-dir", base, "--ensemble", "2",
    ])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["members"] == 2 and len(meta["final"]) == 2
    for k in (0, 1):
        assert os.path.isdir(os.path.join(base, f"member_{k}", "epoch_0"))

    vpath = os.path.join(tmp_path, "vol.npy")
    np.save(vpath, RNG.uniform(0, 1, (18, 12, 12)).astype(np.float32))

    def _predict(ckpt, out):
        rc = cli.main([
            "predict3d", "--config", "hippocampus", "--volume", vpath,
            *shape, "--checkpoint", ckpt, "--out-dir", out,
        ])
        assert rc == 0
        capsys.readouterr()
        return np.load(os.path.join(out, "uncertainty.npy"))

    unc_ens = _predict(meta["checkpoint_arg"], os.path.join(tmp_path, "pe"))
    unc_m0 = _predict(meta["dirs"][0], os.path.join(tmp_path, "p0"))
    assert unc_ens.shape == (18, 12, 12) and (unc_ens >= 0).all()
    # two independently-initialized members must disagree somewhere
    assert not np.allclose(unc_ens, unc_m0)
