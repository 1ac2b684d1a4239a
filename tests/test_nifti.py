"""Raw-data ingestion tests: NIfTI-1 reader/writer round-trips, the
slice-extraction protocol, and the convert -> ShardDataset -> Trainer
pipeline on synthetic .nii.gz fixtures (VERDICT r2 #5; BASELINE.json
north star — the reference ships no extraction code)."""

import dataclasses
import gzip
import json
import os
import struct

import numpy as np
import pytest

from supernet_tpu.data import (
    ShardDataset,
    convert_nifti_dir,
    read_nifti,
    volume_to_slices,
    write_nifti,
)


def test_nifti_roundtrip_f32(tmp_path):
    vol = np.random.default_rng(0).normal(size=(7, 9, 5)).astype(np.float32)
    p = str(tmp_path / "v.nii")
    write_nifti(p, vol)
    out, hdr = read_nifti(p)
    np.testing.assert_array_equal(out, vol)
    assert hdr["shape"] == (7, 9, 5)


def test_nifti_roundtrip_gzip_int16_4d(tmp_path):
    vol = np.random.default_rng(1).integers(
        -100, 100, (6, 8, 4, 2)
    ).astype(np.int16)
    p = str(tmp_path / "v.nii.gz")
    write_nifti(p, vol)
    out, hdr = read_nifti(p)
    np.testing.assert_array_equal(out, vol)
    assert hdr["shape"] == (6, 8, 4, 2)
    # really gzip on disk
    with open(p, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"


def test_nifti_fortran_order(tmp_path):
    """NIfTI data is column-major; the fastest-varying axis must be X."""
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    p = str(tmp_path / "v.nii")
    write_nifti(p, vol)
    with open(p, "rb") as f:
        raw = f.read()
    first_two = np.frombuffer(raw, np.float32, count=2, offset=352)
    # element (1,0,0) follows (0,0,0) on disk
    np.testing.assert_array_equal(first_two, [vol[0, 0, 0], vol[1, 0, 0]])


def test_nifti_scl_slope_and_big_endian(tmp_path):
    """Hand-built big-endian header with scl_slope=2, scl_inter=0.5."""
    vol = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    hdr = bytearray(348)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 4)  # int16
    struct.pack_into(">h", hdr, 72, 16)
    struct.pack_into(">f", hdr, 108, 352.0)
    struct.pack_into(">2f", hdr, 112, 2.0, 0.5)
    hdr[344:348] = b"n+1\x00"
    p = str(tmp_path / "be.nii")
    with open(p, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4)
        f.write(vol.astype(">i2").tobytes(order="F"))
    out, h = read_nifti(p)
    assert h["byteorder"] == ">"
    np.testing.assert_allclose(out, vol.astype(np.float32) * 2.0 + 0.5)


def test_nifti_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.nii")
    with open(p, "wb") as f:
        f.write(b"\x00" * 400)
    with pytest.raises(ValueError, match="NIfTI"):
        read_nifti(p)


def test_volume_to_slices_normalize_pad_filter():
    rng = np.random.default_rng(2)
    img = rng.uniform(10.0, 50.0, (10, 12, 4)).astype(np.float32)
    lbl = np.zeros((10, 12, 4), np.int16)
    lbl[4:6, 5:7, 1] = 1  # only slice z=1 has foreground
    lbl[3, 3, 3] = 2  # and slice z=3
    x, y = volume_to_slices(img, lbl, image_size=16)
    assert x.shape == (2, 16, 16, 1) and y.shape == (2, 16, 16)
    # per-volume min-max normalization to [0, 1]
    assert 0.0 <= x.min() and x.max() <= 1.0
    # symmetric zero-pad: original (10, 12) centered in 16x16
    assert (x[0, :3, :, 0] == 0).all() and (x[0, 13:, :, 0] == 0).all()
    assert (x[0, :, :2, 0] == 0).all() and (x[0, :, 14:, 0] == 0).all()
    # label values preserved exactly through the pad
    assert set(np.unique(y)) == {0, 1, 2}
    # keep_empty keeps every slice
    x_all, y_all = volume_to_slices(img, lbl, image_size=16, keep_empty=True)
    assert len(x_all) == 4


def test_volume_to_slices_crop_and_modalities():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (20, 24, 3, 4)).astype(np.float32)  # 4 modalities
    lbl = np.ones((20, 24, 3), np.int16)
    x, y = volume_to_slices(img, lbl, image_size=12)
    assert x.shape == (3, 12, 12, 4) and y.shape == (3, 12, 12)
    # center crop: rows 4..16 of the original (20 -> 12), cols 6..18
    ref = img[:, :, 0, :]
    lo0, lo1 = (20 - 12) // 2, (24 - 12) // 2
    # normalization is per-modality min-max over the volume
    flat = img.reshape(-1, 4)
    norm = (ref - flat.min(0)) / (flat.max(0) - flat.min(0) + 0)
    np.testing.assert_allclose(
        x[0], norm[lo0 : lo0 + 12, lo1 : lo1 + 12, :], rtol=1e-5, atol=1e-5
    )


def _write_msd_task(root, n_vols=2, shape=(20, 26, 5), n_classes=3, seed=0):
    """Synthetic Medical-Segmentation-Decathlon task dir of .nii.gz pairs."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(root, "labelsTr"), exist_ok=True)
    total = 0
    for i in range(n_vols):
        img = rng.uniform(0, 100, shape).astype(np.float32)
        lbl = np.zeros(shape, np.uint8)
        for z in range(shape[2]):
            if z % 2 == 0:  # half the slices carry foreground
                lbl[
                    shape[0] // 3 : shape[0] // 2,
                    shape[1] // 3 : shape[1] // 2,
                    z,
                ] = rng.integers(1, n_classes)
                total += 1
        write_nifti(os.path.join(root, "imagesTr", f"case_{i:03d}.nii.gz"), img)
        write_nifti(
            os.path.join(root, "labelsTr", f"case_{i:03d}.nii.gz"), lbl
        )
    return total


def test_convert_nifti_to_shards_to_training(tmp_path):
    """The north-star pipeline: raw .nii.gz -> convert -> native/python
    ShardDataset -> one Trainer epoch with finite loss."""
    task = str(tmp_path / "Task99_Synth")
    n_slices = _write_msd_task(task, n_vols=3, shape=(20, 26, 6))
    out = str(tmp_path / "shards")
    pairs = convert_nifti_dir(task, out, image_size=32, shard_size=4)
    assert pairs, "no shards written"
    ds = ShardDataset(out, shuffle=False)
    assert len(ds) == n_slices
    batches = list(ds.batches(4, drop_remainder=False))
    x0, y0 = batches[0]
    assert x0.shape[1:] == (32, 32, 1) and y0.shape[1:] == (32, 32)
    assert x0.dtype == np.float32 and 0.0 <= x0.min() and x0.max() <= 1.0
    assert (y0 >= 0).all()

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.trainer import Trainer

    exp = HIPPOCAMPUS.replace(
        model=dataclasses.replace(
            HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
        ),
        train=dataclasses.replace(
            HIPPOCAMPUS.train, batch_size=4, epochs=1, log_every=100
        ),
    )
    tr = Trainer(
        exp, ds, out_dir=str(tmp_path / "run"), track_curves=False
    )
    tr.run(epochs=1, log=lambda *_: None)
    assert np.isfinite(tr.history["train_loss"][-1])


def test_cli_convert_from_nifti(tmp_path, capsys):
    from supernet_tpu.cli import main

    task = str(tmp_path / "Task98_Synth")
    _write_msd_task(task, n_vols=2, shape=(18, 22, 4), seed=1)
    out = str(tmp_path / "shards")
    rc = main(
        [
            "convert",
            "--config",
            "hippocampus",
            "--data",
            task,
            "--from-nifti",
            "--shard-size",
            "8",
            "--out",
            out,
            "--max-volumes",
            "2",
        ]
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["shards"] >= 1
    # shards are 64x64 (the hippocampus config's image_size)
    x = np.load(os.path.join(out, "x_00000.npy"))
    assert x.shape[1:] == (64, 64, 1)


def test_volume_to_slices_border_only_foreground_dropped():
    """The foreground filter runs on the CROPPED label: a slice whose only
    foreground sits in the cropped-off border must be dropped, not kept with
    an all-background label (round-3 review fix)."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (20, 20, 2)).astype(np.float32)
    lbl = np.zeros((20, 20, 2), np.int16)
    lbl[0, 0, 0] = 1  # z=0: foreground only in the border lost by a 12-crop
    lbl[9:11, 9:11, 1] = 1  # z=1: foreground in the center
    x, y = volume_to_slices(img, lbl, image_size=12)
    assert len(x) == 1  # only the center-foreground slice survives
    assert (y[0] > 0).any()
    # keep_empty still keeps both (and the border slice's label is empty)
    x_all, y_all = volume_to_slices(img, lbl, image_size=12, keep_empty=True)
    assert len(x_all) == 2
    assert not (y_all[0] > 0).any()


def test_nifti_detached_hdr_img_pair(tmp_path):
    """'ni1' magic: voxels read from the sibling .img (round-3 review fix);
    a lone .hdr with neither .img nor inline data errors clearly."""
    import gzip
    import struct

    rng = np.random.default_rng(8)
    vol = rng.normal(0, 1, (5, 4, 3)).astype(np.float32)
    # build the pair from a written single-file .nii: header -> .hdr with
    # ni1 magic + vox_offset 0, payload -> .img
    nii = str(tmp_path / "v.nii")
    write_nifti(nii, vol)
    raw = open(nii, "rb").read()
    hdr = bytearray(raw[:348])
    hdr[344:348] = b"ni1\x00"
    struct.pack_into("<f", hdr, 108, 0.0)  # vox_offset: .img data at 0
    (tmp_path / "pair.hdr").write_bytes(bytes(hdr))
    (tmp_path / "pair.img").write_bytes(raw[352:])
    out, h = read_nifti(str(tmp_path / "pair.hdr"))
    np.testing.assert_array_equal(out, vol)
    # gzipped companion works too
    (tmp_path / "pz.hdr").write_bytes(bytes(hdr))
    with gzip.open(tmp_path / "pz.img.gz", "wb") as f:
        f.write(raw[352:])
    out2, _ = read_nifti(str(tmp_path / "pz.hdr"))
    np.testing.assert_array_equal(out2, vol)
    # lone header with no companion and no inline data: clear error
    (tmp_path / "lone.hdr").write_bytes(bytes(hdr))
    with pytest.raises(ValueError, match="no companion"):
        read_nifti(str(tmp_path / "lone.hdr"))


def test_volume_to_cube_nifti_to_3d_model():
    """NIfTI volume -> normalized cube -> 3-D VDP U-Net forward: the raw
    3-D ingestion path for the volumetric family (`models/unet3d.py`)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.data import volume_to_cube
    from supernet_tpu.models import forward3d, init_params3d

    rng = np.random.default_rng(11)
    img = rng.uniform(100.0, 900.0, (20, 12, 9)).astype(np.float32)
    lbl = np.zeros((20, 12, 9), np.int16)
    lbl[8:12, 4:8, 3:6] = 2
    x, y = volume_to_cube(img, lbl, size=16)
    assert x.shape == (16, 16, 16, 1) and y.shape == (16, 16, 16)
    assert 0.0 <= x.min() and x.max() <= 1.0  # normalized
    assert set(np.unique(y)) == {0, 2}  # labels exact through crop/pad
    # crop on the long axis, pad on the short ones
    assert (x[:, :2, :, 0] == 0).all() and (x[:, :, :3, 0] == 0).all()

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    params = init_params3d(jax.random.PRNGKey(0), cfg)
    probs, sigma = forward3d(params, jnp.asarray(x[None]), cfg)
    assert probs.shape == (1, 1000, cfg.n_classes)
    assert np.isfinite(np.asarray(probs)).all()

    # unlabeled volumes get all-background labels
    x2, y2 = volume_to_cube(img, None, size=16)
    assert not y2.any()
