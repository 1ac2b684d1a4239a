"""One-compiled-program volumetric ensemble training
(`ensemble.EnsembleTrainer3D` + `train3d.make_ensemble_train_step3d`).

The contract under test mirrors the 2-D file: member k of the one-program
run matches a sequential `Trainer3D` seeded ``seed + k`` — same init
(PRNGKey(seed+k)), same per-epoch permutations (default_rng(seed+k)), same
augmentation keying — to float32 tolerance."""

import dataclasses
import os

import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.data import synthetic_volumes
from supernet_tpu.ensemble import EnsembleTrainer3D
from supernet_tpu.train import index_tree
from supernet_tpu.train3d import Trainer3D

EXP = HIPPOCAMPUS.replace(
    model=dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    ),
    train=dataclasses.replace(
        HIPPOCAMPUS.train, batch_size=2, epochs=2, log_every=100
    ),
)

X, Y = synthetic_volumes(EXP.model, 6, seed=0)


def _sequential_members(tmp_path, k_members, epochs=2):
    finals = []
    for k in range(k_members):
        exp_k = EXP.replace(
            train=dataclasses.replace(EXP.train, seed=EXP.train.seed + k)
        )
        tr = Trainer3D(exp_k, X, Y, out_dir=str(tmp_path / f"seq_{k}"))
        state = tr.run(epochs=epochs, log=lambda *_: None)
        finals.append((state.params, tr.history))
    return finals


def _assert_params_match(expect_params, got_stacked, k, msg):
    got = index_tree(got_stacked, k)
    for layer, p in expect_params.items():
        for name, val in p.items():
            np.testing.assert_allclose(
                np.asarray(got[layer][name]), np.asarray(val),
                rtol=2e-4, atol=1e-5, err_msg=f"{msg}: member {k} "
                f"{layer}/{name}",
            )


def test_scan_matches_sequential_trainer3d(tmp_path):
    seq = _sequential_members(tmp_path, 2)
    ens = EnsembleTrainer3D(
        EXP, 2, X, Y, out_dir=str(tmp_path / "ens"), member_mode="scan"
    )
    assert ens.member_mode == "scan"
    state = ens.run(epochs=2, log=lambda *_: None)
    for k, (seq_params, seq_hist) in enumerate(seq):
        _assert_params_match(seq_params, state.params, k, "scan vs seq")
        np.testing.assert_allclose(
            ens.histories[k]["train_loss"], seq_hist["train_loss"],
            rtol=1e-4,
        )
    # checkpoint layout: member_{k}/epoch_{N} + history pickle, the same
    # surface `cli eval3d/predict3d --checkpoint a,b` consumes
    for k in range(2):
        d = os.path.join(str(tmp_path / "ens"), f"member_{k}")
        assert os.path.isdir(os.path.join(d, "epoch_1")), d
        assert os.path.exists(os.path.join(d, "history.pkl"))


def test_vmap_matches_scan(tmp_path):
    runs = {}
    for mode in ("scan", "vmap", "unroll"):
        ens = EnsembleTrainer3D(
            EXP, 2, X, Y, out_dir=str(tmp_path / mode), member_mode=mode
        )
        runs[mode] = (ens, ens.run(epochs=1, log=lambda *_: None))
    for k in range(2):
        expect = index_tree(runs["scan"][1].params, k)
        _assert_params_match(expect, runs["vmap"][1].params, k,
                             "vmap vs scan")
        _assert_params_match(expect, runs["unroll"][1].params, k,
                             "unroll vs scan")


def test_validation_and_artifacts(tmp_path):
    ens = EnsembleTrainer3D(
        EXP, 2, X[:4], Y[:4], X[4:], Y[4:],
        out_dir=str(tmp_path / "v"), member_mode="scan",
    )
    ens.run(epochs=1, log=lambda *_: None)
    for k, h in enumerate(ens.histories):
        assert len(h["val_loss"]) == 1
        assert len(h["val_dice"]) == 1
        d = os.path.join(str(tmp_path / "v"), f"member_{k}")
        # the Trainer3D-parity artifact set: curves + center-slice report
        assert os.path.exists(os.path.join(d, "train_loss.png"))
        assert os.path.exists(os.path.join(d, "uncertainty_info.pkl"))


def test_member_sharded_mesh(tmp_path):
    from supernet_tpu.parallel import make_mesh_for_batch

    mesh = make_mesh_for_batch(2)
    ens = EnsembleTrainer3D(
        EXP, 2, X, Y, out_dir=str(tmp_path / "mesh"), mesh=mesh
    )
    assert ens.member_mode == "vmap"
    state = ens.run(epochs=1, log=lambda *_: None)
    # numerics: the mesh run matches the single-device vmap run
    ref = EnsembleTrainer3D(
        EXP, 2, X, Y, out_dir=str(tmp_path / "ref"), member_mode="vmap"
    )
    ref_state = ref.run(epochs=1, log=lambda *_: None)
    for k in range(2):
        _assert_params_match(
            index_tree(ref_state.params, k), state.params, k,
            "mesh vs single-device vmap",
        )


def test_scan_rejected_on_mesh():
    from supernet_tpu.parallel import make_mesh_for_batch

    with pytest.raises(ValueError, match="vmap"):
        EnsembleTrainer3D(EXP, 2, X, Y, mesh=make_mesh_for_batch(2),
                          member_mode="scan")


def test_needs_two_members():
    with pytest.raises(ValueError, match="n_members"):
        EnsembleTrainer3D(EXP, 1, X, Y)


def test_mesh_padding_trains_any_k(tmp_path):
    """Non-dividing K pads the member axis to the mesh (VERDICT r4 #5);
    the 3 REAL members' checkpoints/histories are the product."""
    from supernet_tpu import checkpoint as ckpt
    from supernet_tpu.parallel import make_mesh

    import jax

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    ens = EnsembleTrainer3D(EXP, 3, X, Y, mesh=make_mesh(2),
                            out_dir=str(tmp_path / "pad"))
    assert ens.n_pad == 1 and ens.n_train == 4
    ens.run(epochs=1, log=lambda *_: None)
    assert len(ens.member_dirs) == 3 and len(ens.histories) == 3
    for k in range(3):
        assert ckpt.latest_epoch(os.path.join(
            str(tmp_path / "pad"), f"member_{k}")) == 0
    assert not os.path.exists(os.path.join(str(tmp_path / "pad"),
                                           "member_3"))
