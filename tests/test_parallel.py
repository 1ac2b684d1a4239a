"""Distributed tests without a cluster (SURVEY.md §4.5): the sharded train
step on an 8-device CPU mesh must produce the same parameter update as the
single-device step on the same global batch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.models import init_params
from supernet_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from supernet_tpu.train import create_train_state, make_train_step, one_hot_flatten

CFG = dataclasses.replace(
    HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
)
TC = dataclasses.replace(HIPPOCAMPUS.train, batch_size=8)


def _batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.normal(0, 1, (b, CFG.image_size, CFG.image_size, 1)).astype(
            np.float32
        )
    )
    y_img = jnp.asarray(
        rng.integers(0, CFG.n_classes, (b, CFG.out_size, CFG.out_size)).astype(
            np.int32
        )
    )
    return x, one_hot_flatten(y_img, CFG.n_classes)


def _single_device_update(x, y):
    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, TC)
    step = make_train_step(CFG, TC)
    return step(state, x, y)


@pytest.mark.parametrize("use_shard_map", [False, True])
def test_sharded_step_matches_single_device(use_shard_map):
    assert jax.device_count() >= 8, "conftest must fake 8 devices"
    x, y = _batch()
    ref_state, ref_metrics = _single_device_update(x, y)

    mesh = make_mesh(8)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, TC)
    state = replicate(mesh, state)
    xs, ys = shard_batch(mesh, x, y)
    step = make_sharded_train_step(CFG, TC, mesh, use_shard_map=use_shard_map)
    new_state, metrics = step(state, xs, ys)

    assert float(metrics.loss) == pytest.approx(
        float(ref_metrics.loss), rel=1e-5
    )
    for name in ref_state.params:
        for w in ("w_mu", "w_sigma"):
            np.testing.assert_allclose(
                np.asarray(new_state.params[name][w]),
                np.asarray(ref_state.params[name][w]),
                rtol=2e-5,
                atol=1e-6,
                err_msg=f"{name}/{w}",
            )


def test_dryrun_multichip_entrypoint():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    probs, sigma = jax.jit(fn)(*args)
    assert probs.shape == (4, 54 * 54, 3)
    assert bool(jnp.all(jnp.isfinite(probs)))


def test_sharded_forward_matches_single_device():
    """Data-parallel eval: mesh-sharded forward == single-device forward."""
    import dataclasses

    import numpy as np

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import forward, init_params
    from supernet_tpu.parallel import (
        make_mesh_for_batch,
        make_sharded_forward,
        replicate,
        shard_batch,
    )

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 1)).astype(np.float32))

    p_ref, s_ref = forward(params, x, cfg)

    mesh = make_mesh_for_batch(8)
    assert mesh.devices.size == 8
    f = make_sharded_forward(cfg, mesh)
    xp = shard_batch(mesh, x)
    p_par, s_par = f(replicate(mesh, params), xp)
    np.testing.assert_allclose(np.asarray(p_par), np.asarray(p_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_par), np.asarray(s_ref), atol=2e-5)


def test_make_mesh_for_batch_divisibility():
    from supernet_tpu.parallel import make_mesh_for_batch

    # 8 devices available; batch 20 -> largest divisor <= 8 is 5
    mesh = make_mesh_for_batch(20)
    assert mesh.devices.size == 5
    assert 20 % mesh.devices.size == 0


def test_run_testing_with_mesh(tmp_path):
    """Data-parallel evaluation end to end: run_testing over an 8-device
    mesh must produce the same metrics as the single-device protocol."""
    import dataclasses

    import numpy as np

    from supernet_tpu.configs import HIPPOCAMPUS, NoiseConfig
    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.evaluate import run_testing
    from supernet_tpu.models import init_params
    from supernet_tpu.parallel import make_mesh_for_batch

    exp = HIPPOCAMPUS.replace(
        model=dataclasses.replace(
            HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
        ),
        train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=8),
        out_dir=str(tmp_path),
    )
    x, y = synthetic_dataset(exp.model, 16, seed=0)
    ds = PickleDataset(x, y, 1)
    params = init_params(jax.random.PRNGKey(0), exp.model)

    ref = run_testing(exp, params, ds, NoiseConfig(), images_n=0,
                      out_dir=str(tmp_path / "ref"))
    mesh = make_mesh_for_batch(8)
    par = run_testing(exp, params, ds, NoiseConfig(), images_n=0,
                      out_dir=str(tmp_path / "par"), mesh=mesh)
    assert par["accuracy"] == pytest.approx(ref["accuracy"], abs=1e-6)
    assert par["dice_anterior"] == pytest.approx(
        ref["dice_anterior"], abs=1e-6
    )


def test_run_testing_with_mesh_nondivisible_tail(tmp_path):
    """The trailing partial batch is padded-and-masked under a mesh: metrics
    equal single-device on a dataset size NOT divisible by the batch."""
    import dataclasses

    from supernet_tpu.configs import HIPPOCAMPUS, NoiseConfig
    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.evaluate import run_testing
    from supernet_tpu.models import init_params
    from supernet_tpu.parallel import make_mesh_for_batch

    exp = HIPPOCAMPUS.replace(
        model=dataclasses.replace(
            HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
        ),
        train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=8),
        out_dir=str(tmp_path),
    )
    x, y = synthetic_dataset(exp.model, 13, seed=0)  # 8 + tail of 5
    ds = PickleDataset(x, y, 1)
    params = init_params(jax.random.PRNGKey(0), exp.model)

    ref = run_testing(exp, params, ds, NoiseConfig(), images_n=0,
                      out_dir=str(tmp_path / "ref"))
    par = run_testing(exp, params, ds, NoiseConfig(), images_n=0,
                      out_dir=str(tmp_path / "par"),
                      mesh=make_mesh_for_batch(8))
    for k in ("accuracy", "dice_anterior", "dice_posterior",
              "hausdorff_anterior", "sensitivity_posterior"):
        assert par[k] == pytest.approx(ref[k], abs=1e-5, nan_ok=True), k


def test_run_adversarial_with_mesh_matches_single_device(tmp_path):
    """The PGD attack itself is sharded under the mesh; adversarial metrics
    (incl. the tail batch) equal the single-device run."""
    import dataclasses

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.evaluate import run_adversarial
    from supernet_tpu.models import init_params
    from supernet_tpu.parallel import make_mesh_for_batch

    exp = HIPPOCAMPUS.replace(
        model=dataclasses.replace(
            HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
        ),
        train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=8),
        attack=dataclasses.replace(
            HIPPOCAMPUS.attack, max_adv_step=2, epsilon=0.01
        ),
        out_dir=str(tmp_path),
    )
    x, y = synthetic_dataset(exp.model, 11, seed=0)  # 8 + tail of 3
    ds = PickleDataset(x, y, 1)
    params = init_params(jax.random.PRNGKey(0), exp.model)

    ref = run_adversarial(exp, params, ds, out_dir=str(tmp_path / "ref"))
    par = run_adversarial(exp, params, ds, out_dir=str(tmp_path / "par"),
                          mesh=make_mesh_for_batch(8))
    for k in ("accuracy", "snr_db", "dice_anterior", "dice_posterior"):
        assert par[k] == pytest.approx(ref[k], rel=1e-4, nan_ok=True), k


def test_trainer_mesh_divisibility_guard():
    """The DP train path must fail fast (not at device_put) when the batch
    does not divide over the mesh (VERDICT r2 #3)."""
    import dataclasses as dc

    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.trainer import Trainer

    exp = HIPPOCAMPUS.replace(
        model=CFG, train=dc.replace(TC, batch_size=20)
    )
    x, y = synthetic_dataset(CFG, 20, seed=0)
    ds = PickleDataset(x, y, 1)
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(exp, ds, mesh=make_mesh(8))


def test_trainer_dp_default_batch_on_non_dividing_devices(tmp_path):
    """cli train --data-parallel with the default batch (20) on 8 devices:
    make_mesh_for_batch shrinks the mesh to 5 devices and training runs."""
    import dataclasses as dc

    from supernet_tpu.data import PickleDataset, synthetic_dataset
    from supernet_tpu.parallel import make_mesh_for_batch
    from supernet_tpu.trainer import Trainer

    exp = HIPPOCAMPUS.replace(
        model=CFG,
        train=dc.replace(TC, batch_size=20, epochs=1, log_every=100),
    )
    mesh = make_mesh_for_batch(20)
    assert int(np.prod(mesh.devices.shape)) == 5  # 8 -> largest divisor of 20
    x, y = synthetic_dataset(CFG, 20, seed=0)
    ds = PickleDataset(x, y, 1)
    tr = Trainer(
        exp, ds, out_dir=str(tmp_path / "dp"), mesh=mesh, track_curves=False
    )
    tr.run(epochs=1, log=lambda *_: None)
    assert np.isfinite(tr.history["train_loss"][-1])


@pytest.mark.parametrize("use_shard_map", [False, True])
def test_sharded_adversarial_training_matches_single_device(use_shard_map):
    """Adversarial TRAINING under DP must clip the attack to the GLOBAL
    batch range on both paths (round-3 review fix: the shard_map path used
    each shard's local min/max). The batch's extremes live on shard 0 only,
    so a local-range clip would produce different updates."""
    assert jax.device_count() >= 8, "conftest must fake 8 devices"
    x, y = _batch()
    x = x.at[0, 0, 0, 0].set(9.0)  # global max, on shard 0 only
    x = x.at[0, 0, 1, 0].set(-9.0)  # global min, on shard 0 only
    tc = dataclasses.replace(
        TC, adversarial_training="fgsm", adv_epsilon=0.5, adv_alpha=0.5
    )

    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, tc)
    ref_state, ref_metrics = make_train_step(CFG, tc)(state, x, y)

    mesh = make_mesh(8)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, tc)
    state = replicate(mesh, state)
    xs, ys = shard_batch(mesh, x, y)
    step = make_sharded_train_step(CFG, tc, mesh, use_shard_map=use_shard_map)
    new_state, metrics = step(state, xs, ys)

    assert float(metrics.loss) == pytest.approx(
        float(ref_metrics.loss), rel=1e-5
    )
    for name in ref_state.params:
        for w in ("w_mu", "w_sigma"):
            np.testing.assert_allclose(
                np.asarray(new_state.params[name][w]),
                np.asarray(ref_state.params[name][w]),
                rtol=2e-5,
                atol=1e-6,
                err_msg=f"{name}/{w}",
            )


def test_dp_train_step3d_matches_single_device():
    """Volumetric batch-sharded step (make_dp_train_step3d) over the
    8-device mesh == the plain-jit 3-D step on the same global batch —
    the SHARED step body guarantees identical augmentation/objective;
    this pins the GSPMD gradient reduction."""
    from supernet_tpu.parallel import make_dp_train_step3d
    from supernet_tpu.train3d import make_train_step3d

    cfg3 = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    tc3 = dataclasses.replace(HIPPOCAMPUS.train, batch_size=8)
    from supernet_tpu.models import init_params3d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (8, 16, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (8, 10, 10, 10)).astype(np.int32))

    params = init_params3d(jax.random.PRNGKey(0), cfg3)
    state, _ = create_train_state(params, tc3)
    ref_state, ref_m = make_train_step3d(cfg3, tc3)(state, x, y)

    mesh = make_mesh(8)
    params = init_params3d(jax.random.PRNGKey(0), cfg3)
    state, _ = create_train_state(params, tc3)
    state = replicate(mesh, state)
    xs, ys = shard_batch(mesh, x, y)
    new_state, m = make_dp_train_step3d(cfg3, tc3, mesh)(state, xs, ys)

    assert float(m.loss) == pytest.approx(float(ref_m.loss), rel=1e-5)
    for name in ref_state.params:
        for w in ("w_mu", "w_sigma"):
            np.testing.assert_allclose(
                np.asarray(new_state.params[name][w]),
                np.asarray(ref_state.params[name][w]),
                rtol=2e-5,
                atol=1e-6,
                err_msg=f"{name}/{w}",
            )


def test_trainer3d_batch_divisibility_guard():
    """Trainer3D(mesh, shard='batch') rejects a batch the mesh cannot
    split instead of failing inside the first dispatch."""
    from supernet_tpu.train3d import Trainer3D

    cfg3 = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    exp = HIPPOCAMPUS.replace(
        model=cfg3, train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=3)
    )
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (3, 16, 16, 16, 1)).astype(np.float32)
    y = rng.integers(0, 3, (3, 16, 16, 16)).astype(np.int32)
    with pytest.raises(ValueError, match="does not divide"):
        Trainer3D(exp, x, y, mesh=make_mesh(8), shard="batch")


def test_trainer3d_mesh_epoch_runs():
    """Trainer3D end-to-end on a 4-device mesh (batch DP, shard_batch
    feed): one epoch trains, checkpoints, and the loss is finite."""
    import os

    from supernet_tpu.data import synthetic_volumes
    from supernet_tpu.train3d import Trainer3D

    cfg3 = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    exp = HIPPOCAMPUS.replace(
        model=cfg3,
        train=dataclasses.replace(HIPPOCAMPUS.train, batch_size=4, epochs=1),
    )
    x, y = synthetic_volumes(cfg3, 4, seed=0)
    import tempfile

    with tempfile.TemporaryDirectory() as out:
        tr = Trainer3D(exp, x, y, out_dir=out, mesh=make_mesh(4),
                       shard="batch")
        tr.run(log=lambda *_: None)
        assert np.isfinite(tr.history["train_loss"][-1])
        assert os.path.isdir(os.path.join(out, "epoch_0"))
