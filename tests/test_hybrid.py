"""Hybrid data x spatial partitioning over a 2-D (data, space) mesh:
batch sharded over one axis, image H / volume D over the other, in ONE
jitted step — numerics must match the unsharded step, and the compiled
module must show both the halo collective-permutes and the gradient
all-reduce (net-new vs the reference, which has no distributed backend;
SURVEY.md §2.8)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.parallel import (
    make_hybrid_forward,
    make_hybrid_train_step,
    make_hybrid_train_step3d,
    make_mesh2d,
)


def test_make_mesh2d_shape_and_axes():
    mesh = make_mesh2d(2, 4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "space")
    with pytest.raises(ValueError, match="16 devices"):
        make_mesh2d(4, 4)


@pytest.mark.parametrize("n_data,n_space", [(2, 4), (4, 2)])
def test_hybrid_train_step_matches_unsharded(n_data, n_space):
    """One FULL training step on the (data, space) mesh equals the
    unsharded step: GSPMD shards the batch AND the image H axis, inserts
    the halo exchanges, and all-reduces the weight gradients over the
    whole mesh. Tolerance covers f32 reduction order."""
    from supernet_tpu.models import init_params
    from supernet_tpu.train import (
        create_train_state,
        make_train_step,
        one_hot_flatten,
    )

    exp = HIPPOCAMPUS
    cfg = dataclasses.replace(exp.model, base_kernels=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 2 * n_data
    x = jnp.asarray(rng.normal(0, 1, (b, 64, 64, 1)).astype(np.float32))
    y = one_hot_flatten(
        jnp.asarray(
            rng.integers(0, cfg.n_classes, (b, cfg.out_size, cfg.out_size))
            .astype(np.int32)
        ),
        cfg.n_classes,
    )

    params2 = jax.tree.map(jnp.array, params)
    state_ref, _ = create_train_state(params, exp.train)
    step_ref = make_train_step(cfg, exp.train)
    state_ref, m_ref = step_ref(state_ref, x, y)

    mesh = make_mesh2d(n_data, n_space)
    state_h, _ = create_train_state(params2, exp.train)
    step_h = make_hybrid_train_step(cfg, exp.train, mesh)
    # both collectives must actually be present in the partitioned module
    # (numeric parity alone would also pass for a silently-replicated
    # fallback): halo exchange along space + grad all-reduce
    hlo = step_h.lower(state_h, x, y).compile().as_text()
    assert "collective-permute" in hlo or "all-to-all" in hlo
    assert "all-reduce" in hlo
    state_h, m_h = step_h(state_h, x, y)

    np.testing.assert_allclose(float(m_h.loss), float(m_ref.loss), rtol=1e-5)
    for layer, ws in state_ref.params.items():
        for k, v in ws.items():
            np.testing.assert_allclose(
                np.asarray(state_h.params[layer][k]),
                np.asarray(v),
                atol=2e-5,
                err_msg=f"{layer}/{k}",
            )


def test_hybrid_forward_matches_unsharded_and_is_sharded():
    from supernet_tpu.models import forward, init_params

    cfg = dataclasses.replace(HIPPOCAMPUS.model, base_kernels=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 1)).astype(np.float32))
    ref_p, ref_s = forward(params, x, cfg)

    mesh = make_mesh2d(2, 4)
    f = make_hybrid_forward(cfg, mesh)
    # the program must actually run (data, space)-partitioned: the
    # internal re-pin to P("data", "space") makes GSPMD emit halo
    # exchanges, which show up as collective-permutes
    hlo = f.lower(params, x).compile().as_text()
    assert "collective-permute" in hlo or "all-to-all" in hlo
    got_p, got_s = f(params, x)
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(ref_p), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(ref_s), atol=2e-5
    )


def test_hybrid_train_step3d_matches_unsharded():
    """Volumetric hybrid: batch over data, D (scan) axis over space."""
    from supernet_tpu.models import init_params3d
    from supernet_tpu.train import create_train_state
    from supernet_tpu.train3d import make_train_step3d

    exp = HIPPOCAMPUS
    cfg = dataclasses.replace(
        exp.model, image_size=16, out_size=10, base_kernels=2, depth=2
    )
    params = init_params3d(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(
        rng.integers(0, cfg.n_classes, (4, 10, 10, 10)).astype(np.int32)
    )

    params2 = jax.tree.map(jnp.array, params)
    state_ref, _ = create_train_state(params, exp.train)
    step_ref = make_train_step3d(cfg, exp.train)
    state_ref, m_ref = step_ref(state_ref, x, y)

    mesh = make_mesh2d(2, 4)
    state_h, _ = create_train_state(params2, exp.train)
    step_h = make_hybrid_train_step3d(cfg, exp.train, mesh)
    state_h, m_h = step_h(state_h, x, y)

    np.testing.assert_allclose(float(m_h.loss), float(m_ref.loss), rtol=1e-5)
    for layer, ws in state_ref.params.items():
        for k, v in ws.items():
            np.testing.assert_allclose(
                np.asarray(state_h.params[layer][k]),
                np.asarray(v),
                atol=3e-5,
                err_msg=f"{layer}/{k}",
            )


def test_trainer3d_hybrid_shard_runs(tmp_path):
    """Trainer3D(shard='hybrid') on a (2, 4) mesh: trains, writes the
    epoch checkpoint, finite loss (the cli train3d --hybrid-shard path)."""
    from supernet_tpu.train3d import Trainer3D

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    tc = dataclasses.replace(HIPPOCAMPUS.train, epochs=1, batch_size=2)
    exp = dataclasses.replace(
        HIPPOCAMPUS, model=cfg, train=tc, out_dir=str(tmp_path)
    )
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (4, 16, 16, 16, 1)).astype(np.float32)
    y = rng.integers(0, cfg.n_classes, (4, 16, 16, 16)).astype(np.int32)
    tr = Trainer3D(exp, x, y, out_dir=str(tmp_path / "run"),
                   mesh=make_mesh2d(2, 4), shard="hybrid")
    tr.run(log=lambda *_: None)
    assert np.isfinite(tr.history["train_loss"][0])
    assert (tmp_path / "run" / "epoch_0").exists()


def test_trainer3d_hybrid_shard_rejects_bad_mesh():
    from supernet_tpu.parallel import make_mesh
    from supernet_tpu.train3d import Trainer3D

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    tc = dataclasses.replace(HIPPOCAMPUS.train, epochs=1, batch_size=2)
    exp = dataclasses.replace(HIPPOCAMPUS, model=cfg, train=tc)
    x = np.zeros((4, 16, 16, 16, 1), np.float32)
    y = np.zeros((4, 16, 16, 16), np.int32)
    with pytest.raises(ValueError, match="data.*space|2-D mesh"):
        Trainer3D(exp, x, y, mesh=make_mesh(8), shard="hybrid")
