"""Spatial (halo-exchange) partitioning: the H-sharded VDP conv must agree
exactly with the unsharded VALID conv after trimming the edge rows
(SURVEY.md §2.8/§7.4 — the spatial analog of sequence parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.ops import vconv
from supernet_tpu.parallel import make_mesh
from supernet_tpu.parallel.spatial import make_spatial_vconv, trim_valid


@pytest.mark.parametrize("n_dev", [4, 8])
def test_spatial_vconv_matches_unsharded(n_dev):
    assert jax.device_count() >= n_dev
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    h = 8 * n_dev  # H_loc = 8 per device
    mu = jnp.asarray(rng.normal(0, 1, (2, h, 20, 8)).astype(np.float32))
    sg = jnp.abs(jnp.asarray(rng.normal(0, 1, (2, h, 20, 8)).astype(np.float32)))
    w = jnp.asarray(0.3 * rng.normal(0, 1, (3, 3, 8, 6)).astype(np.float32))
    ws = jnp.asarray(rng.normal(0, 1, (6,)).astype(np.float32) - 4.0)

    mu_ref, sg_ref = vconv(mu, sg, w, ws)

    f = make_spatial_vconv(mesh)
    mu_sp, sg_sp = f(mu, sg, w, ws)
    # sharded output carries H (not H-2) rows; trim the zero-halo edges
    assert mu_sp.shape[1] == h
    mu_sp, sg_sp = trim_valid(mu_sp), trim_valid(sg_sp)
    np.testing.assert_allclose(np.asarray(mu_sp), np.asarray(mu_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sg_sp), np.asarray(sg_ref), atol=2e-5)


def test_spatial_vconv_is_actually_sharded():
    """The output of the sharded conv must be H-sharded over the mesh (the
    point is 1/D activation memory per device)."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(0, 1, (1, 32, 16, 4)).astype(np.float32))
    sg = jnp.abs(mu)
    w = jnp.asarray(0.3 * rng.normal(0, 1, (3, 3, 4, 4)).astype(np.float32))
    ws = jnp.asarray(rng.normal(0, 1, (4,)).astype(np.float32) - 4.0)
    mu_sp, _ = make_spatial_vconv(mesh)(mu, sg, w, ws)
    spec = mu_sp.sharding.spec
    assert spec[1] == "data", spec


def test_spatial_encoder_block_matches_unsharded():
    """conv+relu -> conv+relu -> pool across 8 shards == the unsharded
    block after trimming one pooled garbage row per global edge."""
    from supernet_tpu.ops import vconv_relu, vmaxpool
    from supernet_tpu.parallel.spatial import make_spatial_encoder_block

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    h = 8 * 8  # H_loc = 8
    mu = jnp.asarray(rng.normal(0, 1, (2, h, 24, 4)).astype(np.float32))
    sg = jnp.abs(jnp.asarray(rng.normal(0, 1, (2, h, 24, 4)).astype(np.float32)))
    w1 = jnp.asarray(0.3 * rng.normal(0, 1, (3, 3, 4, 8)).astype(np.float32))
    ws1 = jnp.asarray(rng.normal(0, 1, (8,)).astype(np.float32) - 4.0)
    w2 = jnp.asarray(0.3 * rng.normal(0, 1, (3, 3, 8, 8)).astype(np.float32))
    ws2 = jnp.asarray(rng.normal(0, 1, (8,)).astype(np.float32) - 4.0)

    # unsharded reference block
    m, s = vconv_relu(mu, sg, w1, ws1)
    m, s = vconv_relu(m, s, w2, ws2)
    m_ref, s_ref = vmaxpool(m, s)

    f = make_spatial_encoder_block(mesh)
    m_sp, s_sp = f(mu, sg, w1, ws1, w2, ws2)
    # sharded pooled output has one extra (garbage) row per global edge
    assert m_sp.shape[1] == m_ref.shape[1] + 2
    m_sp, s_sp = trim_valid(m_sp), trim_valid(s_sp)
    np.testing.assert_allclose(np.asarray(m_sp), np.asarray(m_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_sp), np.asarray(s_ref), atol=2e-5)


def test_spatial_forward_matches_unsharded():
    """The FULL Hippocampus U-Net forward with the image H axis sharded
    over 8 devices (GSPMD spatial partitioning via sharding constraints,
    make_spatial_forward) equals the unsharded forward."""
    import dataclasses

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import init_params
    from supernet_tpu.models.unet import forward
    from supernet_tpu.parallel import make_spatial_forward

    cfg = dataclasses.replace(HIPPOCAMPUS.model, base_kernels=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 1)).astype(np.float32))

    p_ref, s_ref = jax.jit(lambda p, xx: forward(p, xx, cfg))(params, x)

    mesh = make_mesh(8)
    f = make_spatial_forward(cfg, mesh)
    p_sp, s_sp = f(params, x)
    np.testing.assert_allclose(np.asarray(p_sp), np.asarray(p_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_sp), np.asarray(s_ref), atol=2e-5)


def test_spatial_train_step_matches_unsharded():
    """One FULL training step (loss + grads + Adam + clipnorm) with the
    image H axis sharded over 8 devices equals the unsharded step —
    GSPMD partitions the backward's halo exchanges and all-reduces the
    weight gradients. Tolerance covers f32 reduction-order differences."""
    import dataclasses

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import init_params
    from supernet_tpu.parallel import make_spatial_train_step
    from supernet_tpu.train import (
        create_train_state,
        make_train_step,
        one_hot_flatten,
    )

    exp = HIPPOCAMPUS
    cfg = dataclasses.replace(exp.model, base_kernels=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 1)).astype(np.float32))
    y = one_hot_flatten(
        jnp.asarray(
            rng.integers(0, cfg.n_classes, (2, cfg.out_size, cfg.out_size))
            .astype(np.int32)
        ),
        cfg.n_classes,
    )

    # independent buffer copies: both steps donate their carried state
    params2 = jax.tree.map(jnp.array, params)
    state_ref, _ = create_train_state(params, exp.train)
    step_ref = make_train_step(cfg, exp.train)
    state_ref, m_ref = step_ref(state_ref, x, y)

    mesh = make_mesh(8)
    state_sp, _ = create_train_state(params2, exp.train)
    step_sp = make_spatial_train_step(cfg, exp.train, mesh)
    # the step must actually execute H-sharded: GSPMD's halo exchanges
    # show up as collective-permutes in the partitioned module (numeric
    # parity alone would also pass for a silently-replicated fallback)
    hlo = step_sp.lower(state_sp, x, y).compile().as_text()
    assert "collective-permute" in hlo or "all-to-all" in hlo
    state_sp, m_sp = step_sp(state_sp, x, y)

    np.testing.assert_allclose(
        float(m_sp.loss), float(m_ref.loss), rtol=1e-5
    )
    for layer, ws in state_ref.params.items():
        for k, v in ws.items():
            np.testing.assert_allclose(
                np.asarray(state_sp.params[layer][k]),
                np.asarray(v),
                atol=2e-5,
                err_msg=f"{layer}/{k}",
            )


def test_spatial_forward3d_matches_unsharded():
    """Volumetric forward with the D axis sharded over the 8-device mesh
    equals the unsharded forward3d — GSPMD inserts the 3-D halo
    exchanges."""
    import dataclasses

    from supernet_tpu.models import forward3d, init_params3d
    from supernet_tpu.parallel import make_mesh, make_spatial_forward3d

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16, 1)).astype(np.float32))
    params = init_params3d(jax.random.PRNGKey(0), cfg)
    ref_p, ref_s = forward3d(params, x, cfg)
    mesh = make_mesh(8)
    f = make_spatial_forward3d(cfg, mesh)
    got_p, got_s = f(params, x)
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(ref_p), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(ref_s), rtol=1e-4, atol=1e-6
    )


def test_spatial_train_step3d_matches_unsharded():
    import dataclasses

    from supernet_tpu.models import init_params3d
    from supernet_tpu.parallel import make_mesh, make_spatial_train_step3d
    from supernet_tpu.train import create_train_state
    from supernet_tpu.train3d import make_train_step3d

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=2,
        depth=2,
    )
    tc = dataclasses.replace(HIPPOCAMPUS.train, batch_size=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (2, 10, 10, 10)).astype(np.int32))

    params = init_params3d(jax.random.PRNGKey(0), cfg)
    state, _ = create_train_state(params, tc)
    ref_state, ref_m = make_train_step3d(cfg, tc)(state, x, y)

    params = init_params3d(jax.random.PRNGKey(0), cfg)
    state, _ = create_train_state(params, tc)
    step = make_spatial_train_step3d(cfg, tc, make_mesh(8))
    new_state, m = step(state, x, y)
    assert float(m.loss) == pytest.approx(float(ref_m.loss), rel=1e-5)
    for name in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(new_state.params[name]["w_mu"]),
            np.asarray(ref_state.params[name]["w_mu"]),
            rtol=2e-5,
            atol=1e-6,
            err_msg=name,
        )
