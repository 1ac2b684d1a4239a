"""2-D -> 3-D parameter inflation (models/inflate.py): mean path and
s_w-driven variance terms must be EXACT on depth-constant inputs; the
full 3-D model must accept the inflated tree and train."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.models import (
    inflate_params3d,
    init_params,
    init_params3d,
    softplus_inverse,
)


def _tiny_cfg():
    return dataclasses.replace(
        HIPPOCAMPUS.model, image_size=16, out_size=10, base_kernels=4,
        depth=2,
    )


def test_softplus_inverse_roundtrip():
    y = jnp.asarray([1e-4, 0.1, 1.0, 20.0, 80.0], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softplus(softplus_inverse(y))),
        np.asarray(y),
        rtol=1e-5,
    )


def test_inflated_tree_matches_3d_structure():
    cfg = _tiny_cfg()
    p2 = init_params(jax.random.PRNGKey(0), cfg)
    p3 = inflate_params3d(p2, cfg)
    ref = init_params3d(jax.random.PRNGKey(0), cfg)
    assert set(p3) == set(ref)
    for name, ws in ref.items():
        assert p3[name]["w_mu"].shape == ws["w_mu"].shape, name
        assert p3[name]["w_sigma"].shape == ws["w_sigma"].shape, name


def test_inflate_rejects_mismatched_checkpoint():
    cfg = _tiny_cfg()
    p2 = init_params(jax.random.PRNGKey(0), cfg)
    other = dataclasses.replace(cfg, base_kernels=8)
    with pytest.raises(ValueError, match="do not match"):
        inflate_params3d(p2, other)
    with pytest.raises(ValueError, match="missing"):
        inflate_params3d({"conv_input": p2["conv_input"]}, cfg)


def test_inflated_input_conv_is_exact_on_depth_constant_input():
    """vconv_input with inflated weights on a depth-replicated volume:
    every depth tap of the 3-D output equals the 2-D layer's output, for
    BOTH moments (the window sum over the k depth taps contributes a
    factor k that cancels the sigma/k inflation exactly)."""
    from supernet_tpu.ops.moments import vconv_input
    from supernet_tpu.ops.moments3d import vconv3d_input

    cfg = _tiny_cfg()
    p2 = init_params(jax.random.PRNGKey(0), cfg)
    p3 = inflate_params3d(p2, cfg)
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 1)).astype(np.float32))
    x3 = jnp.broadcast_to(x2[:, None], (2, 12, 12, 12, 1))

    w2 = p2["conv_input"]
    mu2, sg2 = vconv_input(x2, w2["w_mu"], w2["w_sigma"])
    w3 = p3["conv_input"]
    mu3, sg3 = vconv3d_input(x3, w3["w_mu"], w3["w_sigma"])

    for d in range(mu3.shape[1]):
        np.testing.assert_allclose(
            np.asarray(mu3[:, d]), np.asarray(mu2), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sg3[:, d]), np.asarray(sg2), rtol=1e-4, atol=1e-6
        )


def test_inflated_encoder_chain_mean_path_is_exact():
    """conv+relu x2 + pool with inflated weights on a depth-constant
    volume reproduces the 2-D mean activations at every surviving depth
    tap (depth constancy is preserved through the whole encoder)."""
    from supernet_tpu.ops.moments import vconv_input, vconv_relu, vmaxpool
    from supernet_tpu.ops.moments3d import (
        vconv3d_input,
        vconv3d_relu,
        vmaxpool3d,
    )

    cfg = _tiny_cfg()
    p2 = init_params(jax.random.PRNGKey(1), cfg)
    p3 = inflate_params3d(p2, cfg)
    rng = np.random.default_rng(1)
    x2 = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 1)).astype(np.float32))
    x3 = jnp.broadcast_to(x2[:, None], (2, 16, 16, 16, 1))

    m2, s2 = vconv_input(x2, p2["conv_input"]["w_mu"],
                         p2["conv_input"]["w_sigma"])
    from supernet_tpu.ops.moments import vrelu
    m2, s2 = vrelu(m2, s2)
    m2, s2 = vconv_relu(m2, s2, p2["conv1"]["w_mu"], p2["conv1"]["w_sigma"])
    m2, _ = vmaxpool(m2, s2)

    from supernet_tpu.ops.moments3d import vrelu as vrelu3d
    m3, s3 = vconv3d_input(x3, p3["conv_input"]["w_mu"],
                           p3["conv_input"]["w_sigma"])
    m3, s3 = vrelu3d(m3, s3)
    m3, s3 = vconv3d_relu(m3, s3, p3["conv1"]["w_mu"],
                          p3["conv1"]["w_sigma"])
    m3, _ = vmaxpool3d(m3, s3)

    for d in range(m3.shape[1]):
        np.testing.assert_allclose(
            np.asarray(m3[:, d]), np.asarray(m2), atol=2e-5
        )


def test_training_from_inflated_init_runs():
    """A full 3-D train step from an inflated init executes, produces a
    finite loss, and updates every layer."""
    from supernet_tpu.train import create_train_state
    from supernet_tpu.train3d import make_train_step3d

    cfg = _tiny_cfg()
    tc = HIPPOCAMPUS.train
    p2 = init_params(jax.random.PRNGKey(2), cfg)
    p3 = inflate_params3d(p2, cfg)
    p3_before = jax.tree.map(np.asarray, p3)
    state, _ = create_train_state(p3, tc)
    step = make_train_step3d(cfg, tc)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(
        rng.integers(0, cfg.n_classes, (2, 10, 10, 10)).astype(np.int32)
    )
    state, m = step(state, x, y)
    assert np.isfinite(float(m.loss))
    for name, ws in p3_before.items():
        assert not np.allclose(
            np.asarray(state.params[name]["w_mu"]), ws["w_mu"]
        ), name


def test_trainer3d_accepts_inflated_initial_params(tmp_path):
    """Trainer3D(initial_params=...) trains FROM the inflated tree (the
    cli train3d --init-from-2d path): the first checkpointed epoch's
    params must descend from the transfer init, not a random draw."""
    from supernet_tpu.configs import ExperimentConfig, TrainConfig
    from supernet_tpu.train3d import Trainer3D

    cfg = _tiny_cfg()
    tc = dataclasses.replace(
        HIPPOCAMPUS.train, epochs=1, batch_size=2
    )
    exp = dataclasses.replace(
        HIPPOCAMPUS, model=cfg, train=tc, out_dir=str(tmp_path)
    )
    p2 = init_params(jax.random.PRNGKey(5), cfg)
    p3 = inflate_params3d(p2, cfg)
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, 16, 16, 16, 1)).astype(np.float32)
    y = rng.integers(0, cfg.n_classes, (2, 16, 16, 16)).astype(np.int32)
    tr = Trainer3D(exp, x, y, out_dir=str(tmp_path / "run"),
                   initial_params=p3)
    state = tr.run()
    # one Adam step moves each weight by at most ~lr from the init;
    # a random init would differ at O(mean_sigma) >> lr
    got = np.asarray(state.params["conv_input"]["w_mu"])
    want = np.asarray(p3["conv_input"]["w_mu"])
    steps = max(1, len(x) // tc.batch_size) * tc.epochs
    assert np.max(np.abs(got - want)) <= 2.0 * tc.lr * steps + 1e-6
