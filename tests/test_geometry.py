"""Geometry tests: the exact VALID/unpool/pad/crop size chains of both
reference models (SURVEY.md §4.2), pinned against the comment traces at
`Hippocampus.py:375-418` and `Brats.py:379-455`."""

import jax
import jax.numpy as jnp
import pytest

from supernet_tpu.configs import BRATS, HIPPOCAMPUS, LUNGS
from supernet_tpu.models import VDPUNet, layer_names


def test_hippocampus_io_shapes():
    """Shape-only: the numeric forward is covered by
    test_forward_jits_and_no_nan (eager eval here would recompute 12 convs
    op-by-op on the 1-CPU test host)."""
    cfg = HIPPOCAMPUS.model
    model = VDPUNet(cfg)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((2, 64, 64, 1), jnp.float32)
    probs, sigma = jax.eval_shape(model.apply, params, x)
    assert probs.shape == (2, 54 * 54, 3)
    assert sigma.shape == (2, 54 * 54, 3)


def test_brats_io_shapes():
    """Shape-only (jax.eval_shape): the full 204x204 depth-5 forward is too
    slow for the 1-CPU test host; the geometry chain is what's under test."""
    cfg = BRATS.model
    model = VDPUNet(cfg)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, 204, 204, 4), jnp.float32)
    probs, sigma = jax.eval_shape(model.apply, params, x)
    assert probs.shape == (1, 186 * 186, 5)
    assert sigma.shape == (1, 186 * 186, 5)


def test_lungs_io_shapes():
    cfg = LUNGS.model
    model = VDPUNet(cfg)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(1))
    x = jax.ShapeDtypeStruct((1, 128, 128, 1), jnp.float32)
    probs, _ = jax.eval_shape(model.apply, params, x)
    assert probs.shape == (1, 118 * 118, 2)


def test_hippocampus_layer_inventory():
    """Layer names/shapes match the reference model attributes
    (Hippocampus.py:343-363): 12 conv layers total."""
    names = layer_names(HIPPOCAMPUS.model)
    got = {n: (k, ci, co) for n, k, ci, co in names}
    assert got == {
        "conv_input": (3, 1, 32),
        "conv1": (3, 32, 32),
        "conv2": (3, 32, 64),
        "conv3": (3, 64, 64),
        "conv4": (3, 64, 128),
        "conv5": (3, 128, 128),
        "up1_conv2x2": (2, 128, 64),
        "up1_conv1": (3, 128, 64),
        "up1_conv2": (3, 64, 64),
        "up2_conv2x2": (2, 64, 32),
        "up2_conv1": (3, 64, 32),
        "up2_conv2": (3, 32, 32),
        "conv_final": (1, 32, 3),
    }


def test_brats_layer_inventory():
    """Brats.py:331-367: encoder to 512 channels, 4 decoder blocks."""
    names = layer_names(BRATS.model)
    got = {n: (k, ci, co) for n, k, ci, co in names}
    assert got["conv_input"] == (3, 4, 32)
    assert got["conv8"] == (3, 256, 512)
    assert got["conv9"] == (3, 512, 512)
    assert got["up1_conv2x2"] == (2, 512, 256)
    assert got["up4_conv2"] == (3, 32, 32)
    assert got["conv_final"] == (1, 32, 5)
    assert len(got) == 2 * 5 + 3 * 4 + 1


def _shape_chain(cfg, image_size, in_channels):
    """Record every intermediate H via the forward's tap under eval_shape."""
    import dataclasses

    from supernet_tpu.models import init_params
    from supernet_tpu.models.unet import forward

    cfg = dataclasses.replace(cfg, remat=False)  # remat re-traces blocks
    rec = {}

    def tap(name, shape):
        rec[name] = shape[1]

    params = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, image_size, image_size, in_channels), jnp.float32)
    jax.eval_shape(lambda p, xx: forward(p, xx, cfg, tap=tap), params, x)
    return rec


def test_hippocampus_intermediate_chain():
    """The full documented geometry chain (`Hippocampus.py:375-418`):
    64 -> 62 -> 60 -> 30 -> 28 -> 26 -> 13 -> 11 -> 9 -> 18 -> 24 -> 22 ->
    26 -> 24 -> 48 -> 54 -> 52 -> 56 -> 54. A pad/crop choreography change
    whose errors cancel at the output cannot pass this."""
    rec = _shape_chain(HIPPOCAMPUS.model, 64, 1)
    assert rec == {
        "conv_input": 62, "conv1": 60, "pool0": 30,
        "conv2": 28, "conv3": 26, "pool1": 13,
        "conv4": 11, "conv5": 9,
        "up1_conv2x2": 18, "up1_pad": 24, "up1_concat": 24,
        "up1_conv1": 22, "up1_pad2": 26, "up1_conv2": 24,
        "up2_conv2x2": 48, "up2_pad": 54, "up2_concat": 54,
        "up2_conv1": 52, "up2_pad2": 56, "up2_conv2": 54,
        "conv_final": 54,
    }


def test_brats_intermediate_chain():
    """The depth-5 BraTS chain incl. the (1,0) bottleneck pre-pad
    (`Brats.py:379-455`)."""
    rec = _shape_chain(BRATS.model, 204, 4)
    assert rec == {
        "conv_input": 202, "conv1": 200, "pool0": 100,
        "conv2": 98, "conv3": 96, "pool1": 48,
        "conv4": 46, "conv5": 44, "pool2": 22,
        "conv6": 20, "conv7": 18, "pool3": 9,
        "pre_pad": 10, "conv8": 8, "conv9": 6,
        "up1_conv2x2": 12, "up1_pad": 18, "up1_concat": 18,
        "up1_conv1": 16, "up1_pad2": 20, "up1_conv2": 18,
        "up2_conv2x2": 36, "up2_pad": 42, "up2_concat": 42,
        "up2_conv1": 40, "up2_pad2": 44, "up2_conv2": 42,
        "up3_conv2x2": 84, "up3_pad": 90, "up3_concat": 90,
        "up3_conv1": 88, "up3_pad2": 92, "up3_conv2": 90,
        "up4_conv2x2": 180, "up4_pad": 186, "up4_concat": 186,
        "up4_conv1": 184, "up4_pad2": 188, "up4_conv2": 186,
        "conv_final": 186,
    }


def test_param_count_and_init_ranges():
    cfg = HIPPOCAMPUS.model
    model = VDPUNet(cfg)
    params = model.init(jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves(params)
    total = sum(x.size for x in flat)
    assert total == model.n_params
    # w_mu truncated at 2 std of 0.1
    for name, p in params.items():
        assert float(jnp.max(jnp.abs(p["w_mu"]))) <= 0.2 + 1e-6
        lo = float(jnp.min(p["w_sigma"]))
        hi = float(jnp.max(p["w_sigma"]))
        if name in ("up1_conv2x2", "up2_conv2x2", "conv_final"):
            assert -4.6 <= lo and hi <= -2.2
        else:
            assert -12.0 <= lo and hi <= -4.6


def test_forward_jits_and_no_nan():
    cfg = HIPPOCAMPUS.model
    model = VDPUNet(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 1))
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    probs, sigma = fwd(params, x)
    assert bool(jnp.all(jnp.isfinite(probs)))
    assert bool(jnp.all(jnp.isfinite(sigma)))
    assert bool(jnp.all(sigma >= 0.0))
    # probabilities sum to 1 per pixel
    import numpy as np

    np.testing.assert_allclose(
        jnp.sum(probs, axis=-1), jnp.ones(probs.shape[:2]), rtol=1e-5
    )
