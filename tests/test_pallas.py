"""Fused Pallas VDP-conv kernel vs the XLA moments path (SURVEY.md §7.2
step 10): forward equality and custom-VJP gradient equality, run in
interpreter mode so they hold on CPU CI as well as on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.ops.pallas import vdp_conv, vdp_conv_reference

CASES = [
    # k, cin, cout, H, fuse_relu, has_sigma
    (3, 8, 16, 12, False, True),
    (3, 8, 16, 12, True, True),
    (2, 8, 8, 10, False, True),
    (1, 16, 4, 9, False, True),
    (3, 1, 8, 12, False, False),
]


def _setup(k, cin, cout, h, has_sigma, seed=0):
    rng = np.random.default_rng(seed)

    def t(*s):
        return jnp.asarray(rng.normal(0, 1, s).astype(np.float32))

    mu = t(2, h, h, cin)
    sigma = jnp.abs(t(2, h, h, cin)) if has_sigma else None
    w_mu = 0.3 * t(k, k, cin, cout)
    w_sigma = t(cout) - 5.0
    return mu, sigma, w_mu, w_sigma


@pytest.mark.parametrize("k,cin,cout,h,fuse,has_sigma", CASES)
def test_forward_matches_xla(k, cin, cout, h, fuse, has_sigma):
    mu, sigma, w_mu, w_sigma = _setup(k, cin, cout, h, has_sigma)
    got = vdp_conv(mu, sigma, w_mu, w_sigma, fuse_relu=fuse, interpret=True)
    want = vdp_conv_reference(mu, sigma, w_mu, w_sigma, fuse_relu=fuse)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


@pytest.mark.parametrize("k,cin,cout,h,fuse,has_sigma", CASES)
def test_grad_matches_xla(k, cin, cout, h, fuse, has_sigma):
    mu, sigma, w_mu, w_sigma = _setup(k, cin, cout, h, has_sigma)

    def loss_pallas(*args):
        a, b = vdp_conv(*args, fuse_relu=fuse, interpret=True)
        return jnp.sum(a * a) + jnp.sum(jnp.sin(b))

    def loss_ref(*args):
        a, b = vdp_conv_reference(*args, fuse_relu=fuse)
        return jnp.sum(a * a) + jnp.sum(jnp.sin(b))

    argnums = (0, 1, 2, 3) if has_sigma else (0, 2, 3)
    gp = jax.grad(loss_pallas, argnums)(mu, sigma, w_mu, w_sigma)
    gr = jax.grad(loss_ref, argnums)(mu, sigma, w_mu, w_sigma)
    for a, b in zip(gp, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4
        )


def test_model_forward_pallas_backend_matches():
    """Whole-model forward parity between backends (interpret on CPU)."""
    import dataclasses

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import forward, init_params
    from supernet_tpu.ops import moments
    from supernet_tpu.ops.pallas import vdp_conv as _  # noqa: F401

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 1)).astype(np.float32))

    p_ref, s_ref = forward(params, x, cfg)

    from supernet_tpu.ops.pallas import vdp_conv as real_vdp_conv
    import supernet_tpu.ops.pallas as pk
    import functools

    orig = pk.vdp_conv
    pk.vdp_conv = functools.partial(real_vdp_conv, interpret=True)
    moments.set_backend("pallas")
    try:
        p_pal, s_pal = forward(params, x, cfg)
    finally:
        moments.set_backend("xla")
        pk.vdp_conv = orig

    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), atol=1e-5)


class TestPallasPool:
    """Fused Pallas max-pool kernels vs the XLA where-tree composition
    (ops/pallas/pool.py): bit-exact forward AND backward, including
    first-occurrence tie routing; interpreter mode so it runs on CPU."""

    def _setup(self, shape, ties=True, seed=0):
        from supernet_tpu.ops import pallas as P

        rng = np.random.default_rng(seed)
        if ties:
            mu = jnp.asarray(
                rng.integers(-3, 3, shape).astype(np.float32)
            )
        else:
            mu = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        sigma = jnp.abs(jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)))
        return mu, sigma

    @pytest.mark.parametrize("shape,ties", [
        ((2, 8, 8, 32), True),
        ((1, 12, 16, 8), False),
        ((3, 4, 4, 130), True),  # >1 lane tile
    ])
    def test_pool_fwd_bwd_matches_xla(self, shape, ties):
        from supernet_tpu.ops.moments import _vmaxpool_fast
        from supernet_tpu.ops.pallas import pool as pool_mod

        mu, sigma = self._setup(shape, ties)
        pool_mod.set_interpret(True)
        try:
            a1, b1 = jax.jit(_vmaxpool_fast)(mu, sigma)
            a2, b2 = jax.jit(pool_mod.vmaxpool_pallas)(mu, sigma)
            np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

            def mkloss(f):
                def L(m, s):
                    o1, o2 = f(m, s)
                    return jnp.sum(o1 * 1.3) + jnp.sum(o2 * 0.7)

                return jax.jit(jax.grad(L, argnums=(0, 1)))

            g1 = mkloss(_vmaxpool_fast)(mu, sigma)
            g2 = mkloss(pool_mod.vmaxpool_pallas)(mu, sigma)
            for x, y in zip(g1, g2):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        finally:
            pool_mod.set_interpret(False)

    def test_pool_impl_knob(self):
        from supernet_tpu.ops import get_pool_impl, set_pool_impl

        assert get_pool_impl() == "xla"
        set_pool_impl("pallas")
        assert get_pool_impl() == "pallas"
        set_pool_impl("xla")
        with pytest.raises(ValueError):
            set_pool_impl("nope")

    def test_odd_shape_falls_back(self):
        # odd spatial dims are outside the kernel envelope: vmaxpool with
        # pool impl forced to pallas must still work (XLA fallback)
        from supernet_tpu.ops import set_pool_impl, vmaxpool
        from supernet_tpu.ops.moments import _vmaxpool_fast

        mu, sigma = self._setup((2, 7, 9, 4))
        set_pool_impl("pallas")
        try:
            a2, b2 = vmaxpool(mu, sigma)
        finally:
            set_pool_impl("xla")
        a1, b1 = _vmaxpool_fast(mu, sigma)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
