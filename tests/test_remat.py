"""cfg.remat (jax.checkpoint over encoder/decoder blocks) must not change
numerics: forward and gradients identical with and without rematerialization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.models import forward, init_params
from supernet_tpu.train import loss_fn, one_hot_flatten


def test_remat_forward_and_grads_match():
    base = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
    )
    remat = dataclasses.replace(base, remat=True)
    params = init_params(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 1)).astype(np.float32))
    y = one_hot_flatten(
        jnp.asarray(rng.integers(0, 3, (2, 22, 22)).astype(np.int32)), 3
    )

    p0, s0 = forward(params, x, base)
    p1, s1 = forward(params, x, remat)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)

    tc = HIPPOCAMPUS.train
    g0 = jax.grad(lambda p: loss_fn(p, x, y, base, tc)[0])(params)
    g1 = jax.grad(lambda p: loss_fn(p, x, y, remat, tc)[0])(params)
    for (k0, v0), (k1, v1) in zip(
        sorted(g0.items()), sorted(g1.items())
    ):
        assert k0 == k1
        for w in ("w_mu", "w_sigma"):
            np.testing.assert_allclose(
                np.asarray(v0[w]), np.asarray(v1[w]), atol=1e-6, err_msg=k0
            )
