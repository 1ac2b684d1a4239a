"""Multi-host helpers (`parallel/multihost.py`): row-partition math for
arbitrary process counts, single-process equivalence of `global_batch`
with `shard_batch`, a train step consuming process-local-built arrays, and
the env-gated initialize no-op."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.models import init_params
from supernet_tpu.parallel import (
    global_batch,
    global_mesh,
    make_mesh,
    make_sharded_train_step,
    process_local_rows,
    replicate,
    shard_batch,
)
from supernet_tpu.train import create_train_state, make_train_step, one_hot_flatten

CFG = dataclasses.replace(
    HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
)
TC = dataclasses.replace(HIPPOCAMPUS.train, batch_size=8)


def test_process_local_rows_partition():
    """Equal contiguous blocks in process order; exact cover; divisibility
    enforced."""
    rows = [process_local_rows(24, pi, 4) for pi in range(4)]
    assert rows == [(0, 6), (6, 12), (12, 18), (18, 24)]
    with pytest.raises(ValueError, match="divide"):
        process_local_rows(10, 0, 4)
    # defaults read the live (single-process) runtime
    assert process_local_rows(8) == (0, 8)


def test_global_batch_equals_shard_batch_single_process():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (8, 4, 4, 1)).astype(np.float32)
    mesh = global_mesh()
    assert mesh.devices.size == jax.device_count()
    ga = global_batch(mesh, x)
    ref = shard_batch(make_mesh(), jnp.asarray(x))
    assert ga.shape == ref.shape
    assert ga.sharding.is_equivalent_to(ref.sharding, ndim=ga.ndim)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(ref))


def test_train_step_on_process_local_arrays():
    """The sharded train step runs on arrays assembled via
    make_array_from_process_local_data and matches the single-device
    update — the multi-host feed path, exercised in its 1-process case."""
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (8, CFG.image_size, CFG.image_size, 1)).astype(
        np.float32
    )
    y = rng.integers(0, CFG.n_classes, (8, CFG.out_size, CFG.out_size)).astype(
        np.int32
    )

    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, TC)
    ref_state, ref_m = make_train_step(CFG, TC)(
        state, jnp.asarray(x), one_hot_flatten(jnp.asarray(y), CFG.n_classes)
    )

    mesh = global_mesh()
    lo, hi = process_local_rows(8)
    xs, ys = global_batch(mesh, x[lo:hi], y[lo:hi])
    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, TC)
    state = replicate(mesh, state)
    step = make_sharded_train_step(CFG, TC, mesh)
    new_state, m = step(state, xs, ys)
    assert float(m.loss) == pytest.approx(float(ref_m.loss), rel=1e-5)
    for name in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(new_state.params[name]["w_mu"]),
            np.asarray(ref_state.params[name]["w_mu"]),
            rtol=2e-5,
            atol=1e-6,
        )


def test_initialize_from_env_noop(monkeypatch):
    from supernet_tpu.parallel import multihost

    monkeypatch.delenv("SUPERNET_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize_from_env() is False
