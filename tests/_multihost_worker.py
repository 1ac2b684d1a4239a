"""Worker process for the real 2-process multi-host test
(tests/test_multihost.py::test_two_process_bringup_and_step).

Run as:  python tests/_multihost_worker.py <out_dir>

Environment (set by the spawning test): SUPERNET_COORDINATOR,
SUPERNET_NUM_PROCESSES, SUPERNET_PROCESS_ID, JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=2 (2 local devices per
process -> a 4-device global mesh over 2 OS processes, gloo collectives).

Each worker: distributed bring-up via `initialize_from_env`, feeds ONLY
its `process_local_rows` slice of a deterministic global batch through
`global_batch` (`make_array_from_process_local_data`), runs ONE sharded
train step over the global mesh, and writes its view of the loss and a
param leaf — the parent asserts both workers equal the single-process
update. The underscore name keeps pytest from collecting this file."""

import os
import sys


def main() -> int:
    out_dir = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import init_params
    from supernet_tpu.parallel import (
        global_batch,
        global_mesh,
        initialize_from_env,
        make_sharded_train_step,
        process_local_rows,
        replicate,
    )
    from supernet_tpu.train import create_train_state

    assert initialize_from_env(), "coordinator env not picked up"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert len(jax.local_devices()) == 2

    cfg = dataclasses.replace(
        HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
    )
    tc = dataclasses.replace(HIPPOCAMPUS.train, batch_size=8)

    # every process draws the SAME deterministic global batch, then feeds
    # only its contiguous row block — the Trainer multi-host feed contract
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (8, cfg.image_size, cfg.image_size, 1)).astype(
        np.float32
    )
    y = rng.integers(
        0, cfg.n_classes, (8, cfg.out_size, cfg.out_size)
    ).astype(np.int32)

    mesh = global_mesh()
    lo, hi = process_local_rows(8)
    xs, ys = global_batch(mesh, x[lo:hi], y[lo:hi])

    params = init_params(jax.random.PRNGKey(0), cfg)
    state, _ = create_train_state(params, tc)
    state = replicate(mesh, state)
    step = make_sharded_train_step(cfg, tc, mesh)
    new_state, m = step(state, xs, ys)

    # replicated outputs: every process holds a full local replica — read
    # it via addressable_data (device_get would reject the global array)
    loss = float(np.asarray(m.loss.addressable_data(0)))
    leaf = np.asarray(
        new_state.params["conv_input"]["w_mu"].addressable_data(0)
    )
    pid = jax.process_index()
    np.savez(
        os.path.join(out_dir, f"worker_{pid}.npz"),
        loss=loss,
        leaf=leaf,
        rows=np.asarray([lo, hi]),
    )
    # let both processes finish collectives before teardown
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
