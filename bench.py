"""Benchmark: VDP U-Net training throughput (images/sec/chip) + MFU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}

Baselines (the reference publishes no numbers, BASELINE.md):
- ``vs_baseline`` — ratio against a conservative ESTIMATE of the reference
  TF2 implementation's single-GPU rate (~100 img/s Hippocampus); recorded
  here and revisited if the reference ever becomes runnable.
- ``vs_baseline_measured`` — ratio against the reference's *algorithm*
  (patch-matmul VDP convs, ops/naive.py) trained end-to-end on THIS chip
  via ``set_backend("naive")`` — a measured same-hardware denominator.

MFU: analytic MXU FLOPs (supernet_tpu/flops.py, fwd + 2x bwd) over the
chip's bf16 peak (device_kind table; override SUPERNET_TPU_PEAK_TFLOPS).

Env knobs: SUPERNET_BENCH_MODEL=hippocampus|brats|lungs (default
hippocampus), SUPERNET_BENCH_ITERS, SUPERNET_BENCH_EXTRA=1 (also bench the
other models into extra fields), SUPERNET_BENCH_BASELINE=1|0 (force/skip
the measured naive baseline; default: on for Hippocampus only — BraTS's
patch matrices at batch 20 are ~GB-scale transients),
SUPERNET_PRECISION, SUPERNET_BACKEND, SUPERNET_DATA_PARALLEL=1.
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


def _exp(name):
    from supernet_tpu.configs import BRATS, HIPPOCAMPUS, LUNGS

    return {"hippocampus": HIPPOCAMPUS, "brats": BRATS, "lungs": LUNGS}[name]


def _bench_model(name: str, n_iters: int, data_parallel: bool) -> dict:
    """Measure one model's train-step throughput; returns the stats dict."""
    import jax
    import jax.numpy as jnp

    from supernet_tpu import flops as F
    from supernet_tpu.models import init_params
    from supernet_tpu.train import (
        create_train_state,
        make_multi_train_step,
        make_train_step,
        one_hot_flatten,
    )

    exp = _exp(name)
    cfg, tc = exp.model, exp.train
    batch = tc.batch_size
    if data_parallel:
        batch = batch * jax.device_count()
    # K steps per dispatch via lax.scan — the trainer's epoch-on-device
    # path (trainer.py steps_per_dispatch): amortizes the per-dispatch
    # host round-trip (~0.6 ms on a relayed transport).
    # SUPERNET_BENCH_DISPATCH=1 measures the per-step dispatch path.
    k_steps = int(os.environ.get("SUPERNET_BENCH_DISPATCH", "8"))
    from supernet_tpu.ops import get_backend

    if data_parallel or get_backend() == "naive":
        k_steps = 1  # mesh path and GB-scale naive transients stay per-step

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(
            0, 1, (batch, cfg.image_size, cfg.image_size, cfg.in_channels)
        ).astype(np.float32)
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
    elif k_steps > 1:
        x = jnp.broadcast_to(x[None], (k_steps,) + x.shape)
        y = jnp.broadcast_to(y[None], (k_steps,) + y.shape)
        step = make_multi_train_step(cfg, tc, k_steps)
    else:
        step = make_train_step(cfg, tc)

    # Warmup / compile. NOTE: completion is forced by fetching the loss to
    # the host — on relayed/remote TPU transports (axon), block_until_ready
    # acks dispatch rather than device completion, which inflates rates by
    # orders of magnitude; a value fetch cannot return early.
    state, metrics = step(state, x, y)
    float(jax.numpy.min(metrics.loss))

    n_disp = max(1, n_iters // k_steps)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, metrics = step(state, x, y)
    assert float(jax.numpy.min(metrics.loss)) > -1e30  # fetch = completion
    dt = time.perf_counter() - t0
    n_iters = n_disp * k_steps

    n_dev = jax.device_count() if data_parallel else 1
    ips = n_iters * batch / dt  # global
    flops_img = F.forward_flops(cfg, 1) * 3.0  # train step, per image
    flops_s = ips * flops_img
    return {
        "images_per_sec": round(ips / n_dev, 2),  # per chip
        "flops_per_image_g": round(flops_img / 1e9, 3),
        "tflops_per_sec": round(flops_s / n_dev / 1e12, 3),
        "mfu": round(F.mfu(flops_s / n_dev), 4),
        "batch": batch,
        "devices": n_dev,
        "global_images_per_sec": round(ips, 2),
    }


def main() -> None:
    import jax

    from supernet_tpu import flops as F
    from supernet_tpu.ops import set_backend, set_mxu_precision

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
    # SUPERNET_ACT_DTYPE=float32|bfloat16 — inter-layer activation dtype.
    # bf16 halves the HBM traffic of this data-movement-bound model; the
    # loss head and all conv accumulations stay f32 (ops/moments.py). The
    # bench measures the TPU production mode — bf16 — by default (300-step
    # Hippocampus loss curve matches f32-high to 0.41%, within f32-default's
    # own 0.24% deviation; docs/PERFORMANCE.md); the library default stays
    # f32 for reference-exact numerics. Set SUPERNET_ACT_DTYPE=float32 to
    # bench the conservative mode.
    from supernet_tpu.ops import set_act_dtype

    set_act_dtype(os.environ.get("SUPERNET_ACT_DTYPE", "bfloat16"))
    # SUPERNET_CONV_FOLD=none|sigma|full — variance-path kernel fusion mode
    # (see ops/moments.py); default is the module default (measured best).
    fold = os.environ.get("SUPERNET_CONV_FOLD")
    if fold:
        from supernet_tpu.ops import set_conv_fold

        set_conv_fold(fold)

    model = os.environ.get("SUPERNET_BENCH_MODEL", "hippocampus")
    n_iters = int(os.environ.get("SUPERNET_BENCH_ITERS", "200"))
    data_parallel = (
        os.environ.get("SUPERNET_DATA_PARALLEL", "0") == "1"
        and jax.device_count() > 1
    )

    stats = _bench_model(model, n_iters, data_parallel)
    out = {
        "metric": f"{model}_train_throughput",
        "value": stats["images_per_sec"],
        "unit": "images/sec",
        "vs_baseline": round(
            stats["images_per_sec"] / REFERENCE_IMAGES_PER_SEC, 3
        ),
        "mfu": stats["mfu"],
        "tflops_per_sec": stats["tflops_per_sec"],
        "flops_per_image_g": stats["flops_per_image_g"],
        "peak_tflops": F.peak_tflops(),
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
    }
    if data_parallel:
        out["devices"] = stats["devices"]
        out["global_images_per_sec"] = stats["global_images_per_sec"]

    # measured same-chip baseline: the reference's patch-matmul algorithm
    want_naive = os.environ.get(
        "SUPERNET_BENCH_BASELINE", "1" if model == "hippocampus" else "0"
    )
    if want_naive == "1" and not data_parallel:
        set_backend("naive")
        naive = _bench_model(model, max(10, n_iters // 10), False)
        set_backend(os.environ.get("SUPERNET_BACKEND", "xla"))
        out["baseline_measured_images_per_sec"] = naive["images_per_sec"]
        out["vs_baseline_measured"] = round(
            stats["images_per_sec"] / naive["images_per_sec"], 3
        )

    # secondary models for the record (same JSON line, extra fields)
    if os.environ.get("SUPERNET_BENCH_EXTRA", "1") == "1":
        for other in ("brats",) if model != "brats" else ("hippocampus",):
            try:
                o = _bench_model(other, max(10, n_iters // 5), data_parallel)
                out[other] = {
                    "images_per_sec": o["images_per_sec"],
                    "mfu": o["mfu"],
                    "tflops_per_sec": o["tflops_per_sec"],
                    "flops_per_image_g": o["flops_per_image_g"],
                }
            except Exception as e:  # never lose the headline number
                out[other] = {"error": str(e)[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
