"""Benchmark: VDP U-Net training throughput (images/sec/chip) + MFU + HBM
roofline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}

Baselines (the reference publishes no numbers, BASELINE.md):
- ``vs_baseline`` — MEASURED same-chip ratio against the reference's own
  *algorithm* (patch-matmul VDP convs, ops/naive.py) trained end-to-end on
  THIS chip via ``set_backend("naive")`` — the defensible denominator.
  Falls back to the estimate below only when the naive run is skipped.
- ``vs_baseline_estimated`` — ratio against a conservative ESTIMATE of the
  reference TF2 implementation's single-GPU rate (~100 img/s Hippocampus).

MFU: analytic MXU FLOPs (supernet_tpu/flops.py, fwd + 2x bwd) over the
chip's bf16 peak. HBM roofline: XLA's compiled-module "bytes accessed"
(achieved traffic) and the analytic minimum-bytes model
(flops.train_step_min_bytes), both divided by the chip's peak HBM GB/s.

Env knobs: SUPERNET_BENCH_MODEL=hippocampus|brats|lungs (default
hippocampus), SUPERNET_BENCH_ITERS, SUPERNET_BENCH_EXTRA=1 (also bench the
other models into extra fields), SUPERNET_BENCH_BASELINE=1|0 (force/skip
the measured naive baseline; default: on for Hippocampus only — BraTS's
patch matrices at batch 20 are ~GB-scale transients),
SUPERNET_BENCH_SCALING=1|0 (batch-scaling study -> "best" fields; default
on), SUPERNET_PRECISION, SUPERNET_BACKEND, SUPERNET_DATA_PARALLEL=1.

Resilience (round-3 postmortem: one 300-s init hang cost the round its
entire perf record, BENCH_r03.json): the measurement now runs in a CHILD
subprocess supervised by this process. The relayed TPU backend's init hang
is in-process state — a fresh process is the only reliable reset — so the
supervisor makes SUPERNET_BENCH_ATTEMPTS (default 4) attempts, each a new
subprocess with a SUPERNET_BENCH_INIT_TIMEOUT (default 150 s) init
watchdog, with backoff between attempts. Every successful run is persisted
to bench_last_good.json — merged over the previous capture so a
knob-reduced quick run never clobbers sections a full run measured
(``_merge_last_good``; skipped sections carry ``retained_from``
provenance). If all attempts fail, that last-known-good payload is emitted
with ``stale: true`` + the failure trace so a round is never
evidence-free. SUPERNET_BENCH_CHILD=1 marks the child (internal).
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

# batch sizes for the scaling study (VERDICT r2 #1); measured 2026-08-17 on
# v5e: Hippocampus saturates at 256 (17.9k img/s, 25.6% MFU; 512 flat),
# BraTS at 128 (1053 img/s, 32.4% MFU). BraTS activations are ~100x
# Hippocampus per image, so its sweep stays small to fit HBM.
SCALING_BATCHES = {
    "hippocampus": (64, 128, 256),
    "brats": (64, 128),
    "lungs": (64, 128),
}

# 3-D sweep (VERDICT r3 #2): a 64^3 volume is 64x a 64^2 slice, so the
# batch axis is small; 32 x 64^3 x 32ch bf16 activations ~ 0.5 GB/layer.
SCALING_BATCHES_3D = (8, 16, 32)


def _exp(name):
    from supernet_tpu.configs import BRATS, HIPPOCAMPUS, LUNGS

    return {"hippocampus": HIPPOCAMPUS, "brats": BRATS, "lungs": LUNGS}[name]


def _act_bytes() -> int:
    from supernet_tpu.ops import get_act_dtype

    import jax.numpy as jnp

    return 2 if get_act_dtype() == jnp.bfloat16 else 4


def _bench_model(
    name: str,
    n_iters: int,
    data_parallel: bool,
    batch_override: int = 0,
) -> dict:
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
    batch = batch_override or tc.batch_size
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

    # XLA's cost analysis (HBM "bytes accessed") for the roofline fields.
    # lower().compile() hits the persistent compilation cache populated by
    # the warmup call (~60 ms); executing the AOT object itself hangs on
    # relayed transports, so the timed loop below stays on the jit path.
    try:
        ca = step.lower(state, x, y).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else (ca or {})
        xla_bytes = float(ca.get("bytes accessed", 0.0)) / k_steps
    except Exception:
        xla_bytes = 0.0

    n_disp = max(1, n_iters // k_steps)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, metrics = step(state, x, y)
    assert float(jax.numpy.min(metrics.loss)) > -1e30  # fetch = completion
    dt = time.perf_counter() - t0
    n_iters = n_disp * k_steps

    n_dev = jax.device_count() if data_parallel else 1
    ips = n_iters * batch / dt  # global
    step_s = dt / n_iters
    flops_img = F.forward_flops(cfg, 1) * 3.0  # train step, per image
    flops_s = ips * flops_img
    min_bytes = F.train_step_min_bytes(cfg, batch, _act_bytes())
    out = {
        "images_per_sec": round(ips / n_dev, 2),  # per chip
        "flops_per_image_g": round(flops_img / 1e9, 3),
        "tflops_per_sec": round(flops_s / n_dev / 1e12, 3),
        "mfu": round(F.mfu(flops_s / n_dev), 4),
        "batch": batch,
        "devices": n_dev,
        "global_images_per_sec": round(ips, 2),
        "step_ms": round(step_s * 1e3, 3),
        # roofline: achieved HBM GB/s from XLA's own traffic estimate, and
        # the fraction of the chip's peak the analytic MINIMUM traffic
        # would need at this rate (>= ~1.0 -> provably bandwidth-bound)
        "min_bytes_per_step_mb": round(min_bytes / 1e6, 1),
        "hbm_utilization_min": round(
            F.hbm_utilization(min_bytes / n_dev / step_s), 4
        ),
    }
    if xla_bytes:
        out["xla_bytes_per_step_mb"] = round(xla_bytes / 1e6, 1)
        out["achieved_hbm_gbps"] = round(xla_bytes / n_dev / step_s / 1e9, 1)
        out["hbm_utilization"] = round(
            F.hbm_utilization(xla_bytes / n_dev / step_s), 4
        )
    return out


_BEST_KEYS = (
    "batch",
    "images_per_sec",
    "mfu",
    "hbm_utilization_min",
    "hbm_utilization",
    "achieved_hbm_gbps",
    "step_ms",
)


def _scaling_study(model: str, base_stats: dict, n_iters: int):
    """Sweep SCALING_BATCHES for one model (single device); returns the
    {batch: img/s} map and the best-throughput stats subset, seeded with
    the already-measured parity-batch run."""
    scaling = {str(base_stats["batch"]): base_stats["images_per_sec"]}
    best = dict(base_stats)
    for b in SCALING_BATCHES.get(model, ()):
        try:
            s = _bench_model(model, n_iters, False, b)
        except Exception as e:  # OOM etc. — record and move on
            scaling[str(b)] = f"error: {str(e)[:80]}"
            continue
        scaling[str(b)] = s["images_per_sec"]
        if s["images_per_sec"] > best["images_per_sec"]:
            best = s
    return scaling, {k: best[k] for k in _BEST_KEYS if k in best}


def main() -> None:
    # persistent compilation cache: the scaling study compiles one program
    # per (model, batch); re-runs and the cost-analysis lower() become free
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/supernet_bench_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
    except Exception:
        pass

    # Watchdog: the relayed TPU backend sometimes HANGS at init instead of
    # raising UNAVAILABLE (observed 2026-08-18: jax.devices() stuck >300 s).
    # Run device discovery on a daemon thread with a bounded join so the
    # driver always gets the one parseable JSON line instead of a stalled
    # process. SUPERNET_BENCH_INIT_TIMEOUT=seconds (default 300) tunes it.
    import threading

    init_timeout = float(os.environ.get("SUPERNET_BENCH_INIT_TIMEOUT", "300"))
    init_result: dict = {}

    def _discover():
        try:
            init_result["devices"] = jax.devices()
        except Exception as e:  # surfaced below as the error JSON line
            init_result["error"] = e

    th = threading.Thread(target=_discover, daemon=True)
    th.start()
    th.join(init_timeout)
    if th.is_alive() or "error" in init_result:
        why = (
            f"backend init hung >{init_timeout:.0f}s"
            if th.is_alive()
            else f"{init_result['error']}"
        )
        print(json.dumps({
            "metric": "images_per_sec",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {why[:200]}",
        }))
        sys.stdout.flush()
        os._exit(1)  # the stuck init thread cannot be joined; hard-exit

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
    precision = os.environ.get("SUPERNET_PRECISION", "default")
    backend = os.environ.get("SUPERNET_BACKEND", "xla")
    set_mxu_precision(precision)
    set_backend(backend)
    # SUPERNET_ACT_DTYPE=float32|bfloat16 — inter-layer activation dtype.
    # bf16 halves the HBM traffic of this data-movement-bound model; the
    # loss head and all conv accumulations stay f32 (ops/moments.py). The
    # bench measures the TPU production mode — bf16 — by default (300-step
    # Hippocampus loss curve matches f32-high to 0.41%, within f32-default's
    # own 0.24% deviation; docs/PERFORMANCE.md); the library default stays
    # f32 for reference-exact numerics. Set SUPERNET_ACT_DTYPE=float32 to
    # bench the conservative mode.
    from supernet_tpu.ops import set_act_dtype

    act_dtype = os.environ.get("SUPERNET_ACT_DTYPE", "bfloat16")
    set_act_dtype(act_dtype)
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
        # measured same-chip ratio is filled in below when the naive
        # baseline runs; the typed-in estimate is the fallback only
        "vs_baseline_estimated": round(
            stats["images_per_sec"] / REFERENCE_IMAGES_PER_SEC, 3
        ),
        "mfu": stats["mfu"],
        "tflops_per_sec": stats["tflops_per_sec"],
        "flops_per_image_g": stats["flops_per_image_g"],
        "peak_tflops": F.peak_tflops(),
        "peak_hbm_gbps": F.peak_hbm_gbps(),
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
        # every reported rate is self-describing (numeric mode + kernels)
        "act_dtype": act_dtype,
        "backend": backend,
        "precision": precision,
        "batch": stats["batch"],
        "step_ms": stats["step_ms"],
        "min_bytes_per_step_mb": stats["min_bytes_per_step_mb"],
        "hbm_utilization_min": stats["hbm_utilization_min"],
    }
    for k in (
        "xla_bytes_per_step_mb",
        "achieved_hbm_gbps",
        "hbm_utilization",
    ):
        if k in stats:
            out[k] = stats[k]
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
        set_backend(backend)
        out["baseline_measured_images_per_sec"] = naive["images_per_sec"]
        out["vs_baseline"] = round(
            stats["images_per_sec"] / naive["images_per_sec"], 3
        )
    else:
        out["vs_baseline"] = out["vs_baseline_estimated"]
        out["vs_baseline_is_estimate"] = True

    # batch-scaling study: the parity batch (20) underfills the chip; report
    # the best-throughput configuration alongside it (VERDICT r2 #1).
    # "best" is an ALWAYS-PRESENT first-class key (VERDICT r3 #8) so
    # round-over-round regression stays machine-checkable: when the sweep
    # is skipped it degrades to the parity-batch stats rather than vanish.
    if os.environ.get("SUPERNET_BENCH_SCALING", "1") == "1" and not data_parallel:
        scaling, best = _scaling_study(model, stats, max(20, n_iters // 4))
        out["batch_scaling"] = scaling
        out["best"] = best
    else:
        out["best"] = {k: stats[k] for k in _BEST_KEYS if k in stats}

    # secondary models for the record (same JSON line, extra fields)
    if os.environ.get("SUPERNET_BENCH_EXTRA", "1") == "1":
        for other in ("brats",) if model != "brats" else ("hippocampus",):
            try:
                o = _bench_model(other, max(10, n_iters // 5), data_parallel)
                entry = {
                    k: o[k]
                    for k in (
                        "images_per_sec",
                        "mfu",
                        "tflops_per_sec",
                        "flops_per_image_g",
                        "batch",
                        "step_ms",
                        "hbm_utilization_min",
                        "hbm_utilization",
                        "achieved_hbm_gbps",
                    )
                    if k in o
                }
                if (
                    os.environ.get("SUPERNET_BENCH_SCALING", "1") == "1"
                    and not data_parallel  # single-device rates would be
                    # incomparable with the DP headline above
                ):
                    scaling, best = _scaling_study(
                        other, o, max(10, n_iters // 8)
                    )
                    entry["batch_scaling"] = scaling
                    entry["best"] = best
                out[other] = entry
            except Exception as e:  # never lose the headline number
                out[other] = {"error": str(e)[:200]}

    # volumetric family (models/unet3d): parity point (batch 4) + the
    # same batch-scaling sweep -> always-present "best" field as 2-D
    # (VERDICT r3 #2/#8); SUPERNET_BENCH_3D=0 to skip
    if (
        os.environ.get("SUPERNET_BENCH_3D", "1") == "1"
        and not data_parallel
    ):
        try:
            v = _bench_3d(max(10, n_iters // 10))
            best_keys = ("batch", "vols_per_sec", "mfu",
                         "hbm_utilization_min", "step_ms")
            if os.environ.get("SUPERNET_BENCH_SCALING", "1") == "1":
                scaling = {str(v["batch"]): v["vols_per_sec"]}
                best = dict(v)
                for b3 in SCALING_BATCHES_3D:
                    try:
                        s = _bench_3d(max(6, n_iters // 20), b3)
                    except Exception as e:  # OOM etc.
                        scaling[str(b3)] = f"error: {str(e)[:80]}"
                        continue
                    scaling[str(b3)] = s["vols_per_sec"]
                    if s["vols_per_sec"] > best["vols_per_sec"]:
                        best = s
                v["batch_scaling"] = scaling
                v["best"] = {k: best[k] for k in best_keys if k in best}
            else:
                v["best"] = {k: v[k] for k in best_keys if k in v}
            out["unet3d"] = v
        except Exception as e:
            out["unet3d"] = {"error": str(e)[:200]}

    # vmapped ensemble training (ensemble.EnsembleTrainer's step) vs the
    # K-sequential-steps cost; SUPERNET_BENCH_ENSEMBLE=0 to skip
    if (
        os.environ.get("SUPERNET_BENCH_ENSEMBLE", "1") == "1"
        and not data_parallel
    ):
        try:
            out["ensemble_train"] = _bench_ensemble(
                max(10, n_iters // 10), stats["step_ms"]
            )
        except Exception as e:
            out["ensemble_train"] = {"error": str(e)[:200]}

    # serving-side forward throughput (the InferenceSession device path);
    # SUPERNET_BENCH_INFER=0 to skip
    if (
        os.environ.get("SUPERNET_BENCH_INFER", "1") == "1"
        and not data_parallel
    ):
        try:
            out["inference"] = _bench_inference(max(20, n_iters))
        except Exception as e:
            out["inference"] = {"error": str(e)[:200]}
    print(json.dumps(out))


def _bench_inference(n_iters: int) -> dict:
    """Device-side forward throughput at the training batch size — the
    rate a saturated InferenceSession sustains once requests are batched
    (host->device transfer excluded: relay-dominated on this transport,
    overlapped on real serving hosts; docs/PERFORMANCE.md 'Inference').
    Chains the jitted forward K times per dispatch and fetches a scalar,
    the same completion discipline as the train bench."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import forward, init_params

    cfg, tc = HIPPOCAMPUS.model, HIPPOCAMPUS.train
    b = tc.batch_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 1, (b, cfg.image_size, cfg.image_size,
                          cfg.in_channels)).astype(np.float32)
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    k = 8

    @jax.jit
    def fwd_k(p, x0):
        def body(c, _):
            probs, sigma = forward(p, c, cfg)
            # feed BOTH outputs back into the carry: probs alone would let
            # XLA dead-code-eliminate the whole variance path (the mean
            # path never reads sigma) and overstate the serving rate
            return c + 1e-6 * (
                probs[:, :1, :1] + sigma[:, :1, :1]
            ).reshape(c.shape[0], 1, 1, 1), None
        c, _ = jax.lax.scan(body, x0, None, length=k)
        return jnp.sum(c)

    float(fwd_k(params, x))  # compile + completion
    t0 = _time.perf_counter()
    for _ in range(max(1, n_iters // k)):
        s = fwd_k(params, x)
    assert float(s) > -1e30
    dt = (_time.perf_counter() - t0) / (max(1, n_iters // k) * k)
    return {
        "model": "hippocampus",
        "batch": b,
        "images_per_sec": round(b / dt, 1),
        "batch_ms": round(dt * 1e3, 3),
    }


def _bench_ensemble(n_iters: int, single_step_ms: float) -> dict:
    """Vmapped K-member ensemble train step (train.make_ensemble_train_step)
    at the Hippocampus parity batch. ``sequential_step_ms`` is K x the
    measured single-model step — what the round-3 K-sequential-trainings
    path pays per aligned step, EXCLUDING its K-1 extra jit compiles and
    K-1 extra epoch/validation loops (which dominate real wall-clock on
    short runs: ~35 s/compile on the relayed TPU vs ~9 s of step compute
    per 120-epoch Hippocampus member). ``speedup_per_step`` is therefore
    the steady-state per-step ratio, a LOWER bound on the end-to-end win.

    Measures all three member-axis lowerings and reports the fastest
    (docs/PERFORMANCE.md "ensemble member lowering"): vmap
    (weights-batched convs), lax.scan over members (one trace for all K),
    and unroll (Python loop inside one jit — measured fastest on v5e,
    the single-device default in ensemble.EnsembleTrainer)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import init_params
    from supernet_tpu.train import (
        create_train_state,
        make_ensemble_train_step,
        stack_trees,
    )

    cfg, tc = HIPPOCAMPUS.model, HIPPOCAMPUS.train
    k_members, b = 4, tc.batch_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(
            0, 1,
            (k_members, b, cfg.image_size, cfg.image_size, cfg.in_channels),
        ).astype(np.float32)
    )
    y = jnp.asarray(
        rng.integers(
            0, cfg.n_classes, (k_members, b, cfg.out_size, cfg.out_size)
        ).astype(np.int32)
    )
    seeds = jnp.arange(k_members, dtype=jnp.int32)
    members = []
    for k in range(k_members):
        p = init_params(jax.random.PRNGKey(k), cfg)
        s, _ = create_train_state(p, tc)
        members.append(s)
    state0 = stack_trees(members)

    def run_mode(mode):
        state = jax.tree_util.tree_map(jnp.array, state0)  # fresh copy
        step = make_ensemble_train_step(cfg, tc, member_mode=mode)
        state, m = step(state, x, y, seeds)
        float(jnp.min(m.loss))  # compile + completion
        t0 = _time.perf_counter()
        for _ in range(n_iters):
            state, m = step(state, x, y, seeds)
        assert float(jnp.min(m.loss)) > -1e30
        return (_time.perf_counter() - t0) / n_iters

    dts = {mode: run_mode(mode) for mode in ("vmap", "scan", "unroll")}
    mode = min(dts, key=dts.get)
    dt = dts[mode]
    return {
        "members": k_members,
        "batch_per_member": b,
        "member_mode": mode,
        "step_ms": round(dt * 1e3, 3),
        "step_ms_vmap": round(dts["vmap"] * 1e3, 3),
        "step_ms_scan": round(dts["scan"] * 1e3, 3),
        "step_ms_unroll": round(dts["unroll"] * 1e3, 3),
        "sequential_step_ms": round(k_members * single_step_ms, 3),
        "speedup_per_step": round(
            k_members * single_step_ms / (dt * 1e3), 2
        ),
        "member_images_per_sec": round(b / dt, 1),
    }


def _bench_3d(n_iters: int, batch_override: int = 0) -> dict:
    """Volumetric train-step throughput: 64^3 Hippocampus-config cubes,
    batch 4 parity point by default (docs/PERFORMANCE.md '3-D model
    family'); ``batch_override`` drives the scaling sweep."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from supernet_tpu.configs import HIPPOCAMPUS
    from supernet_tpu.models import init_params3d
    from supernet_tpu.train import create_train_state
    from supernet_tpu.train3d import make_train_step3d

    cfg, tc = HIPPOCAMPUS.model, HIPPOCAMPUS.train
    b = batch_override or 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(0, 1, (b, 64, 64, 64, cfg.in_channels)).astype(np.float32)
    )
    y = jnp.asarray(
        rng.integers(0, cfg.n_classes, (b, 54, 54, 54)).astype(np.int32)
    )
    params = init_params3d(jax.random.PRNGKey(0), cfg)
    state, _ = create_train_state(params, tc)
    # K steps per lax.scan dispatch — the Trainer3D steps_per_dispatch
    # path, same rationale as the 2-D bench (amortize the per-program
    # relay dispatch). SUPERNET_BENCH_DISPATCH=1 measures per-step.
    k_steps = max(1, int(os.environ.get("SUPERNET_BENCH_DISPATCH", "4")))
    if k_steps > 1:
        from supernet_tpu.train3d import make_multi_train_step3d

        multi = make_multi_train_step3d(cfg, tc, k_steps)
        xk = jnp.broadcast_to(x[None], (k_steps, *x.shape))
        yk = jnp.broadcast_to(y[None], (k_steps, *y.shape))
        state, m = multi(state, xk, yk)
        float(jnp.min(m.loss))  # compile + completion
        t0 = _time.perf_counter()
        for _ in range(max(1, n_iters // k_steps)):
            state, m = multi(state, xk, yk)
        assert float(jnp.min(m.loss)) > -1e30
        dt = (_time.perf_counter() - t0) / (
            max(1, n_iters // k_steps) * k_steps
        )
    else:
        step = make_train_step3d(cfg, tc)
        state, m = step(state, x, y)
        float(jnp.min(m.loss))  # compile + completion
        t0 = _time.perf_counter()
        for _ in range(n_iters):
            state, m = step(state, x, y)
        assert float(jnp.min(m.loss)) > -1e30
        dt = (_time.perf_counter() - t0) / n_iters
    from supernet_tpu import flops as F

    from supernet_tpu.ops import get_act_dtype

    act_b = 2 if get_act_dtype() == jnp.bfloat16 else 4
    return {
        "vols_per_sec": round(b / dt, 2),
        "step_ms": round(dt * 1e3, 2),
        "cube": 64,
        "batch": b,
        "mfu": round(F.mfu(F.train_step_flops3d(cfg, b) / dt), 4),
        "hbm_utilization_min": round(
            F.hbm_utilization(
                F.train_step_min_bytes3d(cfg, b, act_b) / dt
            ),
            4,
        ),
    }


LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_last_good.json"
)


def _merge_last_good(payload: dict) -> dict:
    """Union a fresh capture over the previous last-known-good payload.

    A knob-reduced run (SUPERNET_BENCH_SCALING=0 / _EXTRA=0 / _BASELINE=0,
    used for quick in-session A/Bs) measures only a subset of the sections;
    writing it verbatim would clobber the richer prior capture (observed
    2026-08-19: a quick ensemble A/B erased batch_scaling/brats/unet3d/
    inference from last-good). So: keys the fresh run measured win; prior
    sections it skipped are retained, with their provenance recorded in
    ``retained_from`` so the file never silently mixes timestamps. If the
    fresh run skipped the measured naive baseline but the prior capture has
    one, ``vs_baseline`` is recomputed against that retained denominator
    (the denominator is a same-chip property, independent of this run)."""
    try:
        with open(LAST_GOOD_PATH) as f:
            old = json.load(f)
    except (OSError, json.JSONDecodeError, ValueError):
        return payload
    if not isinstance(old, dict) or old.get("stale"):
        return payload
    # vs_baseline_is_estimate qualifies the fresh vs_baseline only — never
    # carry the old run's flag against a new denominator
    retained = {
        k: old.get("captured_at", "unknown")
        for k in old
        if k not in payload
        and k not in ("captured_at", "retained_from",
                      "vs_baseline_is_estimate")
    }
    # "best" rides the batch-scaling sweep: a SCALING=0 run still emits an
    # always-present "best" (= the parity batch), which must not shadow a
    # prior sweep-derived best
    if "batch_scaling" in retained and "best" in old:
        retained["best"] = old.get("captured_at", "unknown")
        payload = {k: v for k, v in payload.items() if k != "best"}
    if not retained:
        return payload
    merged = dict(old)
    merged.pop("retained_from", None)
    if "vs_baseline_is_estimate" not in payload:
        merged.pop("vs_baseline_is_estimate", None)
    merged.update(payload)
    merged["retained_from"] = retained
    base = merged.get("baseline_measured_images_per_sec")
    if "baseline_measured_images_per_sec" in retained and base:
        merged["vs_baseline"] = round(merged["value"] / base, 3)
        merged.pop("vs_baseline_is_estimate", None)
    return merged


def _child_main() -> int:
    """One measurement attempt (runs in a subprocess). Returns exit code."""
    try:
        main()
        return 0
    except RuntimeError as e:  # e.g. TPU relay UNAVAILABLE at backend init
        if "backend" not in str(e).lower():
            raise
        # still emit ONE parseable JSON line so the supervisor records WHY
        # this attempt produced no throughput number
        print(json.dumps({
            "metric": "images_per_sec",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {str(e)[:200]}",
        }))
        return 1


def _parse_json_tail(text: str):
    """Last parseable JSON line of a child's stdout, or None."""
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return None


def supervise() -> int:
    """Retry the measurement in fresh subprocesses; never leave the round
    evidence-free (VERDICT r3 #1).

    The observed failure mode is an in-process backend-init hang on the
    relayed TPU transport — unjoinable thread, no exception — so each
    attempt is a NEW process (the only reliable reset) with its own init
    watchdog. On total failure the last-known-good payload is replayed,
    timestamped and labeled ``stale: true``.
    """
    import subprocess

    attempts = max(1, int(os.environ.get("SUPERNET_BENCH_ATTEMPTS", "4")))
    init_timeout = float(os.environ.get("SUPERNET_BENCH_INIT_TIMEOUT", "150"))
    # overall per-attempt wall clamp: the full sweep (scaling + extra models
    # + naive baseline + 3-D + inference) legitimately takes many minutes
    child_timeout = float(os.environ.get("SUPERNET_BENCH_CHILD_TIMEOUT", "2700"))
    failures = []
    for attempt in range(attempts):
        env = dict(os.environ)
        env["SUPERNET_BENCH_CHILD"] = "1"
        env["SUPERNET_BENCH_INIT_TIMEOUT"] = str(init_timeout)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                timeout=child_timeout,
                env=env,
            )
            payload = _parse_json_tail(proc.stdout)
            if proc.returncode == 0 and payload and "error" not in payload:
                payload["captured_at"] = time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                )
                payload = _merge_last_good(payload)
                try:
                    with open(LAST_GOOD_PATH, "w") as f:
                        json.dump(payload, f, indent=1)
                except OSError:
                    pass  # read-only checkout: still print the live result
                print(json.dumps(payload))
                return 0
            why = (
                payload.get("error", f"rc={proc.returncode}")
                if payload
                else f"rc={proc.returncode}, no JSON in stdout "
                f"(stderr tail: {proc.stderr[-200:]!r})"
            )
        except subprocess.TimeoutExpired:
            why = f"child exceeded {child_timeout:.0f}s wall clamp"
        failures.append(f"attempt {attempt + 1}: {why}")
        print(f"bench attempt {attempt + 1}/{attempts} failed: {why}",
              file=sys.stderr)
        if attempt + 1 < attempts:
            time.sleep(min(60.0, 5.0 * 2 ** attempt))  # backoff before retry

    trace = "; ".join(failures)[:800]
    try:
        with open(LAST_GOOD_PATH) as f:
            stale = json.load(f)
    except (OSError, json.JSONDecodeError):
        stale = None
    if stale is not None:
        stale["stale"] = True
        stale["stale_captured_at"] = stale.pop("captured_at", "unknown")
        stale["error"] = f"TPU backend unavailable this round: {trace}"
        print(json.dumps(stale))
        return 0  # parseable last-known-good evidence, clearly labeled
    print(json.dumps({
        "metric": "images_per_sec",
        "value": 0.0,
        "unit": "images/sec",
        "vs_baseline": 0.0,
        "error": f"TPU backend unavailable and no last-known-good: {trace}",
    }))
    return 1


if __name__ == "__main__":
    if os.environ.get("SUPERNET_BENCH_CHILD") == "1":
        raise SystemExit(_child_main())
    raise SystemExit(supervise())
