"""Volumetric evaluation drivers: the noise-robustness ``testing`` protocol,
the adversarial (FGSM/PGD) branch, and the uncertainty-quality report — for
the 3-D model family (`models/unet3d.py`).

The reference evaluates 2-D slices only (`Hippocampus.py:1123-1547`); this
module applies the SAME protocol to whole volumes — net-new surface the 3-D
family needs to be usable end-to-end:

 1. synthesize noise (gaussian/speckle/S&P), region-mask it by the label,
    add, clip to the center-cropped clean batch's range, account SNR — all
    on device (`supernet_tpu.perturb`, dimension-generic);
 2. forward3d -> (probs, sigma); accumulate predictions + artifacts;
 3. per-structure Dice/Hausdorff/sens/prec/spec/RVD/over-under on host —
    the 2-D metric kernels reduce over axes (1, 2), so volumes are scored
    through a [B, D*H, W] view (per-VOLUME statistics, exactly analogous
    to the reference's per-image ones).

With ``mesh`` the volume's D (scan) axis is sharded over the devices —
spatial partitioning (`parallel.make_spatial_forward3d`), the regime where
whole-volume activations do not fit one chip; the attack loop shards the
same way (x_spec=P(None, axis), labels replicated).

Artifacts per run: center-slice renders + ``uncertainty_info.pkl``
(`reports.save_uncertainty_slices3d`), ``Related_hyperparameters*.txt``,
and the calibration set (sparsification/AUSE, ECE + reliability diagram)
in the same noise-mode directory scheme as the 2-D drivers.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from supernet_tpu import metrics as M
from supernet_tpu import perturb, reports
from supernet_tpu.attacks import (
    make_fgsm_attack,
    make_pgd_attack,
    retarget_labels,
)
from supernet_tpu.configs import ExperimentConfig, NoiseConfig
from supernet_tpu.evaluate import _REGION_DIR, _aggregate_structures
from supernet_tpu.models import forward3d
from supernet_tpu.ops.moments3d import crop_center3d
from supernet_tpu.train import one_hot_flatten

Array = jax.Array
Params = Dict[str, Dict[str, jax.Array]]


def _forward3d_fn(cfg, mesh=None, mc_samples: int = 0, mc_seed: int = 0):
    """Volumetric eval forward (the shared `evaluate.make_eval_forward`
    factory): plain jit of `forward3d`; with ``mesh`` the D (scan) axis is
    sharded (spatial partitioning — parameters replicated, halo exchanges
    inserted by the SPMD partitioner); ``mc_samples > 0`` = the
    `forward_sampled3d` Monte-Carlo ensemble baseline."""
    from supernet_tpu.evaluate import make_eval_forward
    from supernet_tpu.models import forward_sampled3d
    from supernet_tpu.parallel import make_spatial_forward3d

    return make_eval_forward(
        cfg, mesh, mc_samples, mc_seed,
        forward3d, forward_sampled3d, make_spatial_forward3d,
    )


def _as2d(v: np.ndarray) -> np.ndarray:
    """[B, o, o, o(, C)] -> [B, o*o, o(, C)]: the 2-D metric kernels reduce
    over axes (1, 2), so this view scores each whole volume as one sample
    (Hausdorff treats each (d, h) row as a W-dim point — the rows-as-points
    convention of `metrics.compute_H` extended by one axis)."""
    b, o = v.shape[0], v.shape[1]
    return v.reshape((b, o * o, o) + v.shape[4:])


def _batches(x: np.ndarray, y: np.ndarray, batch_size: int):
    for i in range(0, len(x), batch_size):
        yield x[i : i + batch_size], y[i : i + batch_size]


def _score_batch(
    probs: np.ndarray,
    sigma: np.ndarray,
    y_crop: np.ndarray,
    cfg,
    exp_name: str,
    structs,
    acc_metrics,
    accs: List[float],
):
    """Shared per-batch scoring: reshape the flat head outputs to cubes,
    accumulate accuracy + per-structure metrics; returns (probs_v, sigma_v,
    pred) as [b, o, o, o(, C)] arrays."""
    b, o = len(y_crop), cfg.out_size
    probs_v = probs[:b].reshape(b, o, o, o, cfg.n_classes)
    sigma_v = sigma[:b].reshape(b, o, o, o, cfg.n_classes)
    pred = np.argmax(probs_v, axis=-1)
    # per-VOLUME accuracies (not one batch mean): with drop_remainder=False
    # a trailing partial batch would otherwise be over-weighted in the
    # final mean; all volumes have equal voxel counts, so the mean over
    # these is the exact voxel-level accuracy
    accs.extend(np.mean(pred == y_crop, axis=(1, 2, 3)).tolist())
    for s in structs:
        acc_metrics[s].append(
            M.structure_metrics(
                _as2d(M.binarize(y_crop, s, exp_name)),
                _as2d(M.binarize(pred, s, exp_name)),
            )
        )
    return probs_v, sigma_v, pred


def run_testing3d(
    exp: ExperimentConfig,
    params: Params,
    x: np.ndarray,
    y: np.ndarray,
    noise: NoiseConfig = NoiseConfig(),
    out_dir: Optional[str] = None,
    images_n: int = 4,
    seed: int = 0,
    mesh=None,
    mc_samples: int = 0,
    artifact_max_samples: Optional[int] = None,
) -> Dict[str, object]:
    """The ``testing`` protocol on volumes; returns metrics + artifact path.

    ``x``: [N, S, S, S, C] cubes, ``y``: [N, S, S, S] int labels (what
    `data.nifti.volume_to_cube` / `data.synthetic.synthetic_volumes`
    produce). ``mc_samples > 0`` evaluates the Monte-Carlo weight-sampling
    baseline instead of the VDP propagation (same metrics/artifacts).

    Metrics and the variance report accumulate ONLINE (O(batch) host
    memory); ``artifact_max_samples`` caps the rows kept for the full-set
    ``uncertainty_info.pkl`` + slice renders (None = all volumes)."""
    cfg = exp.model
    if mc_samples > 0 and mesh is not None:
        raise ValueError("mc_samples mode is single-device; drop mesh")
    fwd = _forward3d_fn(cfg, mesh, mc_samples=mc_samples, mc_seed=seed)
    from supernet_tpu.evaluate import _reject_ensemble_modes, ensemble_forward

    if _reject_ensemble_modes(params, mesh, mc_samples):
        fwd, params = ensemble_forward(fwd, params)
    if mesh is not None:
        from supernet_tpu.parallel import replicate

        params = replicate(mesh, params)
    key = jax.random.PRNGKey(seed)
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.int32)

    n_total = len(x)
    # clamp to >=1: downstream artifact writers need at least one row
    artifact_cap = (
        n_total if artifact_max_samples is None
        else min(max(artifact_max_samples, 1), n_total)
    )
    all_probs, all_sigma, all_x, all_y = [], [], [], []
    n_kept = 0
    rep = reports.UncertaintyAccumulator(
        n_total, images_n=0, dataset=exp.name, adversarial=False
    )
    snrs: List[float] = []
    accs: List[float] = []
    structs = M.dataset_structures(exp.name)
    acc_metrics: Dict[str, List[M.StructureMetrics]] = {s: [] for s in structs}
    t_infer, n_batches = 0.0, 0

    for xb_np, yb_np in _batches(x, y, exp.train.batch_size):
        y_crop = np.asarray(
            crop_center3d(yb_np, cfg.out_size, cfg.out_size, cfg.out_size)
        )
        xb = jnp.asarray(xb_np)
        if noise.kind != "none" and noise.std > 0:
            key, sub = jax.random.split(key)
            # clip range + SNR use the center-cropped frames, the 3-D analog
            # of the reference protocol (`Hippocampus.py:1270-1271,1302-1307`)
            xb, snr = perturb.apply_noise(
                sub,
                xb,
                jnp.asarray(yb_np),
                noise,
                exp.name,
                crop_size=cfg.out_size,
            )
            snrs.append(float(snr))

        t0 = time.perf_counter()
        probs, sigma = fwd(params, xb)
        probs = np.asarray(probs)  # host fetch of BOTH outputs = completion
        sigma = np.asarray(sigma)
        t_infer += time.perf_counter() - t0
        n_batches += 1

        probs_v, sigma_v, _ = _score_batch(
            probs, sigma, y_crop, cfg, exp.name, structs, acc_metrics, accs
        )
        rep.update(np.asarray(xb), probs_v, y_crop, sigma_v)
        b = len(probs_v)
        take = min(b, artifact_cap - n_kept)
        if take > 0:
            all_probs.append(probs_v[:take])
            all_sigma.append(sigma_v[:take])
            all_x.append(np.asarray(xb)[:take])
            all_y.append(y_crop[:take])
            n_kept += take

    probs = np.concatenate(all_probs)
    sigma = np.concatenate(all_sigma)
    xs = np.concatenate(all_x)
    ys = np.concatenate(all_y)

    region_dir = _REGION_DIR.get(noise.region, "on_all")
    sub = (
        "clean"
        if noise.kind == "none" or noise.std == 0
        else f"{noise.kind}_{noise.std}/{region_dir}"
    )
    out_dir = out_dir or os.path.join(
        exp.out_dir, exp.name + "_3d", "testing", sub
    )
    os.makedirs(out_dir, exist_ok=True)

    result: Dict[str, object] = {
        "accuracy": float(np.mean(accs)),
        "snr_db": float(np.mean(snrs)) if snrs else float("inf"),
        "test_time_per_batch_s": t_infer / max(n_batches, 1),
        "out_dir": out_dir,
    }
    if mc_samples > 0:
        result["mc_samples"] = mc_samples
    _aggregate_structures(result, structs, acc_metrics)

    reports.save_uncertainty_slices3d(
        out_dir, probs, sigma, xs, ys,
        images_n=images_n, n_classes=cfg.n_classes,
    )
    # full-set (not capped) exact mean + reference-format per-structure
    # variance report, accumulated online over every batch above
    unc = rep.finalize(out_dir)
    result["mean_predictive_variance"] = unc["mean"]
    result["artifact_samples"] = n_kept
    reports.write_hyperparameters(
        out_dir,
        "Related_hyperparameters.txt",
        {**dataclasses.asdict(noise), **result},
    )
    return result


def run_adversarial3d(
    exp: ExperimentConfig,
    params: Params,
    x: np.ndarray,
    y: np.ndarray,
    out_dir: Optional[str] = None,
    images_n: int = 4,
    mesh=None,
    artifact_max_samples: Optional[int] = None,
) -> Dict[str, object]:
    """Adversarial evaluation on volumes: PGD when targeted / for
    hippocampus-style configs, single-step FGSM otherwise — the same
    branch logic as the 2-D `evaluate.run_adversarial`
    (`Hippocampus.py:894-1049`, `Brats.py:984-991`), the attack
    differentiating through the full 3-D VDP forward.

    Streams like ``run_testing3d``: metrics and the variance report
    accumulate online; ``artifact_max_samples`` caps the volumes kept
    for the slice renders (None = all)."""
    cfg = exp.model
    ac = exp.attack
    if isinstance(params, (list, tuple)):
        raise ValueError(
            "adversarial eval attacks ONE member's loss surface; pass a "
            "single checkpoint (ensemble attack transfer is out of scope)"
        )
    fwd = _forward3d_fn(cfg, mesh)
    x_spec = y_spec = None
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from supernet_tpu.parallel import replicate

        params = replicate(mesh, params)
        # the 3-D attack shards the volume's D axis like the forward; the
        # flattened one-hot label cannot be D-sharded, so it is replicated
        x_spec, y_spec = P(None, "data"), P()
    use_pgd = ac.targeted or exp.name == "hippocampus"
    attack = (make_pgd_attack if use_pgd else make_fgsm_attack)(
        cfg, ac, mesh=mesh, forward_fn=forward3d,
        x_spec=x_spec, y_spec=y_spec,
    )
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.int32)

    n_total = len(x)
    # clamp to >=1: downstream artifact writers need at least one row
    artifact_cap = (
        n_total if artifact_max_samples is None
        else min(max(artifact_max_samples, 1), n_total)
    )
    all_probs, all_sigma, all_adv, all_y = [], [], [], []
    n_kept = 0
    rep = reports.UncertaintyAccumulator(
        n_total, images_n=0, dataset=exp.name,
        adversarial=True, targeted=ac.targeted,
    )
    accs, snrs = [], []
    structs = M.dataset_structures(exp.name)
    acc_metrics: Dict[str, List[M.StructureMetrics]] = {s: [] for s in structs}
    t_infer, n_batches = 0.0, 0

    for xb_np, yb_np in _batches(x, y, exp.train.batch_size):
        y_crop = np.asarray(
            crop_center3d(yb_np, cfg.out_size, cfg.out_size, cfg.out_size)
        )
        xb = jnp.asarray(xb_np)
        y_attack = y_crop
        if ac.targeted:
            y_attack = np.asarray(
                retarget_labels(
                    jnp.asarray(y_crop),
                    ac.adversary_targeted_class,
                    ac.adv_class,
                )
            )
        y_flat = one_hot_flatten(jnp.asarray(y_attack), cfg.n_classes)
        x_min, x_max = jnp.min(xb), jnp.max(xb)
        adv = attack(params, xb, y_flat, x_min, x_max)
        # force the attack to completion OUTSIDE the timed window (same
        # rationale as the 2-D driver); the host copy is reused below
        adv_np = np.asarray(adv)

        t0 = time.perf_counter()
        probs, sigma = fwd(params, adv)
        probs = np.asarray(probs)
        sigma = np.asarray(sigma)
        t_infer += time.perf_counter() - t0
        n_batches += 1

        probs_v, sigma_v, _ = _score_batch(
            probs, sigma, y_crop, cfg, exp.name, structs, acc_metrics, accs
        )
        adv_crop = np.asarray(
            crop_center3d(adv_np, cfg.out_size, cfg.out_size, cfg.out_size)
        )
        x_crop = np.asarray(
            crop_center3d(xb_np, cfg.out_size, cfg.out_size, cfg.out_size)
        )
        # SNR of the adversarial perturbation on the cropped frames
        # (`Hippocampus.py:995-1000`)
        snrs.append(float(perturb.snr_db(x_crop, adv_crop)))
        rep.update(adv_crop, probs_v, y_crop, sigma_v)
        b = len(probs_v)
        take = min(b, artifact_cap - n_kept)
        if take > 0:
            all_probs.append(probs_v[:take])
            all_sigma.append(sigma_v[:take])
            all_adv.append(adv_np[:take])
            all_y.append(y_crop[:take])
            n_kept += take

    probs = np.concatenate(all_probs)
    sigma = np.concatenate(all_sigma)
    advs = np.concatenate(all_adv)
    ys = np.concatenate(all_y)

    mode = "targeted" if ac.targeted else "untargeted"
    out_dir = out_dir or os.path.join(
        exp.out_dir, exp.name + "_3d", "adversarial", f"{mode}_eps{ac.epsilon}"
    )
    os.makedirs(out_dir, exist_ok=True)

    result: Dict[str, object] = {
        "accuracy": float(np.mean(accs)),
        "snr_db": float(np.mean(snrs)) if snrs else float("inf"),
        "test_time_per_batch_s": t_infer / max(n_batches, 1),
        "out_dir": out_dir,
    }
    _aggregate_structures(result, structs, acc_metrics)

    reports.save_uncertainty_slices3d(
        out_dir, probs, sigma, advs, ys,
        images_n=images_n, n_classes=cfg.n_classes,
    )
    # full-set (not capped) exact mean + reference-format per-structure
    # variance report, accumulated online over every batch above, incl.
    # the per-structure variance fields targeted attacks append
    # (`Hippocampus.py:1105-1112`)
    pv = rep.finalize(out_dir)
    result["mean_predictive_variance"] = pv["mean"]
    result["artifact_samples"] = n_kept
    for k, v in pv.items():
        if k != "mean":
            result[f"predictive_variance_{k}"] = v
    reports.write_hyperparameters(
        out_dir,
        "Related_hyperparameters_adversarial.txt",
        {**dataclasses.asdict(ac), **result},
    )
    return result


def run_calibration3d(
    exp: ExperimentConfig,
    params: Params,
    x: np.ndarray,
    y: np.ndarray,
    out_dir: Optional[str] = None,
    n_bins: int = 15,
    mesh=None,
    mc_samples: int = 0,
) -> Dict[str, object]:
    """Uncertainty-quality report on volumes: forward the set once, run
    `calibration.analyze` (voxel-wise — through the [N, D*H, W] view), write
    the same artifact set as the 2-D driver. ``mc_samples > 0`` scores the
    MC weight-sampling baseline's uncertainty instead of the VDP
    propagation."""
    from supernet_tpu.calibration import analyze, write_calibration_artifacts

    cfg = exp.model
    if mc_samples > 0 and mesh is not None:
        raise ValueError("mc_samples mode is single-device; drop mesh")
    fwd = _forward3d_fn(cfg, mesh, mc_samples=mc_samples)
    from supernet_tpu.evaluate import _reject_ensemble_modes, ensemble_forward

    if _reject_ensemble_modes(params, mesh, mc_samples):
        fwd, params = ensemble_forward(fwd, params)
    if mesh is not None:
        from supernet_tpu.parallel import replicate

        params = replicate(mesh, params)
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.int32)
    o = cfg.out_size

    all_probs, all_sigma, all_y = [], [], []
    for xb_np, yb_np in _batches(x, y, exp.train.batch_size):
        b = len(xb_np)
        probs, sigma = fwd(params, jnp.asarray(xb_np))
        all_probs.append(
            np.asarray(probs).reshape(b, o, o, o, cfg.n_classes)
        )
        all_sigma.append(
            np.asarray(sigma).reshape(b, o, o, o, cfg.n_classes)
        )
        all_y.append(np.asarray(crop_center3d(yb_np, o, o, o)))
    probs = np.concatenate(all_probs)
    sigma = np.concatenate(all_sigma)
    labels = np.concatenate(all_y).astype(np.int64)

    res = analyze(
        _as2d(probs), _as2d(sigma), _as2d(labels), exp.name, n_bins=n_bins
    )
    if mc_samples > 0:
        res["mc_samples"] = mc_samples
    if out_dir:
        write_calibration_artifacts(out_dir, res, exp.name + "_3d",
                                    len(labels))
        res["out_dir"] = out_dir
    return res


def run_noise_sweep3d(
    exp: ExperimentConfig,
    params: Params,
    x: np.ndarray,
    y: np.ndarray,
    images_n: int = 4,
    mesh=None,
    mc_samples: int = 0,
    artifact_max_samples: Optional[int] = None,
) -> List[Dict[str, object]]:
    """Clean eval + gaussian noise at each configured level x region — the
    volumetric analog of the module-level sweep (`Hippocampus.py:1578-1601`).
    ``mc_samples`` > 0 sweeps the MC ensemble baseline instead.
    ``artifact_max_samples`` bounds every run's pkl-artifact buffer so the
    7-runs-per-sweep protocol keeps host memory O(cap), not O(test set)."""
    results = [
        run_testing3d(exp, params, x, y, NoiseConfig(), images_n=images_n,
                      mesh=mesh, mc_samples=mc_samples,
                      artifact_max_samples=artifact_max_samples)
    ]
    for std in exp.noise_levels:
        for region in exp.noise_regions:
            results.append(
                run_testing3d(
                    exp, params, x, y,
                    NoiseConfig(kind="gaussian", std=std, region=region),
                    images_n=images_n, mesh=mesh, mc_samples=mc_samples,
                    artifact_max_samples=artifact_max_samples,
                )
            )
    return results
