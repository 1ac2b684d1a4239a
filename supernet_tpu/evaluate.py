"""Evaluation drivers: clean/noise-robustness ``testing`` protocol and the
adversarial (FGSM/PGD) evaluation branch.

Reference: ``testing`` (`Hippocampus.py:1123-1547`, `Brats.py:1123-1519`),
the adversarial branch of ``main_function(Training=False)``
(`Hippocampus.py:839-1118`, `Brats.py:893-1119`), and the module-level
noise-sweep driver (`Hippocampus.py:1578-1601`).

Protocol per batch (noise eval):
 1. center-crop a copy of image+label to the output size for records;
 2. synthesize noise (gaussian/speckle/S&P), region-mask it by the label,
    add, clip to the clean batch range, account SNR — all on device
    (supernet_tpu.perturb);
 3. forward -> (probs, sigma); accumulate predictions + artifacts;
 4. per-structure Dice/Hausdorff/sens/prec/spec/RVD/over-under on host.

Artifacts written per run: ``uncertainty_info*.pkl``,
``Predictive_variance_tasks.txt``, ``Related_hyperparameters*.txt`` — the
reference's full output surface, in the same noise-mode-specific directory
scheme (on_anterior/on_posterior/on_all, on_object/on_background/on_all).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from supernet_tpu import metrics as M
from supernet_tpu import perturb, reports
from supernet_tpu.metrics import _nanmean, _nanstd
from supernet_tpu.attacks import make_fgsm_attack, make_pgd_attack, retarget_labels
from supernet_tpu.configs import ExperimentConfig, NoiseConfig
from supernet_tpu.data import PickleDataset, center_crop_np
from supernet_tpu.models import forward
from supernet_tpu.train import one_hot_flatten

Params = Dict[str, Dict[str, jax.Array]]

_REGION_DIR = {
    "A": "on_anterior",
    "P": "on_posterior",
    "O": "on_object",
    "B": "on_background",
    "all": "on_all",
}


def make_eval_forward(
    cfg,
    mesh,
    mc_samples: int,
    mc_seed: int,
    forward_fn,
    sampled_fn,
    sharded_factory,
):
    """Shared eval-forward factory for both model families.

    Plain jit of ``forward_fn``; with ``mesh``, ``sharded_factory(cfg,
    mesh)`` (batch-sharded for 2-D, scan-axis for volumes). ``mc_samples
    > 0`` switches to the Monte-Carlo ensemble the VDP propagation
    replaces (the paper's baseline: "instead of Monte Carlo sampling"):
    N posterior weight draws through the deterministic twin
    ``sampled_fn``, returning the empirical (mean, variance) of the
    softmax outputs in the same [B, N, C] shapes — every downstream
    metric/artifact path works unchanged. Draws are deterministic per
    (mc_seed, batch index); costs N forwards per batch vs the VDP's one."""
    if mc_samples > 0:
        from supernet_tpu.models import sample_weights

        counter = [0]

        @jax.jit
        def mc(params, x, key):
            keys = jax.random.split(key, mc_samples)

            def one(k):
                return sampled_fn(sample_weights(params, k), x, cfg)

            probs = jax.lax.map(one, keys)  # [N, B, pixels, C]
            return jnp.mean(probs, 0), jnp.var(probs, 0)

        def f(params, x):
            key = jax.random.fold_in(
                jax.random.PRNGKey(mc_seed), counter[0]
            )
            counter[0] += 1
            return mc(params, x, key)

        return f
    if mesh is not None:
        return sharded_factory(cfg, mesh)

    # memoized per (forward_fn, cfg): a sweep calls run_testing once per
    # noise level x region, and a fresh jit wrapper each call would
    # re-trace the whole model every time (ADVICE r3)
    hit = _PLAIN_FWD_CACHE.get((forward_fn, cfg))
    if hit is not None:
        return hit

    @jax.jit
    def f(params, x):
        return forward_fn(params, x, cfg)

    _PLAIN_FWD_CACHE[(forward_fn, cfg)] = f
    return f


_PLAIN_FWD_CACHE: Dict[tuple, object] = {}

# latest ensemble wrap: (member list, mixture fwd, stacked tree). Size-1 —
# a sweep reuses one ensemble; holding strong member refs makes the
# id()-based key safe (ids cannot be recycled while the entry lives).
_ENSEMBLE_CACHE: Dict[tuple, tuple] = {}


def ensemble_forward(fwd, params_list):
    """Deep-ensemble eval forward: wrap a ``fwd(params, x) -> (p, s)``
    into the uniform-mixture moments over K stacked member trees
    (`serving.EnsembleSession`'s math — within-member variance PLUS
    between-member disagreement), vmapped so XLA batches the K forwards
    in one program. Returns ``(mixture_fwd, stacked_params)``.

    Single-device VDP only: callers reject mesh / mc_samples modes.

    Repeated calls with the SAME fwd and member trees (a noise sweep calls
    run_testing per level x region) return the cached (mixture fwd,
    stacked tree) pair instead of re-stacking K trees and re-tracing the
    vmapped K-member program every time (ADVICE r3)."""
    params_list = list(params_list)
    if not params_list:
        raise ValueError("params_list must hold at least one member")
    key = (fwd, tuple(id(p) for p in params_list))
    hit = _ENSEMBLE_CACHE.get(key)
    if hit is not None and all(
        a is b for a, b in zip(hit[0], params_list)
    ):
        return hit[1], hit[2]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *params_list
    )

    @jax.jit
    def efn(params, x):
        p, s = jax.vmap(lambda pr: fwd(pr, x))(params)
        mean = jnp.mean(p, axis=0)
        var = jnp.mean(s + jnp.square(p), axis=0) - jnp.square(mean)
        return mean, jnp.maximum(var, 0.0)

    _ENSEMBLE_CACHE.clear()
    _ENSEMBLE_CACHE[key] = (params_list, efn, stacked)
    return efn, stacked


def _reject_ensemble_modes(params, mesh, mc_samples=0):
    """Shared guard: list-of-members params compose with the plain VDP
    forward only (the mixture is not defined for the MC baseline, and
    mesh sharding of the stacked tree is unimplemented)."""
    if isinstance(params, (list, tuple)):
        if mesh is not None or mc_samples:
            raise ValueError(
                "ensemble eval (a list of member params) is single-device "
                "VDP only; drop mesh / mc_samples"
            )
        return True
    return False


def _forward_fn(cfg, mesh=None, mc_samples: int = 0, mc_seed: int = 0):
    """2-D eval forward (see `make_eval_forward`): batch-sharded over the
    mesh, or the `forward_sampled` MC ensemble."""
    from supernet_tpu.models import forward_sampled
    from supernet_tpu.parallel import make_sharded_forward

    return make_eval_forward(
        cfg, mesh, mc_samples, mc_seed,
        forward, forward_sampled, make_sharded_forward,
    )




def _aggregate_structures(
    result: Dict[str, object],
    structs,
    acc_metrics: Dict[str, List[M.StructureMetrics]],
) -> None:
    """The reference's per-structure report block (`Hippocampus.py:1051-1118`,
    `:1360-1399`): dice + std, Hausdorff, sens/prec/spec, RVD, over/under
    segmentation, c_score — NaN-safe for structures absent from every image
    (untargeted BraTS attacks)."""
    for s in structs:
        ms = acc_metrics[s]
        all_dice = np.concatenate([m.all_dice for m in ms])
        result[f"dice_{s}"] = _nanmean(all_dice)
        result[f"dice_{s}_std"] = _nanstd(all_dice)
        result[f"hausdorff_{s}"] = float(np.mean([m.hausdorff for m in ms]))
        for field in (
            "sensitivity",
            "precision",
            "specificity",
            "rvd",
            "over_seg",
            "under_seg",
        ):
            result[f"{field}_{s}"] = _nanmean(
                [getattr(m, field) for m in ms]
            )
        # combined over/under score from mean sensitivity + specificity
        # (`Hippocampus.py:1024,1394`: c_score(test_s, test_sp))
        result[f"c_score_{s}"] = M.c_score(
            result[f"sensitivity_{s}"], result[f"specificity_{s}"]
        )


def _crop_label(y: np.ndarray, size: int) -> np.ndarray:
    yc = center_crop_np(y[..., None] if y.ndim == 3 else y, size)
    return yc[..., 0] if yc.ndim == 4 else yc


def _pad_batch(a, batch_size: int):
    """Pad the leading dim to ``batch_size`` by repeating the last sample.

    Keeps mesh-sharded eval shapes static on the trailing partial batch; the
    padded rows are sliced off every output before metrics/artifacts, so a
    mesh run scores exactly the samples a single-device run does. Repeating
    existing rows leaves the batch min/max (used by noise clipping and the
    attack projection) unchanged."""
    pad = batch_size - len(a)
    if pad <= 0:
        return a
    reps = jnp if isinstance(a, jax.Array) else np
    return reps.concatenate([a, reps.repeat(a[-1:], pad, axis=0)], axis=0)


def run_testing(
    exp: ExperimentConfig,
    params: Params,
    ds: PickleDataset,
    noise: NoiseConfig = NoiseConfig(),
    out_dir: Optional[str] = None,
    images_n: int = 0,
    seed: int = 0,
    mesh=None,
    mc_samples: int = 0,
    artifact_max_samples: Optional[int] = None,
) -> Dict[str, object]:
    """The ``testing`` protocol; returns metrics + artifact path.

    ``mc_samples > 0`` evaluates the Monte-Carlo weight-sampling baseline
    instead of the VDP propagation (same metrics/artifacts; N forwards per
    batch — see `_forward_fn`).

    Host memory is O(batch + images_n + artifact rows): metrics and the
    predictive-variance report accumulate ONLINE
    (`reports.UncertaintyAccumulator`), so the test set can be arbitrarily
    large. The one full-set surface is the reference's
    ``uncertainty_info*.pkl`` dump ([probs, sigma, images, labels, acc] —
    `Hippocampus.py:1420,1449`, ~2.8 MB/sample on BraTS);
    ``artifact_max_samples`` caps how many leading samples it keeps
    (``None`` = all, the parity default; the cap is recorded in the result
    as ``artifact_samples`` and in the hyperparameters dump)."""
    cfg = exp.model
    if mc_samples > 0 and mesh is not None:
        raise ValueError("mc_samples mode is single-device; drop mesh")
    fwd = _forward_fn(cfg, mesh, mc_samples=mc_samples, mc_seed=seed)
    if _reject_ensemble_modes(params, mesh, mc_samples):
        fwd, params = ensemble_forward(fwd, params)
    if mesh is not None:
        from supernet_tpu.parallel import replicate

        params = replicate(mesh, params)
    key = jax.random.PRNGKey(seed)

    n_total = len(ds)
    # clamp to >=1: downstream artifact writers need at least one row
    artifact_cap = (
        n_total if artifact_max_samples is None
        else min(max(artifact_max_samples, 1), n_total)
    )
    all_probs, all_sigma, all_x, all_y = [], [], [], []
    n_kept = 0
    rep = reports.UncertaintyAccumulator(
        n_total, images_n=images_n, dataset=exp.name, adversarial=False
    )
    snrs: List[float] = []
    accs: List[float] = []
    structs = M.dataset_structures(exp.name)
    acc_metrics: Dict[str, List[M.StructureMetrics]] = {s: [] for s in structs}
    t_infer = 0.0
    n_batches = 0

    # every test sample is evaluated (the reference includes the partial
    # final batch, Hippocampus.py:505-510); with a mesh the tail batch is
    # padded to the static batch size and the padding masked back out, so
    # mesh metrics are identical to single-device on any dataset size.
    for x, y in ds.batches(exp.train.batch_size, drop_remainder=False):
        b = len(x)
        x_crop = center_crop_np(x, cfg.out_size)
        y_crop = _crop_label(y, cfg.out_size)
        xb = jnp.asarray(x)
        yb_full = jnp.asarray(y.astype(np.int32))
        if noise.kind != "none" and noise.std > 0:
            key, sub = jax.random.split(key)
            # crop_size: clip range + SNR use the center-cropped frames,
            # exactly like the reference (`Hippocampus.py:1270-1271,1302-1307`)
            xb, snr = perturb.apply_noise(
                sub, xb, yb_full, noise, exp.name, crop_size=cfg.out_size
            )
            snrs.append(float(snr))
        if mesh is not None:
            xb = _pad_batch(xb, exp.train.batch_size)

        t0 = time.perf_counter()
        probs, sigma = fwd(params, xb)
        # host fetch of BOTH outputs = true device completion; the reference
        # times the whole (logits, sigma) materialization
        # (`Hippocampus.py:952-954`)
        probs = np.asarray(probs)
        sigma = np.asarray(sigma)
        t_infer += time.perf_counter() - t0
        n_batches += 1

        probs_i = probs[:b].reshape(
            b, cfg.out_size, cfg.out_size, cfg.n_classes
        )
        sigma_i = sigma[:b].reshape(
            b, cfg.out_size, cfg.out_size, cfg.n_classes
        )
        pred = np.argmax(probs_i, axis=-1)
        accs.append(float(np.mean(pred == y_crop)))
        for s in structs:
            acc_metrics[s].append(
                M.structure_metrics(
                    M.binarize(y_crop, s, exp.name),
                    M.binarize(pred, s, exp.name),
                )
            )
        x_noisy = center_crop_np(np.asarray(xb)[:b], cfg.out_size)
        rep.update(x_noisy, probs_i, y_crop, sigma_i)
        take = min(b, artifact_cap - n_kept)
        if take > 0:
            all_probs.append(probs_i[:take])
            all_sigma.append(sigma_i[:take])
            all_x.append(x_noisy[:take])
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
    out_dir = out_dir or os.path.join(exp.out_dir, exp.name, "testing", sub)
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

    artifact = reports.save_uncertainty_artifact(
        out_dir,
        probs,
        sigma,
        xs,
        ys,
        acc=result["accuracy"],
        name=reports.uncertainty_artifact_name(
            0.0 if noise.kind == "none" else noise.std, noise.region
        ),
    )
    result["artifact"] = artifact
    result["artifact_samples"] = n_kept
    if n_kept < n_total:
        logging.getLogger(__name__).info(
            "uncertainty_info artifact capped to %d of %d samples "
            "(artifact_max_samples)", n_kept, n_total,
        )
    unc = rep.finalize(out_dir)
    result["mean_predictive_variance"] = unc["mean"]
    reports.write_hyperparameters(
        out_dir,
        "Related_hyperparameters.txt",
        {**dataclasses.asdict(noise), **result},
    )
    return result


def run_adversarial(
    exp: ExperimentConfig,
    params: Params,
    ds: PickleDataset,
    out_dir: Optional[str] = None,
    images_n: int = 0,
    mesh=None,
    artifact_max_samples: Optional[int] = None,
) -> Dict[str, object]:
    """Adversarial evaluation branch (`Hippocampus.py:894-1049`): PGD when
    targeted (both datasets) / always for Hippocampus; single-step FGSM for
    untargeted BraTS (`Brats.py:984-991`).

    Streams like ``run_testing``: metrics and the variance report
    accumulate online; ``artifact_max_samples`` caps the full-set
    ``uncertainty_info.pkl`` rows (None = all, parity default)."""
    cfg = exp.model
    ac = exp.attack
    if isinstance(params, (list, tuple)):
        raise ValueError(
            "adversarial eval attacks ONE member's loss surface; pass a "
            "single checkpoint (ensemble attack transfer is out of scope)"
        )
    fwd = _forward_fn(cfg, mesh)
    if mesh is not None:
        from supernet_tpu.parallel import replicate

        params = replicate(mesh, params)
    use_pgd = ac.targeted or exp.name == "hippocampus"
    # the attack itself (max_adv_step forward+backward passes — the most
    # expensive stage) is batch-sharded over the mesh too
    attack = (make_pgd_attack if use_pgd else make_fgsm_attack)(
        cfg, ac, mesh=mesh
    )

    n_total = len(ds)
    # clamp to >=1: downstream artifact writers need at least one row
    artifact_cap = (
        n_total if artifact_max_samples is None
        else min(max(artifact_max_samples, 1), n_total)
    )
    all_probs, all_sigma, all_adv, all_y = [], [], [], []
    n_kept = 0
    rep = reports.UncertaintyAccumulator(
        n_total, images_n=images_n, dataset=exp.name,
        adversarial=True, targeted=ac.targeted,
    )
    accs, snrs = [], []
    structs = M.dataset_structures(exp.name)
    acc_metrics: Dict[str, List[M.StructureMetrics]] = {s: [] for s in structs}
    t_infer, n_batches = 0.0, 0

    for x, y in ds.batches(exp.train.batch_size, drop_remainder=False):
        b = len(x)
        y_crop = _crop_label(y, cfg.out_size)
        xb = jnp.asarray(x)
        y_attack = y_crop
        if ac.targeted:
            y_attack = np.asarray(
                retarget_labels(
                    jnp.asarray(y_crop.astype(np.int32)),
                    ac.adversary_targeted_class,
                    ac.adv_class,
                )
            )
        # one_hot with depth n_classes: the targeted adv_class (3 for
        # Hippocampus, out of range) becomes an all-zero row, exactly like
        # the reference's tf.one_hot(depth=output_size) (Hippocampus.py:917).
        y_flat = one_hot_flatten(
            jnp.asarray(y_attack.astype(np.int32)), cfg.n_classes
        )
        x_min, x_max = jnp.min(xb), jnp.max(xb)
        if mesh is not None:
            # pad to the static batch size (mask the rows back out below);
            # the attack is per-sample, so padding changes nothing else
            xb = _pad_batch(xb, exp.train.batch_size)
            y_flat = _pad_batch(y_flat, exp.train.batch_size)
        adv = attack(params, xb, y_flat, x_min, x_max)
        # force the (async-dispatched) attack to completion OUTSIDE the
        # timed window — otherwise its max_adv_step forward+backward
        # iterations land inside it and "inference time" is off by ~2*steps
        # forwards; the host copy is reused below
        adv_np = np.asarray(adv)

        t0 = time.perf_counter()
        probs, sigma = fwd(params, adv)
        # both outputs fetched inside the timed window (`Hippocampus.py:952-954`)
        probs = np.asarray(probs)
        sigma = np.asarray(sigma)
        t_infer += time.perf_counter() - t0
        n_batches += 1

        probs_i = probs[:b].reshape(
            b, cfg.out_size, cfg.out_size, cfg.n_classes
        )
        sigma_i = sigma[:b].reshape(
            b, cfg.out_size, cfg.out_size, cfg.n_classes
        )
        pred = np.argmax(probs_i, axis=-1)
        accs.append(float(np.mean(pred == y_crop)))
        for s in structs:
            acc_metrics[s].append(
                M.structure_metrics(
                    M.binarize(y_crop, s, exp.name),
                    M.binarize(pred, s, exp.name),
                )
            )
        adv_crop = center_crop_np(adv_np[:b], cfg.out_size)
        x_crop = center_crop_np(x, cfg.out_size)
        # SNR of the adversarial perturbation on the cropped frames
        # (`Hippocampus.py:995-1000`: 10 log10(sum x^2 / sum (adv - x)^2))
        snrs.append(float(perturb.snr_db(x_crop, adv_crop)))
        rep.update(
            adv_crop, probs_i, y_crop, sigma_i, adv=adv_crop,
            masked=y_attack if ac.targeted else None,
        )
        take = min(b, artifact_cap - n_kept)
        if take > 0:
            all_probs.append(probs_i[:take])
            all_sigma.append(sigma_i[:take])
            all_adv.append(adv_crop[:take])
            all_y.append(y_crop[:take])
            n_kept += take

    probs = np.concatenate(all_probs)
    sigma = np.concatenate(all_sigma)
    advs = np.concatenate(all_adv)
    ys = np.concatenate(all_y)

    mode = "targeted" if ac.targeted else "untargeted"
    out_dir = out_dir or os.path.join(
        exp.out_dir, exp.name, "adversarial", f"{mode}_eps{ac.epsilon}"
    )
    os.makedirs(out_dir, exist_ok=True)

    result: Dict[str, object] = {
        "accuracy": float(np.mean(accs)),
        # SNR of the adversarial perturbation (`Hippocampus.py:995-1001`)
        "snr_db": float(np.mean(snrs)) if snrs else float("inf"),
        "test_time_per_batch_s": t_infer / max(n_batches, 1),
        "out_dir": out_dir,
    }
    _aggregate_structures(result, structs, acc_metrics)

    artifact = reports.save_uncertainty_artifact(
        out_dir, probs, sigma, advs, ys, acc=result["accuracy"]
    )
    result["artifact"] = artifact
    result["artifact_samples"] = n_kept
    if n_kept < n_total:
        logging.getLogger(__name__).info(
            "uncertainty_info artifact capped to %d of %d samples "
            "(artifact_max_samples)", n_kept, n_total,
        )
    unc = rep.finalize(out_dir)
    result["mean_predictive_variance"] = unc["mean"]
    # per-class / per-structure predictive variance lines the reference
    # appends for targeted attacks (`Hippocampus.py:1105-1112`)
    for k, v in unc.items():
        if k != "mean":
            result[f"predictive_variance_{k}"] = v
    reports.write_hyperparameters(
        out_dir,
        "Related_hyperparameters_adversarial.txt",
        {**dataclasses.asdict(ac), **result},
    )
    return result


def run_noise_sweep(
    exp: ExperimentConfig,
    params: Params,
    ds: PickleDataset,
    images_n: int = 0,
    mesh=None,
    artifact_max_samples: Optional[int] = None,
) -> List[Dict[str, object]]:
    """The module-level sweep (`Hippocampus.py:1578-1601`): clean eval +
    uncertainty render, then gaussian noise at each level x region.

    ``artifact_max_samples`` bounds the pkl-artifact buffer of EVERY run in
    the sweep — the sweep is the highest-volume caller of `run_testing`
    (7 full-set passes at the default 2 levels x 3 regions), so it must be
    able to reach the streaming cap the single-run path already has."""
    results = [
        run_testing(exp, params, ds, NoiseConfig(), images_n=images_n,
                    mesh=mesh, artifact_max_samples=artifact_max_samples)
    ]
    for std in exp.noise_levels:
        for region in exp.noise_regions:
            results.append(
                run_testing(
                    exp,
                    params,
                    ds,
                    NoiseConfig(kind="gaussian", std=std, region=region),
                    images_n=images_n,
                    mesh=mesh,
                    artifact_max_samples=artifact_max_samples,
                )
            )
    return results
