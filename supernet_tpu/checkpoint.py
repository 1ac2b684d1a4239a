"""Checkpointing: Orbax for native state + a Keras-H5 weight importer.

The reference checkpoints with Keras ``save_weights``/``load_weights`` into
``./{Dataset}/saved_models_SUPER_u-Net/epoch_{N}/vdp_UNET_model.weights.h5``
every epoch (`Hippocampus.py:474,549-555,665,743`; C37 in SURVEY.md §2.6),
resuming via ``continue_training``/``saved_model_epochs``.

Here:
- native path: Orbax ``StandardCheckpointer`` on the full ``TrainState``
  pytree (params + optimizer state + step), same ``epoch_{N}`` directory
  scheme, ``latest_epoch``/resume helpers;
- ``import_keras_h5`` reads the reference's H5 layout into our params dict
  so pretrained-parity evals can run. Keras names subclassed layers by class
  in creation order (``my_conv_input``, ``my_conv_intermediate``,
  ``my_conv_intermediate_1``, ...), and creation order in
  ``Density_prop_with_pad_UNET.__init__`` equals our ``layer_names`` order
  (`Hippocampus.py:343-364`, `Brats.py:331-368`), with weights named
  ``w_mu1``/``w_sigma1`` on the input conv and ``w_mu``/``w_sigma``
  elsewhere (`Hippocampus.py:114-122,167-175`);
- ``export_keras_h5`` writes the same layout (round-trip tested, and lets
  users of the reference load our trained weights back into it).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import jax
import numpy as np

from supernet_tpu.configs import ModelConfig
from supernet_tpu.models import layer_names

Params = Dict[str, Dict[str, jax.Array]]


# ------------------------------------------------------------------- orbax


def _epoch_dir(root: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(root), f"epoch_{epoch}")


def save_state(root: str, epoch: int, state) -> str:
    """Save a TrainState pytree under ``root/epoch_{N}/state``."""
    import orbax.checkpoint as ocp

    path = os.path.join(_epoch_dir(root, epoch), "state")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore_state(root: str, epoch: int, template):
    """Restore a TrainState saved by ``save_state`` or the async writer;
    ``template`` is an abstract or concrete pytree of matching structure."""
    import orbax.checkpoint as ocp

    path = os.path.join(_epoch_dir(root, epoch), "state")
    if not os.path.isdir(path):
        path = os.path.join(_epoch_dir(root, epoch), "default")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def resolve_checkpoint(src: str):
    """(root, epoch) from a checkpoint path: ``.../epoch_{N}`` names that
    exact epoch (the reference's ``saved_model_epochs`` selector,
    `Hippocampus.py:550`); anything else is a root whose LATEST epoch is
    picked. ``epoch`` is None when the root holds no checkpoints."""
    m = re.fullmatch(r"epoch_(\d+)", os.path.basename(os.path.normpath(src)))
    if m:
        root = os.path.dirname(os.path.normpath(src))
        return root, int(m.group(1))
    return src, latest_epoch(src)


def latest_epoch(root: str) -> Optional[int]:
    """Highest N with an ``epoch_{N}`` checkpoint under root, or None.

    Accepts both layouts: ``epoch_{N}/state`` (save_state) and
    ``epoch_{N}/default`` (AsyncCheckpointer / CheckpointManager).
    """
    if not os.path.isdir(root):
        return None
    best = None
    for name in os.listdir(root):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m and (
            os.path.isdir(os.path.join(root, name, "state"))
            or os.path.isdir(os.path.join(root, name, "default"))
        ):
            n = int(m.group(1))
            best = n if best is None or n > best else best
    return best


class AsyncEpochCheckpointer:
    """Non-blocking per-epoch checkpointing (SURVEY.md §5: the reference
    blocks training on a synchronous Keras ``save_weights`` every epoch,
    `Hippocampus.py:665`). Saves run on a background thread via Orbax's
    AsyncCheckpointer while the next epoch trains; ``wait()`` drains.

    Directory scheme matches the reference (``root/epoch_{N}``) so
    ``latest_epoch`` / resume work across sync and async writers.
    """

    def __init__(self, root: str, keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self.root = os.path.abspath(root)
        self.keep = keep
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._saved: List[int] = []

    def save(self, epoch: int, state) -> None:
        path = os.path.join(_epoch_dir(self.root, epoch), "default")
        self._ckptr.save(path, state, force=True)
        self._saved.append(epoch)
        if self.keep is not None and len(self._saved) > self.keep:
            import shutil

            victim = self._saved.pop(0)
            self._ckptr.wait_until_finished()
            shutil.rmtree(_epoch_dir(self.root, victim), ignore_errors=True)

    def restore(self, epoch: int, template):
        self._ckptr.wait_until_finished()
        path = os.path.join(_epoch_dir(self.root, epoch), "default")
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as c:
            return c.restore(path, template)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()


# ---------------------------------------------------------------- keras h5


def _keras_layer_name(index: int) -> str:
    """Keras auto-name of the i-th conv layer in creation order."""
    if index == 0:
        return "my_conv_input"
    if index == 1:
        return "my_conv_intermediate"
    return f"my_conv_intermediate_{index - 1}"


def _h5_weight_map(f) -> Dict[str, np.ndarray]:
    """Flatten an H5 weights file to {layer_name/weight_name: array},
    handling both the attr-based Keras 2 layout and a bare group walk."""
    out: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        import h5py

        if isinstance(obj, h5py.Dataset):
            out[name] = np.asarray(obj)

    f.visititems(visit)
    return out


def import_keras_h5(path: str, cfg: ModelConfig) -> Params:
    """Read a reference ``vdp_UNET_model.weights.h5`` into our params dict.

    Matching is by Keras creation-order layer name + weight suffix, with a
    shape check against ``layer_names(cfg)``.
    """
    import h5py

    names = layer_names(cfg)
    params: Params = {}
    with h5py.File(path, "r") as f:
        flat = _h5_weight_map(f)
        for i, (name, k, cin, cout) in enumerate(names):
            klayer = _keras_layer_name(i)
            suffix = "1" if i == 0 else ""
            mu_keys = [
                key
                for key in flat
                if klayer in key.split("/") and f"w_mu{suffix}" in key
            ]
            sg_keys = [
                key
                for key in flat
                if klayer in key.split("/") and f"w_sigma{suffix}" in key
            ]
            if len(mu_keys) != 1 or len(sg_keys) != 1:
                raise KeyError(
                    f"layer {name} ({klayer}): expected exactly one "
                    f"w_mu{suffix}/w_sigma{suffix}, found {mu_keys} / {sg_keys}"
                )
            w_mu = flat[mu_keys[0]].astype(np.float32)
            w_sigma = flat[sg_keys[0]].astype(np.float32)
            if w_mu.shape != (k, k, cin, cout) or w_sigma.shape != (cout,):
                raise ValueError(
                    f"layer {name}: shape mismatch, h5 has "
                    f"{w_mu.shape}/{w_sigma.shape}, model expects "
                    f"{(k, k, cin, cout)}/{(cout,)}"
                )
            params[name] = {
                "w_mu": jax.numpy.asarray(w_mu),
                "w_sigma": jax.numpy.asarray(w_sigma),
            }
    return params


def export_keras_h5(path: str, params: Params, cfg: ModelConfig) -> None:
    """Write our params in the reference's H5 layout (Keras-2 style groups
    ``{layer}/{layer}/{weight}:0`` plus the layer_names/weight_names attrs)."""
    import h5py

    names = layer_names(cfg)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        layer_list: List[bytes] = []
        for i, (name, _, _, _) in enumerate(names):
            klayer = _keras_layer_name(i)
            layer_list.append(klayer.encode())
            suffix = "1" if i == 0 else ""
            g = f.create_group(klayer)
            wnames = []
            for wkey, our in (
                (f"w_mu{suffix}:0", "w_mu"),
                (f"w_sigma{suffix}:0", "w_sigma"),
            ):
                full = f"{klayer}/{wkey}"
                g.create_dataset(
                    full.split("/", 1)[1],
                    data=np.asarray(params[name][our], np.float32),
                )
                wnames.append(full.encode())
            g.attrs["weight_names"] = wnames
        f.attrs["layer_names"] = layer_list


# -------------------------------------------------------------- npz (light)


def save_params_npz(path: str, params: Params) -> None:
    """Dependency-light flat dump (used by tests/bench; Orbax is the
    production path)."""
    flat = {
        f"{layer}/{w}": np.asarray(v)
        for layer, ws in params.items()
        for w, v in ws.items()
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Params:
    out: Params = {}
    with np.load(path) as f:
        for key in f.files:
            layer, w = key.rsplit("/", 1)
            out.setdefault(layer, {})[w] = jax.numpy.asarray(f[key])
    return out
