"""Adversarial training mode (VERDICT r2 #6; BASELINE.json configs[4] —
"FGSM/PGD attack training"): the mixed objective, the in-step example
generation, and an e2e run where loss decreases and clean eval survives."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supernet_tpu.configs import HIPPOCAMPUS
from supernet_tpu.data import PickleDataset, synthetic_dataset
from supernet_tpu.models import init_params
from supernet_tpu.train import (
    create_train_state,
    loss_fn,
    make_adversarial_examples,
    make_train_step,
    one_hot_flatten,
    value_and_grad_step,
)

CFG = dataclasses.replace(
    HIPPOCAMPUS.model, image_size=32, out_size=22, base_kernels=4
)
TC = dataclasses.replace(HIPPOCAMPUS.train, batch_size=4)


def _batch(b=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.normal(0, 1, (b, CFG.image_size, CFG.image_size, 1)).astype(
            np.float32
        )
    )
    y_img = rng.integers(0, CFG.n_classes, (b, CFG.out_size, CFG.out_size))
    return x, one_hot_flatten(jnp.asarray(y_img.astype(np.int32)),
                              CFG.n_classes)


def test_adversarial_examples_stay_in_ball():
    params = init_params(jax.random.PRNGKey(0), CFG)
    x, y = _batch()
    for mode in ("fgsm", "pgd"):
        tc = dataclasses.replace(
            TC, adversarial_training=mode, adv_epsilon=0.05, adv_steps=3,
            adv_step_size=0.02,
        )
        adv = make_adversarial_examples(params, x, y, CFG, tc)
        d = np.abs(np.asarray(adv - x))
        assert d.max() <= 0.05 + 1e-6
        assert d.max() > 0.0  # the attack actually moved the input
        # projected into the batch data range too (Hippocampus.py:930-932)
        assert float(jnp.max(adv)) <= float(jnp.max(x)) + 1e-6
        assert float(jnp.min(adv)) >= float(jnp.min(x)) - 1e-6


def test_mixed_objective_value():
    """loss == adv_alpha * L(clean) + (1-adv_alpha) * L(adv) with the adv
    batch gradient-stopped; aux is the clean branch."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    x, y = _batch()
    tc = dataclasses.replace(
        TC, adversarial_training="fgsm", adv_epsilon=0.05, adv_alpha=0.3
    )
    (loss, (nll, kl, probs, _)), grads = value_and_grad_step(
        params, x, y, CFG, tc
    )
    loss_c, (nll_c, _, probs_c, _) = loss_fn(params, x, y, CFG, tc)
    adv = make_adversarial_examples(params, x, y, CFG, tc)
    loss_a, _ = loss_fn(params, adv, y, CFG, tc)
    assert float(loss) == pytest.approx(
        0.3 * float(loss_c) + 0.7 * float(loss_a), rel=1e-5
    )
    assert float(nll) == pytest.approx(float(nll_c), rel=1e-6)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_c))
    # gradients flow (and differ from the clean-only gradient)
    _, g_clean = value_and_grad_step(
        params, x, y, CFG, dataclasses.replace(tc, adversarial_training="none")
    )
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), grads, g_clean
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_adv_alpha_one_matches_clean_gradient():
    """adv_alpha=1 reduces the gradient to the clean objective's."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    x, y = _batch(seed=1)
    tc = dataclasses.replace(
        TC, adversarial_training="fgsm", adv_epsilon=0.05, adv_alpha=1.0
    )
    (_, _), g_mixed = value_and_grad_step(params, x, y, CFG, tc)
    (_, _), g_clean = value_and_grad_step(
        params, x, y, CFG, dataclasses.replace(tc, adversarial_training="none")
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_mixed), jax.tree_util.tree_leaves(g_clean)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_adversarial_training_e2e(tmp_path):
    """Adversarial-mode training runs, loss decreases, clean-eval Dice
    survives (the VERDICT's done-when)."""
    from supernet_tpu.evaluate import run_testing
    from supernet_tpu.trainer import Trainer

    exp = HIPPOCAMPUS.replace(
        model=CFG,
        train=dataclasses.replace(
            TC,
            epochs=2,
            log_every=100,
            adversarial_training="fgsm",
            adv_epsilon=0.01,
        ),
    )
    x, y = synthetic_dataset(CFG, 8, seed=0)
    ds = PickleDataset(x, y, 1)
    tr = Trainer(exp, ds, ds, out_dir=str(tmp_path / "adv"),
                 track_curves=False)
    state = tr.run(epochs=2, log=lambda *_: None)
    losses = tr.history["train_loss"]
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]  # loss decreases over epochs
    res = run_testing(
        exp, jax.device_get(state.params), ds,
        out_dir=str(tmp_path / "eval"), images_n=0,
    )
    assert np.isfinite(res["accuracy"])
    # clean eval still produces usable per-structure metrics
    assert "dice_anterior" in res and "dice_posterior" in res


def test_adversarial_training_sharded_step_runs():
    """The DP train step composes with adversarial training (8-dev mesh)."""
    from supernet_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )

    tc = dataclasses.replace(
        TC, batch_size=8, adversarial_training="fgsm", adv_epsilon=0.01
    )
    mesh = make_mesh(8)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state, _ = create_train_state(params, tc)
    state = replicate(mesh, state)
    x, y = _batch(b=8)
    xs, ys = shard_batch(mesh, x, y)
    step = make_sharded_train_step(CFG, tc, mesh)
    state, m = step(state, xs, ys)
    assert np.isfinite(float(m.loss))


def test_unknown_adv_mode_raises():
    params = init_params(jax.random.PRNGKey(0), CFG)
    x, y = _batch()
    tc = dataclasses.replace(TC, adversarial_training="bogus")
    with pytest.raises(ValueError, match="adversarial_training"):
        make_train_step(CFG, tc)(
            create_train_state(params, tc)[0], x, y
        )
