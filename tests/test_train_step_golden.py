"""Whole-model TRAIN-STEP trajectory goldens vs torch (VERDICT r3 #3).

The one numeric path previously untested end-to-end: autograd through a real
model. The reference's training numerics are cuDNN autograd
(learning/engine.py:105-130, ``scaler.scale(loss).backward()``) followed by
Ranger2020 (optimizer.py:136-255). Here the FULL chain
``model-forward → DiceLoss → backward → Ranger`` runs for several steps on
identical weights/batches (fp32, no_amp) on both sides:

  * torch: the identically-weighted whole-model replicas from
    tests/test_full_model_parity.py + an in-test MONAI-semantics DiceLoss +
    the behavioral TorchRanger port from tests/test_optim_golden.py;
  * jax:   brats21_tpu's make_train_step + learning.ranger on the same
    init, through the jit/grad/donation machinery the product uses.

Per-step agreement of the loss and of EVERY parameter (compared in torch
layout via the golden-tested one-way weight mapping). Covers EquiUnet and
the flagship EquiUnetASSPEvo including deep supervision, EvoNorm group-std
backward, SE/ASPP paths, trilinear-upsample transpose, GC (including the
reference's rank-5 EvoNorm affine params), lookahead sync and weight decay.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from brats21_tpu.learning.losses import make_criterion
from brats21_tpu.learning.ranger import ranger
from brats21_tpu.learning.train_state import create_train_state, make_train_step
from brats21_tpu.config import TrainConfig

from test_full_model_parity import (F4, TorchEquiUnet, TorchEquiUnetASSPEvo,
                                    _copy_block, _copy_conv, _copy_convevo,
                                    _copy_cbr, _copy_ublock)
from test_optim_golden import TorchRanger


def torch_dice_loss(logits, target):
    """MONAI DiceLoss, reference 'dice' kwargs (definer.py:184-203):
    sigmoid, squared_pred, batch=True, smooth 1e-5/1e-5, mean reduction.
    Channels-first [B, C, X, Y, Z]."""
    probs = torch.sigmoid(logits)
    axes = (0, 2, 3, 4)
    inter = (probs * target).sum(dim=axes)
    denom = (probs ** 2).sum(dim=axes) + (target ** 2).sum(dim=axes)
    return (1.0 - (2.0 * inter + 1e-5) / (denom + 1e-5)).mean()


def _torch_ds_loss(outputs, target):
    """deep_supervision_loss twin: mean of the criterion over all heads
    (reference engine.py:312-333)."""
    if isinstance(outputs, tuple):
        main, deeps = outputs
    else:
        main, deeps = outputs, []
    losses = [torch_dice_loss(main, target)]
    losses += [torch_dice_loss(d, target) for d in deeps]
    return torch.stack(losses).mean()


def _copy_equiunet(tm, params):
    for name in ("encoder1", "encoder2", "encoder3", "encoder4", "bottom",
                 "decoder3", "decoder2", "decoder1"):
        _copy_ublock(getattr(tm, name), params[name])
    _copy_cbr(tm.bottom_2, params["bottom_2"])
    with torch.no_grad():
        k = np.asarray(params["outconv"]["Conv_0"]["kernel"])
        tm.outconv.weight.copy_(torch.from_numpy(
            np.transpose(k, (4, 3, 0, 1, 2))))
        tm.outconv.bias.copy_(torch.from_numpy(
            np.asarray(params["outconv"]["Conv_0"]["bias"])))


def _copy_assp_evo(tm, params):
    for name in ("encoder1", "encoder2", "encoder3", "encoder4",
                 "decoder3", "decoder2", "decoder1"):
        _copy_block(getattr(tm, name), params[name])
    for name in ("bridge1", "bridge2", "bridge3",
                 "upconv3", "upconv2", "upconv1"):
        _copy_convevo(getattr(tm, name), params[name])
    for i in range(4):
        _copy_conv(tm.aspp.convs[i], params["aspp"][f"conv_{i}"])
    _copy_convevo(tm.aspp.conv_k1, params["aspp"]["conv_k1"])
    _copy_conv(tm.out_conv, params["out_conv"])
    _copy_conv(tm.deep3, params["deep3"]["conv"])
    _copy_conv(tm.deep2, params["deep2"]["conv"])


def _np_params(state_params):
    return jax.tree_util.tree_map(np.asarray, state_params)


def _run_trajectory(model_name, make_flax, make_torch, copy_fn, ranger_kw,
                    n_steps=9, param_atol=5e-5, loss_atol=2e-5):
    """Run n_steps of the full train step on both sides, asserting per-step
    loss and whole-model parameter agreement (compared in torch layout via
    the golden-tested flax→torch mapping)."""
    rng = np.random.default_rng(7)
    cfg = TrainConfig(model=model_name, width=8, criterion="dice",
                      no_amp=True)
    criterion = make_criterion(cfg)
    model = make_flax()

    # flax init → the single source of truth for both sides' weights
    sample = jnp.zeros((1, 16, 16, 16, 4), jnp.float32)
    lr = 1e-3
    tx = ranger(lr, **ranger_kw)
    state = create_train_state(model, tx, jax.random.PRNGKey(3), sample)
    step_fn = make_train_step(criterion, use_amp=False)

    tm = make_torch(F4)
    copy_fn(tm, _np_params(state.params))
    tparams = list(tm.parameters())
    t_ranger = TorchRanger([p.detach().clone() for p in tparams], lr=lr,
                           **{("wd" if k == "weight_decay" else k): v
                              for k, v in ranger_kw.items()})

    batches = []
    for _ in range(n_steps):
        img = rng.standard_normal((1, 16, 16, 16, 4)).astype(np.float32)
        seg = (rng.random((1, 16, 16, 16, 3)) > 0.55).astype(np.float32)
        batches.append((img, seg))

    key = jax.random.PRNGKey(0)
    for t, (img, seg) in enumerate(batches):
        # ---- torch side
        tm.zero_grad()
        out = tm(torch.from_numpy(np.moveaxis(img, -1, 1)))
        tloss = _torch_ds_loss(out, torch.from_numpy(np.moveaxis(seg, -1, 1)))
        tloss.backward()
        t_ranger.step([p.grad for p in tparams])
        with torch.no_grad():
            for p, q in zip(tparams, t_ranger.p):
                p.copy_(q)

        # ---- jax side (the product path: jit, value_and_grad, donation)
        state, metrics = step_fn(state, jnp.asarray(img), jnp.asarray(seg),
                                 key)
        jloss = float(metrics["loss"])
        np.testing.assert_allclose(
            jloss, float(tloss.detach()), atol=loss_atol, rtol=1e-5,
            err_msg=f"{model_name} loss diverged at step {t + 1}")

        # ---- whole-model param comparison in torch layout: copy the
        # current flax params into a FRESH replica via the (forward-parity
        # golden-tested) mapping and diff every tensor.
        probe = make_torch(F4)
        copy_fn(probe, _np_params(state.params))
        for (name, pw), pt in zip(tm.state_dict().items(),
                                  probe.state_dict().values()):
            np.testing.assert_allclose(
                pt.numpy(), pw.detach().numpy(), atol=param_atol, rtol=0,
                err_msg=f"{model_name} param {name} diverged at "
                        f"step {t + 1}")
    return state


def test_equiunet_train_step_trajectory_matches_torch():
    """EquiUnet (GroupNorm/ReLU family) full train steps vs torch autograd
    + plain Ranger: 9 steps through the RAdam rectification crossover and a
    lookahead sync (k=6)."""
    from brats21_tpu.models.equiunet import EquiUnet
    _run_trajectory(
        "equiunet",
        lambda: EquiUnet(features=F4, num_classes=3, act="relu",
                         norm="group", deep_supervision=False, remat=False),
        lambda f: TorchEquiUnet(f).train(),
        _copy_equiunet,
        ranger_kw={},
    )


def test_assp_evo_train_step_trajectory_matches_torch_gc_wd():
    """The flagship EquiUnetASSPEvo with deep supervision vs torch autograd
    + Ranger(use_gc, weight_decay) — the published Model-6 training chain
    (main_train.py:90, definer.py:316-331). GC covers the reference's
    rank-5 EvoNorm affine params ((1,C,1,1,1), equiunet2021.py:75-78),
    which must be mean-centered even though the flax twins are rank-1."""
    from brats21_tpu.models.assp_evo import EquiUnetASSPEvo
    _run_trajectory(
        "equiunet_assp_evo",
        lambda: EquiUnetASSPEvo(features=F4, num_classes=3,
                                deep_supervision=True, remat=False),
        lambda f: TorchEquiUnetASSPEvo(f).train(),
        _copy_assp_evo,
        ranger_kw={"use_gc": True, "weight_decay": 1e-2},
    )
