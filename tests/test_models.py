"""Shape/structure tests for the model zoo (reference smoke test:
equiunet2021.py:336-345 builds 1×4×64³ and checks output shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats21_tpu.config import TrainConfig
from brats21_tpu.models import get_model


def _build_and_run(model_name, spatial=(16, 16, 16), width=8, **kw):
    cfg = TrainConfig(model=model_name, width=width, norm=kw.pop("norm", "group"),
                      act=kw.pop("act", "relu"))
    model = get_model(cfg)
    x = jnp.ones((1, *spatial, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    return out


@pytest.mark.parametrize("name", ["equiunet", "equiunet_assp_evo"])
def test_flagship_output_shapes(name):
    out, deeps = _build_and_run(name)
    assert out.shape == (1, 16, 16, 16, 3)
    for d in deeps:
        assert d.shape == (1, 16, 16, 16, 3)


def test_equiunet_deep_head_count():
    _, deeps = _build_and_run("equiunet")
    assert len(deeps) == 4  # bottom, bottom_2, up3, up2 (equiunet2020.py:493-499)


def test_assp_evo_deep_head_count():
    _, deeps = _build_and_run("equiunet_assp_evo")
    assert len(deeps) == 2  # up3, up2 only (equiunet2021.py:326-332)


def test_att_equiunet():
    out, deeps = _build_and_run("att_equiunet")
    assert out.shape == (1, 16, 16, 16, 3)
    assert len(deeps) == 4


def test_equiunet_refinement_returns_pair():
    out, deeps = _build_and_run("equiunet_ref")
    assert isinstance(out, list) and len(out) == 2
    assert out[0].shape == out[1].shape == (1, 16, 16, 16, 3)


@pytest.mark.parametrize("norm", ["group", "instance", "none"])
def test_norm_variants(norm):
    out, _ = _build_and_run("equiunet", norm=norm)
    assert np.isfinite(np.asarray(out)).all()


def test_equiunet_jit_and_grad():
    cfg = TrainConfig(model="equiunet", width=8)
    model = get_model(cfg)
    x = jnp.ones((1, 16, 16, 16, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(p):
        out, deeps = model.apply(p, x)
        return jnp.mean(out ** 2) + sum(jnp.mean(d ** 2) for d in deeps)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_bf16_forward():
    cfg = TrainConfig(model="equiunet_assp_evo", width=8)
    model = get_model(cfg)
    x = jnp.ones((1, 16, 16, 16, 4), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(params, x)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_dropout_channel_wise_masks_whole_channels():
    """channel_wise=True is torch Dropout3d semantics (MONAI's
    Dropout[DROPOUT, 3] for SegResNet/HighResNet/VNet dropout_prob): one
    mask value per (batch, channel), constant across the spatial axes."""
    from brats21_tpu.models.layers import Dropout

    x = jnp.ones((2, 4, 5, 6, 8), jnp.float32)
    drop = Dropout(0.5, channel_wise=True)
    y = drop.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    flat = np.asarray(y).reshape(2, -1, 8)
    # every (batch, channel) column is either all-zero or all-scaled
    per_bc = flat.transpose(0, 2, 1).reshape(-1, flat.shape[1])
    for col in per_bc:
        assert np.all(col == 0.0) or np.allclose(col, 2.0)
    assert np.any(per_bc == 0.0) and np.any(per_bc > 0.0)

    # element-wise mode really is element-wise (mask varies within a
    # channel) and deterministic mode is the identity
    ye = Dropout(0.5).apply({}, x, False,
                            rngs={"dropout": jax.random.PRNGKey(0)})
    fe = np.asarray(ye).reshape(2, -1, 8)
    varies = [(np.any(fe[b, :, c] == 0) and np.any(fe[b, :, c] > 0))
              for b in range(2) for c in range(8)]
    assert any(varies)
    np.testing.assert_array_equal(
        np.asarray(Dropout(0.5, channel_wise=True).apply({}, x, True)), x)
