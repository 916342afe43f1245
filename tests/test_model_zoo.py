"""Full model-zoo coverage: every CLI model name builds and produces
correctly-shaped finite outputs (reference surface arguments_train.py:24-47)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brats21_tpu.config import TrainConfig
from brats21_tpu.models import get_model

SPATIAL = (16, 16, 16)


def _run(name, width=4, **kw):
    cfg = TrainConfig(model=name, width=width,
                      patch_size=list(kw.pop("patch_size", SPATIAL)), **kw)
    model = get_model(cfg)
    x = jnp.ones((1, *SPATIAL, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    if isinstance(out, tuple) and "batch_stats" in variables:
        pass
    return out


def _main_of(out):
    if isinstance(out, tuple):
        out = out[0]
    if isinstance(out, (list, tuple)):
        out = out[0]
    return out


@pytest.mark.parametrize("name", ["modified_unet", "att_unet", "r2unet",
                                  "r2attunet"])
def test_unet_family(name):
    out = _run(name)
    main = _main_of(out)
    assert main.shape == (1, *SPATIAL, 3)
    assert np.isfinite(np.asarray(main)).all()
    # 4-head output: main + 3 deep heads (unet_family.py:207-215)
    assert isinstance(out, tuple) and len(out[1]) == 3
    for d in out[1]:
        assert d.shape == (1, *SPATIAL, 3)


def test_basic_unet():
    out = _run("basic_unet")
    assert _main_of(out).shape == (1, *SPATIAL, 3)


def test_segresnet():
    out = _run("segresnet")
    assert _main_of(out).shape == (1, *SPATIAL, 3)


def test_segresnetvae():
    out = _run("segresnetvae", patch_size=SPATIAL)
    seg, vae_loss = out
    assert seg.shape == (1, *SPATIAL, 3)
    assert np.isfinite(float(vae_loss))


def test_highresnet():
    out = _run("highresnet")
    assert _main_of(out).shape == (1, *SPATIAL, 3)


def test_vnet():
    out = _run("vnet")
    assert _main_of(out).shape == (1, *SPATIAL, 3)


def test_dynunet():
    cfg = TrainConfig(model="nnunet", norm="instance")
    model = get_model(cfg)
    x = jnp.ones((1, 32, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    main, deeps = model.apply(variables, x)
    assert main.shape == (1, 32, 32, 32, 3)
    assert len(deeps) == 3
    for d in deeps:
        assert d.shape == (1, 32, 32, 32, 3)


def test_unetr():
    cfg = TrainConfig(model="unet_tr", patch_size=[32, 32, 32], norm="instance")
    model = get_model(cfg)
    x = jnp.ones((1, 32, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert _main_of(out).shape == (1, 32, 32, 32, 3)
