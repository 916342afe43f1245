"""Composable TTA API — parity with the reference ``tta`` package
(tta/base.py adapted from qubvel/ttach): build arbitrary Cartesian products
of dual transforms and iterate (aug, deaug) pairs.

The high-performance configured 16-combo path lives in ops/tta.py (scan +
switch, on-device); this module covers the *general* surface — custom combo
sets, VerticalFlip, noise — yielding Transformer objects whose callables are
jit-friendly pure functions.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .tta import aug_axes, deaug_axes

Array = jax.Array


class DualTransform:
    """A parameterized invertible transform (tta/base.py:14-39)."""

    identity_param: Any = None

    def __init__(self, pname: str, params: Sequence[Any]):
        self.pname = pname
        self.params = list(params)

    def apply_aug_image(self, image: Array, param: Any) -> Array:
        raise NotImplementedError

    def apply_deaug_mask(self, mask: Array, param: Any) -> Array:
        raise NotImplementedError


class OnAxes(DualTransform):
    """Axis permutations xyz/yzx/zxy (tta/transforms.py:16-50)."""

    identity_param = "zxy"

    def __init__(self, axes: Sequence[str]):
        assert all(a in ("xyz", "yzx", "zxy") for a in axes), \
            "axes need to be 'xyz', 'yzx', 'zxy'"
        super().__init__("axe", axes)

    def apply_aug_image(self, image, param):
        return aug_axes(image, param)

    def apply_deaug_mask(self, mask, param):
        return deaug_axes(mask, param)


class HorizontalFlip(DualTransform):
    """Flip spatial axis 1 of torch dim-3 ↔ our axis 2 (tta/transforms.py:53-74)."""

    identity_param = False

    def __init__(self):
        super().__init__("apply", [False, True])

    def apply_aug_image(self, image, param):
        return jnp.flip(image, axis=2) if param else image

    apply_deaug_mask = apply_aug_image


class VerticalFlip(DualTransform):
    """Flip torch dim-2 ↔ our axis 1 (tta/transforms.py:77-98)."""

    identity_param = False

    def __init__(self):
        super().__init__("apply", [False, True])

    def apply_aug_image(self, image, param):
        return jnp.flip(image, axis=1) if param else image

    apply_deaug_mask = apply_aug_image


class GaussianNoise(DualTransform):
    """NOTE: the reference's GaussianNoise body is a duplicated VerticalFlip
    (tta/transforms.py:125-146) — behaviour preserved for parity."""

    identity_param = False

    def __init__(self):
        super().__init__("apply", [False, True])

    def apply_aug_image(self, image, param):
        return jnp.flip(image, axis=1) if param else image

    apply_deaug_mask = apply_aug_image


class RandomGaussianNoise(DualTransform):
    """Image-only noise, identity de-aug (tta/transforms.py:101-122);
    deterministic under a caller-provided PRNG key."""

    identity_param = True

    def __init__(self, mean: float = 0.0, std: float = 0.1, seed: int = 0):
        super().__init__("apply", [True])
        self.mean = mean
        self.std = std
        self.key = jax.random.PRNGKey(seed)

    def apply_aug_image(self, image, param):
        k1, k2 = jax.random.split(self.key)
        s = jax.random.uniform(k1, (), minval=0.0, maxval=self.std)
        return image + self.mean + s * jax.random.normal(
            k2, image.shape, image.dtype)

    def apply_deaug_mask(self, mask, param):
        return mask


class Rotate90(DualTransform):
    """Rotations in our axes (1, 2) (tta/transforms.py:149-173)."""

    identity_param = 0

    def __init__(self, angles: Sequence[int]):
        angles = list(angles)
        if self.identity_param not in angles:
            angles = [self.identity_param] + angles
        super().__init__("angle", angles)

    def apply_aug_image(self, image, param):
        k = (param // 90) % 4
        return jnp.rot90(image, k, axes=(1, 2)) if k else image

    def apply_deaug_mask(self, mask, param):
        k = (-(param // 90)) % 4
        return jnp.rot90(mask, k, axes=(1, 2)) if k else mask


class Transformer:
    """One (aug chain, reversed de-aug chain) pair (tta/base.py:119-133)."""

    def __init__(self, chain: List[Tuple[DualTransform, Any]]):
        self.chain = chain

    def augment_image(self, image: Array) -> Array:
        for t, p in self.chain:
            image = t.apply_aug_image(image, p)
        return image

    def deaugment_mask(self, mask: Array) -> Array:
        for t, p in reversed(self.chain):
            mask = t.apply_deaug_mask(mask, p)
        return mask


class Compose:
    """Cartesian product of transform params (tta/base.py:103-133)."""

    def __init__(self, transforms: Sequence[DualTransform]):
        self.transforms = list(transforms)

    def __len__(self) -> int:
        out = 1
        for t in self.transforms:
            out *= len(t.params)
        return out

    def __iter__(self) -> Iterator[Transformer]:
        for combo in itertools.product(*(t.params for t in self.transforms)):
            yield Transformer(list(zip(self.transforms, combo)))


def default_compose() -> Compose:
    """The configured reference pipeline (definer.py:647-658)."""
    return Compose([OnAxes(axes=["zxy", "xyz"]), HorizontalFlip(),
                    Rotate90(angles=[0, 90, 180, 270])])
