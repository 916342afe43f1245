"""Test-time augmentation, fully on-device.

The reference loops 16 aug→forward→deaug→``.cpu()`` round-trips per model per
case (tta/base.py:115-133, engine.py:424-440). Here the 16-combo set —
``OnAxes(["zxy","xyz"]) × HorizontalFlip × Rotate90([0,90,180,270])``
(definer.py:653-657) — is folded on-device: a ``lax.scan`` over the 8
flip×rot variants per axes-orientation, with ``lax.switch`` dispatching the
static aug/deaug index maps, accumulating sigmoid-probability and loss sums
in the carry. Memory stays O(1 volume); no host transfers.

Layout: channels-last [B, s0, s1, s2, C]. Torch spatial dims (2,3,4) map to
(1,2,3): HorizontalFlip = flip axis 2, Rotate90 = rot in axes (1,2), OnAxes
'xyz' = spatial (s0,s1,s2)→(s1,s2,s0).

Shape rule: flips/rot90 mix axes 1 and 2, so TTA requires s0 == s1 (BraTS
full volumes are 240×240×Z; sliding-window patches are cubes). Pad first.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def main_head(out: Any) -> Array:
    """Main-head logits from a model output: plain logits, (logits, deeps)
    tuples, or [refined, out] refinement pairs (inferers.py:135-138 keeps
    head[0]; refinement uses the refined head, engine.py:490-491)."""
    if isinstance(out, tuple) and len(out) == 2 \
            and isinstance(out[1], (list, tuple)):
        out = out[0]
    if isinstance(out, (list, tuple)):
        out = out[0]
    return out


AXES: Tuple[str, ...] = ("zxy", "xyz")       # definer.py:653; 'zxy' = identity
ANGLES: Tuple[int, ...] = (0, 90, 180, 270)
FLIPS: Tuple[bool, ...] = (False, True)

#: Cartesian product in the reference order (tta/base.py:115):
#: for axe in AXES: for flip in FLIPS: for angle in ANGLES
COMBOS: List[Tuple[str, bool, int]] = [
    (a, f, r) for a in AXES for f in FLIPS for r in ANGLES]
NUM_COMBOS = len(COMBOS)  # 16


def aug_axes(x: Array, axe: str) -> Array:
    """OnAxes.apply_aug_image (tta/transforms.py:33-39), channels-last."""
    if axe == "zxy":
        return x
    if axe == "xyz":
        return jnp.transpose(x, (0, 2, 3, 1, 4))
    if axe == "yzx":
        return jnp.transpose(x, (0, 3, 1, 2, 4))
    raise ValueError(axe)


def deaug_axes(y: Array, axe: str) -> Array:
    """OnAxes.apply_deaug_mask (tta/transforms.py:41-47)."""
    if axe == "zxy":
        return y
    if axe == "xyz":
        return jnp.transpose(y, (0, 3, 1, 2, 4))
    if axe == "yzx":
        return jnp.transpose(y, (0, 2, 3, 1, 4))
    raise ValueError(axe)


def aug_flip_rot(x: Array, flip: bool, angle: int) -> Array:
    """HorizontalFlip then Rotate90 (tta/transforms.py:63-66, 165-167)."""
    if flip:
        x = jnp.flip(x, axis=2)
    k = (angle // 90) % 4
    if k:
        x = jnp.rot90(x, k, axes=(1, 2))
    return x


def deaug_flip_rot(y: Array, flip: bool, angle: int) -> Array:
    """Inverse, reversed order (Compose reverses the de-aug chain,
    tta/base.py:119-133)."""
    k = (-(angle // 90)) % 4
    if k:
        y = jnp.rot90(y, k, axes=(1, 2))
    if flip:
        y = jnp.flip(y, axis=2)
    return y


def _spatial_after(axe: str, flip: bool, angle: int,
                   spatial: Tuple[int, int, int]) -> Tuple[int, int, int]:
    """Static spatial shape of an augmented volume."""
    s0, s1, s2 = spatial
    if axe == "xyz":
        s0, s1, s2 = s1, s2, s0
    elif axe == "yzx":
        s0, s1, s2 = s2, s0, s1
    if (angle // 90) % 2:
        s0, s1 = s1, s0
    return (s0, s1, s2)


def tta_forward(apply_fn: Callable[[Array], Any], x: Array,
                reduce_member: Callable[[Any, Any], Any], init_carry: Any,
                axes: Sequence[str] = AXES) -> Any:
    """Fold ``reduce_member(carry, deaug_outputs)`` over all TTA variants.

    ``apply_fn(x_aug)`` may return logits or (logits, deeps); de-augmentation
    is mapped over every leaf (engine.py:438 applies deaug per head).

    Combos are grouped by the static shape of their augmented input (rot90
    parity × orientation), and each group runs as one ``lax.scan`` over a
    ``lax.switch`` of its aug/deaug chains, so the model traces once per
    distinct shape and memory stays one volume regardless of combo count.
    Requires x.shape[1] == x.shape[2] (BraTS 240×240×Z after padding).
    """
    if x.shape[1] != x.shape[2]:
        raise ValueError(
            f"TTA requires square first two spatial dims, got {x.shape}; "
            "pad with pad_to_square_tta first")
    spatial = x.shape[1:4]
    groups: dict = {}
    for axe in axes:
        for f in FLIPS:
            for r in ANGLES:
                shape = _spatial_after(axe, f, r, spatial)
                groups.setdefault(shape, []).append((axe, f, r))

    carry = init_carry
    for combos in groups.values():
        aug_branches = [
            (lambda v, a=a, f=f, r=r: aug_flip_rot(aug_axes(v, a), f, r))
            for a, f, r in combos]
        deaug_branches = [
            (lambda t, a=a, f=f, r=r: jax.tree_util.tree_map(
                lambda l: deaug_axes(deaug_flip_rot(l, f, r), a), t))
            for a, f, r in combos]

        def body(c, i):
            xi = jax.lax.switch(i, aug_branches, x)
            out = apply_fn(xi)
            out = jax.lax.switch(i, deaug_branches, out)
            return reduce_member(c, out), None

        carry, _ = jax.lax.scan(body, carry, jnp.arange(len(combos)))
    return carry


def tta_mean_probs(apply_fn: Callable[[Array], Any], x: Array,
                   criterion: Optional[Callable] = None,
                   target: Any = None,
                   axes: Sequence[str] = AXES,
                   num_classes: int = 3) -> Tuple[Array, Array]:
    """(mean sigmoid-probs of the main head, mean deep-supervision loss)
    over the 16 combos — the engine.py:229-249 fusion, without the per-combo
    D2H hop. Returns (probs, loss); loss is 0 when no target."""
    probs0 = jnp.zeros(x.shape[:-1] + (num_classes,), jnp.float32)

    def reduce(carry, out):
        probs_sum, loss_sum = carry
        main = main_head(out)
        probs_sum = probs_sum + jax.nn.sigmoid(main.astype(jnp.float32))
        if criterion is not None and target is not None:
            from ..learning.losses import deep_supervision_loss
            loss_sum = loss_sum + deep_supervision_loss(criterion, out, target)
        return probs_sum, loss_sum

    n = len(axes) * len(FLIPS) * len(ANGLES)
    probs_sum, loss_sum = tta_forward(apply_fn, x, reduce,
                                      (probs0, jnp.zeros([], jnp.float32)),
                                      axes)
    return probs_sum / n, loss_sum / n


def pad_to_square_tta(x: Array) -> Tuple[Array, Tuple[int, int]]:
    """Zero-pad spatial axes 1,2 to the common square size required by TTA;
    returns (padded, (pad0, pad1)) for later cropping."""
    s0, s1 = x.shape[1], x.shape[2]
    side = max(s0, s1)
    pads = [(0, 0), (0, side - s0), (0, side - s1)] + \
           [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pads), (side - s0, side - s1)


def crop_from_square_tta(y: Array, pads: Tuple[int, int]) -> Array:
    p0, p1 = pads
    return y[:, : y.shape[1] - p0, : y.shape[2] - p1]
