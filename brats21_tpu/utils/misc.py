"""Small helpers (reference utils/misc.py:13-52) — pytree-flavoured here."""

from __future__ import annotations

from typing import Any, Callable, List

import numpy as np


def apply_f(seq: Any, f: Callable) -> Any:
    """Apply ``f`` to every leaf of an arbitrarily nested list/tuple
    (misc.py:13-24)."""
    if isinstance(seq, (list, tuple)):
        return [apply_f(t, f) for t in seq]
    return f(seq)


def flatten(seq: Any) -> List:
    """Flatten an irregular nested list (misc.py:27-39)."""
    result: List = []
    if isinstance(seq, (list, tuple)):
        for x in seq:
            result.extend(flatten(x))
    else:
        result.append(seq)
    return result


def to_array(x: Any) -> np.ndarray:
    """Device array / numpy → host numpy (misc.py:42-52 analog)."""
    return np.asarray(x)
