"""Import reference-trained torch checkpoints into flax param trees.

The reference workflow serves ``best_model.pth`` / ``last_model.pth``
(src/main_inference.py:62-69): ``torch.load(...)["model"]`` — or
``["swa_model"]`` for SWA runs, where the net is wrapped in
``torch.optim.swa_utils.AveragedModel`` (keys prefixed ``module.`` plus an
``n_averaged`` buffer). This module converts those state_dicts into this
framework's flax parameter trees so reference-trained weights can be served
(and fine-tuned) directly — the bridge to demonstrating BASELINE.md's
equal-DSC claim on real weights.

Layout conversions (the same mapping golden-tested one-way in
tests/test_full_model_parity.py):

  * Conv3d weight  [out, in, k, k, k] → flax kernel [k, k, k, in, out]
  * Linear weight  [out, in]          → flax kernel [in, out]
  * EvoNorm gamma/beta/v (1, C, 1, 1, 1) (equiunet2021.py:75-78) → (c,)
  * GroupNorm weight/bias (c,)        → scale/bias (c,)

Supported families: ``equiunet`` / ``unet`` / ``equiunet_assp_evo`` (the
published Models 1/6 lineage). The translation is table-free: each flax
param path is rewritten to its reference state_dict key by the per-family
rules below, so any width / num_classes / deep-supervision configuration
works, and unconsumed or missing keys are hard errors.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

logger = logging.getLogger("brats21_tpu.import_torch")

__all__ = ["load_torch_state_dict", "state_dict_to_flax",
           "import_checkpoint", "SUPPORTED_MODELS"]

SUPPORTED_MODELS = ("equiunet", "equiunet_ref", "att_equiunet",
                    "equiunet_assp_evo")


# ---------------------------------------------------------------------------
# state_dict loading / unwrapping
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str, prefer_swa: bool = False
                          ) -> Dict[str, np.ndarray]:
    """Load a reference ``*.pth`` and return a flat name→numpy dict.

    Handles the reference payloads (engine.py save: ``{"model": ...}`` /
    ``{"swa_model": ...}``), AveragedModel's ``module.`` prefix and
    ``n_averaged`` buffer, and a raw state_dict."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob
    if isinstance(blob, dict) and not _looks_like_state_dict(blob):
        for key in (("swa_model", "model") if prefer_swa
                    else ("model", "swa_model", "state_dict")):
            if key in blob:
                sd = blob[key]
                break
        else:
            raise KeyError(
                f"{path}: no model/swa_model/state_dict entry; "
                f"keys={sorted(blob)[:10]}")
    if hasattr(sd, "state_dict"):      # a whole nn.Module was pickled
        sd = sd.state_dict()
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "n_averaged":          # AveragedModel bookkeeping
            continue
        if k.startswith("module."):    # AveragedModel wrapper prefix
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                            else v)
    return out


def _looks_like_state_dict(d: Dict[str, Any]) -> bool:
    return bool(d) and all(
        hasattr(v, "shape") or hasattr(v, "detach") for v in d.values())


# ---------------------------------------------------------------------------
# per-family flax-path → torch-key translation
# ---------------------------------------------------------------------------

def _torch_key_equiunet(path: Sequence[str]) -> Tuple[str, str]:
    """(torch_key, kind) for the 2020 family (equiunet2020.py:312-500).

    flax tree: encoderN/ConvBnRelu{1,2}/{conv/Conv_0/{kernel,bias}, bn/
    {scale,bias}}; bottom/bottom_2/decoderN alike; outconv/Conv_0;
    deep_*/conv/Conv_0 (the torch heads are Sequential(conv1x1, Upsample)
    → key suffix ``.0``)."""
    parts = list(path)
    leaf = parts[-1]
    if parts[0].startswith("deep"):
        # DeepHead: deep_bottom/conv/Conv_0/kernel → deep_bottom.0.weight
        base = f"{parts[0]}.0"
        return f"{base}.{_wb(leaf)}", ("conv_w" if leaf == "kernel"
                                       else "vec")
    if parts[-2] == "Conv_0":          # a Conv3d leaf
        mod = ".".join(parts[:-2])     # e.g. encoder1.ConvBnRelu1.conv
        return f"{mod}.{_wb(leaf)}", ("conv_w" if leaf == "kernel"
                                      else "vec")
    if parts[-2] == "bn":              # GroupNorm scale/bias
        mod = ".".join(parts[:-2])
        return f"{mod}.bn.{'weight' if leaf == 'scale' else 'bias'}", "vec"
    raise KeyError(f"equiunet: unmapped flax path {'/'.join(parts)}")


def _torch_key_assp_evo(path: Sequence[str]) -> Tuple[str, str]:
    """(torch_key, kind) for EquiUnetASSPEvo (equiunet2021.py:225-333).

    torch modules: encoderN/decoderN = ConvEvoBlockCorrected with ONE
    nn.Sequential ``conv_conv_se`` = [conv, evo, dropout, conv, evo,
    dropout, ResidualSELayer] (:197-206) → indices 0,1,3,4,6; the MONAI
    ResidualSELayer's mlp is ``fc`` = Sequential(Linear, relu, Linear,
    sigmoid) → fc.0 / fc.2. bridges/upconvs = ConvEvo{conv,evo} (:212-222);
    aspp = SimpleASPPEVO{convs.i, conv_k1.{conv,evo}} (:167-181); deep
    heads = Sequential(conv1x1, Upsample) → ``.0`` (:274-282)."""
    parts = list(path)
    leaf = parts[-1]
    block = parts[0]

    def conv_kind():
        return "conv_w" if leaf == "kernel" else "vec"

    if block.startswith("deep"):
        return f"{block}.0.{_wb(leaf)}", conv_kind()
    if block == "out_conv":
        return f"out_conv.{_wb(leaf)}", conv_kind()
    if block == "aspp":
        sub = parts[1]
        if sub.startswith("conv_") and sub != "conv_k1":
            idx = sub.split("_")[1]
            return f"aspp.convs.{idx}.{_wb(leaf)}", conv_kind()
        if sub == "conv_k1":
            if parts[2] == "conv":
                return f"aspp.conv_k1.conv.{_wb(leaf)}", conv_kind()
            return f"aspp.conv_k1.evo.{leaf}", "evo"
        raise KeyError(f"assp_evo: unmapped aspp path {'/'.join(parts)}")
    if block.startswith(("bridge", "upconv")):
        if parts[1] == "conv":
            return f"{block}.conv.{_wb(leaf)}", conv_kind()
        return f"{block}.evo.{leaf}", "evo"
    if block.startswith(("encoder", "decoder")):
        sub = parts[1]
        seq = {"conv1": "0", "evo1": "1", "conv2": "3", "evo2": "4"}
        if sub in ("conv1", "conv2"):
            return (f"{block}.conv_conv_se.{seq[sub]}.{_wb(leaf)}",
                    conv_kind())
        if sub in ("evo1", "evo2"):
            return f"{block}.conv_conv_se.{seq[sub]}.{leaf}", "evo"
        if sub == "se":
            fc = {"fc1": "0", "fc2": "2"}[parts[2]]
            return (f"{block}.conv_conv_se.6.fc.{fc}.{_wb(leaf)}",
                    "lin_w" if leaf == "kernel" else "vec")
    raise KeyError(f"assp_evo: unmapped flax path {'/'.join(parts)}")


def _torch_key_att_equiunet(path: Sequence[str]) -> Tuple[str, str]:
    """(torch_key, kind) for AttEquiUnet (equiunet2020.py:503-561).

    Beyond the shared UBlock/ConvBnRelu naming: CBAM's ChannelGate mlp is
    Sequential(Flatten, Linear, ReLU, Linear) → keys mlp.1/mlp.3
    (:177-182); SpatialGate wraps a BasicConv named 'spatial' with
    conv/bn children (:152-156, 210-215); torch bottom_2 is
    Sequential(ConvBnRelu, CBAM) → prefixes bottom_2.0 / bottom_2.1,
    where flax names them bottom_2 / bottom_2_cbam."""
    parts = list(path)
    leaf = parts[-1]
    if parts[0] == "bottom_2":
        parts = ["bottom_2", "0"] + parts[1:]
    elif parts[0] == "bottom_2_cbam":
        parts = ["bottom_2", "1"] + parts[1:]
    if "ChannelGate" in parts:
        i = parts.index("ChannelGate")
        idx = {"Dense_0": "1", "Dense_1": "3"}[parts[i + 1]]
        prefix = ".".join(parts[:i + 1])
        return (f"{prefix}.mlp.{idx}.{_wb(leaf)}",
                "lin_w" if leaf == "kernel" else "vec")
    if "SpatialGate" in parts:
        i = parts.index("SpatialGate")
        prefix = ".".join(parts[:i + 1])
        if parts[i + 1] == "spatial_conv":
            return (f"{prefix}.spatial.conv.{_wb(leaf)}",
                    "conv_w" if leaf == "kernel" else "vec")
        return (f"{prefix}.spatial.bn."
                f"{'weight' if leaf == 'scale' else 'bias'}", "vec")
    return _torch_key_equiunet(parts)


def _wb(leaf: str) -> str:
    return "weight" if leaf in ("kernel", "scale") else "bias"


_FAMILY_RULES = {
    "equiunet": _torch_key_equiunet,
    # refinement variant: flax 'refunet/{conv0,hx*,d*,conv_d0}' mirrors the
    # torch attribute names (equiunet2020.py:252-309,460-463), so the
    # generic join covers it
    "equiunet_ref": _torch_key_equiunet,
    "att_equiunet": _torch_key_att_equiunet,
    "equiunet_assp_evo": _torch_key_assp_evo,
}


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

def _convert(arr: np.ndarray, kind: str, want_shape) -> np.ndarray:
    if kind == "conv_w":
        out = np.ascontiguousarray(arr.transpose(2, 3, 4, 1, 0))
    elif kind == "lin_w":
        out = np.ascontiguousarray(arr.T)
    elif kind == "evo":
        out = arr.reshape(-1)          # (1,C,1,1,1) → (c,)
    else:
        out = arr
    if tuple(out.shape) != tuple(want_shape):
        raise ValueError(
            f"shape mismatch after conversion ({kind}): torch {arr.shape} "
            f"→ {out.shape}, flax wants {tuple(want_shape)}")
    return out.astype(np.float32)


def state_dict_to_flax(sd: Dict[str, np.ndarray], model_name: str,
                       flax_params: Any) -> Any:
    """Rewrite a reference state_dict into the given flax param tree's
    structure. ``flax_params`` supplies the target structure/shapes (from
    ``model.init``); every flax leaf must resolve, and every torch tensor
    must be consumed (num_batches_tracked-style buffers excepted)."""
    import jax
    if model_name not in _FAMILY_RULES:
        raise NotImplementedError(
            f"torch import for '{model_name}' not supported "
            f"(supported: {SUPPORTED_MODELS})")
    rule = _FAMILY_RULES[model_name]
    used = set()

    def fill(path, leaf):
        parts = [str(getattr(p, "key", p)) for p in path]
        tkey, kind = rule(parts)
        if tkey not in sd:
            raise KeyError(
                f"torch checkpoint is missing '{tkey}' "
                f"(for flax param {'/'.join(parts)})")
        used.add(tkey)
        return _convert(sd[tkey], kind, leaf.shape)

    out = jax.tree_util.tree_map_with_path(fill, flax_params)
    # ignorable buffers: BN bookkeeping, and EvoNorm's vestigial
    # running_var (registered unconditionally, equiunet2021.py:83, but
    # only read by the B0 variant — the published models are S0)
    leftovers = [k for k in sd
                 if k not in used
                 and not k.endswith(("num_batches_tracked", "running_var"))]
    if leftovers:
        raise ValueError(
            f"torch checkpoint has {len(leftovers)} unconsumed tensors "
            f"(architecture mismatch?): {sorted(leftovers)[:8]} ...")
    return out


def import_checkpoint(path: str, cfg: Any, prefer_swa: bool = False) -> Any:
    """One-call import: .pth → flax params for ``get_model(cfg)``.

    Returns the params tree; shapes are validated against a fresh
    ``model.init`` on a tiny volume."""
    import jax
    import jax.numpy as jnp

    from ..models import get_model

    model = get_model(cfg)
    name = cfg.model if not isinstance(cfg, dict) else cfg["model"]
    sample = jnp.zeros((1, 16, 16, 16, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    sd = load_torch_state_dict(path, prefer_swa=prefer_swa)
    params = state_dict_to_flax(sd, name, variables["params"])
    logger.info("imported %d torch tensors from %s into '%s'",
                len(sd), path, name)
    return params
