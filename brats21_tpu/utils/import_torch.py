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

Supported families: the equiunet lineage (``equiunet`` / ``equiunet_ref``
/ ``att_equiunet`` / ``equiunet_assp_evo`` — the published Models 1/6),
the whole in-repo unet_family (``modified_unet`` / ``r2unet`` /
``att_unet`` / ``r2attunet``, reference networks/unet_family.py), and the
MONAI-backed zoo (``basic_unet`` / ``segresnet`` / ``segresnetvae`` /
``highresnet`` / ``vnet`` / ``nnunet`` / ``unet_tr`` — reached via
monai.networks.nets, definer.py:49-127; their state_dict naming follows
MONAI 0.6.0's module structure, reconstructed per-family in the rules
below). The translation is table-free: each flax param path is rewritten
to its reference state_dict key by the per-family rules below, so any
width / num_classes / deep-supervision configuration works, and unconsumed
or missing keys are hard errors (so any naming drift vs a real checkpoint
surfaces loudly rather than silently).

MONAI-zoo caveats: (a) MONAI's plain-string ``norm="instance"`` builds
affine-less InstanceNorm3d — such checkpoints carry no norm tensors and
import as the identity affine; (b) SegResNetVAE's reconstruction decoder
shares the segmentation decoder's weights (MONAI loops up_samples/
up_layers), so those tensors fill both our decoder and VAE-branch slots —
the served segmentation path is exact, the VAE aux loss is approximate.

The attention gates' ``nn.BatchNorm3d`` (unet_family.py:107-121) carries
``running_mean``/``running_var`` state — those import into the flax
``batch_stats`` collection (pass ``flax_batch_stats``, or use
:func:`import_checkpoint`, which returns a full variables dict).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

logger = logging.getLogger("brats21_tpu.import_torch")

__all__ = ["load_torch_state_dict", "state_dict_to_flax",
           "import_checkpoint", "SUPPORTED_MODELS"]

SUPPORTED_MODELS = ("equiunet", "equiunet_ref", "att_equiunet",
                    "equiunet_assp_evo",
                    "modified_unet", "r2unet", "att_unet", "r2attunet",
                    "basic_unet", "segresnet", "segresnetvae", "nnunet",
                    "highresnet", "vnet", "unet_tr")


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
    if parts[-2] == "bn":              # norm scale/bias (+ BN stats)
        mod = ".".join(parts[:-2])
        return f"{mod}.bn.{_wb(leaf)}", "vec"
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
        return f"{prefix}.spatial.bn.{_wb(leaf)}", "vec"
    return _torch_key_equiunet(parts)


def _wb(leaf: str) -> str:
    return {"kernel": "weight", "scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}[leaf]


def _make_unet_family_rule(recurrent: bool, norm: str = "group"):
    """Rule factory for the unet_family models (unet_family.py:134-500).

    torch modules: ``ConvBlock.conv`` = Sequential[conv, norm?, act, conv,
    norm?, act] (:13-35 — conv2 at index 3 with a norm, 2 without);
    ``UpConv.up`` = Sequential[Upsample, conv, norm?, act] (:38-57);
    ``RRCNNblock`` = {Conv_1x1, RCNN: Sequential[RecurrentBlock×2]} where
    each RecurrentBlock's ``conv`` = Sequential[conv, norm?, act]
    (:60-101); ``AttentionBlock`` gates = Sequential[conv1x1, BatchNorm3d]
    (:104-123, BatchNorm regardless of the model norm). The recurrent
    models name their blocks RRCNNn / Up_RRCNNn instead of Convn /
    Up_convn (:233-254 vs :146-164); flax uses the Conv naming for all
    four (models/unet_family.py:_FamilyBase), so the rule renames."""
    has_norm = norm not in (None, "none")

    def rule(parts: Sequence[str]) -> Tuple[str, str]:
        leaf = parts[-1]
        block = parts[0]
        kind = "conv_w" if leaf == "kernel" else "vec"
        if block == "Conv_1x1" or block.startswith("outconv"):
            return f"{block}.{_wb(leaf)}", kind
        if block.startswith("Att"):
            gate = {"W_g": ("W_g", "0"), "bn_g": ("W_g", "1"),
                    "W_x": ("W_x", "0"), "bn_x": ("W_x", "1"),
                    "psi": ("psi", "0"), "bn_psi": ("psi", "1")}[parts[1]]
            return f"{block}.{gate[0]}.{gate[1]}.{_wb(leaf)}", kind
        if block.startswith("Up") and not block.startswith("Up_conv"):
            idx = {"conv": "1", "norm": "2"}[parts[1]]
            return f"{block}.up.{idx}.{_wb(leaf)}", kind
        # encoder (Convn) / decoder (Up_convn) blocks
        tblock = block
        if recurrent:
            if block.startswith("Up_conv"):
                tblock = "Up_RRCNN" + block[len("Up_conv"):]
            elif block.startswith("Conv"):
                tblock = "RRCNN" + block[len("Conv"):]
            if parts[1] == "conv_1x1":
                return f"{tblock}.Conv_1x1.{_wb(leaf)}", kind
            rec = {"rec1": "0", "rec2": "1"}[parts[1]]
            idx = {"conv": "0", "norm": "1"}[parts[2]]
            return f"{tblock}.RCNN.{rec}.conv.{idx}.{_wb(leaf)}", kind
        if has_norm:
            idx = {"conv1": "0", "norm1": "1",
                   "conv2": "3", "norm2": "4"}[parts[1]]
        else:
            idx = {"conv1": "0", "conv2": "2"}[parts[1]]
        return f"{tblock}.conv.{idx}.{_wb(leaf)}", kind

    return rule


# ---------------------------------------------------------------------------
# MONAI-backed zoo rules (reference reaches these via monai.networks.nets,
# definer.py:49-127, so served .pth files carry MONAI 0.6.0 state_dict keys;
# naming below reconstructs monai 0.6.0's module structure — a Convolution
# is Sequential("conv", "adn"), ADN norms are child "N", dynunet blocks use
# conv1/norm1/conv2/norm2, conv_only layers keep the "conv" child)
# ---------------------------------------------------------------------------

def _make_basic_unet_rule(norm: str = "instance"):
    """BasicUNet (monai basic_unet.py; definer.py:49-60): conv_0/down_N are
    TwoConv("conv_0","conv_1" Convolutions); upcat_N has "upsample.deconv" +
    "convs" TwoConv; final_conv is a bare nn.Conv3d.

    MONAI's plain-string norm="instance" builds nn.InstanceNorm3d with
    torch's default affine=False — such checkpoints carry NO adn.N tensors,
    so norm affine params import as identity ("opt_vec")."""
    affine_optional = norm == "instance"

    def two_conv(prefix: str, sub: str, leaf: str) -> Tuple[str, str]:
        i = sub.rsplit("_", 1)[1]
        if sub.startswith("conv"):
            return (f"{prefix}.conv_{i}.conv.{_wb(leaf)}",
                    "conv_w" if leaf == "kernel" else "vec")
        return (f"{prefix}.conv_{i}.adn.N.{_wb(leaf)}",
                "opt_vec" if affine_optional else "vec")

    def rule(parts: Sequence[str]) -> Tuple[str, str]:
        leaf = parts[-1]
        block = parts[0]
        if block == "conv_0":
            return two_conv("conv_0", parts[1], leaf)
        if block.startswith("down_"):
            return two_conv(f"{block}.convs", parts[1], leaf)
        if block.endswith("_upconv"):
            name = block[: -len("_upconv")]
            return (f"{name}.upsample.deconv.{_wb(leaf)}",
                    "deconv_w" if leaf == "kernel" else "vec")
        if block.endswith("_convs"):
            name = block[: -len("_convs")]
            return two_conv(f"{name}.convs", parts[1], leaf)
        if block == "final_conv":
            return (f"final_conv.{_wb(leaf)}",
                    "conv_w" if leaf == "kernel" else "vec")
        raise KeyError(f"basic_unet: unmapped flax path {'/'.join(parts)}")

    return rule


def _torch_key_segresnet(path: Sequence[str]) -> Tuple[str, str]:
    """SegResNet (monai segresnet.py; definer.py:85-99): convInit;
    down_layers.{i} = Sequential(pre_conv|Identity, ResBlock×n) so block j
    sits at index j+1; up_samples.{i} = Sequential(conv1x1, upsample);
    up_layers.{i}.{j} = ResBlock(norm1,conv1,norm2,conv2); conv_final =
    Sequential(norm, act, conv)."""
    import re

    parts = list(path)
    leaf = parts[-1]
    block = parts[0]
    kind = "conv_w" if leaf == "kernel" else "vec"
    if block == "conv_init":
        return f"convInit.conv.{_wb(leaf)}", kind
    if block == "norm_final":
        return f"conv_final.0.{_wb(leaf)}", "vec"
    if block == "conv_final":
        return f"conv_final.2.conv.{_wb(leaf)}", kind

    def res_block(prefix: str, sub: str) -> Tuple[str, str]:
        if sub.startswith("conv"):
            return f"{prefix}.{sub}.conv.{_wb(leaf)}", kind
        return f"{prefix}.{sub}.{_wb(leaf)}", "vec"

    m = re.fullmatch(r"down_(\d+)_block_(\d+)", block)
    if m:
        i, j = m.groups()
        return res_block(f"down_layers.{i}.{int(j) + 1}", parts[1])
    m = re.fullmatch(r"down_(\d+)", block)
    if m:
        return f"down_layers.{m.group(1)}.0.conv.{_wb(leaf)}", kind
    m = re.fullmatch(r"up_conv_(\d+)", block)
    if m:
        return f"up_samples.{m.group(1)}.0.conv.{_wb(leaf)}", kind
    m = re.fullmatch(r"up_(\d+)_block_(\d+)", block)
    if m:
        i, j = m.groups()
        return res_block(f"up_layers.{i}.{j}", parts[1])
    raise KeyError(f"segresnet: unmapped flax path {'/'.join(parts)}")


def _torch_key_segresnetvae(path: Sequence[str]) -> Tuple[str, str]:
    """SegResNetVAE = SegResNet + VAE branch (monai segresnet.py
    _prepare_vae_modules): vae_down = Sequential[norm, act, conv(bias),
    norm, act]; vae_fc1/vae_fc2/vae_fc3 Linears; vae_fc_up_sample =
    Sequential[conv1x1, upsample, norm, act]; the reconstruction decoder
    REUSES the segmentation decoder's up_samples/up_layers weights (shared
    modules), and vae_conv_final = Sequential[norm, act, conv]."""
    parts = list(path)
    leaf = parts[-1]
    block = parts[0]
    kind = "conv_w" if leaf == "kernel" else "vec"
    vae_map = {
        "vae_norm": ("vae_down.0", "vec"),
        "vae_down": ("vae_down.2.conv", kind),
        "vae_down_norm": ("vae_down.3", "vec"),
        "vae_up_conv": ("vae_fc_up_sample.0.conv", kind),
        "vae_up_norm": ("vae_fc_up_sample.2", "vec"),
        "vae_final_norm": ("vae_conv_final.0", "vec"),
        "vae_recon": ("vae_conv_final.2.conv", kind),
    }
    if block in vae_map:
        prefix, k = vae_map[block]
        return f"{prefix}.{_wb(leaf)}", k
    lin = {"vae_mu": "vae_fc1", "vae_sigma": "vae_fc2",
           "vae_fc_up": "vae_fc3"}
    if block in lin:
        return (f"{lin[block]}.{_wb(leaf)}",
                "lin_w" if leaf == "kernel" else "vec")
    # the VAE reconstruction decoder shares the segmentation decoder's
    # weights (monai loops self.up_samples/self.up_layers in _get_vae_loss)
    if block.startswith("vae_up_block_"):
        return _torch_key_segresnet(
            [f"up_{block.rsplit('_', 1)[1]}_block_0", *parts[1:]])
    if block.startswith("vae_up_"):
        return _torch_key_segresnet(
            [f"up_conv_{block.rsplit('_', 1)[1]}", *parts[1:]])
    return _torch_key_segresnet(parts)


def _make_dynunet_rule(levels: int = 6):
    """DynUNet via the reference's WrapperDynUNet (unet_family.py:503-523;
    monai dynunet.py): every key is under the wrapper's ``net.`` prefix.
    monai registers input_block / downsamples.{i} / bottleneck /
    upsamples.{j}.(transp_conv|conv_block) / output_block.conv /
    deep_supervision_heads.{k}.conv (UnetBasicBlock children conv1/norm1/
    conv2/norm2, conv_only Convolutions keep the "conv" child). The
    ``skip_layers`` chain re-registers the same shared modules — those
    duplicate keys are ignorable (see _IGNORE_PREFIXES)."""
    import re

    def basic_block(prefix: str, sub: str, inner: str, leaf: str
                    ) -> Tuple[str, str]:
        n = {"layer0": "1", "layer1": "2"}[sub]
        if inner == "conv":
            return (f"{prefix}.conv{n}.conv.{_wb(leaf)}",
                    "conv_w" if leaf == "kernel" else "vec")
        return f"{prefix}.norm{n}.{_wb(leaf)}", "vec"

    def rule(parts: Sequence[str]) -> Tuple[str, str]:
        leaf = parts[-1]
        block = parts[0]
        if block == "input_block":
            return basic_block("net.input_block", parts[1], parts[2], leaf)
        m = re.fullmatch(r"down_(\d+)", block)
        if m:
            i = int(m.group(1))
            prefix = ("net.bottleneck" if i == levels - 1
                      else f"net.downsamples.{i - 1}")
            return basic_block(prefix, parts[1], parts[2], leaf)
        m = re.fullmatch(r"up_(\d+)_transp", block)
        if m:
            j = levels - 2 - int(m.group(1))
            return (f"net.upsamples.{j}.transp_conv.conv.{_wb(leaf)}",
                    "deconv_w" if leaf == "kernel" else "vec")
        m = re.fullmatch(r"up_(\d+)_block", block)
        if m:
            j = levels - 2 - int(m.group(1))
            return basic_block(f"net.upsamples.{j}.conv_block",
                               parts[1], parts[2], leaf)
        if block == "out_main":
            return (f"net.output_block.conv.conv.{_wb(leaf)}",
                    "conv_w" if leaf == "kernel" else "vec")
        m = re.fullmatch(r"out_deep_(\d+)", block)
        if m:
            k = int(m.group(1)) - 1
            return (f"net.deep_supervision_heads.{k}.conv.conv.{_wb(leaf)}",
                    "conv_w" if leaf == "kernel" else "vec")
        raise KeyError(f"nnunet: unmapped flax path {'/'.join(parts)}")

    return rule


def _make_highresnet_rule(norm: str = "batch"):
    """HighResNet (monai highresnet.py; definer.py:111-119): one Sequential
    ``blocks`` = [ConvNormActi, HighResBlock×9, ConvNormActi(k1, dropout),
    ConvNormActi(k1, no norm/act)], each with a positional inner
    ``layers`` Sequential (ConvNormActi: conv 0 / norm 1; HighResBlock:
    norm 0 / act 1 / conv 2 / norm 3 / act 4 / conv 5)."""
    affine_optional = norm == "instance"
    norm_kind = "opt_vec" if affine_optional else "vec"

    def rule(parts: Sequence[str]) -> Tuple[str, str]:
        import re

        leaf = parts[-1]
        block = parts[0]
        kind = "conv_w" if leaf == "kernel" else "vec"
        flat = {"conv_init": ("blocks.0.layers.0", kind),
                "norm_init": ("blocks.0.layers.1", norm_kind),
                "conv_penult": ("blocks.10.layers.0", kind),
                "norm_penult": ("blocks.10.layers.1", norm_kind),
                "conv_final": ("blocks.11.layers.0", kind)}
        if block in flat:
            prefix, k = flat[block]
            return f"{prefix}.{_wb(leaf)}", k
        m = re.fullmatch(r"res_(\d+)_(\d+)", block)
        if m:
            g, b = int(m.group(1)), int(m.group(2))
            idx = 1 + 3 * g + b
            layer = {"norm_0": ("0", norm_kind), "conv_0": ("2", kind),
                     "norm_1": ("3", norm_kind),
                     "conv_1": ("5", kind)}[parts[1]]
            return f"blocks.{idx}.layers.{layer[0]}.{_wb(leaf)}", layer[1]
        raise KeyError(f"highresnet: unmapped flax path {'/'.join(parts)}")

    return rule


def _torch_key_vnet(path: Sequence[str]) -> Tuple[str, str]:
    """VNet (monai vnet.py; definer.py:120-127): in_tr/out_tr hold a
    ``conv_block`` Convolution (conv + adn.N BatchNorm); transitions hold
    ``down_conv``/``up_conv`` + ``bn1`` + an ``ops`` Sequential of LUConvs
    (each a ``conv_block`` Convolution); out_tr adds a bare ``conv2``."""
    import re

    parts = list(path)
    leaf = parts[-1]
    block = parts[0]
    sub = parts[1]
    kind = "conv_w" if leaf == "kernel" else "vec"

    def ops_key(prefix: str, sub: str) -> Tuple[str, str]:
        m = re.fullmatch(r"ops_(\d+)_(conv|norm)", sub)
        if not m:
            raise KeyError(f"vnet: unmapped flax path {'/'.join(parts)}")
        k, what = m.groups()
        if what == "conv":
            return f"{prefix}.ops.{k}.conv_block.conv.{_wb(leaf)}", kind
        return f"{prefix}.ops.{k}.conv_block.adn.N.{_wb(leaf)}", "vec"

    if block in ("in_tr", "out_tr"):
        if sub == "conv":
            return f"{block}.conv_block.conv.{_wb(leaf)}", kind
        if sub == "norm":
            return f"{block}.conv_block.adn.N.{_wb(leaf)}", "vec"
        if sub == "conv2":
            return f"{block}.conv2.{_wb(leaf)}", kind
    if re.fullmatch(r"(down|up)_tr\d+", block):
        if sub == "down_conv":
            return f"{block}.down_conv.{_wb(leaf)}", kind
        if sub == "up_conv":
            return (f"{block}.up_conv.{_wb(leaf)}",
                    "deconv_w" if leaf == "kernel" else "vec")
        if sub == "bn1":
            return f"{block}.bn1.{_wb(leaf)}", "vec"
        if sub == "ops":
            return ops_key(block, parts[2])
    raise KeyError(f"vnet: unmapped flax path {'/'.join(parts)}")


def _torch_key_unetr(path: Sequence[str]) -> Tuple[str, str]:
    """UNETR (monai unetr.py; definer.py:68-83): vit.patch_embedding
    (perceptron Linear at index 1 + position_embeddings), vit.blocks.{i}
    (norm1 / attn.qkv (bias-free) / attn.out_proj / norm2 / mlp.linear1-2),
    vit.norm; UnetrBasicBlock nests its res block under ``layer``;
    UnetrPrUpBlock = transp_conv_init + bare ``blocks.{j}`` deconvs;
    UnetrUpBlock = transp_conv + conv_block; out = UnetOutBlock."""
    import re

    parts = list(path)
    leaf = parts[-1]
    block = parts[0]
    kind = "conv_w" if leaf == "kernel" else "vec"
    lin = "lin_w" if leaf == "kernel" else "vec"
    if block == "patch_embed":
        return f"vit.patch_embedding.patch_embeddings.1.{_wb(leaf)}", lin
    if block == "pos_embed":
        return "vit.patch_embedding.position_embeddings", "vec"
    if block == "vit_norm":
        return f"vit.norm.{_wb(leaf)}", "vec"
    m = re.fullmatch(r"block_(\d+)", block)
    if m:
        i = m.group(1)
        sub = parts[1]
        if sub in ("ln1", "ln2"):
            return (f"vit.blocks.{i}.norm{sub[-1]}.{_wb(leaf)}", "vec")
        if sub == "attn":
            tname = {"qkv": "qkv", "proj": "out_proj"}[parts[2]]
            return f"vit.blocks.{i}.attn.{tname}.{_wb(leaf)}", lin
        if sub in ("fc1", "fc2"):
            return f"vit.blocks.{i}.mlp.linear{sub[-1]}.{_wb(leaf)}", lin
    if block == "out":
        return f"out.conv.conv.{_wb(leaf)}", kind

    def res_block(prefix: str, sub: str) -> Tuple[str, str]:
        if sub.startswith("conv"):
            return f"{prefix}.{sub}.conv.{_wb(leaf)}", kind
        return f"{prefix}.{sub}.{_wb(leaf)}", "vec"

    if block == "encoder1":
        return res_block("encoder1.layer", parts[1])
    m = re.fullmatch(r"encoder(\d)_transp_(\d+)", block)
    if m:
        enc, j = m.group(1), int(m.group(2))
        prefix = (f"encoder{enc}.transp_conv_init" if j == 0
                  else f"encoder{enc}.blocks.{j - 1}")
        return (f"{prefix}.conv.{_wb(leaf)}",
                "deconv_w" if leaf == "kernel" else "vec")
    m = re.fullmatch(r"decoder(\d)_transp", block)
    if m:
        return (f"decoder{m.group(1)}.transp_conv.conv.{_wb(leaf)}",
                "deconv_w" if leaf == "kernel" else "vec")
    m = re.fullmatch(r"decoder(\d)_res", block)
    if m:
        return res_block(f"decoder{m.group(1)}.conv_block", parts[1])
    raise KeyError(f"unet_tr: unmapped flax path {'/'.join(parts)}")


_FAMILY_RULES = {
    "equiunet": _torch_key_equiunet,
    # refinement variant: flax 'refunet/{conv0,hx*,d*,conv_d0}' mirrors the
    # torch attribute names (equiunet2020.py:252-309,460-463), so the
    # generic join covers it
    "equiunet_ref": _torch_key_equiunet,
    "att_equiunet": _torch_key_att_equiunet,
    "equiunet_assp_evo": _torch_key_assp_evo,
    "segresnet": _torch_key_segresnet,
    "segresnetvae": _torch_key_segresnetvae,
}

_UNET_FAMILY = {"modified_unet": False, "att_unet": False,
                "r2unet": True, "r2attunet": True}

# torch keys under these prefixes duplicate tensors already consumed via
# their canonical paths (shared-module re-registration) — ignore leftovers
_IGNORE_PREFIXES = {
    # DynUNetSkipLayer chain re-registers input_block/downsamples/
    # bottleneck/upsamples/heads (monai dynunet.py)
    "nnunet": ("net.skip_layers.",),
}


def _rule_for(model_name: str, norm: str = "group"):
    if model_name in _FAMILY_RULES:
        return _FAMILY_RULES[model_name]
    if model_name in _UNET_FAMILY:
        return _make_unet_family_rule(_UNET_FAMILY[model_name], norm)
    if model_name == "basic_unet":
        return _make_basic_unet_rule(norm)
    if model_name == "nnunet":
        return _make_dynunet_rule()
    if model_name == "highresnet":
        return _make_highresnet_rule(norm)
    if model_name == "vnet":
        return _torch_key_vnet
    if model_name == "unet_tr":
        return _torch_key_unetr
    raise NotImplementedError(
        f"torch import for '{model_name}' not supported "
        f"(supported: {SUPPORTED_MODELS})")


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

def _convert(arr: np.ndarray, kind: str, want_shape) -> np.ndarray:
    if kind == "conv_w":
        out = np.ascontiguousarray(arr.transpose(2, 3, 4, 1, 0))
    elif kind == "deconv_w":
        # torch ConvTranspose3d (in,out,k,k,k) → flax ConvTranspose
        # (k,k,k,in,out) with spatial flip (lax.conv_transpose does not
        # flip kernels — the inverse of tests' _copy_deconv)
        out = np.ascontiguousarray(
            arr.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1])
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
                       flax_params: Any, flax_batch_stats: Any = None,
                       norm: str = "group") -> Any:
    """Rewrite a reference state_dict into the given flax param tree's
    structure. ``flax_params`` supplies the target structure/shapes (from
    ``model.init``); every flax leaf must resolve, and every torch tensor
    must be consumed (num_batches_tracked-style buffers excepted).

    When the model carries running statistics (the unet_family attention
    gates' BatchNorm3d), pass the ``batch_stats`` tree from ``model.init``
    as ``flax_batch_stats``; the return value is then the pair
    ``(params, batch_stats)``. ``norm`` is the model's norm-layer name —
    it shifts the reference's Sequential indices (unet_family.py:17-31)."""
    import jax
    rule = _rule_for(model_name, norm)
    used = set()

    def fill(path, leaf):
        # layers.BatchNorm nests flax's under "BatchNorm_0" — drop it so
        # every family rule sees the same structure as with other norms
        parts = [str(getattr(p, "key", p)) for p in path
                 if str(getattr(p, "key", p)) != "BatchNorm_0"]
        tkey, kind = rule(parts)
        if tkey not in sd:
            if kind == "opt_vec":
                # affine-less torch norm (e.g. MONAI's plain-string
                # "instance" → nn.InstanceNorm3d(affine=False)): our
                # always-affine twin imports the identity transform
                return (np.ones if parts[-1] == "scale" else np.zeros)(
                    leaf.shape, np.float32)
            raise KeyError(
                f"torch checkpoint is missing '{tkey}' "
                f"(for flax param {'/'.join(parts)})")
        used.add(tkey)
        return _convert(sd[tkey], kind, leaf.shape)

    out = jax.tree_util.tree_map_with_path(fill, flax_params)
    bs_out = (jax.tree_util.tree_map_with_path(fill, flax_batch_stats)
              if flax_batch_stats is not None else None)
    # ignorable buffers: BN bookkeeping, and EvoNorm's vestigial
    # running_var (registered unconditionally, equiunet2021.py:83, but
    # only read by the B0 variant — the published models are S0)
    skip_tails = ["num_batches_tracked"]
    if flax_batch_stats is None:
        skip_tails += ["running_var"]
    skip_prefixes = _IGNORE_PREFIXES.get(model_name, ())
    leftovers = [k for k in sd
                 if k not in used and not k.endswith(tuple(skip_tails))
                 and not k.startswith(skip_prefixes)]
    if leftovers:
        raise ValueError(
            f"torch checkpoint has {len(leftovers)} unconsumed tensors "
            f"(architecture mismatch?): {sorted(leftovers)[:8]} ...")
    return out if flax_batch_stats is None else (out, bs_out)


def import_checkpoint(path: str, cfg: Any, prefer_swa: bool = False) -> Any:
    """One-call import: .pth → flax variables for ``get_model(cfg)``.

    Returns a variables dict — ``{"params": ...}`` plus ``"batch_stats"``
    when the model carries running statistics (unet_family attention
    gates). Shapes are validated against a fresh ``model.init`` on a tiny
    volume."""
    import jax
    import jax.numpy as jnp

    from ..models import get_model

    model = get_model(cfg)
    get = cfg.get if isinstance(cfg, dict) else (
        lambda k, d=None: getattr(cfg, k, d))
    name = get("model")
    # init needs only shapes, but the sample must be deep enough for the
    # model's downsampling chain (nnunet: 6 stride-2 levels) and, for
    # unet_tr, exactly the configured image size (pos_embed token count)
    if name == "unet_tr":
        side = tuple(get("patch_size") or (128, 128, 128))
    elif name == "nnunet":
        side = (32, 32, 32)
    else:
        side = (16, 16, 16)
    sample = jnp.zeros((1, *side, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    sd = load_torch_state_dict(path, prefer_swa=prefer_swa)
    norm = get("norm", "group") or "group"
    if "batch_stats" in variables:
        params, bs = state_dict_to_flax(sd, name, variables["params"],
                                        variables["batch_stats"], norm=norm)
        result = {"params": params, "batch_stats": bs}
    else:
        result = {"params": state_dict_to_flax(sd, name,
                                               variables["params"],
                                               norm=norm)}
    logger.info("imported %d torch tensors from %s into '%s'",
                len(sd), path, name)
    return result
