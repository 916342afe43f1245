"""Model zoo factory, keyed by the reference CLI names (definer.py:37-174)."""

from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from .assp_evo import EquiUnetASSPEvo, EvoNorm3D
from .equiunet import AttEquiUnet, CBAM, EquiUnet, RefUnet, Unet

__all__ = [
    "get_model", "EquiUnet", "AttEquiUnet", "Unet", "EquiUnetASSPEvo",
    "EvoNorm3D", "CBAM", "RefUnet",
]

IN_CHANNELS = 4  # t1 / t1ce / t2 / flair (definer.py:46)


def get_model(cfg: Any) -> nn.Module:
    """Build a flax model from a config carrying the reference argparse
    surface (model/norm/act/width/dropout/num_classes; definer.py:37-174).

    ``cfg`` may be a TrainConfig, argparse.Namespace, or dict.
    """
    if isinstance(cfg, dict):
        get = cfg.get
    else:
        get = lambda k, d=None: getattr(cfg, k, d)

    name = get("model")
    remat_mode = get("remat_mode", "block") or "block"
    width = get("width", 48)
    num_classes = get("num_classes", 3)
    dropout = get("dropout", 0.0)
    norm = get("norm", "group")
    act = get("act", "relu")
    features4 = [width * 2 ** i for i in range(4)]

    common: Dict[str, Any] = dict(
        features=features4, num_classes=num_classes, act=act, norm=norm,
        deep_supervision=True, dropout=dropout)

    if name == "equiunet":
        return EquiUnet(**common, remat=remat_mode != "none")
    if name == "equiunet_ref":
        return EquiUnet(**common, refinement=True, remat=remat_mode != "none")
    if name == "att_equiunet":
        return AttEquiUnet(**common)
    if name in ("equiunet_assp_evo", "equiunet_assp_evocor"):
        return EquiUnetASSPEvo(**common, remat=remat_mode)
    if name == "equiunet_assp_evo_ref":
        return EquiUnetASSPEvo(**common, refinement=True, remat=remat_mode)

    # NOTE: the reference's dispatch for this family has a dead branch
    # (definer.py:158 tests "att_equiunet" instead of "att_unet", so
    # --model att_unet crashes there); fixed here.
    if name in ("modified_unet", "att_unet", "r2unet", "r2attunet"):
        from .unet_family import AttUnet, R2AttUnet, R2Unet, UnetFamily
        fam = {"modified_unet": UnetFamily, "att_unet": AttUnet,
               "r2unet": R2Unet, "r2attunet": R2AttUnet}[name]
        return fam(features=features4, num_classes=num_classes, act=act,
                   norm=norm, deep_supervision=True)

    if name == "basic_unet":
        from .extra import BasicUNet
        features = [width * 2 ** i for i in range(5)] + [width]
        return BasicUNet(features=features, num_classes=num_classes, act=act,
                         norm=norm, dropout=dropout)
    if name == "segresnet":
        from .extra import SegResNet
        return SegResNet(init_filters=8, num_classes=num_classes,
                         dropout=dropout, norm=norm)
    if name == "segresnetvae":
        from .extra import SegResNetVAE
        return SegResNetVAE(init_filters=8, num_classes=num_classes,
                            dropout=dropout, input_image_size=get("patch_size"))
    if name == "highresnet":
        from .extra import HighResNet
        return HighResNet(num_classes=num_classes, act=act, norm=norm,
                          dropout=dropout)
    if name == "vnet":
        from .extra import VNet
        return VNet(num_classes=num_classes, act=act, dropout=dropout)
    if name == "nnunet":
        from .dynunet import DynUNet
        return DynUNet(num_classes=num_classes, norm=norm)
    if name == "unet_tr":
        from .unetr import UNETR
        return UNETR(num_classes=num_classes, img_size=tuple(get("patch_size")),
                     feature_size=16, hidden_size=768, mlp_dim=3072,
                     num_heads=12, norm=norm)

    raise NameError("Not Supported Model")
