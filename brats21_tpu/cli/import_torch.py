"""Convert a reference-trained torch checkpoint into a servable run dir.

One command bridges the reference workflow (``best_model.pth``,
src/main_inference.py:62-69) into this framework:

    python -m brats21_tpu.cli.import_torch \
        --pth /runs/model6/best_model.pth \
        --model equiunet_assp_evo --width 48 \
        --out /runs/model6_tpu

writes ``/runs/model6_tpu/{config.yaml, best_model/}`` so the standard
inference driver serves the reference weights directly:

    python -m brats21_tpu.cli.main_inference \
        --config /runs/model6_tpu/config.yaml --on test --input ... --tta

``--swa`` reads the ``swa_model`` payload (AveragedModel ``module.``
prefix handled) instead of ``model``.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    from ..utils.import_torch import SUPPORTED_MODELS
    p = argparse.ArgumentParser(
        description="Import a reference torch .pth into a brats21_tpu run dir")
    p.add_argument("--pth", required=True,
                   help="reference best_model.pth / last_model.pth")
    p.add_argument("--out", required=True, help="output run directory")
    p.add_argument("--model", default="equiunet_assp_evo",
                   choices=list(SUPPORTED_MODELS))
    p.add_argument("--width", type=int, default=48)
    p.add_argument("--num_classes", type=int, default=3)
    p.add_argument("--norm", type=str, default="group",
                   help="equiunet-family norm layer (definer.py:37-66)")
    p.add_argument("--act", type=str, default="relu")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--swa", action="store_true", default=False,
                   help="the .pth holds an AveragedModel ('swa_model' key)")
    p.add_argument("-v", "--verbosity", action="count", default=0)
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    from .. import set_main_logger
    logger = set_main_logger(None, verbosity=max(args.verbosity, 1))

    import numpy as np

    from ..config import TrainConfig
    from ..learning.checkpoint import BEST_NAME
    from ..utils.import_torch import import_checkpoint

    cfg = TrainConfig(model=args.model, width=args.width,
                      num_classes=args.num_classes, norm=args.norm,
                      act=args.act, dropout=args.dropout)
    variables = import_checkpoint(args.pth, cfg, prefer_swa=args.swa)

    os.makedirs(args.out, exist_ok=True)
    cfg.save_path = args.out
    cfg.to_yaml(os.path.join(args.out, "config.yaml"))

    # best_model payload in the framework's checkpoint layout
    # (learning/checkpoint.py:_payload); inference loads params from best
    # (or swa_params from last for SWA runs — imported SWA weights are
    # plain params here, so the config written above has swa_start unset)
    import orbax.checkpoint as ocp
    payload = {
        "epoch": np.asarray(0),
        "step": np.asarray(0),
        "params": variables["params"],
        "best_value": np.asarray(float("nan"), np.float32),
    }
    if "batch_stats" in variables:   # unet_family attention-gate BN stats
        payload["batch_stats"] = variables["batch_stats"]
    path = os.path.join(os.path.abspath(args.out), BEST_NAME)
    ckptr = ocp.PyTreeCheckpointer()
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    ckptr.save(tmp, payload)
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    os.replace(tmp, path)
    logger.info("wrote %s (+config.yaml) — serve with: python -m "
                "brats21_tpu.cli.main_inference --config %s/config.yaml ...",
                path, args.out)
    return args.out


if __name__ == "__main__":
    main()
