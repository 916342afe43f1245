"""Argparse surfaces — train (reference src/arguments_train.py:16-223) and
inference (src/arguments_inference.py:18-156) — parsing into TrainConfig /
per-model ensemble configs with the same flag names and defaults."""

from __future__ import annotations

import argparse
import os
from copy import deepcopy
from typing import Dict, Tuple

import yaml

from ..config import (ACT_CHOICES, CRITERION_CHOICES, DECAY_CHOICES,
                      MODEL_CHOICES, NORM_CHOICES, OPTIMIZER_CHOICES,
                      TrainConfig)


def check_isdir(path: str) -> str:
    if path is not None and not os.path.isdir(path):
        raise argparse.ArgumentTypeError(f"{path} is not a directory")
    return path


def check_exist(path: str) -> str:
    if path is not None and not os.path.exists(path):
        raise argparse.ArgumentTypeError(f"{path} does not exist")
    return path


def build_train_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU Segmentation Model Training (brats21_tpu)")
    g = parser.add_argument_group("model", "Model configuration")
    g.add_argument("--model", default="equiunet", choices=MODEL_CHOICES)
    g.add_argument("--norm", type=str, default="instance", choices=NORM_CHOICES)
    g.add_argument("--act", type=str, default="relu", choices=ACT_CHOICES)
    g.add_argument("--width", type=int, default=48)
    g.add_argument("--dropout", type=float, default=0.0)
    g.add_argument("--num_classes", type=int, default=3)

    g = parser.add_argument_group("data", "Data loading & save")
    g.add_argument("--train_data_path", type=check_isdir, required=True)
    g.add_argument("--val_data_path", type=check_isdir, default=None)
    g.add_argument("--already_preprocess", action="store_true", default=False)
    parser.add_argument("--save_path", type=str, default="./runs")
    parser.add_argument("--resume", type=check_exist,
                        help="checkpoint dir to restart from")
    parser.add_argument("--no_full_name", action="store_true", default=False)

    g = parser.add_argument_group("training", "Training hyper parameters")
    g.add_argument("--batch_size", type=int, default=1)
    g.add_argument("--patch_size", type=int, nargs=3, default=[128, 128, 128])
    g.add_argument("--epochs", type=int, default=350)
    g.add_argument("--val_frequency", type=int, default=3)
    g.add_argument("--no_amp", action="store_true", default=False)
    g.add_argument("--remat_mode", type=str, default="norm",
                   choices=["block", "norm", "none"],
                   help="activation rematerialization (TPU memory/perf knob)")
    g.add_argument("--criterion", type=str, default="dice",
                   choices=CRITERION_CHOICES)
    g.add_argument("--gradient_accumulation_iter", type=int, default=None)
    g.add_argument("--adaptive_gradient_clipping", action="store_true",
                   default=False)
    g.add_argument("--gradient_clipping", action="store_true", default=False)
    g.add_argument("--max_grad_norm", type=float, default=1)
    g.add_argument("--remove_outliers", action="store_true", default=False)
    g.add_argument("--num_workers", type=int, default=4)
    g.add_argument("--wire", type=str, default="auto",
                   choices=["auto", "sparse", "dense"],
                   help="host<->device wire format for per-case eval: "
                        "sparse = brain-masked packed volumes + bit-packed "
                        "fused output + transfer/compute pipelining "
                        "(ops/wire.py); auto probes link bandwidth once")
    g.add_argument("--eval_bucket", type=int, default=8,
                   help="pad eval volumes to multiples of this (>=8, "
                        "multiple of 8): one XLA executable per bucket "
                        "shape instead of per case shape. Coarser buckets "
                        "trade far fewer compiles for extra padded voxels "
                        "AND slightly different predictions/metrics: the "
                        "zero pad enters instance/group-norm statistics, "
                        "exactly like the reference's own /8 pad does. "
                        "8 = reference parity")
    g.add_argument("--seed", type=int, default=123)
    g.add_argument("--fold", default=0, type=lambda x: None if x == "None" else int(x))
    g.add_argument("--device", type=str, default="0")

    g = parser.add_argument_group("optimizer & lr",
                                  "Optimizer & learning rate scheduler")
    g.add_argument("--learning_rate", type=float, default=0.0001)
    g.add_argument("--weight_decay", type=float, default=0.00001)
    g.add_argument("--optimizer", default="ranger", choices=OPTIMIZER_CHOICES)
    g.add_argument("--decay_type", default="flat_cosine", choices=DECAY_CHOICES)
    g.add_argument("--swa_start", type=int, default=None)
    g.add_argument("--swa_lr", type=float, default=0.00005)
    g.add_argument("--swa_anneal_epochs", type=int, default=10)

    g = parser.add_argument_group("Ranger options")
    g.add_argument("--use_gc", action="store_true", default=False)
    g.add_argument("--use_gcnorm", action="store_true", default=False)
    g.add_argument("--normloss", action="store_true", default=False)
    g.add_argument("--normloss_factor", type=float, default=1e-4)
    g.add_argument("--gc_conv_only", action="store_true", default=False)

    g = parser.add_argument_group("log", "Log and metrics")
    g.add_argument("--log_train_interval", type=int, default=10)
    g.add_argument("--log_train_metrics", action="store_true", default=False)
    g.add_argument("--log_val_interval", type=int, default=1)
    g.add_argument("--log_val_metrics", action="store_true", default=False)
    g.add_argument("--key_metric", nargs=1,
                   choices=["dice", "hausdorff_distance95"], default=["dice"])
    g.add_argument("--additional_metrics", nargs="+",
                   choices=["dice", "hausdorff_distance95", "sensitivity",
                            "specificity"],
                   default=["hausdorff_distance95"])
    g.add_argument("--save_on", type=str, default="loss",
                   choices=["key_metric", "loss"])
    g.add_argument("--no_tensorboard", action="store_true", default=False)
    g.add_argument("--evaluate_end_training", action="store_true", default=False)
    g.add_argument("--only_evaluate", action="store_true", default=False)
    g.add_argument("--debug_val", action="store_true", default=False)
    g.add_argument("--sliding_window_inference", action="store_true",
                   default=False)
    g.add_argument("--sliding_window_size", type=int, nargs=3,
                   default=[128, 128, 128])
    g.add_argument("-v", "--verbosity", action="count", default=0)
    return parser


def get_train_args(argv=None) -> TrainConfig:
    """arguments_train.py:182-223 incl. the resume config.yaml reload."""
    parser = build_train_parser()
    args = parser.parse_args(argv)

    if args.only_evaluate:
        assert args.resume, ("if only_evaluate: the config file .yaml "
                             "corresponding to resume args is needed")
    if args.gradient_accumulation_iter is not None:
        assert args.gradient_accumulation_iter > 0

    if args.resume:
        resume_path = deepcopy(args.resume)
        save_path = os.path.dirname(args.resume.rstrip("/"))
        train_data_path = deepcopy(args.train_data_path)
        val_data_path = deepcopy(args.val_data_path)
        with open(os.path.join(save_path, "config.yaml")) as f:
            loaded = yaml.safe_load(f)
        cfg = TrainConfig.from_dict(loaded)
        cfg.resume = resume_path
        cfg.save_path = save_path
        cfg.train_data_path = train_data_path
        cfg.val_data_path = val_data_path
        return cfg.validate()
    return TrainConfig.from_dict(vars(args)).validate()


def build_inference_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU Segmentation Model Inference (brats21_tpu)")
    g = parser.add_argument_group("model", "Model configuration")
    g.add_argument("--config", type=check_exist, required=True, nargs="+",
                   help="path(s) to trained config.yaml files (ensemble)")
    g.add_argument("--train_data_path", type=check_isdir)
    g.add_argument("--val_data_path", type=check_isdir, default=None)
    g.add_argument("--input", "--test_data_path", dest="test_data_path",
                   type=check_isdir, default=None)
    g.add_argument("--on", default="val", choices=["val", "train", "test"])
    g.add_argument("--device", type=str, default="0")
    g.add_argument("--output", "--save_path", dest="save_path", type=str,
                   default=None)
    g.add_argument("--create_patient_dir", action="store_true", default=False)
    g.add_argument("--docker_test", action="store_true", default=False)
    g.add_argument("--num_workers", type=int, default=0)
    g.add_argument("-v", "--verbosity", action="count", default=0)
    g.add_argument("--watch", action="store_true", default=False,
                   help="serve mode (on=test): after the initial pass, keep "
                        "polling test_data_path and segment new cases as "
                        "they appear (model stays compiled+warm)")
    g.add_argument("--watch_interval", type=float, default=5.0,
                   help="poll period in seconds for --watch")
    g.add_argument("--watch_stop_file", type=str, default=None,
                   help="exit the --watch loop when this file appears")
    g.add_argument("--watch_warmup", type=int, nargs=3, default=None,
                   metavar=("X", "Y", "Z"),
                   help="compile the serving executables at startup for a "
                        "case whose cropped foreground shape is X Y Z "
                        "(bucketized by --eval_bucket), so the FIRST real "
                        "case serves at steady-state latency instead of "
                        "paying the XLA compile (~minutes). Use the "
                        "expected cropped brain extent; any case whose "
                        "crop falls in the same --eval_bucket cell reuses "
                        "the executable")
    g.add_argument("--import_pth", type=str, nargs="+", default=None,
                   help="reference torch checkpoint(s) (.pth) to serve "
                        "instead of this framework's checkpoints; one per "
                        "--config, converted in-memory "
                        "(utils/import_torch.py). For a persistent "
                        "conversion use `python -m "
                        "brats21_tpu.cli.import_torch`")

    g = parser.add_argument_group("processing", "Processing configuration")
    g.add_argument("--sliding_window_inference", action="store_true",
                   default=False)
    g.add_argument("--sliding_window_size", type=int, nargs=3,
                   default=[128, 128, 128])
    g.add_argument("--tta", action="store_true", default=False)
    g.add_argument("--logit_threshold", type=float, default=0.5)
    g.add_argument("--perform_staple", action="store_true", default=False)
    g.add_argument("--staple_threshold", type=float, default=0.5)
    g.add_argument("--cleaning_areas", action="store_true", default=False)
    g.add_argument("--cleaning_areas_threshold", type=int, default=10)
    g.add_argument("--replace_value", action="store_true", default=False)
    g.add_argument("--replace_value_threshold", type=int, default=20)
    g.add_argument("--wire", type=str, default="auto",
                   choices=["auto", "sparse", "dense"],
                   help="host<->device wire format (see main_train --wire)")
    g.add_argument("--eval_bucket", type=int, default=8,
                   help="eval shape bucket (see main_train --eval_bucket)")
    return parser


def get_inference_args(argv=None) -> Tuple[Dict[str, argparse.Namespace], str]:
    """arguments_inference.py:74-156: merge each trained config.yaml with CLI
    overrides into {config_i: Namespace}; locate exactly one best_model
    checkpoint per config dir."""
    parser = build_inference_parser()
    args = parser.parse_args(argv)

    if args.on == "test":
        assert args.test_data_path is not None, \
            "if 'on' is test, a test_data_path is needed"
    if len(args.config) > 1 and args.save_path is None:
        raise ValueError("Several configs/models files has been selected and "
                         "you don't have specified a 'save_path'")
    if len(args.config) > 1:
        if args.on == "val" and args.val_data_path is None and args.train_data_path is None:
            raise ValueError("'on' is val. You need to specify a data path")
        if args.on == "train":
            raise ValueError("'on' is train. This mode is incompatible with "
                             "several configs/models files")

    if args.import_pth is not None and len(args.import_pth) != len(args.config):
        raise ValueError(
            f"--import_pth needs one .pth per --config "
            f"({len(args.import_pth)} vs {len(args.config)})")

    config_dict: Dict[str, argparse.Namespace] = {}
    for idx, config_file in enumerate(args.config):
        folder = os.path.dirname(os.path.abspath(config_file))
        if args.import_pth is None:
            checkpoints = [d for d in os.listdir(folder)
                           if "best_model" in d or "last_model" in d]
            assert checkpoints, f"No checkpoint found in {folder}"

        with open(config_file) as f:
            loaded = yaml.safe_load(f)
        keep = {k: deepcopy(loaded.get(k)) for k in
                ("train_data_path", "val_data_path", "save_path")}
        loaded.update(vars(args))
        for k, v in keep.items():
            if loaded[k] is None:
                loaded[k] = v
        loaded["no_tensorboard"] = True
        loaded["log_val_interval"] = 1
        loaded["config"] = config_file
        loaded["model_dir"] = folder
        # one .pth per config (vars(args) copied the whole list above)
        loaded["import_pth"] = (args.import_pth[idx]
                                if args.import_pth else None)

        if args.on == "val" and args.val_data_path is not None:
            loaded["fold"] = None
            loaded["train_data_path"] = None
        config_dict[f"config_{idx}"] = argparse.Namespace(**loaded)

    # processing-group experiment suffix (main_inference.py:86)
    from ..config import make_experience_name
    proc_keys = ("sliding_window_inference", "sliding_window_size", "tta",
                 "logit_threshold", "perform_staple", "staple_threshold",
                 "cleaning_areas", "cleaning_areas_threshold",
                 "replace_value", "replace_value_threshold")
    name, _ = make_experience_name(
        TrainConfig(), add_current_date_time=False, include_base=False,
        extra_groups={"processing": {k: getattr(args, k) for k in proc_keys}})
    return config_dict, name
