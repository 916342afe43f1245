"""CLI flag-surface parity with the reference.

The reference's published workflow is its two argparse surfaces
(src/arguments_train.py:16-179, src/arguments_inference.py:18-71) plus the
recipe command lines in its README (README.md:103-170, models 1-7).  A user
switching from the reference must be able to paste those exact flags.  These
tests pin that contract:

- every LIVE reference flag (commented-out ones excluded, e.g.
  ``--add_min_max`` at arguments_train.py:98) is accepted by our parsers,
  including the alias pairs ``--input/--test_data_path`` and
  ``--output/--save_path`` (arguments_inference.py:30,34);
- the published train recipes (README.md:103-121) and the model-6 ensemble
  inference recipe (README.md:160-163) parse with the same semantics.
"""

import yaml

from brats21_tpu.cli.arguments import (build_inference_parser,
                                       build_train_parser, get_train_args)

# Every live option string in the reference train parser
# (src/arguments_train.py:16-179), in source order.
REFERENCE_TRAIN_FLAGS = [
    "--model", "--norm", "--act", "--width", "--dropout", "--num_classes",
    "--train_data_path", "--val_data_path", "--already_preprocess",
    "--save_path", "--resume", "--no_full_name",
    "--batch_size", "--patch_size", "--epochs", "--val_frequency",
    "--no_amp", "--criterion", "--gradient_accumulation_iter",
    "--adaptive_gradient_clipping", "--gradient_clipping", "--max_grad_norm",
    "--remove_outliers", "--num_workers", "--seed", "--fold", "--device",
    "--learning_rate", "--weight_decay", "--optimizer", "--decay_type",
    "--swa_start", "--swa_lr", "--swa_anneal_epochs",
    "--use_gc", "--use_gcnorm", "--normloss", "--normloss_factor",
    "--gc_conv_only",
    "--log_train_interval", "--log_train_metrics", "--log_val_interval",
    "--log_val_metrics", "--key_metric", "--additional_metrics", "--save_on",
    "--no_tensorboard", "--evaluate_end_training", "--only_evaluate",
    "--debug_val", "--sliding_window_inference", "--sliding_window_size",
    "-v",
]

# Every live option string in the reference inference parser
# (src/arguments_inference.py:18-71), including both names of each alias.
REFERENCE_INFERENCE_FLAGS = [
    "--config", "--train_data_path", "--val_data_path",
    "--input", "--test_data_path", "--on", "--device",
    "--output", "--save_path", "--create_patient_dir", "--docker_test",
    "--num_workers", "-v",
    "--sliding_window_inference", "--sliding_window_size",
    "--tta", "--logit_threshold", "--perform_staple", "--staple_threshold",
    "--cleaning_areas", "--cleaning_areas_threshold",
    "--replace_value", "--replace_value_threshold",
]


def _option_strings(parser):
    out = set()
    for action in parser._actions:
        out.update(action.option_strings)
    return out


def test_train_flags_superset_of_reference():
    ours = _option_strings(build_train_parser())
    missing = [f for f in REFERENCE_TRAIN_FLAGS if f not in ours]
    assert not missing, f"reference train flags not accepted: {missing}"


def test_inference_flags_superset_of_reference():
    ours = _option_strings(build_inference_parser())
    missing = [f for f in REFERENCE_INFERENCE_FLAGS if f not in ours]
    assert not missing, f"reference inference flags not accepted: {missing}"


def test_reference_model2_train_recipe_parses(tmp_path):
    """The verbatim U-NetV2 recipe (reference README.md:109-111), with only
    the data/save paths substituted."""
    data = tmp_path / "BraTS2021_TrainingData"
    data.mkdir()
    argv = (f"--train_data_path {data} --save_path {tmp_path}/model2/fold0 "
            "--model equiunet_assp_evo --act leakyrelu --width 48 "
            "--criterion dice --num_workers 4 --optimizer ranger "
            "--decay_type cosine --learning_rate 0.0003 --val_frequency 2 "
            "--log_val_metrics --evaluate_end_training --remove_outliers "
            "--epochs 150 --no_full_name --fold 0 --device 0 -vv").split()
    cfg = get_train_args(argv)
    assert cfg.model == "equiunet_assp_evo"
    assert cfg.act == "leakyrelu"
    assert cfg.width == 48
    assert cfg.criterion == "dice"
    assert cfg.optimizer == "ranger"
    assert cfg.decay_type == "cosine"
    assert cfg.learning_rate == 0.0003
    assert cfg.val_frequency == 2
    assert cfg.log_val_metrics and cfg.evaluate_end_training
    assert cfg.remove_outliers and cfg.no_full_name
    assert cfg.epochs == 150 and cfg.fold == 0
    assert cfg.verbosity == 2


def test_reference_model3_and_model5_recipe_deltas(tmp_path):
    """Model 3 adds --seed 93; model 5 swaps --criterion jaccard
    (reference README.md:113-121)."""
    data = tmp_path / "d"
    data.mkdir()
    base = (f"--train_data_path {data} --model equiunet_assp_evo "
            "--act leakyrelu --width 48 --optimizer ranger "
            "--decay_type cosine --learning_rate 0.0003 --epochs 150 "
            "--remove_outliers --fold 0")
    cfg3 = get_train_args((base + " --criterion dice --seed 93").split())
    assert cfg3.seed == 93
    cfg5 = get_train_args((base + " --criterion jaccard").split())
    assert cfg5.criterion == "jaccard"


def test_reference_model1_recipe_group_norm(tmp_path):
    """Model 1 = equiunet with --norm group --act relu
    (reference README.md:103-105)."""
    data = tmp_path / "d"
    data.mkdir()
    argv = (f"--train_data_path {data} --model equiunet --norm group "
            "--act relu --width 48 --criterion dice --optimizer ranger "
            "--decay_type cosine --learning_rate 0.0003 "
            "--remove_outliers --epochs 150 --fold 0").split()
    cfg = get_train_args(argv)
    assert cfg.model == "equiunet" and cfg.norm == "group"


def test_reference_model6_inference_recipe_parses(tmp_path):
    """The model-6 ensemble inference argv (reference README.md:160-163):
    10 configs, --test_data_path alias, duplicated --device, --tta + both
    post-processing steps at the published thresholds."""
    configs = []
    for member in ("model3", "model5"):
        for fold in range(5):
            d = tmp_path / member / f"fold{fold}"
            d.mkdir(parents=True)
            cfg = d / "config.yaml"
            cfg.write_text(yaml.safe_dump({"model": "equiunet_assp_evo"}))
            configs.append(str(cfg))
    val_data = tmp_path / "ValidationData"
    val_data.mkdir()
    argv = (["--config"] + configs +
            ["--test_data_path", str(val_data), "--on", "test", "-vv",
             "--replace_value", "--cleaning_areas",
             "--save_path", str(tmp_path / "model6_inference"),
             "--device", "0", "--replace_value_threshold", "300",
             "--cleaning_areas_threshold", "20", "--device", "0", "--tta"])
    args = build_inference_parser().parse_args(argv)
    assert len(args.config) == 10
    assert args.test_data_path == str(val_data)  # --input alias target
    assert args.save_path == str(tmp_path / "model6_inference")  # --output alias
    assert args.on == "test" and args.tta
    assert args.replace_value and args.replace_value_threshold == 300
    assert args.cleaning_areas and args.cleaning_areas_threshold == 20
    assert args.verbosity == 2
