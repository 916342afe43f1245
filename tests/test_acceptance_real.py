"""scripts/acceptance_real.py end-to-end smoke (VERDICT r4 #7).

No real BraTS data or reference-trained weights exist in this environment,
so the acceptance pipeline is exercised at full fidelity on substitutes:
reference-NAMED torch checkpoints (the test_import_torch replicas whose
state_dict keys match the published .pth byte-for-byte) in reference
run-dir layout (fold dirs + reference-keyed config.yaml,
arguments_train.py:24-52), over a synthetic GT dataset. Covers: member
discovery → per-member config resolution → torch→flax import children →
one ensemble main_inference pass with GT metrics → CSV reduction →
published-row comparison JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import torch
import yaml
from test_import_torch import F4, RefEquiUnet, _randomize

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acceptance_real_end_to_end(tmp_path):
    # two reference-style fold run dirs (best_model.pth + reference yaml)
    weights = tmp_path / "model1"
    for fold in (0, 1):
        d = weights / f"fold{fold}"
        d.mkdir(parents=True)
        tm = _randomize(RefEquiUnet(F4), fold)
        torch.save({"epoch": 1, "model": tm.state_dict()},
                   str(d / "best_model.pth"))
        with open(d / "config.yaml", "w") as f:
            yaml.safe_dump({"model": "equiunet", "width": 8, "act": "relu",
                            "norm": "group", "dropout": 0.0, "fold": fold,
                            "swa_start": None}, f)

    data = tmp_path / "data"
    sys.path.insert(0, REPO)
    from brats21_tpu.data.synthetic import generate_synthetic_dataset
    generate_synthetic_dataset(str(data), num_cases=3, shape=(48, 48, 32),
                               seed=11)

    out = tmp_path / "acc"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "acceptance_real.py"),
         "--weights", str(weights), "--data", str(data), "--out", str(out),
         "--no_tta", "--cleaning_areas_threshold", "2",
         "--replace_value_threshold", "3", "--num_workers", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]

    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "acceptance_real"
    assert rec["cases"] == 3 and rec["members"] == 2
    assert 0.0 <= rec["measured_mean"]["Dice_mean"] <= 1.0
    assert rec["published"]["Dice_mean"] == 0.88121   # README model 6 row
    assert os.path.exists(out / "acceptance_real.json")
    # imported members are standard servable run dirs
    for i in range(2):
        mdir = out / "imported" / f"member_{i:02d}"
        assert (mdir / "config.yaml").exists()
        assert (mdir / "best_model").is_dir()
