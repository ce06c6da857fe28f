#!/usr/bin/env bash
# End-to-end smoke training on a generated mock dataset (the analog of the
# reference CI pipeline, .github/workflows/gp.yaml: make train-predict).
set -e
cd "$(dirname "$0")"
python3 - <<'EOF'
import json, shutil, sys
sys.path.insert(0, ".")
from tests.fixtures import write_cylinder_h5
h5, meta = write_cylinder_h5("/tmp/gp_tpu_mock", num_traj=2, steps=10, nx=10, ny=8)
shutil.copy(h5, "/tmp/gp_tpu_mock/test.h5")
cfg = json.load(open("training_config/cylinder.json"))
cfg["dataset"]["h5_path"] = h5
cfg["dataset"]["meta_path"] = meta
cfg["model"].update({"message_passing_num": 2, "hidden_size": 16})
json.dump(cfg, open("/tmp/gp_tpu_mock/mock_training.json", "w"))
EOF
python3 -m graphphysics_tpu.cli.train \
  --training_parameters_path /tmp/gp_tpu_mock/mock_training.json \
  --num_epochs 1 --batch_size 2 --warmup 5 --model_save_name mock.msgpack
