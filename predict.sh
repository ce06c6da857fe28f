#!/usr/bin/env bash
set -e
cd "$(dirname "$0")"
python3 -m graphphysics_tpu.cli.predict \
  --training_parameters_path /tmp/gp_tpu_mock/mock_training.json \
  --model_path checkpoints/mock.msgpack \
  --save_dir predictions
