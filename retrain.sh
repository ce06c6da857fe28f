#!/usr/bin/env bash
set -e
cd "$(dirname "$0")"
python3 -m graphphysics_tpu.cli.train \
  --training_parameters_path /tmp/gp_tpu_mock/mock_training.json \
  --num_epochs 2 --batch_size 2 --warmup 5 --model_save_name mock.msgpack \
  --resume_training --model_path checkpoints/mock.msgpack
