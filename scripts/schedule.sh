#!/bin/bash
# Schedule execution of many runs (reference: scripts/schedule.sh).
# Run from the repo root with: bash scripts/schedule.sh

python -m matcha_tpu.train trainer.max_epochs=5 logger=csv

python -m matcha_tpu.train trainer.max_epochs=10 logger=csv
