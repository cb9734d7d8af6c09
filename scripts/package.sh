#!/usr/bin/env bash
# Build engine.zip for the production launch mode (north_rule):
#   spark-submit --py-files engine.zip validate.py --table ... [--resume]
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip tdr_draft_metadata_validator_spark -x '*__pycache__*'
echo "wrote $(pwd)/engine.zip ($(du -h engine.zip | cut -f1))"
