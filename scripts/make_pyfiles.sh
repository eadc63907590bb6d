#!/usr/bin/env bash
# Package the kg library for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-/tmp/kg.zip}"
rm -f "$out"
zip -qr "$out" kg -x 'kg/__pycache__/*' -x 'kg/*/__pycache__/*'
echo "$out"
