#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (SURVEY.md §7 v5).
#
#   ./scripts/build_pyfiles.sh
#   spark-submit --py-files dist/deepseek_ocr_customvllm_spark.zip \
#       deepseek_ocr_customvllm_spark/job.py --synth 100000 --out /data/out
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/deepseek_ocr_customvllm_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/deepseek_ocr_customvllm_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("deepseek_ocr_customvllm_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/deepseek_ocr_customvllm_spark.zip")
EOF
