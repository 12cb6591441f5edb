#!/bin/sh
# Package abwcf_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/abwcf_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/abwcf_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("abwcf_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/abwcf_spark.zip written")
EOF
