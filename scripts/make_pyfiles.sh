#!/bin/sh
# Build dist/engine.zip for spark-submit --py-files (north_rule ship mode).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("tegenaria_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/engine.zip")
EOF
