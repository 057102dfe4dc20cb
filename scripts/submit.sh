#!/usr/bin/env bash
# Package the engine and launch via spark-submit --py-files (north rule).
#
#   ./scripts/submit.sh [spark-submit args...] jobs/run_algorithm.py [job args...]
#
# On a real cluster prepend e.g.:
#   --master yarn --deploy-mode cluster --num-executors 256 \
#   --executor-cores 4 --executor-memory 16g \
#   --conf spark.sql.shuffle.partitions=2048 \
#   --conf spark.sql.adaptive.enabled=true
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=build/comm_detect_spark.zip
mkdir -p build
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk('comm_detect_spark'):
        dirs[:] = [d for d in dirs if d != '__pycache__']
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
print('packaged', '$ZIP')
"

exec spark-submit --py-files "$ZIP" "$@"
