#!/usr/bin/env bash
# Package the library and launch the extraction job via spark-submit.
#
#   scripts/submit.sh --input <path> --output <dir> [--run-id r1] [--groups 64]
#
# Cluster sizing is spark-submit's concern; pass e.g.
#   SPARK_SUBMIT_ARGS="--master yarn --num-executors 250 --executor-cores 8"
# For the N -> 4N scaling evidence, run this twice with two --num-executors
# values on the same input (BASELINE.json north_rule).
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/b2xtranslator_spark.zip
rm -f "$ZIP"
# package only the library (tests and docs stay out of the executor env)
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path("b2xtranslator_spark")
with zipfile.ZipFile("/tmp/b2xtranslator_spark.zip", "w") as z:
    for f in root.rglob("*.py"):
        z.write(f, f.as_posix())
PY

SPARK_SUBMIT=${SPARK_SUBMIT:-spark-submit}
# Local default needs a real driver heap: in local mode the driver IS the
# executor, and spark-submit's 1g default OOMs on payload-sized corpora
# (caught by driving this script end-to-end in round 3). Cluster runs
# override the whole string via SPARK_SUBMIT_ARGS.
exec "$SPARK_SUBMIT" ${SPARK_SUBMIT_ARGS:---master 'local[8]' --driver-memory 12g} \
    --py-files "$ZIP" scripts/job.py "$@"
