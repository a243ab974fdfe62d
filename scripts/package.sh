#!/bin/sh
# Package the engine for cluster submission:
#   sh scripts/package.sh && spark-submit --py-files /tmp/gdal_spark.zip \
#       scripts/run_pipeline.py --pages 1000000
set -e
cd "$(dirname "$0")/.."
rm -f /tmp/gdal_spark.zip
zip -qr /tmp/gdal_spark.zip gdal_spark -x "*.pyc" -x "*__pycache__*"
echo /tmp/gdal_spark.zip
