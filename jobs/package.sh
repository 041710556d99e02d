#!/bin/sh
# Build the --py-files artifact and show the cluster submit line.
# (north rule: "ships as a spark-submit --py-files package")
set -e
cd "$(dirname "$0")/.."
python -m zipfile -c dist_osm_lib_spark.zip osm_lib_spark/
echo "built dist_osm_lib_spark.zip"
echo "submit example:"
echo "  spark-submit --master <cluster> --py-files dist_osm_lib_spark.zip \\"
echo "      jobs/extract.py --docs <iceberg/parquet docs table> \\"
echo "      --bbox minLat,minLon,maxLat,maxLon --out <dir> --checkpoint"
