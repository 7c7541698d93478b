#!/usr/bin/env bash
# Fetch the Apache Iceberg Spark runtime jar from Maven Central so the
# skip-gated integration contract (tests/test_iceberg_catalog.py) can run.
#
# This sandbox is offline — the script is the documented recipe for the CI
# lane / any networked machine, not something that can succeed here.
#
# Usage:
#   scripts/fetch_iceberg_jar.sh [dest_dir]          # default: ./jars
#   SPARK_GRAFT_ICEBERG_VERSION=1.10.0 scripts/fetch_iceberg_jar.sh
#
# Then:
#   SPARK_GRAFT_ICEBERG_JAR=jars/iceberg-spark-runtime-4.0_2.13-<ver>.jar \
#       python -m pytest tests/test_iceberg_catalog.py -x -q
set -euo pipefail

# Spark 4.x ships Scala 2.13; the runtime artifact is versioned by the
# Spark minor it targets. Override SPARK_SUFFIX for a Spark 3.5 cluster
# (3.5_2.12).
SPARK_SUFFIX="${SPARK_GRAFT_ICEBERG_SPARK_SUFFIX:-4.0_2.13}"
VERSION="${SPARK_GRAFT_ICEBERG_VERSION:-1.10.0}"
DEST="${1:-jars}"

ARTIFACT="iceberg-spark-runtime-${SPARK_SUFFIX}"
URL="https://repo1.maven.org/maven2/org/apache/iceberg/${ARTIFACT}/${VERSION}/${ARTIFACT}-${VERSION}.jar"
mkdir -p "${DEST}"
OUT="${DEST}/${ARTIFACT}-${VERSION}.jar"

echo "fetching ${URL}"
if command -v curl >/dev/null 2>&1; then
    curl -fL --retry 3 -o "${OUT}" "${URL}"
else
    wget -O "${OUT}" "${URL}"
fi

# sanity: a jar is a zip; Maven Central serves an HTML error page on a bad
# version/suffix combination, which would otherwise fail later and weirder
head -c 2 "${OUT}" | grep -q 'PK' || {
    echo "ERROR: ${OUT} is not a jar (bad version/suffix?)" >&2
    exit 1
}
echo "ok: ${OUT}"
echo "run: SPARK_GRAFT_ICEBERG_JAR=${OUT} python -m pytest tests/test_iceberg_catalog.py -x -q"
