#!/bin/bash
# The whole round gate in one shot: compile, tests, oracle verify, bench.
# Usage: tools/full_check.sh  (from /root/repo)
set -eo pipefail
cd "$(dirname "$0")/.."
echo "== compile"; sbt -batch compile | tail -1
echo "== test";    sbt -batch test 2>&1 | grep -E "Tests:|All tests" | tail -2
echo "== verify sf0.01 vs DuckDB oracle"
SPARK_GRAFT_CPUS=16 tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/graft_verify 2>/dev/null | tail -2
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_verify | tail -3
echo "== bench sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 tools/run.sh graft.Bench 2>/dev/null
