#!/bin/bash
# End-of-round snapshot ritual. Refuses to commit on a red build.
#
# Rounds 9 and 10 both ended with a broken tree at HEAD because the final
# commit was made without re-running the build against the final diff
# (r9: a stale README guard; r10: an untested `col` usage in a spec).
# This script makes that failure mode impossible: it stages everything,
# runs the build/tests from the tree that will actually be committed, and
# only then commits.
#
# Usage: tools/snapshot.sh "commit message"            # full `sbt test` (ideal)
#        tools/snapshot.sh --compile-only "message"    # `sbt Test/compile` (minimum)
set -eo pipefail
cd "$(dirname "$0")/.."

MODE=test
if [ "$1" = "--compile-only" ]; then MODE=compile; shift; fi
MSG="${1:?usage: tools/snapshot.sh [--compile-only] \"commit message\"}"

git add -A
if git diff --cached --quiet; then
  echo "snapshot: nothing staged; tree already committed." >&2
  exit 0
fi

# Guard against unstaged drift between the gate run and the commit: after
# `git add -A` nothing should remain unstaged, but a concurrent writer could
# race us. Verify the worktree matches the index before gating.
if ! git diff --quiet; then
  echo "snapshot: worktree changed after staging — rerun." >&2
  exit 1
fi

if [ "$MODE" = test ]; then
  echo "== snapshot gate: sbt test (full suite) on the staged tree"
  if ! sbt -batch test > /tmp/snapshot_gate.log 2>&1; then
    echo "snapshot: RED — sbt test failed; NOT committing." >&2
    grep -E "\[error\]|Tests:|\*\*\* " /tmp/snapshot_gate.log | tail -20 >&2
    exit 1
  fi
  grep -E "Tests:|All tests" /tmp/snapshot_gate.log | tail -2
else
  echo "== snapshot gate: sbt Test/compile on the staged tree"
  if ! sbt -batch Test/compile > /tmp/snapshot_gate.log 2>&1; then
    echo "snapshot: RED — Test/compile failed; NOT committing." >&2
    grep "\[error\]" /tmp/snapshot_gate.log | tail -20 >&2
    exit 1
  fi
  tail -1 /tmp/snapshot_gate.log
fi

git commit -m "$MSG"
echo "snapshot: committed $(git rev-parse --short HEAD) with a green gate ($MODE)."
