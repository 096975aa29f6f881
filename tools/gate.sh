#!/usr/bin/env bash
# Round-end gate: refuse to snapshot-commit unless the build + tests are
# green. Round 2 shipped a snapshot that didn't compile; this script makes
# that impossible to repeat.
#
# Usage: tools/gate.sh "commit message"
#   runs `sbt compile test`; on success, commits ALL current changes with
#   the given message; on failure, prints the tail and exits nonzero with
#   the working tree untouched.
set -euo pipefail
cd "$(dirname "$0")/.."
msg="${1:?usage: tools/gate.sh \"commit message\"}"
log=$(mktemp)
if ! sbt -batch compile test >"$log" 2>&1; then
  echo "GATE FAILED — not committing. Last 40 lines:" >&2
  tail -40 "$log" >&2
  exit 1
fi
# informational only — the sbt exit code already gates; without `|| true`
# a wording change in sbt's summary would abort the gate under pipefail
grep -E "Tests: succeeded|All tests passed" "$log" | tail -2 || true
git add -A
if git diff --cached --quiet; then
  echo "gate green; nothing to commit"
else
  git commit -m "$msg"
fi
