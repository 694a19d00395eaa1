#!/usr/bin/env bash
# Close-round artifact staging (the mechanical form of the cadence rule in
# BASELINE.md): stage every driver/cadence artifact the round produced and
# commit them, then FAIL if the tree is still dirty — a round can never
# close with its BENCH/CORRECTNESS files untracked again.
set -euo pipefail
cd "$(dirname "$0")/.."

git add -- BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json COPYCHECK.json \
  bench/latest.json bench/scale_latest.json 2>/dev/null || true
# VERDICT/ADVICE arrive with the next round's kickoff but may also be
# refreshed at close; stage them when present
git add -- VERDICT.md ADVICE.md PROGRESS.jsonl 2>/dev/null || true

if git diff --cached --quiet; then
  echo "close-round: no artifact changes to commit"
else
  git commit -m "Round close: stage bench/correctness/leak/copy artifacts

No-Verification-Needed: artifact-only commit (driver-generated JSON/MD)"
fi

dirty=$(git status --porcelain)
if [ -n "$dirty" ]; then
  echo "close-round: FAIL — tree still dirty after staging artifacts:" >&2
  echo "$dirty" >&2
  exit 1
fi
echo "close-round: clean tree, artifacts committed"
