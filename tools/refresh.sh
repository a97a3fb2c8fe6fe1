#!/bin/sh
# One-command round-artifact refresh (r4 verdict optional ask #6):
# regenerates every derived artifact that can silently go stale after a
# semantic change, in dependency order. Review the git diff afterwards —
# an unexpected golden/plan delta is the point of running this.
#
#   sh tools/refresh.sh
#
# BASELINE.md bench rows stay manual (a bench run needs an uncontended
# host and median discipline — see CLAUDE.md "medians, always").
set -e
cd "$(dirname "$0")/.."
sbt -batch 'runMain graft.tools.Golden' 'runMain graft.tools.Plans'
echo "[refresh] done — review: git diff src/test/resources/golden/digests.txt PLANS.md"
