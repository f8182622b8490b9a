#!/usr/bin/env bash
# Cold-environment certification (round 15, VERDICT r14 task 2).
#
# The round-14 "sbt test 381/381" stamp was false-green: the sink_zorder
# quality gate read a STALE staging dir that a pre-fix run had left on
# tmpfs, and the builder's cert JVM inherited it. This script makes that
# class of false-green impossible by construction: every scratch/memo
# base the engine can read from is WIPED before the suite runs, so any
# test that depends on a prior JVM's artifacts fails here, loudly.
#
# What is wiped (and why it is safe):
#   /dev/shm/graft_io    — SourcesSinks sink staging + per-call streaming
#                          checkpoints; rebuilt by the operators on demand
#   /dev/shm/graft-memo  — MemoFrames session-shared artifact parquet;
#                          rebuilt by SharedArtifacts.warm / first touch
#   /tmp/graft_io, /tmp/graft-memo — the no-tmpfs fallbacks of the same
# Nothing under /root/testdata or the repo is touched.
#
# Usage: tools/cold_cert.sh            # full sbt test from cold scratch
# The wipe is recorded on stdout so the BASELINE.md cert block can quote
# it. Exit code is sbt's.
set -u
cd "$(dirname "$0")/.."

echo "COLDCERT wipe: $(date -u +%FT%TZ)"
for d in /dev/shm/graft_io /dev/shm/graft-memo /tmp/graft_io /tmp/graft-memo; do
  if [ -e "$d" ]; then
    du -sh "$d" 2>/dev/null | sed 's/^/COLDCERT   pre-wipe /'
    rm -rf "$d"
  fi
  echo "COLDCERT   wiped $d"
done

echo "COLDCERT sbt test (cold JVM, cold scratch)"
sbt -batch test
rc=$?
echo "COLDCERT exit=$rc"
exit $rc
