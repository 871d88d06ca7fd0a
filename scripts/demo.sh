#!/bin/bash
# Quickstart walkthrough (the reference's examples/io_demo.ipynb, Spark-side):
# generates a messy per-cabinet CSV fixture, then runs discovery -> load ->
# continuity -> resample -> report end-to-end, asserting each stage's
# contract. Green output ends with "[demo] ALL STAGES GREEN".
#
# Usage: scripts/demo.sh [workDir]   # workDir defaults to a fresh temp dir
set -e
cd "$(dirname "$0")/.."
sbt -batch compile > /dev/null
exec scripts/run.sh graft.Demo "$@"
