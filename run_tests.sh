#!/bin/bash
# Full test suite, sharded into two fresh processes.
#
# One long pytest process accumulates XLA-CPU compiler state across the
# ~150 jitted programs the suite builds and eventually segfaults inside
# backend_compile_and_load (observed repeatedly around the heavy MO-DGP
# compiles, test position ~105/156, regardless of which tests those are;
# every affected test passes in a fresh process). Two shards keep each
# process comfortably under the threshold.
set -e
cd "$(dirname "$0")"
python -m pytest tests/test_[a-l]*.py -q "$@"
python -m pytest tests/test_[m-z]*.py -q "$@"
