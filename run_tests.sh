#!/bin/bash
# Full test suite, sharded into three fresh processes.
#
# One long pytest process accumulates XLA-CPU compiler state across the
# ~150 jitted programs the suite builds and eventually segfaults inside
# backend_compile_and_load after ~50-100 heavy model compiles (observed
# repeatedly at different tests; every affected test passes in a fresh
# process). Three shards keep each process under the threshold, with the
# heavy staged-model files (mf/mf_em/mo) isolated in their own process.
set -e
cd "$(dirname "$0")"
python -m pytest tests/test_[a-l]*.py -q "$@"
python -m pytest tests/test_m*.py -q "$@"
python -m pytest tests/test_[n-z]*.py -q "$@"
