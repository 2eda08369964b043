#!/bin/bash
# Offline eval from a checkpoint (reference test.sh -> absent test.py;
# oracle.py is the finished harness here).
source "$(dirname "$0")/_common.sh"
python oracle.py "$@"
