#!/bin/sh
# Official bench on the real TPU. Run ALONE (one axon client at a time;
# no CPU-heavy work while it runs). Writes one JSON line + rc to the log.
LOG=${1:-/tmp/bench_r5.log}
timeout 3600 python bench.py > "$LOG" 2>&1
echo "bench rc=$?" >> "$LOG"
