#!/usr/bin/env bash
# Automated smoke test — counterpart of the reference Scripts/TestVQE.bat:
# run the engine for N frames headless and fail on nonzero exit.
set -u
FRAMES="${1:-100}"
SCENE="${2:-HelloCube}"
OUT="$(mktemp -d)"

echo "[test_vqe] running $SCENE for $FRAMES frames..."
python -m vqengine_tpu -Test -TestFrames="$FRAMES" -W=320 -H=180 \
    -Scene="$SCENE" -OutputDir="$OUT" -LogConsole
rc=$?
if [ $rc -ne 0 ]; then
    echo "[test_vqe] FAILED (exit $rc)"
    exit $rc
fi
echo "[test_vqe] OK — frames in $OUT"
