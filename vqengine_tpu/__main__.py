"""CLI entry point: ``python -m vqengine_tpu [-Test] [-TestFrames=N] ...``
mirrors the reference VQE.exe contract (Main.cpp:38-229): nonzero exit code
on failure, consumed by CI the way Scripts/TestVQE.bat checks %errorlevel%.
"""
from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        from .engine.engine import VQEngineTPU
        engine = VQEngineTPU(argv)
        return engine.run()
    except Exception as e:  # noqa: BLE001
        print(f"[E] fatal: {e}", file=sys.stderr)
        import traceback
        traceback.print_exc()
        return 1


if __name__ == "__main__":
    sys.exit(main())
