"""CLI entry point: ``python -m vqengine_tpu [-Test] [-TestFrames=N] ...``
mirrors the reference VQE.exe contract (Main.cpp:38-229): nonzero exit code
on failure, consumed by CI the way Scripts/TestVQE.bat checks %errorlevel%.
"""
from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # Honor JAX_PLATFORMS for the CLI (e.g. JAX_PLATFORMS=cpu for a
    # hermetic run): this host's sitecustomize registers the remote 'axon'
    # TPU backend at interpreter start and the env var alone does not
    # stick — jax.config must be updated before first backend use
    # (same recipe as tests/conftest.py).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
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
