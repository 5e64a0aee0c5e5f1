"""Backend helpers shared by all device ops.

Pallas TPU kernels run compiled on TPU and in interpreter mode elsewhere
(CPU test meshes, the driver's virtual-device dry runs). All pallas_call
sites in this package go through ``pallas_call`` below so the switch is in
one place.
"""
from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl


@functools.cache
def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_call(kernel, **kwargs):
    """pl.pallas_call with interpret mode auto-enabled off-TPU."""
    if not on_tpu():
        kwargs.setdefault("interpret", True)
        # TPU-specific compiler params are not understood by the interpreter
        kwargs.pop("compiler_params", None)
    return pl.pallas_call(kernel, **kwargs)
