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

# TPU MXU f32 matmuls/einsums default to ONE bf16 pass (8-bit mantissa):
# measured on-chip, a one-hot id-selection dot returns ids wrong by up to
# +-1014 at 284k triangles and edge functions carry 6.8e-4 relative error
# — the source of the round-1 "MSAA brightness diff" and shattered
# geometry on TPU that CPU (exact f32) tests could never see. 'highest'
# (6-pass bf16 decomposition) reproduces f32 exactly, including the
# packed-bf16-pair attribute words selected through the MXU. This must be
# set before any trace; every op module imports this one.
jax.config.update("jax_default_matmul_precision", "highest")


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
