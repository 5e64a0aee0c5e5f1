"""Palette lookup — per-pixel small-table fetch as MXU one-hot matmuls.

XLA's per-pixel gathers on TPU run at ~1 element/cycle (a [2M] x [T,48]
row gather costs ~137 ms). For SMALL tables (materials [M,32], per-item
matrices [N,16]) the lookup is better spent on the MXU: per pixel block,
build a one-hot [M, NPX] in VMEM and multiply by the table — microseconds
per tile instead of ~3 ms per fetched column.

out[p, :] = table[idx[p], :]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._backend import pallas_call

_NPX = 4096          # pixels per block row (lane axis, 32 vregs)
_ROWS = 8            # block rows per kernel instance


def _make_kernel(m: int, k: int):
    def kernel(idx_ref, table_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (m, _NPX), 0)

        def body(t, _):
            idx_row = idx_ref[pl.ds(t, 1), :]                   # [1, NPX]
            onehot = (rows == jnp.broadcast_to(idx_row, (m, _NPX))
                      ).astype(jnp.float32)
            out = jax.lax.dot_general(
                table_ref[:, :], onehot,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [K, NPX]
            out_ref[t, :, :] = out
            return 0

        jax.lax.fori_loop(0, _ROWS, body, 0)

    return kernel


def palette_lookup(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """idx [...] int32 (values in [0, M)), table [M, K] f32 ->
    out [..., K]. Any index shape; internally flattened to lane blocks."""
    shape = idx.shape
    if idx.ndim == 1:
        out = palette_lookup(idx.reshape(1, -1), table)
        return out.reshape(shape[0], table.shape[1])
    if idx.ndim > 2:
        out = palette_lookup(idx.reshape(1, -1), table)
        return out.reshape(*shape, table.shape[1])
    h, w = idx.shape
    m, k = table.shape
    mp = max(8, -(-m // 8) * 8)
    kp = max(8, -(-k // 8) * 8)
    if mp > m or kp > k:
        table = jnp.pad(table, ((0, mp - m), (0, kp - k)))

    n = h * w
    nrows = -(-n // _NPX) * _NPX // _NPX
    nblk = -(-nrows // _ROWS)
    nrows_pad = nblk * _ROWS
    flat = jnp.clip(idx.reshape(-1), 0, mp - 1)
    flat = jnp.pad(flat, (0, nrows_pad * _NPX - n))
    flat = flat.reshape(nrows_pad, _NPX)

    out = pallas_call(
        _make_kernel(mp, kp),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((_ROWS, _NPX), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, kp, _NPX), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows_pad, kp, _NPX), jnp.float32),
    )(flat, table)

    out = jnp.moveaxis(out, 1, 2).reshape(nrows_pad * _NPX, kp)[:n, :k]
    return out.reshape(h, w, k)