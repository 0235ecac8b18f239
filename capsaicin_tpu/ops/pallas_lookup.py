"""Pallas TPU kernel: small-table row lookup as a one-hot MXU matmul.

XLA's dynamic row gather costs ~17ns per index on TPU regardless of width —
34ms for a full 1080p frame's hit-attribute fetch. When the table is small
(<= 128 rows: Cornell-class triangle attribute tables, material tables), the
lookup is better spent on the MXU: build a one-hot [T, BR] mask by comparing
a sublane iota against the index lane vector (no transposes), then
`table[C,T] @ onehot[T,BR]` — a tiny matmul per 1024-index block, ~10x
faster than the gather.

Returns [C, N] column-major; callers slice/transpose (cheap layout ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048
MAX_TABLE_ROWS = 128


def _use_interpret():
    return jax.default_backend() != "tpu"


def _lookup_kernel(t_rows, idx_ref, table_ref, out_ref):
    idx = idx_ref[0:1, :]  # [1, BLOCK] int32
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (t_rows, 1), 0)
    onehot = (row_ids == idx).astype(jnp.float32)  # [T, BLOCK]
    # HIGHEST precision: the MXU's default f32 path rounds operands to
    # bf16, which would truncate the looked-up values themselves.
    out_ref[:, :] = jnp.dot(
        table_ref[:, :], onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def table_lookup(table, idx):
    """table [T, C] (T <= 128), idx [N] int32 in [0, T) -> [N, C] float32."""
    t, c = table.shape
    assert t <= MAX_TABLE_ROWS
    n = idx.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    idx_p = jnp.clip(idx, 0, t - 1).astype(jnp.int32)
    if n_pad != n:
        idx_p = jnp.concatenate([idx_p, jnp.zeros((n_pad - n,), jnp.int32)])
    idx_p = idx_p.reshape(1, n_pad)
    table_t = table.T.astype(jnp.float32)  # [C, T]

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, t),
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((1, BLOCK), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, t), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, BLOCK), lambda p: (0, p), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n_pad), jnp.float32),
        interpret=_use_interpret(),
    )(idx_p, table_t)
    return out[:, :n].T
