"""One-hot MXU table lookup vs plain indexing (interpret mode off-TPU)."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops.pallas_lookup import table_lookup


def test_lookup_matches_indexing(rng):
    table = jnp.asarray(rng.normal(size=(40, 29)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, (5000,)).astype(np.int32))
    got = np.asarray(table_lookup(table, idx))
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


def test_lookup_clips_out_of_range(rng):
    table = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    idx = jnp.asarray(np.array([-5, 0, 7, 99], np.int32))
    got = np.asarray(table_lookup(table, idx))
    want = np.asarray(table)[np.clip(np.asarray(idx), 0, 7)]
    np.testing.assert_array_equal(got, want)
