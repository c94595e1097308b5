"""Radix select vs sort: exact order-statistic agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.ops.robust import _masked_median_sort, masked_median
from icp_rust_tpu.ops.select import kth_smallest_masked


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("n", [1, 2, 7, 100, 1001])
def test_kth_smallest_matches_numpy(dtype, n):
    rng = np.random.default_rng(n)
    x = rng.normal(0, 10, (3, n)).astype(dtype)
    x[0, : n // 3] *= -1  # negatives exercise the sign-flip key mapping
    mask = rng.random((3, n)) > 0.2
    mask[:, 0] = True  # at least one valid lane
    for row in range(3):
        cnt = mask[row].sum()
        ks = np.unique([0, cnt // 2, cnt - 1]).astype(np.int32)
        for k in ks:
            got = kth_smallest_masked(
                jnp.asarray(x[row]), jnp.asarray(mask[row]), jnp.int32(k)
            )
            want = np.sort(x[row][mask[row]])[k]
            assert float(got) == float(want), (row, k)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_masked_median_radix_equals_sort(dtype):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 5, (4, 257)).astype(dtype)
    mask = rng.random((4, 257)) > 0.3
    mask[:, :2] = True
    m_r, v_r = masked_median(jnp.asarray(x), jnp.asarray(mask))
    m_s, v_s = _masked_median_sort(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(v_r), np.asarray(v_s))
    np.testing.assert_array_equal(np.asarray(m_r), np.asarray(m_s))


def test_masked_median_special_values():
    """Duplicates, zeros, negative zeros, infinities in the data."""
    x = jnp.asarray(
        [[1.0, 1.0, 1.0, 1.0], [0.0, -0.0, 5.0, -5.0],
         [np.inf, 1.0, 2.0, 3.0], [-np.inf, -1.0, 0.5, 2.0]],
        jnp.float32,
    )
    mask = jnp.ones((4, 4), bool)
    m_r, _ = masked_median(x, mask)
    m_s, _ = _masked_median_sort(x, mask)
    np.testing.assert_array_equal(np.asarray(m_r), np.asarray(m_s))


def test_masked_median_empty():
    x = jnp.asarray([[1.0, 2.0]], jnp.float32)
    mask = jnp.zeros((1, 2), bool)
    med, valid = masked_median(x, mask)
    assert not bool(valid[0])
    assert float(med[0]) == 0.0
