"""functions/vectors.py: zero-copy list-column -> matrix."""

import numpy as np
import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.functions.vectors import to_matrix


def test_variable_list_roundtrip():
    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    arr = pa.array(rows, pa.list_(pa.float64()))
    np.testing.assert_array_equal(to_matrix(arr), np.asarray(rows))


def test_fixed_size_list_roundtrip():
    rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    arr = pa.array(rows, pa.list_(pa.float32(), 2))
    out = to_matrix(arr)
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, np.asarray(rows))


def test_chunked_and_sliced():
    rows = [[float(i), float(i + 1)] for i in range(10)]
    arr = pa.chunked_array(
        [pa.array(rows[:4], pa.list_(pa.float64())), pa.array(rows[4:], pa.list_(pa.float64()))]
    )
    np.testing.assert_array_equal(to_matrix(arr), np.asarray(rows))
    sliced = pa.array(rows, pa.list_(pa.float64())).slice(3, 5)
    np.testing.assert_array_equal(to_matrix(sliced), np.asarray(rows[3:8]))


def test_zero_copy_when_float64():
    rows = [[1.0, 2.0], [3.0, 4.0]]
    arr = pa.array(rows, pa.list_(pa.float64()))
    out = to_matrix(arr)
    # same backing buffer: float64 storage requires no cast copy
    assert out.base is not None


def test_ragged_rejected():
    arr = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        to_matrix(arr)


def test_null_row_rejected():
    arr = pa.array([[1.0, 2.0], None], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        to_matrix(arr)


def test_empty():
    arr = pa.array([], pa.list_(pa.float64()))
    assert to_matrix(arr).shape == (0, 0)


def test_empty_with_dim():
    arr = pa.array([], pa.list_(pa.float64()))
    assert to_matrix(arr, dim=16).shape == (0, 16)
    # fixed_size_list knows its own width even when empty
    fsl = pa.array([], pa.list_(pa.float32(), 8))
    assert to_matrix(fsl).shape == (0, 8)
    # empty block is a matmul no-op, not a shape error
    import numpy as np

    q = np.zeros((3, 16))
    assert (to_matrix(arr, dim=16) @ q.T).shape == (0, 3)
