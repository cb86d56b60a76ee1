"""Zero-copy Arrow list-column -> numpy matrix conversion.

Embedding columns arrive as ``list<float>`` or ``fixed_size_list<float, d>``.
``to_pylist()`` + ``np.asarray`` materializes every element as a Python
float (measured ~20x the cost of the matmul it feeds at sf0.1); the values
buffer of a non-null list column is already the row-major matrix, so the
conversion is a ``reshape`` — zero-copy when the storage dtype already
matches ``dtype``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def to_matrix(col, dtype=np.float64, dim: int = None) -> np.ndarray:
    """(Chunked) list<numeric> / fixed_size_list<numeric> column -> (n, d)
    ndarray.  Requires equal-length, null-free rows (embedding columns are);
    raises ValueError on ragged input rather than silently padding.

    ``dim``: width to use for an EMPTY column (a variable-length list
    carries no dimension when n == 0; fixed_size_list does).  Callers that
    matmul the result should pass the known dimension so zero-row Arrow
    blocks produce a (0, d) no-op operand instead of a shape error."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    n = len(col)
    if n == 0:
        if pa.types.is_fixed_size_list(col.type):
            dim = col.type.list_size
        return np.zeros((0, dim or 0), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.flatten()  # respects any slice offset
    else:
        offsets = np.asarray(col.offsets)
        widths = np.diff(offsets)
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError("ragged embedding column")
        flat = col.flatten()
    if flat.null_count:
        raise ValueError("embedding column contains null elements")
    mat = np.asarray(flat).reshape(n, dim)
    return mat.astype(dtype, copy=False)
