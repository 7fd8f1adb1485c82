"""Arrow list<float> ⇄ numpy matrix without Python materialization.

``batch[col].to_pylist()`` builds one Python list object per float — at
embedding widths of 768+ that is the dominant cost of a similarity stage.
The Arrow buffers already hold the values contiguously; flatten + reshape
reads them as one numpy view (zero-copy when there are no nulls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """[n, d] matrix from a list<float> / fixed_size_list<float> column.

    Raises ``ValueError`` on ragged rows (embeddings must be uniform-width);
    nulls are not supported (an embedding column should never have them).
    """
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        raise ValueError("embedding column contains nulls")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if len(flat) % n:
        raise ValueError("ragged embedding column")
    d = len(flat) // n
    if not pa.types.is_fixed_size_list(arr.type):
        widths = pc.list_value_length(arr).to_numpy()
        if not (widths == d).all():
            raise ValueError("ragged embedding column")
    return flat.reshape(n, d).astype(dtype, copy=False)
