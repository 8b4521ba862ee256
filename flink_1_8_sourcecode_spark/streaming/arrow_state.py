"""Arrow-IPC (de)serialization for applyInPandasWithState state blobs.

The reference keeps operator state in typed state backends
(flink-runtime/.../state/heap/HeapKeyedStateBackend.java); the Spark
analogue here is a single ``binary`` state column holding an Arrow IPC
stream of a small per-key pandas DataFrame.  Arrow keeps the encode /
decode vectorized and type-faithful (no pickle, no Python object
churn) — the same encoding ``operators/joins.py`` uses for the
unbounded-join state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def ser(pdf: pd.DataFrame) -> bytes:
    """Encode a pandas DataFrame as an Arrow IPC stream (b'' if empty)."""
    if not len(pdf):
        return b""
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def de(buf: bytes, cols: list[str]) -> pd.DataFrame:
    """Decode an Arrow IPC stream; empty buffer -> empty frame with cols."""
    if not buf:
        return pd.DataFrame(columns=cols)
    return pa.ipc.open_stream(pa.BufferReader(buf)).read_all().to_pandas()


def concat(parts: list[pd.DataFrame], cols: list[str]) -> pd.DataFrame:
    """Concatenate non-empty frames (empty frame with cols if none)."""
    parts = [p for p in parts if len(p)]
    if not parts:
        return pd.DataFrame(columns=cols)
    return pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]


def pack_f64(arr: np.ndarray) -> bytes:
    """Encode an (n, k) float64 matrix as raw little-endian bytes.

    For all-numeric fixed-width per-key state (window accumulators,
    element buffers) this beats the Arrow IPC stream: no schema framing,
    no Table construction — a single contiguous buffer copy.  Counts
    ride as float64 (exact below 2**53, far beyond any per-window
    element count).  Arrow IPC (``ser``/``de``) remains the encoding for
    mixed-type state such as the unbounded join's row buffers.
    """
    if not len(arr):
        return b""
    return np.ascontiguousarray(arr, dtype="<f8").tobytes()


def unpack_f64(buf: bytes, ncols: int) -> np.ndarray:
    """Decode ``pack_f64`` bytes back to an (n, ncols) float64 matrix."""
    if not buf:
        return np.empty((0, ncols), dtype=np.float64)
    return np.frombuffer(buf, dtype="<f8").reshape(-1, ncols)
