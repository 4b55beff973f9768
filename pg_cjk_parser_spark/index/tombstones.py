"""Document deletion via tombstones (the Lucene/Elasticsearch
pattern, giving PG DELETE parity on an append-only index).

``delete_docs`` appends a docid list under ``<index>/tombstones/``;
no index data is rewritten.  Every query path filters its candidate
postings against the tombstone set (dropped inside ``_TermList``
during decode, so deleted docs can neither match nor occupy WAND
heap slots), while corpus statistics (n_docs, avgdl, df) stay as
built - exactly Lucene's live-docs behavior - until
``compact_index`` applies the tombstones physically and refreshes
the statistics.

Scale note: the tombstone set ships to executors inside the task
closure as one sorted int64 array; at ~8 bytes/doc that is fine into
the millions.  Past that, compact - a 100 TB deployment treats a
large tombstone backlog as compaction pressure, not a steady state.
"""

from __future__ import annotations

import os
import uuid

import numpy as np


def _tomb_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def delete_docs(index_dir: str, docids) -> int:
    """Mark documents deleted.  Accepts any iterable of ints (or a
    numpy array); append-only and idempotent - re-deleting an id, or
    deleting one that never existed, is harmless."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(list(docids), dtype=np.int64))
    if not ids.size:
        return 0
    d = _tomb_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"del-{uuid.uuid4().hex}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.table({"docid": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, path)
    return int(ids.size)


def load_tombstones(index_dir: str) -> np.ndarray | None:
    """The sorted union of all tombstoned docids, or None."""
    import pyarrow.parquet as pq

    d = _tomb_dir(index_dir)
    if not os.path.isdir(d):
        return None
    parts = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            parts.append(
                pq.read_table(
                    os.path.join(d, name), columns=["docid"]
                )["docid"].to_numpy()
            )
    if not parts:
        return None
    ids = np.unique(np.concatenate(parts).astype(np.int64))
    return ids if ids.size else None


def clear_tombstones(index_dir: str) -> None:
    """Remove the tombstone files (after compaction applied them)."""
    import shutil

    shutil.rmtree(_tomb_dir(index_dir), ignore_errors=True)


def alive_mask(ids: np.ndarray, deleted: np.ndarray | None) -> np.ndarray | None:
    """Boolean mask of ``ids`` NOT in the sorted ``deleted`` array
    (None when nothing is deleted - callers skip the filter)."""
    if deleted is None or not deleted.size or not ids.size:
        return None
    j = np.searchsorted(deleted, ids)
    hit = (j < deleted.size) & (
        deleted[np.minimum(j, deleted.size - 1)] == ids
    )
    return None if not hit.any() else ~hit
