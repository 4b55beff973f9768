"""Document deletion + update via epoch-bounded tombstones (the
Lucene/Elasticsearch live-docs pattern, giving PG DELETE/UPDATE
parity on an append-only index).

``delete_docs`` appends a (docid, upto_epoch) list under
``<index>/tombstones/``; no index data is rewritten.  A tombstone
masks the doc's postings in every epoch <= ``upto_epoch`` (a plain
DELETE uses an unbounded upto), so an UPDATE is
``delete_docs(ids, upto_epoch=e-1)`` followed by appending the new
versions as epoch ``e`` - the old version disappears, the new one
serves (``upsert_index_batch`` in index/streaming.py packages
exactly that).  Batch-built base postings count as epoch 0.

Every query path filters candidate postings against the tombstones
(dropped inside ``_TermList`` during decode with the posting's
epoch, so deleted docs can neither match nor occupy WAND heap
slots), while corpus statistics (n_docs, avgdl, df) stay as built -
exactly Lucene's live-docs behavior - until ``compact_index``
applies the tombstones physically and refreshes the statistics.

Scale note: the tombstone set ships to executors inside the task
closure as two sorted int64 arrays; at ~16 bytes/doc that is fine
into the millions.  Past that, compact - a 100 TB deployment treats
a large tombstone backlog as compaction pressure, not a steady
state.
"""

from __future__ import annotations

import os
import uuid

import numpy as np

# unbounded delete: masks every epoch
NO_EPOCH_LIMIT = 1 << 62


def _tomb_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def delete_docs(
    index_dir: str, docids, upto_epoch: int | None = None
) -> int:
    """Mark documents deleted in every epoch <= ``upto_epoch``
    (default: all epochs - a plain DELETE).  Accepts any iterable of
    ints; append-only and idempotent - re-deleting an id, or deleting
    one that never existed, is harmless."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(list(docids), dtype=np.int64))
    if not ids.size:
        return 0
    upto = NO_EPOCH_LIMIT if upto_epoch is None else int(upto_epoch)
    d = _tomb_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"del-{uuid.uuid4().hex}.parquet")
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "docid": pa.array(ids, pa.int64()),
                "upto": pa.array(
                    np.full(ids.size, upto, np.int64), pa.int64()
                ),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)
    return int(ids.size)


def load_tombstones(index_dir: str):
    """``(docids, upto)`` - sorted unique docids with each id's MAX
    epoch bound - or None when nothing is deleted."""
    import pyarrow.parquet as pq

    d = _tomb_dir(index_dir)
    if not os.path.isdir(d):
        return None
    ids_l, upto_l = [], []
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            t = pq.read_table(os.path.join(d, name))
            ids_l.append(t["docid"].to_numpy().astype(np.int64))
            if "upto" in t.column_names:
                upto_l.append(t["upto"].to_numpy().astype(np.int64))
            else:  # pre-epoch tombstone files: unbounded
                upto_l.append(
                    np.full(len(t), NO_EPOCH_LIMIT, np.int64)
                )
    if not ids_l:
        return None
    ids = np.concatenate(ids_l)
    upto = np.concatenate(upto_l)
    if not ids.size:
        return None
    srt = np.lexsort((upto, ids))
    ids, upto = ids[srt], upto[srt]
    # per-id max bound: lexsort put the largest upto last per id
    last = np.concatenate((ids[1:] != ids[:-1], [True]))
    return ids[last], upto[last]


def clear_tombstones(index_dir: str) -> None:
    """Remove the tombstone files (after compaction applied them)."""
    import shutil

    shutil.rmtree(_tomb_dir(index_dir), ignore_errors=True)


def alive_mask(
    ids: np.ndarray, deleted, epochs: np.ndarray | int | None = None
) -> np.ndarray | None:
    """Boolean mask of postings that SURVIVE the tombstones: a
    posting dies when its docid is tombstoned with
    ``upto >= its epoch``.  ``epochs`` is a per-posting array, a
    scalar (whole block from one epoch), or None (treat as epoch 0 -
    batch layout).  Returns None when nothing dies (callers skip the
    filter)."""
    if deleted is None or not ids.size:
        return None
    dids, upto = deleted
    if not dids.size:
        return None
    j = np.searchsorted(dids, ids)
    jc = np.minimum(j, dids.size - 1)
    hit = (j < dids.size) & (dids[jc] == ids)
    if epochs is None:
        epochs = 0
    hit &= upto[jc] >= epochs
    return None if not hit.any() else ~hit
