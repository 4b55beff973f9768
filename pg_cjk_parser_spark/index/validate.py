"""Index integrity validation (operational tooling).

``validate_index`` cross-checks the three sources of truth an index
carries - stats.json, the per-bucket/epoch lineage manifests, and the
written shards - without decoding postings:

* every bucket manifest is complete and carries the index fingerprint
  (batch indexes), or every epoch manifest is complete (streaming);
* stats totals equal the sum of per-partition metrics;
* termstats totals (a column-pruned read) equal stats totals;
* optionally (``deep=True``) decodes a sample of posting blocks and
  checks docid monotonicity + count consistency per block.

Returns a report dict with ``ok`` plus per-check details; raises
nothing (an unreadable index yields ``ok=False`` with the error).
"""

from __future__ import annotations

import json
import os


def validate_index(index_dir: str, deep: bool = False, sample_blocks: int = 50) -> dict:
    report: dict = {"ok": True, "errors": [], "checks": {}}

    def fail(msg: str) -> None:
        report["ok"] = False
        report["errors"].append(msg)

    try:
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
    except Exception as ex:
        fail(f"stats.json unreadable: {ex}")
        return report
    report["checks"]["stats"] = {
        k: stats.get(k) for k in ("n_docs", "n_postings", "total_tf")
    }

    # --- manifests -------------------------------------------------------
    mdir = os.path.join(index_dir, "manifests")
    bucket_ms, epoch_ms = [], []
    base_m = None
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(mdir, name)) as f:
                    m = json.load(f)
            except Exception as ex:
                fail(f"manifest {name} unreadable: {ex}")
                continue
            if name == "base.json":
                # batch-built corpus totals captured on first append
                # (streaming.py): part of the stats sum, not a bucket
                base_m = m
            elif name.startswith("epoch="):
                epoch_ms.append(m)
            else:
                bucket_ms.append(m)
    else:
        fail("manifests dir missing")

    if epoch_ms:
        bad = [m for m in epoch_ms if m.get("status") != "complete"]
        if bad:
            fail(f"incomplete epoch manifests: {[m.get('epoch') for m in bad]}")
        have = sorted(int(m["epoch"]) for m in epoch_ms)
        if sorted(stats.get("epochs", [])) != have:
            fail(f"stats.epochs {stats.get('epochs')} != manifests {have}")
        for key in ("n_docs", "total_tf", "n_postings"):
            s = sum(int(m.get(key, 0)) for m in epoch_ms)
            if base_m is not None:
                s += int(base_m.get(key, 0))
            if int(stats.get(key, -1)) != s:
                fail(
                    f"stats.{key}={stats.get(key)} != "
                    f"base+sum(epochs)={s}"
                )
        report["checks"]["epochs"] = len(epoch_ms)
    if bucket_ms:
        fp = stats.get("fingerprint")
        bad = [
            m.get("bucket")
            for m in bucket_ms
            if m.get("status") != "complete"
            or (
                m.get("fingerprint") != fp
                # base capture: epoch appends set the stats
                # fingerprint to 'streaming' while the batch-built
                # bucket manifests keep the original build fingerprint
                and not (base_m is not None and fp == "streaming")
            )
        ]
        if bad:
            fail(f"stale/incomplete bucket manifests: {bad[:10]}")
        if len(bucket_ms) != int(stats.get("num_buckets", -1)):
            fail(
                f"{len(bucket_ms)} bucket manifests != num_buckets="
                f"{stats.get('num_buckets')}"
            )
        metrics = [m.get("metrics") for m in bucket_ms]
        if all(metrics):
            for key in ("total_tf", "n_postings"):
                s = sum(int(m[key]) for m in metrics)
                if int(stats.get(key, -1)) != s:
                    fail(f"stats.{key}={stats.get(key)} != sum(buckets)={s}")
        report["checks"]["buckets"] = len(bucket_ms)
    if not bucket_ms and not epoch_ms:
        fail("no manifests found")

    # --- termstats vs stats (column-pruned pyarrow read) ------------------
    ts_dir = os.path.join(index_dir, "termstats")
    try:
        import pyarrow.dataset as ds

        tbl = ds.dataset(ts_dir, partitioning="hive").to_table(
            columns=["df", "cf"]
        )
        import pyarrow.compute as pc

        n_postings = int(pc.sum(tbl["df"]).as_py() or 0)
        total_tf = int(pc.sum(tbl["cf"]).as_py() or 0)
        if n_postings != int(stats.get("n_postings", -1)):
            fail(f"termstats df sum {n_postings} != stats {stats.get('n_postings')}")
        if total_tf != int(stats.get("total_tf", -1)):
            fail(f"termstats cf sum {total_tf} != stats {stats.get('total_tf')}")
        report["checks"]["termstats_rows"] = tbl.num_rows
    except Exception as ex:
        fail(f"termstats unreadable: {ex}")

    # --- deep: sample posting blocks --------------------------------------
    if deep:
        try:
            import pyarrow.dataset as ds

            from .codec import decode_varints, delta_decode

            tbl = ds.dataset(
                os.path.join(index_dir, "postings"), partitioning="hive"
            ).head(
                sample_blocks,
                columns=["n", "min_docid", "max_docid", "docids", "tfs"],
            )
            checked = 0
            for i in range(tbl.num_rows):
                n = tbl["n"][i].as_py()
                ids = delta_decode(tbl["docids"][i].as_py()).view("int64")
                tfs = decode_varints(tbl["tfs"][i].as_py())
                if len(ids) != n or len(tfs) != n:
                    fail(f"block {i}: count mismatch ({len(ids)}, {len(tfs)}) != {n}")
                    continue
                if n and (
                    int(ids[0]) != tbl["min_docid"][i].as_py()
                    or int(ids[-1]) != tbl["max_docid"][i].as_py()
                ):
                    fail(f"block {i}: min/max docid mismatch")
                if n and not (ids[1:] > ids[:-1]).all():
                    fail(f"block {i}: docids not strictly increasing")
                checked += 1
            report["checks"]["blocks_sampled"] = checked
        except Exception as ex:
            fail(f"deep block check failed: {ex}")

    return report
