"""Scaling-efficiency evidence: run the identical index-build job at
two parallelism levels (local[N] vs local[4N]) on the same input and
report throughput at both plus efficiency = (thr_4N / thr_N) / 4.

This sandboxes the north rule's N -> 4N executor criterion (no real
cluster available here); the job itself is spark-submit-compatible
(pure DataFrame + Arrow UDFs, no driver-side loops over data).

Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, synth_docs: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SYNTH_DOCS=str(synth_docs),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_PARTS="web",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n = int(os.environ.get("SCALING_BASE_CPUS", "2"))
    synth_docs = int(os.environ.get("SCALING_SYNTH_DOCS", "800000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    res_n = run_once(n, synth_docs, sf_dir)
    res_4n = run_once(4 * n, synth_docs, sf_dir)

    thr_n = res_n["extras"]["webcorpus_docs_per_sec"]
    thr_4n = res_4n["extras"]["webcorpus_docs_per_sec"]
    eff = (thr_4n / thr_n) / 4.0

    qlat_n = {k: v for k, v in res_n["queries"].items() if k.startswith("q_")}
    qlat_4n = {k: v for k, v in res_4n["queries"].items() if k.startswith("q_")}

    summary = {
        "synth_docs": synth_docs,
        "cpus_n": n,
        "cpus_4n": 4 * n,
        "docs_per_sec_n": thr_n,
        "docs_per_sec_4n": thr_4n,
        "scaling_efficiency": round(eff, 3),
        "build_sec_n": res_n["queries"]["index_build_webcorpus"],
        "build_sec_4n": res_4n["queries"]["index_build_webcorpus"],
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE - measured numbers (this engine)

The reference publishes no benchmark numbers (see /root/repo/BASELINE.md),
so these are the engine's own measured targets of record.

## Index-build scaling (north rule: efficiency >= 0.8 going N -> 4N)

Same job, same input ({synth_docs} synthetic Common-Crawl-style docs,
seed=42), two parallelism levels on identical hardware:

| parallelism | build seconds | docs/sec |
|---|---|---|
| local[{n}] | {summary['build_sec_n']} | {thr_n} |
| local[{4*n}] | {summary['build_sec_4n']} | {thr_4n} |

**Scaling efficiency = (thr_{4*n}/thr_{n}) / 4 = {summary['scaling_efficiency']}**

## Query latency (seconds, BM25 top-10, index at {synth_docs} docs)

| query | local[{n}] | local[{4*n}] |
|---|---|---|
"""
        )
        for k in sorted(qlat_n):
            f.write(f"| {k} | {qlat_n[k]} | {qlat_4n.get(k, '-')} |\n")
        f.write(
            f"""
## Full bench JSON

local[{n}]: `{json.dumps(res_n)}`

local[{4*n}]: `{json.dumps(res_4n)}`
"""
        )


if __name__ == "__main__":
    main()
