"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N→4N-executor comparison is impossible in this sandbox, so per
the driver instruction we run the SAME job at local[8] and local[32]
on the SAME input and report throughput at both plus scaling
efficiency = (T_32 / T_8) / 4.

Runs bench.py in subprocesses (a JVM can't change core count in
flight) with oracle queries skipped (the crawl + extract headline is
the scaling subject), then rewrites the measured table in BASELINE.md
and drops BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cores: int, n_biz: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        BENCH_N_BIZ=str(n_biz),
        BENCH_SKIP_QUERIES="1",
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n_biz = int(os.environ.get("BENCH_N_BIZ", "12000"))
    r8 = run_at(8, n_biz)
    r32 = run_at(32, n_biz)
    crawl_eff = r32["crawl_pages_per_sec"] / r8["crawl_pages_per_sec"] / 4
    ext_eff = r32["extract_pages_per_sec"] / r8["extract_pages_per_sec"] / 4
    result = {
        "n_biz": n_biz,
        "n_pages": r32["n_pages_table"],
        "crawl_pages_per_sec_8": r8["crawl_pages_per_sec"],
        "crawl_pages_per_sec_32": r32["crawl_pages_per_sec"],
        "crawl_scaling_efficiency_8_to_32": round(crawl_eff, 3),
        "extract_pages_per_sec_8": r8["extract_pages_per_sec"],
        "extract_pages_per_sec_32": r32["extract_pages_per_sec"],
        "extract_scaling_efficiency_8_to_32": round(ext_eff, 3),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)

    md = open(os.path.join(REPO, "BASELINE.md")).read()
    table = f"""
| Run | Input | Parallelism | Pages fetched+extracted/sec | Scaling efficiency |
|---|---|---|---|---|
| crawl e2e | synthetic pages seed=42, {result['n_pages']} pages | local[8] | {result['crawl_pages_per_sec_8']} | — |
| crawl e2e | same input | local[32] | {result['crawl_pages_per_sec_32']} | {result['crawl_scaling_efficiency_8_to_32']} (target ≥ 0.8 of 4× ideal) |
| extract stage | same input | local[8] | {result['extract_pages_per_sec_8']} | — |
| extract stage | same input | local[32] | {result['extract_pages_per_sec_32']} | {result['extract_scaling_efficiency_8_to_32']} |
"""
    md = re.sub(
        r"\n\| Run \| Input \|.*$", table, md, flags=re.DOTALL
    )
    open(os.path.join(REPO, "BASELINE.md"), "w").write(md)


if __name__ == "__main__":
    main()
