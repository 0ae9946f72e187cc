"""REST stage audit of the politeness-capped skew crawl's tail waves.

Round-5 bench recorded `skew_wave_secs_capped` ending 5.7 → 11.6 →
26.3 → 238.6 s — the last wave ~100× the median while per-host rows
stayed capped at 2000 (BENCH_FULL.json). This reproduces the run with
the Spark UI enabled and dumps every completed stage (callsite name,
submission time, duration, task count, shuffle/input volume) so the
superlinear component can be NAMED, the same way the round-4 audit
found the crawl-scaling bottlenecks.

    PYTHONPATH=/root/repo python tools/skew_audit.py [n_biz] [cap]

Writes /tmp/skew_audit_stages.json and prints the top stages by
duration plus a per-callsite aggregate.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_biz = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import bench
    from go_scrapper_spark.session import get_spark

    spark = get_spark(
        app_name="skew-audit",
        extra_conf={"spark.ui.enabled": "true"},
    )
    t0 = time.time()
    r = bench.crawl_bench(spark, n_biz, max_parallel=cap,
                          skew_head_frac=0.5, host_wave_stats=True)
    print(json.dumps({k: v for k, v in r.items()
                      if k not in ("wave_secs", "wave_phases")}))
    print("wave_secs:", [round(w, 2) for w in r["wave_secs"]])
    print("\n== per-wave driver phase breakdown ==")
    for i, ph in enumerate(r.get("wave_phases", [])):
        print(f"wave {i + 1:3d} ({r['wave_secs'][i]:7.2f}s): "
              + " ".join(f"{k}={v}" for k, v in ph.items()))

    # wave start offsets (relative seconds from crawl t0) — stage
    # submission timestamps bucket into waves by these boundaries
    bounds = [0.0]
    for w in r["wave_secs"]:
        bounds.append(bounds[-1] + w)

    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{base}/applications/{app_id}/stages?status=COMPLETE"))

    # The crawl's own t0 is inside crawl_bench; approximate with the
    # first stage submitted after our t0 minus a small slack. Stage
    # submissionTime is ISO "2026-08-17T23:00:00.000GMT".
    def ts(s):
        return time.mktime(time.strptime(
            s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")) - time.timezone

    rows = []
    for st in stages:
        sub = ts(st["submissionTime"])
        rows.append({
            "stage": st["stageId"],
            "name": st["name"],
            "t_rel": round(sub - t0, 1),
            "dur_s": round((ts(st["completionTime"]) - sub), 2),
            "tasks": st["numCompleteTasks"],
            "input_mb": round(st["inputBytes"] / 1e6, 1),
            "sh_read_mb": round(st["shuffleReadBytes"] / 1e6, 1),
            "sh_write_mb": round(st["shuffleWriteBytes"] / 1e6, 1),
            "exec_run_s": round(st["executorRunTime"] / 1e3, 1),
        })
    rows.sort(key=lambda x: -x["dur_s"])
    with open("/tmp/skew_audit_stages.json", "w") as f:
        json.dump({"wave_secs": r["wave_secs"], "stages": rows}, f, indent=1)

    print("\n== top 25 stages by duration ==")
    for x in rows[:25]:
        print(f"{x['dur_s']:8.2f}s t+{x['t_rel']:7.1f} tasks={x['tasks']:4d} "
              f"in={x['input_mb']:8.1f}MB shR={x['sh_read_mb']:7.1f} "
              f"shW={x['sh_write_mb']:7.1f} exec={x['exec_run_s']:8.1f}s "
              f"{x['name'][:70]}")

    agg: dict = {}
    for x in rows:
        key = x["name"].split("+details")[0].strip()
        a = agg.setdefault(key, {"n": 0, "dur": 0.0, "exec": 0.0})
        a["n"] += 1
        a["dur"] += x["dur_s"]
        a["exec"] += x["exec_run_s"]
    print("\n== per-callsite totals (top 15 by total duration) ==")
    for k, a in sorted(agg.items(), key=lambda kv: -kv[1]["dur"])[:15]:
        print(f"{a['dur']:9.1f}s over {a['n']:4d} stages exec={a['exec']:9.1f}s  {k[:70]}")

    spark.stop()


if __name__ == "__main__":
    main()
