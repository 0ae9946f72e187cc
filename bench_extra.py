"""Round-7 optimization measurement harness (bench.py is FROZEN; this
file holds the extra isolation benchmarks the optimization guide §1
prescribes).

Usage:
  PYTHONPATH=/root/repo python bench_extra.py [--sf DIR] [--samples N]
      [--mode count|noop] [--plans-dir plans/r07] [--suffix before]
      [query ...]

For each named oracle query (default: the round's target list) this
- runs it ``--samples`` times with the bench.py methodology
  (``.count()``) or the guide §1.4 noop sink, reports every sample and
  the min (min = least-stolen sample on this steal-prone box),
- captures ``.explain('formatted')`` to ``<plans-dir>/<q>_<suffix>.txt``.

Prints one JSON line {query: {"samples": [...], "min": s}, ...}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "sim_lsh_neighbors", "sim_ivf_topk", "decontaminate",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "emb_near_dup",
    "text_tfidf_topk", "s9_robots_policy", "extract_main_content",
    "dedup_paragraph", "dedup_clusters", "text_quality", "lang_suite",
    "sim_topk_dot", "dedup_simhash", "host_template_strip",
    "dedup_substring", "f4_prefix_truncate", "g1_pagination_fanout",
    "j4_fetch_join", "j3_seen_antijoin", "w3_topk_per_group",
    "sessionize_events", "sample_stratified", "link_rank",
    "sitemap_seeds", "emb_quantize_int8", "text_pii_scrub",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--mode", choices=("count", "noop"), default="count")
    ap.add_argument("--plans-dir", default=None,
                    help="capture explain('formatted') per query here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    from go_scrapper_spark import oracle_queries as oq
    from go_scrapper_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=args.cores,
                      shuffle_partitions=64)
    names = args.queries or DEFAULT_QUERIES
    out: dict = {}
    for name in names:
        fn = oq.QUERIES[name][0]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(
                    args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for _ in range(args.samples):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            # time fn() + action, matching bench.py's frozen methodology
            # (iterative operators run eager checkpoints inside fn())
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"samples": samples, "min": min(samples)}
        print(f"# {name}: min={min(samples)} samples={samples}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
