"""One-off A/B: 24M-row crawl at local[8], default vs DISK_ONLY join
caches — validates the heap-spill fix before the 48M ladder rung."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import bench_scaling as bs  # noqa: E402

if not (os.path.isdir(f"{bs.INPUT_DIR}/pages") and
        os.environ.get("AB_REUSE") == "1"):
    bs.prepare_input(24_000_000, 1)
    print("# input ready", flush=True)

for rep in range(2):
    for lvl in [None, "DISK_ONLY"]:
        os.environ.pop("WCS_JOIN_CACHE_STORAGE", None)
        if lvl:
            os.environ["WCS_JOIN_CACHE_STORAGE"] = lvl
        probe = round(bs._cpu_probe(), 3)
        spark = bs._fresh_spark(8)
        r = bs.run_crawl(spark)
        r["storage"] = lvl or "DEFAULT"
        r["rep"] = rep
        r["cpu_probe_s"] = probe
        print(json.dumps(r), flush=True)
        spark.stop()
