#!/usr/bin/env python3
"""Fold the full per-query bench artifact (target/bench.json, written
by graft.Bench) into a driver-recorded BENCH_r{N}.json whose stdout
tail was truncated (the "parsed": null finding): the file artifact is
authoritative — it carries every probe, the complete per-query map and
the outlier re-time triples — while the driver's copy keeps whatever
its stdout window caught.

Usage: python3 scripts/fold_bench.py <BENCH_rN.json> [target/bench.json]

Writes the merged JSON back to <BENCH_rN.json> (keys from the bench
artifact win; driver-side metadata like timestamps is preserved).
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    driver_path = sys.argv[1]
    bench_path = sys.argv[2] if len(sys.argv) > 2 else "target/bench.json"
    with open(bench_path) as f:
        bench = json.load(f)
    try:
        with open(driver_path) as f:
            driver = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        driver = {}
    if not isinstance(driver, dict):
        driver = {"driver_raw": driver}
    # the bench artifact is authoritative for every metric it carries;
    # a stale/truncated "parsed" blob is replaced wholesale
    merged = {k: v for k, v in driver.items() if k != "parsed"}
    merged.update(bench)
    with open(driver_path, "w") as f:
        json.dump(merged, f, indent=1)
    nq = len(bench.get("queries", {}))
    print(f"folded {bench_path} ({nq} queries) into {driver_path}")


if __name__ == "__main__":
    main()
