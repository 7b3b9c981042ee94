#!/usr/bin/env python3
"""Close-bench assertion (r13 verdict #1): refuse a partial bench_full.json.

In r13 a 3-query SPARK_GRAFT_ONLY iteration overwrote the committed
full quiet-box close, making the round's uptick triage unverifiable.
graft.Bench now writes filtered runs to bench_partial.json by default;
this check is the second lock: run it before committing bench_full.json.

Usage: tools/check_bench_full.py <expected_query_count> [bench_full.json]
Exit 0 iff the artifact carries exactly the expected per-query walls and
zero failed queries.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: check_bench_full.py <expected_query_count> [path]")
        return 2
    expected = int(sys.argv[1])
    path = sys.argv[2] if len(sys.argv) > 2 else "bench_full.json"
    with open(path) as f:
        d = json.load(f)
    if not isinstance(d, dict):
        print(f"[check_bench_full] {path}: not a JSON object -> REFUSE")
        return 1
    n = len(d.get("queries") or {})
    failed = d.get("failed") or []
    total = d.get("value")
    total_s = f"{total:.1f}s" if isinstance(total, (int, float)) else "missing"
    ok = n == expected and not failed and total is not None
    print(f"[check_bench_full] {path}: {n} queries (expected {expected}), "
          f"{len(failed)} failed, total {total_s} -> "
          f"{'OK' if ok else 'REFUSE'}")
    if failed:
        print(f"[check_bench_full] failed: {failed}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
