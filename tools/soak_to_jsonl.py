#!/usr/bin/env python3
"""Extract the [soak] JSON rows from a SoakBench sbt log into a .jsonl
artifact (one canonical row per line, in run order).

Usage: python3 tools/soak_to_jsonl.py <sbt_log> <out.jsonl>
"""
import json
import re
import sys


def main():
    log, out = sys.argv[1], sys.argv[2]
    n = 0
    with open(out, "w") as f:
        for line in open(log):
            m = re.search(r"\[soak\] (\{.*\})\s*$", line)
            if m:
                row = json.loads(m.group(1))  # validate
                f.write(json.dumps(row, separators=(",", ":")) + "\n")
                n += 1
    print(f"wrote {n} rows to {out}")


if __name__ == "__main__":
    main()
