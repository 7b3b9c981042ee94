#!/usr/bin/env python3
"""Extract and split the [soak] rows from a SoakBench sbt log into the
two committed artifacts: the full sweep leg and the rate-cap leg.

The rate-cap leg is the ingest-contract harness rows (rate_cap_ingest,
stream_rate_cap_state, hotkey_guard) plus every capped re-run row
(*_on_rate_capped_ingest); everything else — query rows, TOTAL,
skew_probe* — is the sweep leg. Row order within each leg is run order.

Usage: python3 tools/split_soak_log.py <sbt_log> <sweep.jsonl> <ratecap.jsonl>
"""
import json
import re
import sys

CAP_NAMES = {"rate_cap_ingest", "stream_rate_cap_state", "hotkey_guard"}
CAP_SUFFIX = "_on_rate_capped_ingest"


def main():
    log, sweep_out, cap_out = sys.argv[1], sys.argv[2], sys.argv[3]
    sweep, cap = [], []
    for line in open(log):
        m = re.search(r"\[soak\] (\{.*\})\s*$", line)
        if not m:
            continue
        row = json.loads(m.group(1))
        q = row.get("q", "")
        (cap if q in CAP_NAMES or q.endswith(CAP_SUFFIX) else sweep).append(row)
    for path, rows in ((sweep_out, sweep), (cap_out, cap)):
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r, separators=(",", ":")) + "\n")
        print(f"wrote {len(rows)} rows to {path}")
    if not cap:
        print("WARNING: no rate-cap rows found — partial or failed sweep?")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
