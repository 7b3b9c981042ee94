#!/usr/bin/env bash
# One-command canonicalization gate: runs BOTH sides of the shared-idiom
# contract — the Scala property laws (Spark column eval == BigDecimal/JVM
# reference) and the DuckDB fuzz harness (DuckDB eval == the same
# reference on random + adversarial inputs). Run each round so the six
# idioms (half-up micro ratios, 1e-6/1e-9 quantization, h60, erfc,
# quantized list transforms, round-to-even boundaries) cannot drift as
# new queries add call sites.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch 'Test/testOnly graft.PropertyLawsSpec'
python3 tools/fuzz_canonical.py
echo "[gate_fuzz] both sides green"
