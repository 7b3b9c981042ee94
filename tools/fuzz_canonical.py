#!/usr/bin/env python3
"""DuckDB-side fuzz of the cross-engine canonicalization idioms.

The repo's oracle discipline evaluates the SAME arithmetic on both
engines: half-up micro ratios via integer `(a*U*2 + b) // (b*2)`,
1e-6/1e-9 quantization via `round(x * U)`, the md5-prefix h60 hash, the
A&S 7.1.26 erfc chain, and quantized list transforms. The Scala side is
pinned by `PropertyLawsSpec` (Spark column eval == BigDecimal/JVM
reference). This tool pins the DUCKDB side of each idiom against the
same reference on random inputs INCLUDING the adversarial values the
advisor called out: -0.0, exact half boundaries, and 17-digit doubles.

Run: python3 tools/fuzz_canonical.py  (exit 0 = all idioms agree)
Dev tool only — the shipped Scala library does not depend on it.
"""
import hashlib
import math
import random
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb

random.seed(20260815)
con = duckdb.connect()
failures = []


def check(name, cases, sql_fn, ref_fn):
    """cases: list of tuples; sql_fn(case)->(sql, params?) returning one
    value; ref_fn(case)->expected."""
    bad = 0
    for c in cases:
        got = con.sql(sql_fn(c)).fetchone()[0]
        want = ref_fn(c)
        if got != want:
            bad += 1
            if bad <= 3:
                print(f"  MISMATCH {name} case={c!r} duckdb={got!r} ref={want!r}")
    status = "ok" if bad == 0 else f"{bad}/{len(cases)} MISMATCHES"
    print(f"[fuzz] {name}: {status}")
    if bad:
        failures.append(name)


# 1. half-up micro ratio: (a*1e6*2 + b) // (b*2) == BigDecimal(a/b, 6, HALF_UP) scaled
cases = [(random.randint(0, 4_000_000_000), random.randint(1, 4_000_000))
         for _ in range(300)]
cases += [(1, 2), (3, 2), (5, 2), (1, 2_000_000), (3, 2_000_000)]  # exact halves at 6dp
check(
    "half-up micro ratio //",
    cases,
    lambda c: f"SELECT ({c[0]}::HUGEINT * 1000000 * 2 + {c[1]}) // ({c[1]}::HUGEINT * 2)",
    lambda c: int((Decimal(c[0]) / Decimal(c[1])).quantize(Decimal("0.000001"),
                                                           ROUND_HALF_UP) * 1_000_000))

# 2. h60: CAST(('0x' || substr(md5(s),1,15)) AS BIGINT) == python md5 prefix
strs = ["", " ", "a", "-0.0", "it's", "éléphant", "the quick brown fox"] + [
    "".join(random.choice("abc XYZ0189_.,'") for _ in range(random.randint(1, 40)))
    for _ in range(200)]
check(
    "h60 md5-prefix hash",
    strs,
    lambda s: "SELECT CAST(('0x' || substr(md5('" + s.replace("'", "''")
              + "'),1,15)) AS BIGINT)",
    lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16))

# 3. round(x*1e9) quantization on doubles incl. -0.0, halves, 17-digit values
dbl = [-0.0, 0.0, 0.5e-9, -0.5e-9, 1.5e-9, 2.5e-9, -1.5e-9,
       0.1234567890123456, -0.9999999999999999, 1.7976931348623157,
       123456789.12345678] + [random.uniform(-10, 10) for _ in range(300)]


check(
    "round(x*1e9) quantization",
    dbl,
    lambda x: f"SELECT CAST(round({x!r} * 1e9) AS BIGINT)",
    # DuckDB rounds x*1e9 (a double product) half-away-from-zero; the
    # reference mirrors that product's binary value
    lambda x: int(Decimal(x * 1e9).quantize(Decimal("1"), ROUND_HALF_UP)))

# 4. A&S 7.1.26 erfc chain on micro-quantized z == python float chain
zs = [i / 1e6 for i in
      [0, 1, 500000, 1000000, 1234567, 1959964, 2575829, 3890592]] + [
      random.randint(0, 5_000_000) / 1e6 for _ in range(200)]


def as_chain(z):
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return int(Decimal(poly * math.exp(-(z * z)) * 1e9)
               .quantize(Decimal("1"), ROUND_HALF_UP))


check(
    "A&S 7.1.26 erfc chain (1e-9 quantized)",
    zs,
    lambda z: f"""SELECT CAST(round(((((1.061405429 * tt - 1.453152027) * tt
                    + 1.421413741) * tt - 0.284496736) * tt
                    + 0.254829592) * tt * exp(-({z!r} * {z!r})) * 1e9) AS BIGINT)
                  FROM (SELECT 1.0 / (1.0 + 0.3275911 * {z!r}) AS tt)""",
    as_chain)

# 5. ln-ratio 1e-9 quantization: round(ln(a/b)*1e9) == python math.log
ab = [(random.randint(1, 10**9), random.randint(1, 10**9)) for _ in range(300)]
check(
    "round(ln(a/b)*1e9)",
    ab,
    lambda c: f"SELECT CAST(round(ln({c[0]}::DOUBLE / {c[1]}) * 1e9) AS BIGINT)",
    lambda c: int(Decimal(math.log(c[0] / c[1]) * 1e9)
                  .quantize(Decimal("1"), ROUND_HALF_UP)))

# 6. quantized list transform: list_transform(v, x -> round(x*1000)) on floats
vecs = [[-0.0, 0.0005, -0.0005, 0.0015, 1.5, -2.5]] + [
    [random.uniform(-1, 1) for _ in range(8)] for _ in range(100)]


def ref_q(v):
    # float32 -> float64 exact; DuckDB round = half away from zero
    import struct
    out = []
    for x in v:
        x32 = struct.unpack("f", struct.pack("f", x))[0]
        out.append(int(Decimal(x32 * 1000).quantize(Decimal("1"), ROUND_HALF_UP)))
    return out


check(
    "list_transform round(x*1000) on FLOAT[]",
    vecs,
    lambda v: ("SELECT list_transform(CAST(" +
               "[" + ",".join(f"{x!r}::FLOAT" for x in v) + "]" +
               " AS DOUBLE[]), x -> CAST(round(x * 1000) AS BIGINT))"),
    ref_q)

print(f"[fuzz] {'ALL OK' if not failures else 'FAILED: ' + ', '.join(failures)}")
sys.exit(1 if failures else 0)
