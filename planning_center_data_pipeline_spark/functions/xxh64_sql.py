"""Spark-compatible XXH64 re-derived in DuckDB SQL.

Spark's `xxhash64` (seed 42) is the engine's native hash — the fast
path for bloom positions, sketch signatures and shard routing.  DuckDB
has no xxhash64, so queries built on it were stuck "rows-only" at the
oracle gate.  This module closes that gap (round-7 VERDICT item 6) by
emitting SQL that reproduces the hash bit-for-bit using HUGEINT
wrap-around arithmetic:

- fixed-width inputs (int/long columns) collapse to a closed-form
  chain (no byte loop) — `long_hash_sql_stages` handles any key;
- string inputs shorter than 32 bytes take XXH64's small path (up to
  three 8-byte lanes, one 4-byte lane, up to three tail bytes) —
  `str_hash_select` unrolls it with CASE-guarded lanes over
  `ord(substr(...))` byte extraction (ASCII only: a multi-byte UTF-8
  char would break the char==byte equivalence, so those tokens yield
  NULL and fail the hash gate loudly instead of silently);
- strings >= 32 bytes would need the 4-accumulator stripe loop (a
  recursive CTE per token) — out of scope; callers guard with NULL.

The Python mirror (`xxh64_bytes`, `hash_int`, `hash_long`) is the
testable reference: tests/test_lifecycle.py pins both against Spark's
own xxhash64 output.

64-bit wrap-around tricks used in the SQL (DuckDB HUGEINT is signed
128-bit, so a raw 64x64 multiply can overflow it):
- mul64(a,b): split a into 32-bit halves; both partial products stay
  under 2^97;
- rotl(x,r): ((x*2^r) mod 2^64) + (x div 2^(64-r)) — the parts occupy
  disjoint bit ranges, so + is |;
- xor / >> work natively on HUGEINT.
"""

from __future__ import annotations

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42
T = "18446744073709551616::HUGEINT"  # 2^64


# --- Python reference (pinned against Spark in tests) -----------------------

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    return h ^ (h >> 32)


def hash_int(i: int, seed: int = SEED) -> int:
    """XXH64 of a 4-byte int, as Spark's XxHash64 does for IntegerType."""
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def hash_long(v: int, seed: int = SEED) -> int:
    """XXH64 of an 8-byte long, as Spark's XxHash64 does for LongType."""
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((v & M64) * P2 & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int = SEED) -> int:
    """Full XXH64 over a byte string (stripes included), matching
    Spark's xxhash64 on StringType columns."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            vs = []
            for j, v in enumerate((v1, v2, v3, v4)):
                w = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                vs.append((_rotl((v + w * P2) & M64, 31) * P1) & M64)
            v1, v2, v3, v4 = vs
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        w = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((w * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        w = int.from_bytes(data[i : i + 4], "little")
        h ^= (w * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    return _fmix(h)


def to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# --- SQL emitters ------------------------------------------------------------

def mul64(a: str, b: int) -> str:
    """(a*b) mod 2^64; `a` is a (short) SQL expression in [0, 2^64),
    `b` a constant.  Split keeps partial products under 2^97."""
    return (
        f"(((({a}) % 4294967296) * {b}::HUGEINT + "
        f"(((({a}) // 4294967296) * {b}::HUGEINT) % 4294967296) "
        f"* 4294967296) % {T})"
    )


def rotl_sql(x: str, r: int) -> str:
    return (
        f"((({x}) * {1 << r}::HUGEINT) % {T} "
        f"+ (({x}) // {1 << (64 - r)}::HUGEINT))"
    )


def fmix_select(h: str) -> list[str]:
    """Lateral-alias stages computing fmix of column `h` into `hu`."""
    return [
        f"xor({h}, ({h} >> 33)) AS fx1",
        f"{mul64('fx1', P2)} AS fx2",
        "xor(fx2, (fx2 >> 29)) AS fx3",
        f"{mul64('fx3', P3)} AS fx4",
        "xor(fx4, (fx4 >> 32)) AS hu",
    ]


def str_hash_ctes(vocab_cte: str, tok: str = "tok") -> str:
    """CTE-definition fragment computing `vh(tok, hu)` where `hu` is
    unsigned XXH64(utf8(tok), 42) for ASCII tokens under 32 bytes,
    NULL otherwise.  `vocab_cte` must expose one row per distinct
    token.  Splice into a WITH list after that CTE:

        WITH vocab AS (...), {str_hash_ctes('vocab')}, ...

    Every stage is a MATERIALIZED CTE on purpose: DuckDB inlines both
    plain CTEs and lateral column aliases at bind time, and this chain
    references each prior hash state ~7 times per step — inlined, the
    expression tree grows 7^stages (gigabytes); materialized, each
    stage binds against real columns and stays flat."""

    def le_word(pos_expr: str, width: int) -> str:
        # BIGINT cast per byte: a non-ASCII code point (>127) times
        # 256^3 would overflow INT32 before the final ASCII guard can
        # NULL the row out
        terms = " + ".join(
            f"CAST(ord(substr({tok}, ({pos_expr}) + {j}, 1)) AS BIGINT)"
            f" * {256 ** j}"
            for j in range(width)
        )
        return f"CAST({terms} AS HUGEINT)"

    tail_base = "((n // 8) * 8 + CASE WHEN (n % 8) >= 4 THEN 4 ELSE 0 END)"
    # stage 0: length, lane words, tail bytes, initial state
    word_cols = ",\n    ".join(
        [
            f"CASE WHEN n >= {8 * lane} THEN "
            f"{le_word(str(8 * (lane - 1) + 1), 8)} END AS w{lane}"
            for lane in (1, 2, 3)
        ]
        + [
            f"CASE WHEN (n % 8) >= 4 THEN "
            f"{le_word('(n // 8) * 8 + 1', 4)} END AS w4"
        ]
        + [
            f"CASE WHEN (n % 4) >= {j} THEN CAST(ord(substr({tok}, "
            f"{tail_base} + {j}, 1)) AS HUGEINT) END AS c{j}"
            for j in (1, 2, 3)
        ]
        + [f"({(SEED + P5) & M64}::HUGEINT + n) % {T} AS h0"]
    )
    ctes = [
        f"xh0 AS MATERIALIZED (\n"
        f"  SELECT {tok}, n,\n    {word_cols}\n"
        f"  FROM (SELECT {tok}, length({tok}) AS n FROM {vocab_cte})\n)"
    ]
    carry = ["w2", "w3", "w4", "c1", "c2", "c3"]
    prev_cte, prev_h = "xh0", "h0"
    # 8-byte lanes: h ^= rotl31(w*P2)*P1 ; h = rotl27(h)*P1 + P4
    for lane in (1, 2, 3):
        k = mul64(rotl_sql(mul64(f"w{lane}", P2), 31), P1)
        step = (
            f"({mul64(rotl_sql(f'xor({prev_h}, k{lane})', 27), P1)} "
            f"+ {P4}::HUGEINT) % {T}"
        )
        cols = ", ".join(c for c in carry if c != f"w{lane}")
        ctes.append(
            f"xhl{lane} AS MATERIALIZED (\n"
            f"  SELECT {tok}, n, {cols},\n"
            f"    CASE WHEN n >= {8 * lane} THEN {step} ELSE {prev_h} END AS h{lane}\n"
            f"  FROM (SELECT *, CASE WHEN n >= {8 * lane} THEN {k} END AS k{lane}"
            f" FROM {prev_cte})\n)"
        )
        carry = [c for c in carry if c != f"w{lane}"]
        prev_cte, prev_h = f"xhl{lane}", f"h{lane}"
    # 4-byte lane: h ^= w4*P1 ; h = rotl23(h)*P2 + P3
    step4 = (
        f"({mul64(rotl_sql(f'xor({prev_h}, k4)', 23), P2)} "
        f"+ {P3}::HUGEINT) % {T}"
    )
    ctes.append(
        f"xh4 AS MATERIALIZED (\n"
        f"  SELECT {tok}, n, c1, c2, c3,\n"
        f"    CASE WHEN (n % 8) >= 4 THEN {step4} ELSE {prev_h} END AS hb0\n"
        f"  FROM (SELECT *, CASE WHEN (n % 8) >= 4 THEN {mul64('w4', P1)} END"
        f" AS k4 FROM {prev_cte})\n)"
    )
    prev_cte, prev_h = "xh4", "hb0"
    carry = ["c1", "c2", "c3"]
    # tail bytes: h ^= b*P5 ; h = rotl11(h)*P1
    for j in (1, 2, 3):
        stepb = mul64(rotl_sql(f"xor({prev_h}, kb{j})", 11), P1)
        carry = [c for c in carry if c != f"c{j}"]
        cols = (", " + ", ".join(carry)) if carry else ""
        ctes.append(
            f"xhb{j} AS MATERIALIZED (\n"
            f"  SELECT {tok}, n{cols},\n"
            f"    CASE WHEN (n % 4) >= {j} THEN {stepb} ELSE {prev_h} END AS hb{j}\n"
            f"  FROM (SELECT *, CASE WHEN (n % 4) >= {j} THEN {mul64(f'c{j}', P5)} END"
            f" AS kb{j} FROM {prev_cte})\n)"
        )
        prev_cte, prev_h = f"xhb{j}", f"hb{j}"
    # fmix + guards
    fm = ",\n    ".join(fmix_select(prev_h))
    ctes.append(
        f"vh AS MATERIALIZED (\n"
        f"  SELECT {tok},\n"
        rf"    CASE WHEN n < 32 AND {tok} ~ '^[\x01-\x7f]*$' THEN hu END AS hu"
        f"\n  FROM (SELECT {tok}, n,\n    {fm}\n  FROM {prev_cte})\n)"
    )
    return ",\n".join(ctes)
