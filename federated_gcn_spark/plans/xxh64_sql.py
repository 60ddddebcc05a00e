"""Spark-compatible xxhash64 as DuckDB SQL expression text (oracle side).

Every seeded-randomness operator in this repo (MinHash shingles, SimHash,
random walks, fixed-fanout sampling) derives its draws from Spark's
``F.xxhash64`` — a pure function of the row, so results are identical on
any cluster layout.  That same purity means a DuckDB oracle can replay
the draws *exactly*, turning those queries from rows-only checks into
full value-hash checks — IF DuckDB can compute Spark's xxhash64.

DuckDB has no xxhash64, so this module *generates* it as SQL expression
text, mirroring the public Apache Spark implementation
(``org.apache.spark.sql.catalyst.expressions.XXH64``, itself the
canonical XXH64 spec):

- ``hash_int_sql`` / ``hash_long_sql``: the fixed 4-/8-byte paths.
- ``hash_string_sql``: the full byte-stream algorithm (4-lane stripes for
  len >= 32, then 8-byte / 4-byte / 1-byte tails) over the UTF-8 bytes,
  read little-endian exactly like Spark's ``Platform.getLong`` on x86.
- ``xxhash64_sql``: the multi-argument chaining of the ``XxHash64``
  expression — ``hash = 42; for child in children: hash = H(child, hash)``.

Implementation notes:
- All 64-bit values are carried as HUGEINT in [0, 2^64); DuckDB checks
  overflow, so ``mul64`` splits into 32-bit limbs (products stay < 2^97,
  far inside INT128).  xor/shifts are native on HUGEINT.
- SQL has no ``let``, so sub-expressions that would be referenced more
  than once are bound with single-element ``list_transform`` lambdas
  (``list_transform([(v)::HUGEINT], x -> body)[1]``) — the same
  evaluate-once trick the Spark side uses with higher-order functions.
  Text size stays linear in the number of algorithm steps.
- The final value is converted back to Spark's *signed* BIGINT domain
  with ``to_signed64``; ``pmod_sql`` reproduces ``F.pmod`` on it.

Verified bit-for-bit against Spark in tests/test_xxh64_sql.py (random
ints/longs/strings incl. multi-byte UTF-8, lengths 0..100, multi-column
chains).
"""

from __future__ import annotations

import itertools

M64 = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

_counter = itertools.count()


def _v(prefix: str = "x") -> str:
    return f"{prefix}{next(_counter)}"


def _let(val: str, body) -> str:
    """Bind ``val`` (HUGEINT) once; ``body`` is a fn(varname) -> sql."""
    var = _v()
    return f"list_transform([({val})::HUGEINT], {var} -> ({body(var)}))[1]"


def u64(expr: str) -> str:
    """Signed BIGINT/any int expr -> unsigned-64 HUGEINT in [0, 2^64)."""
    return f"((({expr})::HUGEINT % {M64} + {M64}) % {M64})"


def to_signed64(expr: str) -> str:
    """HUGEINT in [0,2^64) -> Spark's signed BIGINT value."""
    return _let(expr, lambda h: f"CASE WHEN {h} >= {1 << 63} THEN ({h} - {M64})::BIGINT ELSE {h}::BIGINT END")


def mul64(a: str, b: int) -> str:
    """(a * const_b) mod 2^64 via 32-bit limbs; a is HUGEINT in range."""
    bl, bh = b % (1 << 32), b >> 32
    return _let(
        a,
        lambda x: f"((((({x} // 4294967296) * {bl} + ({x} % 4294967296) * {bh}) % 4294967296)"
        f" * 4294967296 + ({x} % 4294967296) * {bl}) % {M64})",
    )


def rotl64(x: str, r: int) -> str:
    return _let(x, lambda v: f"(({v} * {1 << r}) % {M64} + {v} // {1 << (64 - r)})")


def xor64(a: str, b: str) -> str:
    return f"xor(({a})::HUGEINT, ({b})::HUGEINT)"


def add64(a: str, b: str) -> str:
    return f"((({a}) + ({b})) % {M64})"


def _fmix(h: str) -> str:
    h = _let(h, lambda v: xor64(v, f"{v} // {1 << 33}"))
    h = mul64(h, P2)
    h = _let(h, lambda v: xor64(v, f"{v} // {1 << 29}"))
    h = mul64(h, P3)
    h = _let(h, lambda v: xor64(v, f"{v} // {1 << 32}"))
    return h


def hash_int_sql(input_expr: str, seed: str) -> str:
    """XXH64.hashInt: 4-byte path. input_expr: any SQL int expression."""
    u32 = f"((({input_expr})::HUGEINT % 4294967296 + 4294967296) % 4294967296)"
    h = add64(seed, str(P5 + 4))
    h = xor64(h, f"((({u32}) * {P1}) % {M64})")  # u32*P1 < 2^96, direct
    h = add64(mul64(rotl64(h, 23), P2), str(P3))
    return _fmix(h)


def hash_long_sql(input_expr: str, seed: str) -> str:
    """XXH64.hashLong: 8-byte path."""
    k1 = mul64(rotl64(mul64(u64(input_expr), P2), 31), P1)
    h = add64(seed, str(P5 + 8))
    h = xor64(h, k1)
    h = add64(mul64(rotl64(h, 27), P1), str(P4))
    return _fmix(h)


def _stripe_lane(acc: str, w: str) -> str:
    """v = rotl31(v + w*P2) * P1 — one lane of the 32-byte stripe loop."""
    return mul64(rotl64(add64(acc, mul64(w, P2)), 31), P1)


def _merge_lane(h: str, v: str) -> str:
    """hash ^= rotl31(v*P2)*P1; hash = hash*P1 + P4."""
    return add64(mul64(xor64(h, mul64(rotl64(mul64(v, P2), 31), P1)), P1), str(P4))


def hash_string_sql(input_expr: str, seed_expr: str) -> str:
    """XXH64 over the UTF-8 bytes of a string expression (Spark
    StringType path: hashUnsafeBytes, words read little-endian).

    The seed is bound once (it may itself be a full chained-hash
    expression when the string is not the first xxhash64 argument)."""
    hv, nv = _v("h"), _v("n")
    seed = _v("s")

    # byte i (0-based) parsed from the hex dump of the UTF-8 blob
    def byte_at(i: str) -> str:
        return (
            f"((strpos('0123456789ABCDEF', {hv}[(2*({i})+1)::BIGINT]) - 1) * 16"
            f" + (strpos('0123456789ABCDEF', {hv}[(2*({i})+2)::BIGINT]) - 1))::HUGEINT"
        )

    def word8_at(off: str) -> str:  # little-endian 8-byte word at byte offset
        terms = " + ".join(f"{byte_at(f'({off})+{b}')} * {1 << (8 * b)}" for b in range(8))
        return f"({terms})"

    def word4_at(off: str) -> str:
        terms = " + ".join(f"{byte_at(f'({off})+{b}')} * {1 << (8 * b)}" for b in range(4))
        return f"({terms})"

    j = _v("j")
    # ---- len >= 32: 4-lane stripes folded via list_reduce ---------------
    acc_var, st_var = _v("acc"), _v("st")
    lanes = ", ".join(
        _stripe_lane(f"{acc_var}[{i + 1}]", f"{st_var}[{i + 1}]") for i in range(4)
    )
    init_lanes = (
        f"[{add64(seed, str((P1 + P2) % M64))}, {add64(seed, str(P2))}, "
        f"(({seed})::HUGEINT), {add64(seed, str(M64 - P1))}]"
    )
    stripes = (
        f"list_transform(range(0, ({nv} // 32)::BIGINT), {j} -> "
        f"[{word8_at(f'32*{j}')}, {word8_at(f'32*{j}+8')}, "
        f"{word8_at(f'32*{j}+16')}, {word8_at(f'32*{j}+24')}])"
    )
    folded = f"list_reduce(list_prepend({init_lanes}, {stripes}), ({acc_var}, {st_var}) -> [{lanes}])"
    fv = _v("f")
    merged_body = rotl64(f"{fv}[1]", 1)
    merged_body = add64(merged_body, rotl64(f"{fv}[2]", 7))
    merged_body = add64(merged_body, rotl64(f"{fv}[3]", 12))
    merged_body = add64(merged_body, rotl64(f"{fv}[4]", 18))
    for i in range(4):
        merged_body = _merge_lane(merged_body, f"{fv}[{i + 1}]")
    merged = f"list_transform([{folded}], {fv} -> ({merged_body}))[1]"

    h_init = (
        f"CASE WHEN {nv} >= 32 THEN {merged} "
        f"ELSE {add64(seed, str(P5))} END"
    )
    h_len = add64(h_init, f"({nv})::HUGEINT")

    # ---- tail: 8-byte words from base = 32*(n//32) ----------------------
    base = f"(32 * ({nv} // 32))"
    acc2, k1v = _v("a"), _v("k")
    w8_list = (
        f"list_transform(range(0, (({nv} - {base}) // 8)::BIGINT), {j} -> "
        f"{word8_at(f'{base} + 8*{j}')})"
    )
    tail8_body = add64(
        mul64(
            rotl64(xor64(acc2, mul64(rotl64(mul64(k1v, P2), 31), P1)), 27), P1
        ),
        str(P4),
    )
    h_w8 = f"list_reduce(list_prepend(({h_len})::HUGEINT, {w8_list}), ({acc2}, {k1v}) -> ({tail8_body}))"

    # ---- tail: one 4-byte word if remaining >= 4 ------------------------
    base4 = f"({base} + 8 * (({nv} - {base}) // 8))"
    hv4 = _v("g")
    b4 = word4_at(base4)
    h4_then = add64(
        mul64(rotl64(xor64(hv4, f"(({b4}) * {P1}) % {M64}"), 23), P2), str(P3)
    )
    h_w4 = (
        f"list_transform([({h_w8})::HUGEINT], {hv4} -> "
        f"(CASE WHEN ({nv} - {base4}) >= 4 THEN {h4_then} ELSE {hv4} END))[1]"
    )

    # ---- tail: single bytes ---------------------------------------------
    base1 = f"(CASE WHEN ({nv} - {base4}) >= 4 THEN {base4} + 4 ELSE {base4} END)"
    acc3, byv = _v("a"), _v("y")
    b1_list = (
        f"list_transform(range(0, ({nv} - {base1})::BIGINT), {j} -> "
        f"{byte_at(f'{base1} + {j}')})"
    )
    tail1_body = mul64(rotl64(xor64(acc3, f"(({byv}) * {P5}) % {M64}"), 11), P1)
    h_b = f"list_reduce(list_prepend(({h_w4})::HUGEINT, {b1_list}), ({acc3}, {byv}) -> ({tail1_body}))"

    full = _fmix(h_b)
    # bind seed, hex dump, and byte length once for the whole expression
    return (
        f"list_transform([({seed_expr})::HUGEINT], {seed} -> "
        f"list_transform([hex(encode({input_expr}))], {hv} -> "
        f"list_transform([octet_length(encode({input_expr}))::HUGEINT], {nv} -> "
        f"({full}))[1])[1])[1]"
    )


def xxhash64_sql(*children: tuple[str, str], seed: int = 42) -> str:
    """Spark ``F.xxhash64(c1, c2, ...)`` as DuckDB SQL, returning the
    *unsigned* HUGEINT hash (wrap with :func:`to_signed64` for the BIGINT
    Spark emits).

    ``children``: (sql_expr, type) pairs with type in {'int','long','string'}
    matching the Spark column types — the chain is
    ``h = seed; for c in children: h = H_type(c, h)``.
    """
    h: str = str(seed)
    for expr, typ in children:
        if typ == "int":
            h = hash_int_sql(expr, h)
        elif typ == "long":
            h = hash_long_sql(expr, h)
        elif typ == "string":
            h = hash_string_sql(expr, h)
        else:
            raise ValueError(f"unsupported xxhash64 child type: {typ}")
    return h


def pmod_sql(unsigned_hash: str, p: int) -> str:
    """``F.pmod(signed_hash, p)`` given the unsigned HUGEINT hash."""
    s = to_signed64(unsigned_hash)
    return f"((({s}) % {p} + {p}) % {p})"
