"""Portable Column-expression builders.

Every function here returns a *SQL expression string* in either the
Spark or DuckDB dialect, so each pipeline operator can be computed
bit-identically by both engines (the driver's correctness oracle runs
DuckDB on the same parquet). The shared primitive is a 60-bit hash
derived from md5 — md5 is identical everywhere, and 15 hex digits fit a
signed BIGINT in both engines. No Python UDFs anywhere.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# portable 60-bit hash
# ---------------------------------------------------------------------------


def phash60(expr: str, dialect: str) -> str:
    """Deterministic 60-bit hash of a string expression, identical in
    Spark and DuckDB."""
    if dialect == "spark":
        return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def exact_money_sum(expr: str, scale: int = 4) -> str:
    """Cross-engine bit-identical ``round(sum(expr), 2)`` for fixed-point
    monetary expressions.

    ``expr`` must be an exact decimal with ≤ ``scale`` fractional digits
    (e.g. price(2dp) × discount-factor(2dp) → 4dp). A plain double sum is
    summation-order-dependent, and since the true sum has > 2 decimals it
    lands exactly on the ``.xx5`` rounding boundary ~1% of the time —
    where Spark and DuckDB then disagree. Scaling each term to an integer
    makes the sum exact and order-independent in BOTH engines; the final
    two divisions recover a 2-decimal value deterministically. The same
    SQL text is valid in Spark and DuckDB.
    """
    m = 10 ** scale
    return (
        f"round(cast(sum(cast(round(({expr}) * {m}, 0) as decimal(38,0)))"
        f" as double) / {m // 100}.0, 0) / 100.0"
    )


def tokens_ws(expr: str, dialect: str) -> str:
    """Whitespace tokenization (documents.text is space-separated)."""
    if dialect == "spark":
        return f"split(trim({expr}), '\\\\s+')"
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbol
BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]"
BPE_RE_DUCK = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def tokens_bpe_count(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size(regexp_extract_all({expr}, '{BPE_RE}', 0))"
    return f"len(regexp_extract_all({expr}, '{BPE_RE_DUCK}'))"


def word_shingles(expr: str, n: int, dialect: str) -> str:
    """Distinct word n-gram shingles of a text column (joined by
    spaces). Built from the token array with higher-order functions —
    no UDF, vectorizable in both engines.

    The token array is let-bound (1-element transform) so the split
    runs ONCE per row; inlining it in the lambda body would re-split
    per shingle index — O(tokens²) per document."""
    toks = tokens_ws(expr, dialect)
    if dialect == "spark":
        body = (
            f"array_distinct(transform("
            f"sequence(1, greatest(size(tk) - {n - 1}, 1)),"
            f" i -> concat_ws(' ', slice(tk, i, {n}))))"
        )
        return f"transform(array({toks}), tk -> {body})[0]"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1),"
        f" i -> array_to_string({toks}[i:i+{n - 1}], ' ')))"
    )


_MH_MOD = 2305843009213693951  # 2^61 - 1 (Mersenne prime)


def _mh_consts(k: int) -> list:
    """Deterministic affine-permutation constants (< 2^30 so every
    product stays below 2^60 — identical overflow-free arithmetic in
    both engines)."""
    out, seed = [], 123456789
    for _ in range(k):
        row = []
        for _ in range(3):
            seed = (1103515245 * seed + 12345) % (1 << 30)
            row.append(seed | 1)
        out.append(row)
    return out


def minhash_sig(shingles: str, k: int, dialect: str) -> str:
    """MinHash signature: ONE md5 per shingle, then k affine
    permutations of the 60-bit value (split into two 30-bit halves so
    products never overflow BIGINT). min per permutation. Returns
    array<bigint>[k].

    This is the 100-TB-relevant formulation: hashing cost is O(shingles),
    not O(shingles × k)."""
    consts = _mh_consts(k)
    if dialect == "spark":
        hs = f"transform({shingles}, s -> {phash60('s', 'spark')})"
        mins = ", ".join(
            f"aggregate(hh, cast(9223372036854775807 as bigint), (acc, h) -> "
            f"least(acc, ({a}L * (h % 1073741824) + {b}L * (h div 1073741824)"
            f" + {c}L) % {_MH_MOD}L))"
            for a, b, c in consts
        )
        # bind the hashed-shingle array once via a 1-element transform
        # (lambda-scoped let), so md5 runs once per shingle
        return f"transform(array({hs}), hh -> array({mins}))[0]"
    hs = f"list_transform({shingles}, s -> {phash60('s', 'duckdb')})"
    mins = ", ".join(
        f"list_min(list_transform(hh, h -> ({a} * (h % 1073741824)"
        f" + {b} * (h // 1073741824) + {c}) % {_MH_MOD}))"
        for a, b, c in consts
    )
    return (
        f"list_transform([{hs}], hh -> [{mins}])[1]"
    )


def band_sig(sig: str, band: int, r: int, dialect: str) -> str:
    """LSH band signature: hash of the band'th slice of r minhashes."""
    lo = band * r + 1
    if dialect == "spark":
        return f"md5(concat_ws(',', slice({sig}, {lo}, {r})))"
    return f"md5(array_to_string({sig}[{lo}:{lo + r - 1}], ','))"


def simhash_bits(toks: str, nbits: int, dialect: str) -> str:
    """``nbits``-bit SimHash over a token array: per bit position,
    majority vote of token-hash bits. Tokens are hashed ONCE (md5 is
    the expensive part); the bit-majorities run over the cached hash
    array. nbits ≤ 60 (phash60's entropy)."""
    assert nbits <= 60
    h = phash60("t", dialect)
    if dialect == "spark":
        hs = f"transform({toks}, t -> {h})"
        body = (
            f"aggregate(sequence(0, {nbits - 1}), cast(0 as bigint), (acc, i) -> "
            f"acc + if(aggregate(hh, cast(0 as bigint), (c, v) -> "
            f"c + if(shiftright(v, i) % 2 = 1, 1, -1)) > 0, shiftleft(cast(1 as bigint), i), 0))"
        )
        return f"transform(array({hs}), hh -> {body})[0]"
    hs = f"list_transform({toks}, t -> {h})"
    body = (
        f"list_sum(list_transform(range(0, {nbits}), i -> "
        f"CASE WHEN list_sum(list_transform(hh, v -> "
        f"CASE WHEN (v >> i) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN (1::BIGINT << i) ELSE 0 END))::BIGINT"
    )
    return f"list_transform([{hs}], hh -> {body})[1]"


def simhash32(toks: str, dialect: str) -> str:
    return simhash_bits(toks, 32, dialect)


def sqnorm_expr(a: str, dialect: str, dim: int | None = None) -> str:
    """Squared L2 norm as ``dot_expr(a, a)`` — the SAME fold text (and
    the same guarded unrolled form when ``dim`` is given), so
    ``sqrt(sqnorm_expr(a))`` is bit-identical to the norm factor inside
    :func:`cosine_sim`."""
    return dot_expr(a, a, dialect, dim)


def cosine_from_norms(
    a: str, b: str, nn_a: str, nn_b: str, dim: int | None = None
) -> str:
    """Cosine similarity given PRECOMPUTED squared norms (spark
    dialect): ``dot(a,b) / nullif(sqrt(nn_a) * sqrt(nn_b), 0.0)``.

    Bit-identical to :func:`cosine_sim`: the dot is the same fold (or
    the same guarded unrolled chain), and cosine_sim's denominator is
    literally ``sqrt(Σv²) * sqrt(Σv²)`` of the two per-side folds —
    precomputing Σv² per ROW (instead of per PAIR) changes where the
    norm is evaluated, not one IEEE operation in it.  This is the
    optimization-r12 pattern for the pair-stage operators: per-pair
    work drops from three 64-element folds to one ≤64-term codegen
    chain + a divide, and every generated method stays under the JIT
    size ceiling (the single-expression unrolled cosine_sim exceeded
    it and ran SLOWER — see OPTIMIZATION_r12.md)."""
    dot = dot_expr(a, b, "spark", dim)
    return f"({dot}) / nullif(sqrt({nn_a}) * sqrt({nn_b}), 0.0)"


def cosine_sim(a: str, b: str, dialect: str, dim: int | None = None) -> str:
    """Cosine similarity of two float-array columns.  ``dim``: see
    :func:`dot_expr` — all three folds (dot + both norms) unroll into
    one codegen-able guarded expression; identical IEEE results."""
    if dialect == "spark":
        dot = f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
        na = f"sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
        nb = f"sqrt(aggregate({b}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
        fold = f"({dot}) / nullif(({na}) * ({nb}), 0.0)"
        if dim:
            udot = "(cast(0.0 as double) + " + " + ".join(
                f"cast({a}[{i}] as double) * cast({b}[{i}] as double)"
                for i in range(dim)
            ) + ")"
            una = "sqrt(cast(0.0 as double) + " + " + ".join(
                f"cast({a}[{i}] as double) * cast({a}[{i}] as double)"
                for i in range(dim)
            ) + ")"
            unb = "sqrt(cast(0.0 as double) + " + " + ".join(
                f"cast({b}[{i}] as double) * cast({b}[{i}] as double)"
                for i in range(dim)
            ) + ")"
            return _unrolled_guard(
                a, b, dim,
                f"({udot}) / nullif(({una}) * ({unb}), 0.0)", fold,
            )
        return fold
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"


# language-ID stopword profiles (tiny, public-knowledge word lists)
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por", "con", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "que", "pour", "dans"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"],
    "zh": ["de5", "shi4", "bu4", "le5", "wo3", "you3", "zai4", "ta1", "men5", "zhe4"],
}


def lang_array_sql(lang: str, dialect: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return f"array({words})" if dialect == "spark" else f"[{words}]"


def pii_augmented(dialect: str) -> str:
    """documents.text carries no real PII, so the scrub op is exercised
    on a deterministic augmentation: every doc gets one synthetic email
    and one synthetic phone derived from doc_id — identical SQL-built
    text in both engines, so the scrubbed output hashes must agree."""
    if dialect == "spark":
        i = "cast(doc_id as string)"
        p3 = "lpad(cast(doc_id % 997 as string), 3, '0')"
        p4 = "lpad(cast((doc_id * 7) % 9973 as string), 4, '0')"
    else:
        i = "doc_id::VARCHAR"
        p3 = "lpad((doc_id % 997)::VARCHAR, 3, '0')"
        p4 = "lpad(((doc_id * 7) % 9973)::VARCHAR, 4, '0')"
    return (
        f"concat(text, ' contact user', {i}, '@mail.example.com or call ',"
        f" {p3}, '-', {p3}, '-', {p4})"
    )


def _unrolled_guard(a: str, b: str, dim: int, unrolled: str,
                    fold: str) -> str:
    """Wrap an unrolled fixed-width kernel in a size guard so semantics
    are EXACTLY the interpreted fold's for any input: arrays of width
    ``dim`` take the codegen-friendly unrolled branch, anything else
    (ragged, null, wider) falls back to the original higher-order fold.

    Why this exists (optimization r12, guide §4.1/§4.2): Spark's
    higher-order functions (aggregate/zip_with/transform) are
    CodegenFallback — every element evaluates through the interpreted
    expression walker, which made the per-pair dot product the dominant
    cost of the whole embedding-similarity family.  An unrolled
    left-associated chain performs the IDENTICAL IEEE additions in the
    IDENTICAL order (fold: ((0.0+v0)+v1)+…; unrolled: same tree), so
    results are bit-for-bit unchanged, but it compiles into
    whole-stage codegen."""
    return (
        f"(CASE WHEN size({a}) = {dim} AND size({b}) = {dim}"
        f" THEN {unrolled} ELSE {fold} END)"
    )


def dot_expr(a: str, b: str, dialect: str, dim: int | None = None) -> str:
    """Plain dot product of two float arrays, summed in index order in
    both dialects so the IEEE result is bit-identical cross-engine.

    ``dim`` (spark dialect only): statically-known array width — emits
    an unrolled, whole-stage-codegen-able sum chain guarded by a size
    check (see :func:`_unrolled_guard`); identical results, ~order of
    magnitude faster than the interpreted aggregate/zip_with fold."""
    if dialect == "spark":
        fold = (
            f"aggregate(zip_with({a}, {b},"
            f" (x, y) -> cast(x as double) * cast(y as double)),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
        if dim:
            terms = " + ".join(
                f"cast({a}[{i}] as double) * cast({b}[{i}] as double)"
                for i in range(dim)
            )
            return _unrolled_guard(
                a, b, dim, f"(cast(0.0 as double) + {terms})", fold
            )
        return fold
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def jaccard_micro_sql(nc: str, union: str, dialect: str) -> str:
    """Round-half-up 10⁶-scaled ratio nc/union in pure BIGINT
    arithmetic — (2·10⁶·nc + u) div (2·u) — the ONE text behind every
    integer micro-Jaccard in the repo (link prediction, top-k cohort
    churn) so the rounding rule cannot drift between copies, the
    bounded_bin_sql discipline applied to ratios."""
    op = "div" if dialect == "spark" else "//"
    return f"((2000000 * {nc} + {union}) {op} (2 * {union}))"


def l2sq_expr(a: str, b: str, dialect: str, dim: int | None = None) -> str:
    """Squared L2 distance of two float arrays, summed in index order
    in both dialects so the IEEE result is bit-identical cross-engine
    (the dot_expr contract, applied to residuals).  ``dim``: see
    :func:`dot_expr` — unrolled codegen form, identical results."""
    if dialect == "spark":
        fold = (
            f"aggregate(zip_with({a}, {b},"
            f" (x, y) -> (cast(x as double) - cast(y as double))"
            f" * (cast(x as double) - cast(y as double))),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
        if dim:
            terms = " + ".join(
                f"(cast({a}[{i}] as double) - cast({b}[{i}] as double))"
                f" * (cast({a}[{i}] as double) - cast({b}[{i}] as double))"
                for i in range(dim)
            )
            return _unrolled_guard(
                a, b, dim, f"(cast(0.0 as double) + {terms})", fold
            )
        return fold
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE)"
        f" * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))"
    )


def zorder_key(a: str, b: str, bits: int, dialect: str) -> str:
    """Z-order (Morton) interleave of the low ``bits`` bits of two
    non-negative integer expressions — the multi-dimensional sort key
    for data-layout clustering: sorting files by this key gives tight
    per-file min/max ranges on BOTH columns, so parquet row-group
    pruning works for predicates on either dimension (the 100 TB lever
    behind Delta/Iceberg ``ZORDER BY``). Pure integer arithmetic,
    bit-identical in both dialects."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(({a} >> {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(({b} >> {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# HyperLogLog primitives (shared by batch + streaming sketches and the
# DuckDB oracles — same arithmetic, bit-identical registers)
# ---------------------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
# max rho: the suffix w = h >> p has 60 - p bits; w = 0 maps to width + 1
HLL_RHO_MAX = 60 - HLL_P + 1
# fixed-point scale for the harmonic sum: S = Σ 2^(53 - M_j) as BIGINT
# (256 · 2^53 < 2^62 — overflow-free in both engines)
HLL_FIX = 1 << 53
# alpha_m for m = 256 (Flajolet et al. 2007), embedded as one repr()'d
# double literal so both engines parse the identical constant
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_rho(word: str) -> str:
    """rho(w) = 1 + index of the lowest set bit of ``word`` (0 → max).
    Pure integer ops (`&`, unary minus, bit_count) — the SAME text is
    valid Spark SQL and DuckDB SQL, so registers are bit-identical."""
    return (
        f"CASE WHEN ({word}) = 0 THEN {HLL_RHO_MAX} "
        f"ELSE 1 + bit_count((({word}) & -({word})) - 1) END"
    )


def hll_estimate(sum_fixed: str, n_zero: str) -> str:
    """HLL estimate from the fixed-point harmonic sum and the
    empty-register count; raw harmonic-mean path with the standard
    linear-counting small-range correction (E ≤ 2.5m and V > 0).
    Same text both engines; final round(·, 2) absorbs any last-ulp
    `ln` divergence between libm implementations."""
    # every numeric literal is CAST(... AS DOUBLE): DuckDB would parse
    # a bare decimal literal as DECIMAL and overflow the multiply chain
    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    m = float(HLL_M)
    raw = (
        f"((({d(HLL_ALPHA)} * {d(m)}) * {d(m)}) * {d(float(HLL_FIX))})"
        f" / CAST({sum_fixed} AS DOUBLE)"
    )
    return (
        f"CASE WHEN {raw} <= {d(2.5 * m)} AND ({n_zero}) > 0"
        f" THEN round({d(m)} * ln({d(m)} / CAST({n_zero} AS DOUBLE)), 2)"
        f" ELSE round({raw}, 2) END"
    )


def bit_mask64(b: str, dialect: str) -> str:
    """Single-bit 64-bit mask ``1 << b`` for b ∈ [0, 63].  Spark's
    shiftleft wraps bit 63 into the sign bit silently; DuckDB raises on
    ``1 << 63``, so its branch spells the sign-bit mask as a literal —
    both produce the identical two's-complement word."""
    if dialect == "spark":
        return f"shiftleft(cast(1 as bigint), cast({b} as int))"
    return (
        f"CASE WHEN ({b}) = 63 THEN (-9223372036854775807 - 1)"
        f" ELSE (1::BIGINT << ({b})) END"
    )


def sqrt_weight_micro(expr: str) -> str:
    """α=0.5 temperature weight in fixed-point micro-units:
    ``round(sqrt(n)·10⁶)`` as DECIMAL(38,0).  sqrt is IEEE
    correctly-rounded in both engines, so the weight is engine-exact.
    The SAME text is valid Spark SQL and DuckDB SQL — every consumer
    (batch operator, streaming plan, oracle) MUST build it here so the
    batch⇆streaming⇆oracle equivalences cannot drift."""
    return f"cast(round(sqrt({expr}) * 1000000, 0) as decimal(38,0))"
