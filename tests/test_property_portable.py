"""Property-based tests (hypothesis) for the portable-arithmetic layer.

Every oracle check in this repo reduces to the claim that a handful of
primitive expressions — decimal-stable rounding, exact-decimal sums,
whitespace tokenization, md5 fingerprints — are BIT-identical between
Spark and DuckDB for arbitrary inputs, not just the fixtures. These
properties attack that claim directly with generated data, including the
half-boundary values where ``round(double)`` is known to diverge between
engines (the reason ``_portable.stable_round`` exists at all).

Each example ships one generated column through both engines (a Spark job
per example, so example counts are kept small — breadth comes from
hypothesis shrinking toward the boundary cases, not volume).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.functions.text import (
    bpe_token_count,
    bpe_token_count_sql,
    doc_fingerprint,
    doc_fingerprint_sql,
    lang_guess,
    lang_guess_sql,
    quality_score,
    quality_score_sql,
    token_count,
    token_count_sql,
)
from amazon_climate_data_etl_spark.operators._portable import (
    dstddev,
    dstddev_sql,
    dsum,
    dsum_sql,
    portable_sql_rounds,
    stable_round,
    stable_round_sql,
)
from tests.oracle_harness import exact_float_mismatches

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_floats = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)
# money-shaped inputs: exactly-2-decimal values, the dsum contract
_cents = st.integers(min_value=-(10**12), max_value=10**12).map(
    lambda i: i / 100
)


def _spark_col(spark, values, expr, name):
    pdf = pd.DataFrame({"x": values})
    return (
        spark.createDataFrame(pdf).select(expr.alias(name)).toPandas()
    )


def _duck_col(values, sql_expr, name):
    pdf = pd.DataFrame({"x": values})
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(f"SELECT {sql_expr} AS {name} FROM t").df()


# stable_round's documented domain: |x|·10^scale ≤ 2^52, for ANY scale 0-10.
# The floor-based form executes the identical IEEE operation sequence in both
# engines, so the generator's job is to hunt values whose exact product
# x·10^scale sits at or within one ulp of a half-integer tie — the zone where
# round 6 falsified the previous decimal(24,10) route (DuckDB's lossy
# double→decimal cast; counterexample pinned below).


def _tie_neighborhood(scale_k_off):
    """Map (scale, k, offset) to a double at/adjacent to the tie (k+0.5)/10^s."""
    import math as _m

    scale, k, off = scale_k_off
    t = (k + 0.5) / 10**scale
    if off == 1:
        t = _m.nextafter(t, _m.inf)
    elif off == -1:
        t = _m.nextafter(t, -_m.inf)
    return t


def _round_domain_for(scale):
    lim = min(1e15, 2.0**52 / 10**scale)
    uniform = st.floats(
        min_value=-lim, max_value=lim, allow_nan=False, allow_infinity=False
    )
    kmax = int(lim * 10**scale / 2)
    ties = st.tuples(
        st.just(scale),
        st.integers(min_value=-kmax, max_value=kmax),
        st.sampled_from([-1, 0, 1]),
    ).map(_tie_neighborhood)
    return st.tuples(
        st.lists(st.one_of(uniform, ties), min_size=1, max_size=40),
        st.just(scale),
    )


_round_domain = st.integers(0, 10).flatmap(_round_domain_for)


@given(xs_scale=_round_domain)
@example(xs_scale=([2.675, 0.125, -0.125, 1.0005, -2.5, 0.5, 1e-9, -1e-9], 2))
@example(xs_scale=([0.045, -0.045, 123.456789555], 4))
# round-6 judge's falsifier of the old decimal(24,10) route: a true binary
# half-tie (x·10^6 = 461168602226562.5 exactly) that DuckDB's lossy
# double→decimal(24,10) cast perturbed while Spark's BigDecimal cast did not.
@example(xs_scale=([461168602.2265625, -461168602.2265625], 6))
@example(xs_scale=([922337205.0, -922337205.0], 6))  # old boundary magnitude
@example(xs_scale=([4.5e15, -4.5e15, 4503599627370495.5], 0))  # 2^52 edge
@settings(**_SETTINGS)
def test_stable_round_bit_identical(spark, xs_scale):
    """stable_round must agree with its SQL twin bit-for-bit across its
    documented domain (|x|·10^scale ≤ 2^52, any scale 0-10) — including
    doubles at and adjacent to decimal half-ties, where every decimal-cast
    based rounding provably differs between the engines."""
    xs, scale = xs_scale
    got = _spark_col(spark, xs, stable_round(F.col("x"), scale), "r")
    want = _duck_col(xs, stable_round_sql("x", scale), "r")
    assert exact_float_mismatches(got, want) == 0


# dstddev's provable domain (see its docstring): price-shaped ≤2-decimal
# inputs whose exact moments stay inside 2^53 after scaling — |x| ≤ 1000 at
# ≤60 values keeps Σx²·10⁸ ≤ 6e15 < 2^53.
_prices = st.integers(min_value=-(10**5), max_value=10**5).map(
    lambda i: i / 100
)


@given(xs=st.lists(_prices, min_size=2, max_size=60))
@example(xs=[0.01, 0.01, 0.01])        # zero variance, tiny values
@example(xs=[1000.0, 1000.0, 999.99])  # cancellation: big mean, tiny spread
#   (the unclamped form made DuckDB's sqrt RAISE on a few-ulp-negative
#   radicand here while Spark returned NaN)
@example(xs=[-5.25] * 30 + [5.25])     # heavy repetition + outlier
@settings(**_SETTINGS)
def test_dstddev_order_independent_and_portable(spark, xs):
    """The exact-decimal-moment sample stddev must match its SQL twin
    bit-for-bit across its documented domain, with the oracle fed the
    REVERSED list — both the cross-engine claim and the order-independence
    claim every summary_stats-family hash leans on."""
    got = _spark_col(spark, xs, dstddev(F.col("x")), "s")
    want = _duck_col(list(reversed(xs)), dstddev_sql("x"), "s")
    assert exact_float_mismatches(got, want) == 0


@given(xs=st.lists(_cents, min_size=1, max_size=60))
@example(xs=[0.1] * 10)   # the classic 0.1 accumulation drift
@example(xs=[1e10, 0.01, -1e10])  # catastrophic cancellation in double
@settings(**_SETTINGS)
def test_dsum_order_independent_and_portable(spark, xs):
    """The exact-decimal sum must (a) be identical no matter the input
    order — the property that makes results stable under repartitioning —
    and (b) match DuckDB's decimal sum of the reversed list bit-for-bit.
    A plain double sum fails both (0.1 ten times != 1.0)."""
    got = _spark_col(spark, xs, dsum(F.col("x")), "s")
    want = _duck_col(list(reversed(xs)), dsum_sql("x"), "s")
    assert exact_float_mismatches(got, want) == 0


# --- portable moment→double conversion (round 8): the narrow/split seam
# must stay bit-exact cross-engine, and past the split domain the engine
# must RAISE instead of silently de-syncing from the oracle ----------------

_NARROW_SUM = 2.0**53 / 1e4  # direct-cast bound for scale-4 moments


def _raises_domain(spark, xs, expr, what):
    try:
        _spark_col(spark, xs, expr, "s")
    except Exception as exc:  # Py4J wraps SparkRuntimeException
        assert f"_portable.{what}" in str(exc), str(exc)[:500]
        return True
    return False


@given(
    eps=st.integers(min_value=-(10**6), max_value=10**6),
    split=st.integers(min_value=4, max_value=8),
    sign=st.sampled_from([1, -1]),
)
@example(eps=0, split=4, sign=1)          # exactly AT the seam
@example(eps=1, split=5, sign=-1)         # one decimal ulp above, negative
@settings(**_SETTINGS)
def test_dsum_conversion_seam_bit_exact(spark, eps, split, sign):
    """Σx straddling the narrow-domain seam (2^53/10^4): below it the
    direct cast fires, at/above it the split conversion fires — BOTH
    must be bit-exact vs DuckDB's identical CASE (the r7 review's
    silent-de-sync risk, closed by construction). The total is split
    across ≥4 rows so every PER-ROW value respects dsum's input
    contract: below ~2^38 a 4-decimal value's nearest double sits within
    ulp/2 ≈ 1.5e-5 < 5e-5 of it, so both engines' input double→decimal
    casts are unambiguous (a single 9e11-magnitude row would be a
    contract violation — doubles there cannot even hold 4 decimals — not
    a conversion-seam case; the aggregated MOMENT is what gets big)."""
    total = sign * (_NARROW_SUM + eps / 1e4)
    xs = [round(total / split, 4)] * split
    assert abs(xs[0]) < 2.0**38  # per-row input-contract guard
    got = _spark_col(spark, xs, dsum(F.col("x")), "s")
    want = _duck_col(xs, dsum_sql("x"), "s")
    assert exact_float_mismatches(got, want) == 0


@given(
    vals=st.lists(
        st.integers(min_value=10**13, max_value=9 * 10**13).map(
            lambda i: i / 1e4
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_dsum_split_path_bit_exact(spark, vals):
    """Deep inside the split-conversion zone (Σx in ~[2e9·1e4, 4e14]):
    both engines execute the identical split sequence, so arbitrary
    scale-4 values must stay bit-exact — order-reversed on the oracle
    side to keep the order-independence claim honest too."""
    got = _spark_col(spark, vals, dsum(F.col("x")), "s")
    want = _duck_col(list(reversed(vals)), dsum_sql("x"), "s")
    assert exact_float_mismatches(got, want) == 0


def test_dstddev_wide_squared_moment_bit_exact(spark):
    """Σx² far beyond the old provable 2^53/10^8 bound (the
    summary_stats shape: price-like values whose squares sum to ~1e13)
    must now take the split path and STILL match DuckDB bit-for-bit —
    previously this zone agreed only until an int→double rounding landed
    on a tie."""
    import numpy as _np

    rng = _np.random.default_rng(11)
    xs = [round(v, 2) for v in rng.uniform(1000, 99999, 2000)]
    got = _spark_col(spark, xs, dstddev(F.col("x")), "s")
    want = _duck_col(list(reversed(xs)), dstddev_sql("x"), "s")
    assert exact_float_mismatches(got, want) == 0


def test_moment_guard_raises_past_split_domain(spark):
    """Past the BIGINT split bound (~9.2e18) the conversion must raise
    loudly — never emit a value the oracle can't reproduce."""
    from amazon_climate_data_etl_spark.operators._portable import davg

    xs = [99999999999999.0] * 100000  # Σx = 1e19 > 9e18
    assert _raises_domain(spark, xs, dsum(F.col("x")), "dsum")
    assert _raises_domain(spark, xs, davg(F.col("x")), "dsum")
    # dstddev's squared moment blows the bound with far fewer rows
    assert _raises_domain(
        spark, [99999999999999.0] * 2, dstddev(F.col("x")), "dstddev"
    )


def test_davg_portable_conversion(spark):
    from amazon_climate_data_etl_spark.operators._portable import (
        davg,
        davg_sql,
    )

    # split path via MANY in-contract rows (sum 1.2e12 > the narrow bound)
    ok = [2.5, 3.5, 4.0] + [200000000000.1234] * 6
    got = _spark_col(spark, ok, davg(F.col("x")), "s")
    want = _duck_col(ok, davg_sql("x"), "s")
    assert exact_float_mismatches(got, want) == 0


_texts = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=80,
)


@given(ts=st.lists(_texts, min_size=1, max_size=30))
@example(ts=["", "   ", "\t\n", " a  b ", "你 好", "a b"])
@settings(**_SETTINGS)
def test_token_count_portable(spark, ts):
    """Whitespace tokenization (Java regex \\s+ vs DuckDB RE2 \\s+) must
    count identically on arbitrary unicode, empty, and whitespace-only
    strings — the denominator of every per-doc text metric."""
    pdf = pd.DataFrame({"x": ts})
    got = (
        spark.createDataFrame(pdf)
        .select(token_count(F.col("x")).cast("long").alias("n"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT CAST({token_count_sql('x')} AS BIGINT) AS n FROM t"
    ).df()
    assert list(got["n"]) == list(want["n"])


@given(ts=st.lists(_texts, min_size=1, max_size=30))
@example(ts=["", " ", "the a of and to in is it " * 3,
             "x" * 64, "x" * 63, "!!!???", "a!b?c."])
@settings(**_SETTINGS)
def test_quality_score_portable(spark, ts):
    """The composite quality score must be bit-identical across engines —
    corpus_filter_funnel thresholds it at 0.5, so a one-digit rounding flip
    on a near-tie composite would cascade into the funnel counts. The SQL
    twin goes through portable_sql_rounds, exactly as at registration."""
    pdf = pd.DataFrame({"x": ts})
    got = (
        spark.createDataFrame(pdf)
        .select(quality_score(F.col("x")).alias("q"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {portable_sql_rounds(quality_score_sql('x'))} AS q FROM t"
    ).df()
    assert exact_float_mismatches(got, want) == 0


@given(ts=st.lists(_texts, min_size=1, max_size=30))
@example(ts=["don't", "it's 1234!", " x", "x ", "a\x0bb", "ΑΒΓ λέξη", "１２３"])
@settings(**_SETTINGS)
def test_bpe_token_count_portable(spark, ts):
    """The GPT-2-style pre-tokenizer count (Java regex vs DuckDB RE2) must
    agree on arbitrary unicode — contractions, digit runs, punctuation
    runs, and the \\x0b class gap are the documented traps."""
    pdf = pd.DataFrame({"x": ts})
    got = (
        spark.createDataFrame(pdf)
        .select(bpe_token_count(F.col("x")).cast("long").alias("n"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT CAST({bpe_token_count_sql('x')} AS BIGINT) AS n FROM t"
    ).df()
    assert list(got["n"]) == list(want["n"])


@given(ts=st.lists(_texts, min_size=1, max_size=30))
@example(ts=["the cat and the dog", "der und die", "le et les", "el y los",
             "the und le y", "", "xyz", "THE AND OF"])
@settings(**_SETTINGS)
def test_lang_guess_portable(spark, ts):
    """Marker-based language ID must pick the same language (including the
    fixed tie-break order en > de > fr > es and the 'und' fallback) in
    both engines on arbitrary text."""
    pdf = pd.DataFrame({"x": ts})
    got = (
        spark.createDataFrame(pdf)
        .select(lang_guess(F.col("x")).alias("lang"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(f"SELECT {lang_guess_sql('x')} AS lang FROM t").df()
    assert list(got["lang"]) == list(want["lang"])


@given(ts=st.lists(_texts, min_size=1, max_size=30))
@example(ts=["", "  A  b  ", "CAFÉ café", "x\ty\nz"])
@example(ts=["\x0b", "a\x0bb"])  # vertical tab: the regression hypothesis found
@example(ts=["\xa0", "İstanbul", "ΣΣ ΤΕΛΟΣ", "Straße"])  # nbsp-trim + unicode casing traps
@settings(**_SETTINGS)
def test_doc_fingerprint_portable(spark, ts):
    """The md5 content fingerprint (lowercase + whitespace-normalize) must
    be byte-identical across engines on arbitrary unicode — exact dedup,
    the hash splits, and the quota ranks all key on it."""
    pdf = pd.DataFrame({"x": ts})
    got = (
        spark.createDataFrame(pdf)
        .select(doc_fingerprint(F.col("x")).alias("fp"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {doc_fingerprint_sql('x')} AS fp FROM t"
    ).df()
    assert list(got["fp"]) == list(want["fp"])


# ---------------------------------------------------------------------------
# Bulk near-tie sweep: the volume complement to the hypothesis properties
# above (8 shrink-guided examples per run). One Spark job and one DuckDB
# query carry ~100k adversarial doubles — every decimal half-tie
# neighborhood an LCG can reach across scales 0-10 — so the stable_round
# docstring's "adversarial sweep, zero mismatches" claim is pinned in the
# suite rather than asserted from a one-off run. The old decimal(24,10)
# route fails this sweep hundreds of times; the IEEE floor form must never.
# ---------------------------------------------------------------------------


def _lcg(seed: int):
    """Deterministic 63-bit LCG (no RNG state: same stream every run)."""
    x = seed
    while True:
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        yield x


def _near_tie_corpus(per_scale: int = 3000):
    """(x, scale) pairs: ties (k+0.5)/10^s, their ±1-ulp neighbors, and
    LCG-uniform in-domain doubles, for every scale 0-10. k stays under
    2^51 (half the documented |x|·10^s ≤ 2^52 domain); the exact boundary
    magnitudes are pinned as @example rows in the hypothesis property."""
    import math

    rows = []
    for scale in range(11):
        p10 = 10**scale
        kmax = (1 << 51) - 2
        g = _lcg(seed=scale + 1)
        for i in range(per_scale):
            k = next(g) % kmax
            if i % 2:
                k = -k
            t = (k + 0.5) / p10
            rows.append((t, scale))
            rows.append((math.nextafter(t, math.inf), scale))
            rows.append((math.nextafter(t, -math.inf), scale))
    return rows


def test_stable_round_bulk_near_tie_sweep(spark):
    """~99k tie-adjacent doubles through both engines in ONE job each:
    zero bit-mismatches allowed anywhere in the documented domain."""
    rows = _near_tie_corpus()
    pdf = pd.DataFrame(rows, columns=["x", "s"])
    assert len(pdf) >= 90_000

    col = None
    for scale in range(11):
        branch = stable_round(F.col("x"), scale)
        col = branch if col is None else F.when(F.col("s") == scale, branch).otherwise(col)
        # (chained otherwise keeps one expression; order doesn't matter —
        # exactly one branch matches per row)
    got = (
        spark.createDataFrame(pdf)
        .select(F.col("s"), F.col("x"), col.alias("r"))
        .toPandas()
        .sort_values(["s", "x"], kind="mergesort")
        .reset_index(drop=True)
    )

    cases = " ".join(
        f"WHEN s = {scale} THEN {stable_round_sql('x', scale)}"
        for scale in range(11)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = (
        con.execute(f"SELECT s, x, CASE {cases} END AS r FROM t ORDER BY s, x")
        .df()
        .reset_index(drop=True)
    )
    assert exact_float_mismatches(got[["r"]], want[["r"]]) == 0


# ---------------------------------------------------------------------------
# r11 fragments: HTML boilerplate rules, PII staged redaction, BPE encoding
# ---------------------------------------------------------------------------

_MARKUPISH = st.lists(
    st.sampled_from(
        [
            "<p>", "</p>", '<a href="/x">', "</a>", "<div>", "<b", ">", "<",
            "word", "alpha beta gamma delta", "w.", "!", "?", "\n", " ",
            "café", 'title="a>b"', "<a>", "</a", "<>", "a@b.co", "..",
        ]
    ),
    min_size=0,
    max_size=25,
).map("".join)


@given(ts=st.lists(_MARKUPISH, min_size=1, max_size=12))
@example(ts=["", "<p>.</p>", "<a >x</a> y.", "<p title=\"a>b\">five words go here ok.</p>"])
@settings(**_SETTINGS)
def test_html_line_rules_portable(spark, ts):
    """The per-line boilerplate verdict and tag-stripped text (Java regex
    vs RE2, trim semantics, anchor capture-group aggregation) must agree
    on arbitrary — including malformed — markup. A verdict flip on ONE
    line changes n_kept/boiler_frac/clean_md5 for the whole document."""
    from amazon_climate_data_etl_spark.operators.textops import (
        _is_content_sql,
        _strip_sql,
        _html_strip,
        html_is_content,
    )

    # one row per LINE, mirroring the per-line lambda application
    lines = [l for t in ts for l in t.split("\n")]
    pdf = pd.DataFrame({"x": lines})
    got = (
        spark.createDataFrame(pdf)
        .select(
            html_is_content(F.col("x")).alias("keep"),
            _html_strip(F.col("x")).alias("s"),
        )
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {_is_content_sql('x')} AS keep, {_strip_sql('x')} AS s FROM t"
    ).df()
    assert list(got["keep"]) == [bool(v) for v in want["keep"]]
    assert list(got["s"]) == list(want["s"])


_PIIISH = st.lists(
    st.sampled_from(
        [
            "user@ex.com", "a@b.c", "a@b.co", "jo.doe+x@sub.example.org",
            "10.0.0.1", "555-1234", "1234-555", "999.999.999.999",
            "1.2.3.4.5", "x", "admin@10.0.0.12", " ", ".", "-", "007",
            "call", "@", "a@", "@b.co", "12.34", "555-123", "555-12345",
        ]
    ),
    min_size=0,
    max_size=20,
).map(" ".join)


@given(ts=st.lists(_PIIISH, min_size=1, max_size=12))
@example(ts=["", "a@b.co 1.2.3.4 555-0000", "x555-1234 1.2.3.4.5"])
@settings(**_SETTINGS)
def test_pii_staged_redaction_portable(spark, ts):
    """The staged count + ordered redact chain must agree byte-for-byte:
    \\b boundaries, {1,3} octet repeats, the alphabetic-tld email rule,
    and the email→ip→phone order all have to line up in both dialects."""
    from amazon_climate_data_etl_spark.operators.textops import (
        _PII_RULES,
        pii_redact_stage,
    )

    pdf = pd.DataFrame({"doc_id": range(len(ts)), "text": ts})
    got = (
        pii_redact_stage(spark.createDataFrame(pdf))
        .orderBy("doc_id")
        .toPandas()
    )
    stage = "text"
    counts = []
    for k, p, rep in _PII_RULES:
        counts.append(f"CAST(len(regexp_extract_all({stage}, '{p}')) AS INTEGER) AS n_{k}")
        stage = f"regexp_replace({stage}, '{p}', '{rep}', 'g')"
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT doc_id, {', '.join(counts)}, md5({stage}) AS redacted_md5 "
        f"FROM t ORDER BY doc_id"
    ).df()
    for c in ("n_email", "n_ip", "n_phone", "redacted_md5"):
        assert list(got[c]) == list(want[c]), c


_BPE_WORDS = st.lists(
    st.text(alphabet="abcdefgrstin", min_size=1, max_size=12),
    min_size=0,
    max_size=15,
).map(" ".join)


@given(ts=st.lists(_BPE_WORDS, min_size=1, max_size=10))
@example(ts=["erer inin stst", "xer erx", "e r er re", ""])
@settings(**_SETTINGS)
def test_bpe_stream_three_way_portable(spark, ts):
    """THREE-way agreement on arbitrary small-alphabet words (the alphabet
    overlaps the trained merges, so merges actually fire): the Spark
    replace chain, the DuckDB replace chain, and the pure-Python
    symbol-list walk must produce the identical encoded stream — any
    boundary false-positive in the separator encoding breaks one of the
    three first."""
    import hashlib
    import re as _re

    from amazon_climate_data_etl_spark.functions.bpe_vocab import MERGES
    from amazon_climate_data_etl_spark.operators.textops import (
        _BPE_SEP,
        _bpe_stream,
        _build_bpe_sql,
    )
    from tools.gen_bpe_merges import merge_word

    pdf = pd.DataFrame({"doc_id": range(len(ts)), "text": ts})
    got = (
        spark.createDataFrame(pdf)
        .select("doc_id", F.md5(_bpe_stream(F.col("text"))).alias("h"))
        .orderBy("doc_id")
        .toPandas()
    )
    # DuckDB: reuse the registered oracle's stream construction by running
    # the full query over a documents view shaped like the fixture
    con = duckdb.connect()
    pdf2 = pdf.assign(lang="en", source="src0", n_chars=pdf["text"].str.len())
    con.register("documents", pdf2)
    want = con.execute(
        "SELECT doc_id, token_md5 FROM (" + _build_bpe_sql().replace("ORDER BY doc_id", "") + ") q ORDER BY doc_id"
    ).df()
    twin = []
    for t in ts:
        streams = []
        for w in _re.findall("[a-z]+", t.lower()):
            sym = list(w)
            for left, right in MERGES:
                sym = merge_word(sym, left, right)
            streams.append(_BPE_SEP + (_BPE_SEP * 2).join(sym) + _BPE_SEP)
        twin.append(hashlib.md5(" ".join(streams).encode()).hexdigest())
    assert list(got["h"]) == list(want["token_md5"]) == twin


# media_summary's exact-integer ppb entropy (r13 graduation): the per-item
# quantization must be the IDENTICAL integer program in both engines —
# Spark `div` vs DuckDB `//` (both floor on this nonnegative domain), the
# half-up (+den//2) bias, the 1e9 clamp — and the aggregated mean must ride
# the portable moment conversion bit-exactly. Generators hunt the seams:
# den=0 (the greatest() guard), comp=0, clamp boundary (comp == den,
# comp = den ± 1), and odd denominators where the +den//2 bias rounds down
# on exact halves.
_ppb_pairs = st.one_of(
    st.tuples(
        st.integers(min_value=0, max_value=10**8),
        st.integers(min_value=0, max_value=10**8),
    ),
    # clamp/tie seams: comp pinned around den
    st.integers(min_value=1, max_value=10**6).flatmap(
        lambda den: st.tuples(
            st.sampled_from(
                [max(0, den - 1), den, den + 1, den // 2, 2 * den + 1]
            ),
            st.just(den),
        )
    ),
)


def _ppb_py(comp: int, den: int) -> int:
    d = max(1, den)
    return min(10**9, (comp * 10**9 + d // 2) // d)


@given(pairs=st.lists(_ppb_pairs, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_entropy_ppb_bit_identical(spark, pairs):
    from amazon_climate_data_etl_spark.sources.multimodal import (
        _ENT_PPB,
        _ENT_PPB_SQL,
    )

    pdf = pd.DataFrame(
        {
            "comp_len": [c for c, _ in pairs],
            "n_bytes": [n for _, n in pairs],
        }
    )
    want = [_ppb_py(c, n) for c, n in pairs]

    sdf = spark.createDataFrame(pdf)
    got_spark = [
        r["p"] for r in sdf.select(F.expr(_ENT_PPB).alias("p")).collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = con.execute(f"SELECT {_ENT_PPB_SQL} AS p FROM t").df()["p"]
    assert [int(x) for x in got_duck] == want

    # the aggregated mean: exact decimal sum -> portable conversion ->
    # /1e9 /count -> stable_round(4), bit-identical across engines
    from amazon_climate_data_etl_spark.operators._portable import (
        _moment_to_double,
        _moment_to_double_sql,
    )

    s_avg = sdf.agg(
        stable_round(
            _moment_to_double(
                F.sum(F.expr(_ENT_PPB).cast("decimal(38,0)")), 0, "t"
            )
            / F.lit(1e9)
            / F.count(F.lit(1)),
            4,
        ).alias("a")
    ).collect()[0]["a"]
    d_avg = con.execute(
        "SELECT "
        + stable_round_sql(
            f"{_moment_to_double_sql(f'sum({_ENT_PPB_SQL})', 0)}"
            " / 1000000000.0 / count(*)",
            4,
        )
        + " AS a FROM t"
    ).df()["a"][0]
    assert s_avg == d_avg
