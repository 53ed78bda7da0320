"""Property + integration hardening for the WARC boundary.

1. Hypothesis roundtrip: arbitrary generated record sets (any header
   names/values in the token charset, arbitrary binary blocks, either
   gzip layout) must survive build → parse exactly — and any single-byte
   corruption of the STRUCTURAL framing must either raise or change the
   parsed records (never a silent identical parse of different bytes).
2. The full crawl story: a .warc.gz segment with planted near-duplicate
   pages → distributed read_warc → html extraction → the extracted clean
   text written as a documents table → the REGISTERED minhash LSH dedup
   query finds exactly the planted pairs. Crawl bytes in, dedup verdicts
   out — every hop is the engine's own operator.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_climate_data_etl_spark.sources.warc_min import (
    build_warc,
    parse_warc,
    read_warc,
)

_SETTINGS = dict(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_.",
    min_size=1,
    max_size=20,
)

_record = st.fixed_dictionaries(
    {
        "headers": st.dictionaries(
            # WARC-Type is always present; extra headers are arbitrary
            # tokens (values may not contain CRLF — the spec's line model)
            st.sampled_from(
                ["WARC-Target-URI", "WARC-Date", "WARC-Record-ID", "X-Custom"]
            ),
            _token,
            max_size=4,
        ).map(lambda h: {**h, "WARC-Type": "resource"}),
        "block": st.binary(max_size=200),
    }
)


@given(recs=st.lists(_record, min_size=0, max_size=6), gz=st.booleans())
@settings(**_SETTINGS)
def test_roundtrip_property(recs, gz):
    parsed = parse_warc(build_warc(recs, gzip_per_record=gz))
    assert len(parsed) == len(recs)
    for want, got in zip(recs, parsed):
        assert got.block == want["block"]
        for k, v in want["headers"].items():
            assert got.get(k) == v


# write-time header validation (r12 added the CR/LF/colon rejection;
# r13 ADVICE: cover it by PROPERTY, not only hand-built cases): names and
# values drawn from an alphabet that INCLUDES the framing metacharacters —
# any name containing ':' or CR/LF (or empty), or value containing CR/LF,
# must raise at build time; everything else must round-trip exactly
# (values compare stripped: the spec's `name: value` line model sheds
# value edge-whitespace on parse).
_hostile = st.text(
    alphabet="abcXYZ019-_.:\r\n\t ",
    min_size=0,
    max_size=12,
)


@given(
    name=_hostile,
    value=_hostile,
    block=st.binary(max_size=64),
    gz=st.booleans(),
)
@settings(**_SETTINGS)
def test_header_validation_property(name, value, block, gz):
    import pytest

    rec = {
        "headers": {"WARC-Type": "resource", name: value},
        "block": block,
    }
    name_bad = (not name) or (":" in name) or ("\r" in name) or ("\n" in name)
    value_bad = "\r" in value or "\n" in value
    if name_bad or value_bad:
        with pytest.raises(ValueError):
            build_warc([rec], gzip_per_record=gz)
        return
    parsed = parse_warc(build_warc([rec], gzip_per_record=gz))
    assert len(parsed) == 1
    assert parsed[0].block == block
    assert parsed[0].get(name) == value.strip()


@given(
    recs=st.lists(_record, min_size=1, max_size=3),
    pos_frac=st.floats(min_value=0.0, max_value=1.0),
    delta=st.integers(min_value=1, max_value=255),
)
@settings(**_SETTINGS)
def test_single_byte_corruption_never_silent(recs, pos_frac, delta):
    """Flip one byte of the UNCOMPRESSED framing: the parse must raise or
    the parsed records must differ — identical output from different
    bytes would mean the parser ignored part of the input."""
    data = build_warc(recs)
    pos = min(len(data) - 1, int(pos_frac * len(data)))
    mutated = bytes(
        b if i != pos else (b + delta) % 256 for i, b in enumerate(data)
    )
    before = [(r.headers, r.block) for r in parse_warc(data)]
    try:
        after = [(r.headers, r.block) for r in parse_warc(mutated)]
    except ValueError:
        return
    assert after != before


def test_max_member_bytes_gate():
    """The degenerate whole-file-single-member layout must trip the cap
    loudly; the splittable member-per-record layout must pass the same
    cap as long as each individual member fits — the cap bounds ONE
    member, not the file's total expansion."""
    import gzip

    import pytest

    recs = [
        {
            "headers": {"WARC-Type": "resource", "X-Custom": f"r{i}"},
            "block": bytes([i]) * 300,
        }
        for i in range(8)
    ]
    plain = build_warc(recs)  # ~8 * ~400 bytes expanded
    whole_file = gzip.compress(plain)
    per_record = build_warc(recs, gzip_per_record=True)

    # cap below the whole-file expansion: degenerate layout raises...
    with pytest.raises(ValueError, match="max_member_bytes"):
        parse_warc(whole_file, max_member_bytes=1000)
    # ...while the splittable layout sails through the SAME cap (each
    # member is one ~400-byte record)
    got = parse_warc(per_record, max_member_bytes=1000)
    assert [r.block for r in got] == [r["block"] for r in recs]
    # a generous cap accepts the degenerate layout too
    assert len(parse_warc(whole_file, max_member_bytes=1 << 20)) == len(recs)
    # default stays unbounded (both layouts accepted)
    assert len(parse_warc(whole_file)) == len(recs)


def test_crawl_to_dedup_end_to_end(spark, tmp_path):
    """Crawl bytes in, near-dup verdicts out: pages 2k and 2k+1 are
    near-identical (one token differs), distinct k are disjoint — after
    read_warc + extraction, the registered minhash_lsh_pairs query over
    the extracted corpus must find exactly the planted pairs."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from amazon_climate_data_etl_spark.operators.textops import (
        html_extract_stage,
        _html_strip,
        html_is_content,
    )
    from tests.oracle_harness import TABLES

    def page(k: int, variant: int) -> bytes:
        # family k's pages differ in ONE token (near-dup); families share
        # NO shingle (every token is k-stamped, incl. the final one — a
        # shared tail would plant real low-similarity cross-family
        # candidates, which is corpus structure, not an engine bug)
        words = [f"tok{k}w{j}" for j in range(30)]
        words[15] = f"tok{k}w15{'a' if variant == 0 else 'b'}"
        body = (
            '<div class="nav"><a href="/">home</a></div>\n'
            f"<p>{' '.join(words)} closing{k} line{k} done{k}.</p>\n"
            "<div>(c) crawl</div>"
        )
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body.encode()
        )

    recs = [
        {
            "headers": {
                "WARC-Type": "response",
                "WARC-Target-URI": f"https://example.org/{k}/{v}",
                "WARC-Date": "2026-08-16T00:00:01Z",
                "WARC-Record-ID": f"<urn:uuid:{k}-{v}>",
            },
            "block": page(k, v),
        }
        for k in range(8)
        for v in (0, 1)
    ]
    seg_dir = str(tmp_path / "crawl")
    os.makedirs(seg_dir)
    with open(os.path.join(seg_dir, "seg-0.warc.gz"), "wb") as f:
        f.write(build_warc(recs, gzip_per_record=True))

    # crawl -> extraction: clean text per page, deterministic doc ids from
    # the target URI (k*2 + v) so the planted pair structure is addressable
    docs = (
        read_warc(spark, seg_dir)
        .filter(F.col("warc_type") == "response")
        .select(
            (
                F.regexp_extract("target_uri", r"/(\d+)/(\d+)$", 1).cast("long") * 2
                + F.regexp_extract("target_uri", r"/(\d+)/(\d+)$", 2).cast("long")
            ).alias("doc_id"),
            F.col("payload").cast("string").alias("html"),
        )
    )
    lines = F.split(F.col("html"), "\n")
    clean = F.array_join(
        F.transform(F.filter(lines, html_is_content), _html_strip), "\n"
    )
    corpus = docs.select(
        "doc_id",
        clean.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("crawl").alias("source"),
        F.length(clean).alias("n_chars"),
    ).toPandas()

    # materialize as a documents table so the REGISTERED query runs on it
    d = str(tmp_path / "sf_crawl")
    os.makedirs(d)
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{d}/{t}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(corpus["doc_id"], pa.int64()),
                "text": pa.array(corpus["text"], pa.string()),
                "lang": pa.array(corpus["lang"], pa.string()),
                "source": pa.array(corpus["source"], pa.string()),
                "n_chars": pa.array(corpus["n_chars"], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )

    from amazon_climate_data_etl_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, d).collect()}
    assert pairs == {(2 * k, 2 * k + 1) for k in range(8)}


def test_max_member_bytes_gate_distributed(spark, tmp_path):
    """The cap must also trip on the DISTRIBUTED path: a read_warc scan of
    a whole-file-single-member segment with a too-small cap fails the job
    loudly (the Python worker error carries the gate message), while the
    same scan with the cap sized for the splittable sibling file passes
    and returns every record."""
    import gzip

    import pytest

    recs = [
        {
            "headers": {"WARC-Type": "resource", "X-Custom": f"r{i}"},
            "block": bytes([i]) * 300,
        }
        for i in range(8)
    ]
    seg = str(tmp_path / "seg")
    os.makedirs(seg)
    with open(os.path.join(seg, "whole.warc.gz"), "wb") as f:
        f.write(gzip.compress(build_warc(recs)))

    with pytest.raises(Exception, match="max_member_bytes"):
        read_warc(spark, seg, max_member_bytes=1000).count()

    split = str(tmp_path / "split")
    os.makedirs(split)
    with open(os.path.join(split, "split.warc.gz"), "wb") as f:
        f.write(build_warc(recs, gzip_per_record=True))
    got = read_warc(spark, split, max_member_bytes=1000).collect()
    assert len(got) == len(recs)
    assert sorted(r.record_idx for r in got) == list(range(len(recs)))


def test_max_member_bytes_is_a_true_memory_bound():
    """The cap must bound ALLOCATION, not just trip after the fact:
    deflate expands up to ~1032:1, so a zeros-bomb member's first
    compressed chunk alone could materialize the whole expansion in one
    decompress() call. With the max_length-bounded decode, peak Python
    allocation while rejecting a 64 MiB expansion under a 1 MiB cap must
    stay within a few MiB (cap + one input slice + slack)."""
    import gzip
    import tracemalloc

    import pytest

    from amazon_climate_data_etl_spark.sources.warc_min import iter_warc

    bomb = gzip.compress(b"\x00" * (64 << 20))  # ~64 KiB compressed
    cap = 1 << 20
    tracemalloc.start()
    tracemalloc.reset_peak()
    with pytest.raises(ValueError, match="max_member_bytes"):
        list(iter_warc(bomb, max_member_bytes=cap))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 << 20, f"peak {peak} bytes — cap is not bounding memory"
