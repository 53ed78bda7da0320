"""Hand-derivable semantics for the crawl_e2e round trip (r12).

The DuckDB oracle proves the engines agree; these cases prove the chain
is RIGHT on a corpus crafted so every verdict is derivable by hand —
and they certify the WRITTEN .warc.gz segments independently, by
re-parsing them with the pure-Python path and checking the splittable
member-per-record framing.
"""

from __future__ import annotations

import glob
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# doc_ids chosen so the PII plant class (doc_id % 4) is controlled:
# 0/4/8 are class 0 (no plant) — 0 and 4 share TEXT_A, so their planted
# text, markup, clean text, and redacted text are identical: an exact-dup
# pair the fingerprint must collapse (keep 0, drop 4). 8 is unique.
# 5 is class 1 (email planted), 6 is class 2 (phone planted).
TEXT_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa."
TEXT_B = "completely different body of running text for the unique doc."
DOCS = [
    (0, TEXT_A, "src0"),
    (4, TEXT_A, "src0"),
    (8, TEXT_B, "src1"),
    (5, "call me maybe and write soon", "src1"),
    (6, "phone home tomorrow morning", "src2"),
]


@pytest.fixture(scope="module")
def crawl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crawl_sem")
    table = pa.table(
        {
            "doc_id": pa.array([i for i, _, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t, _ in DOCS], pa.string()),
            "lang": pa.array(["en"] * len(DOCS), pa.string()),
            "source": pa.array([s for _, _, s in DOCS], pa.string()),
            "n_chars": pa.array([len(t) for _, t, _ in DOCS], pa.int64()),
        }
    )
    pq.write_table(table, d / "documents.parquet")
    return str(d)


def test_crawl_e2e_dedup_and_pii_semantics(spark, crawl_dir):
    from amazon_climate_data_etl_spark.operators.textops import crawl_e2e

    rows = {r.doc_id: r for r in crawl_e2e(spark, crawl_dir).collect()}
    assert set(rows) == {0, 4, 5, 6, 8}
    # URI identity + HTTP status round-tripped
    assert all(r.http_status == 200 for r in rows.values())
    assert rows[0].source == "src0" and rows[8].source == "src1"
    # the exact-dup pair collapses: same fingerprint, keep the smaller id
    assert rows[0].redacted_md5 == rows[4].redacted_md5
    assert (rows[0].dup_count, rows[0].is_kept) == (2, True)
    assert (rows[4].dup_count, rows[4].is_kept) == (2, False)
    assert rows[8].dup_count == 1 and rows[8].is_kept
    # planted PII is found in the EXTRACTED text: class 1 → email,
    # class 2 → phone, class 0 → nothing
    assert (rows[5].n_email, rows[5].n_ip, rows[5].n_phone) == (1, 0, 0)
    assert (rows[6].n_email, rows[6].n_ip, rows[6].n_phone) == (0, 0, 1)
    assert (rows[0].n_email, rows[0].n_ip, rows[0].n_phone) == (0, 0, 0)


def test_written_segments_are_splittable_member_per_record(spark, crawl_dir):
    """Each written .warc.gz must be a sequence of INDEPENDENT gzip
    members, one record each — the Common Crawl splittable convention the
    reader's task-memory contract relies on — and the pure-Python parse
    of the files must recover exactly the synthesized pages."""
    from amazon_climate_data_etl_spark.operators.textops import (
        _crawl_sink,
        _write_crawl_warcs,
    )
    from amazon_climate_data_etl_spark.sources.warc_min import (
        http_payload,
        parse_warc,
    )

    sink, n_written = _write_crawl_warcs(spark, crawl_dir)
    assert sink == _crawl_sink(crawl_dir)
    assert n_written == len(DOCS)
    files = sorted(glob.glob(os.path.join(sink, "*.warc.gz")))
    assert files, "no segments written"
    seen = {}
    for path in files:
        data = open(path, "rb").read()
        # count raw gzip members and parsed records independently
        members, rest = 0, data
        while rest:
            d = zlib.decompressobj(wbits=31)
            d.decompress(rest)
            assert d.eof, f"truncated member in {path}"
            members += 1
            rest = d.unused_data
        recs = parse_warc(data)
        assert members == len(recs), (path, members, len(recs))
        for rec in recs:
            assert rec.warc_type == "response"
            status, headers, body = http_payload(rec)
            assert status == 200
            doc_id = int(rec.get("WARC-Target-URI").rsplit("/", 1)[-1])
            seen[doc_id] = body.decode("utf-8")
    assert set(seen) == {i for i, _, _ in DOCS}
    # identical source docs (same plant class) produced identical pages
    assert seen[0] == seen[4]
    assert "<p>" in seen[8]


def test_mega_duplicate_group_structural(spark, tmp_path):
    """Adversarial skew: EVERY document is the same page (one fingerprint
    holds the whole corpus — the boilerplate-mirror case the join-back
    design exists for). The query must complete and the verdicts must be
    exact: one keeper (the minimum doc_id), dup_count == corpus size on
    every row. Same contract style as the salted-join structural test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_climate_data_etl_spark.operators.textops import crawl_e2e

    n = 400
    # identical text AND identical plant class (all doc_id % 4 == 0) so
    # the redacted clean text is byte-identical corpus-wide
    ids = [4 * i for i in range(n)]
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([TEXT_A] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["src0"] * n, pa.string()),
            "n_chars": pa.array([len(TEXT_A)] * n, pa.int64()),
        }
    )
    d = tmp_path / "mega"
    d.mkdir()
    pq.write_table(table, d / "documents.parquet")

    rows = crawl_e2e(spark, str(d)).collect()
    assert len(rows) == n
    assert len({r.redacted_md5 for r in rows}) == 1
    assert all(r.dup_count == n for r in rows)
    keepers = [r.doc_id for r in rows if r.is_kept]
    assert keepers == [0]


def test_file_count_grows_with_corpus(spark, crawl_dir, monkeypatch):
    """The write fan-out is corpus-derived: an applyInPandas group is ONE
    pandas frame, so the file count must grow once groups would exceed
    the per-file record budget (shrunk here so 5 docs exercise it)."""
    import amazon_climate_data_etl_spark.operators.textops as t

    monkeypatch.setattr(t, "N_CRAWL_FILES", 2)
    monkeypatch.setattr(t, "CRAWL_RECORDS_PER_FILE", 2)
    sink, _ = t._write_crawl_warcs(spark, crawl_dir)
    files = sorted(glob.glob(os.path.join(sink, "*.warc.gz")))
    # 5 docs / 2-per-file budget → ceil = 3 file GROUPS (> the floor of
    # 2). The GROUP count is the law; which of the 3 buckets are occupied
    # is pmod(xxhash64) occupancy, so assert the law, not the exact hash
    # layout (r13 ADVICE): more buckets than the floor allows, at most
    # the ceil(n/budget)=3 that exist — robust to a Spark xxhash64 change
    assert 2 <= len(files) <= 3
    from amazon_climate_data_etl_spark.sources.warc_min import parse_warc

    n = sum(len(parse_warc(open(p, "rb").read())) for p in files)
    assert n == len(DOCS)


def test_wat_metadata_semantics_and_pushdown(spark, crawl_dir):
    """The WAT sibling (r13) on the same hand-crafted corpus: the written
    segments must interleave response+metadata member-per-record (parsed
    independently by the pure-Python path), read_warc's metadata pushdown
    must skip the response blocks while record_idx stays file-positional,
    and the profile's per-(source, lang) sums must be hand-derivable."""
    from amazon_climate_data_etl_spark.operators.textops import (
        _wat_sink,
        _write_wat_warcs,
        wat_metadata_profile,
    )
    from amazon_climate_data_etl_spark.sources.warc_min import (
        parse_warc,
        read_warc,
    )

    sink, n_written = _write_wat_warcs(spark, crawl_dir)
    assert sink == _wat_sink(crawl_dir)
    assert n_written == len(DOCS)
    files = sorted(glob.glob(os.path.join(sink, "*.warc.gz")))
    assert files
    import json

    metas = {}
    for path in files:
        recs = parse_warc(open(path, "rb").read())
        # strict response/metadata interleave, one pair per doc
        assert [r.warc_type for r in recs] == ["response", "metadata"] * (
            len(recs) // 2
        )
        for r in recs:
            if r.warc_type == "metadata":
                m = json.loads(r.block)
                assert m["url"] == r.get("WARC-Target-URI")
                metas[int(m["url"].rsplit("/", 1)[-1])] = m
    assert set(metas) == {i for i, _, _ in DOCS}
    # hand-derivable fields: token counts are whitespace tokens of the RAW
    # text; links count is doc_id % 4
    texts = {i: t for i, t, _ in DOCS}
    for i, m in metas.items():
        assert m["n_tokens"] == len(texts[i].split())
        assert len(m["links"]) == i % 4
        assert m["n_chars"] == len(texts[i])

    # decode-side pushdown: only metadata rows cross the Arrow boundary,
    # and record_idx stays the file position (odd slots in the interleave)
    got = read_warc(spark, sink, record_types=("metadata",)).collect()
    assert len(got) == len(DOCS)
    assert all(r.warc_type == "metadata" for r in got)
    assert all(r.record_idx % 2 == 1 for r in got)

    # the registered profile: (source, lang) grain, hand-checked sums
    rows = {
        (r.source, r.lang): r
        for r in wat_metadata_profile(spark, crawl_dir).collect()
    }
    # crawl_dir docs: src0 x {0, 4} (TEXT_A twice), src1 x {8, 5}, src2 x {6}
    assert rows[("src0", "en")].n_docs == 2
    assert rows[("src0", "en")].sum_tokens == 2 * len(TEXT_A.split())
    assert rows[("src0", "en")].sum_links == (0 % 4) + (4 % 4)
    assert rows[("src2", "en")].sum_links == 6 % 4
    assert rows[("src1", "en")].sum_chars == len(TEXT_B) + len(
        "call me maybe and write soon"
    )


def test_wet_conversion_records_roundtrip(spark, crawl_dir, tmp_path):
    """The WET third of the WARC/WET/WAT trio at the source level:
    per-doc CONVERSION records (text/plain extracted-text blocks, the
    Common Crawl WET convention) written through the shared segment
    writer must round-trip byte-exactly through read_warc's
    conversion-type pushdown — response records interleaved in the same
    files never cross the Arrow boundary."""
    from pyspark.sql import functions as F

    from amazon_climate_data_etl_spark.catalog import load_table
    from amazon_climate_data_etl_spark.operators.textops import (
        _write_warc_segments,
    )
    from amazon_climate_data_etl_spark.sources.warc_min import read_warc

    d = load_table(spark, crawl_dir, "documents")
    n_docs = d.count()
    pages = d.select(
        "doc_id",
        "source",
        "text",
        F.pmod(F.xxhash64("doc_id"), F.lit(2)).cast("int").alias("file_seq"),
    )

    def make_records(pdf):
        recs = []
        for doc_id, source, text in zip(
            pdf["doc_id"], pdf["source"], pdf["text"]
        ):
            url = f"http://{source}.example.com/doc/{doc_id}"
            body = text.encode("utf-8")
            recs.append(
                {
                    "headers": {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:uuid:wet-resp-{doc_id}>",
                        "WARC-Target-URI": url,
                        "Content-Type": "application/http; msgtype=response",
                    },
                    "block": b"HTTP/1.1 200 OK\r\n\r\n" + body,
                }
            )
            recs.append(
                {
                    "headers": {
                        "WARC-Type": "conversion",
                        "WARC-Record-ID": f"<urn:uuid:wet-conv-{doc_id}>",
                        "WARC-Target-URI": url,
                        "Content-Type": "text/plain",
                    },
                    "block": body,
                }
            )
        return recs

    sink = str(tmp_path / "wet")
    total = _write_warc_segments(
        pages, sink, "wet-", make_records, n_docs, "wet_test"
    )
    assert total == len(DOCS)

    got = read_warc(spark, sink, record_types=("conversion",)).collect()
    assert len(got) == len(DOCS)
    assert all(r.warc_type == "conversion" for r in got)
    assert all(r.http_status is None for r in got)  # not an HTTP block
    assert all(r.record_idx % 2 == 1 for r in got)  # interleave positions
    texts = {i: t for i, t, _ in DOCS}
    for r in got:
        doc_id = int(r.target_uri.rsplit("/", 1)[-1])
        assert bytes(r.payload).decode("utf-8") == texts[doc_id]


def test_wet_text_e2e_semantics(spark, crawl_dir):
    """The registered WET certificate (r14) on the hand-crafted corpus:
    written segments must interleave response+conversion member-per-record,
    the conversion blocks must carry the extracted clean text (write-time
    extraction — the WET convention), and the query's per-doc stats must
    agree with an independent pure-Python recomputation over the parsed
    file bytes (chars, whitespace tokens, md5)."""
    import hashlib
    import re

    from amazon_climate_data_etl_spark.operators.textops import (
        _wet_sink,
        _write_wet_warcs,
        wet_text_e2e,
    )
    from amazon_climate_data_etl_spark.sources.warc_min import parse_warc

    sink, n_written = _write_wet_warcs(spark, crawl_dir)
    assert sink == _wet_sink(crawl_dir)
    assert n_written == len(DOCS)
    files = sorted(glob.glob(os.path.join(sink, "*.warc.gz")))
    assert files

    bodies = {}
    for path in files:
        recs = parse_warc(open(path, "rb").read())
        # strict response/conversion interleave, one pair per doc
        assert [r.warc_type for r in recs] == ["response", "conversion"] * (
            len(recs) // 2
        )
        for r in recs:
            if r.warc_type == "conversion":
                assert r.get("Content-Type") == "text/plain; charset=utf-8"
                doc_id = int(r.get("WARC-Target-URI").rsplit("/", 1)[-1])
                bodies[doc_id] = r.block.decode("utf-8")
    assert set(bodies) == {i for i, _, _ in DOCS}
    # write-time extraction: identical source docs in the same plant class
    # (0 and 4 share TEXT_A, class 0) produce identical conversion text;
    # the extraction stripped every tag
    assert bodies[0] == bodies[4]
    assert all("<" not in b for b in bodies.values())

    rows = {r.doc_id: r for r in wet_text_e2e(spark, crawl_dir).collect()}
    assert set(rows) == set(bodies)
    for doc_id, body in bodies.items():
        r = rows[doc_id]
        assert r.wet_chars == len(body)
        assert r.wet_tokens == len(re.split(r"[ \t\n\x0b\f\r]+", body.strip(" "))) if body.strip(" ") else r.wet_tokens == 0
        assert r.wet_md5 == hashlib.md5(body.encode("utf-8")).hexdigest()
        assert r.keep == (r.quality >= 0.5)
    assert rows[0].source == "src0" and rows[8].source == "src1"
    # the duplicate pair carries identical certificates
    assert rows[0].wet_md5 == rows[4].wet_md5
