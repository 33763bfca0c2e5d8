from __future__ import annotations

import pytest

from iscc_specs_spark.operators import textstats as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog, and it is fast!", "en"),
        (1, "", "und"),
        (2, None, "und"),
        (3, "der die das und ist ein zu den mit von", "de"),
        (4, "!!! ??? ...", "und"),
        (5, "  spaced    out\ttext  ", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}

def test_token_counts(docs):
    r = _by_id(T.token_counts(docs))
    assert r[0]["n_tokens"] == 13
    assert r[1]["n_tokens"] == 0 and r[1]["n_chars"] == 0
    assert r[2]["n_tokens"] == 0
    assert r[5]["n_tokens"] == 3
    # BPE-ish: words + punctuation symbols counted separately
    assert r[4]["n_bpe_tokens"] == 9
    assert r[0]["n_bpe_tokens"] == 15  # 13 words + ',' + '!'


def test_quality_scores(docs):
    r = _by_id(T.quality_scores(docs))
    assert r[1]["quality_score"] == pytest.approx(0.3)  # empty: only punct term
    assert r[0]["quality_score"] > 0.8  # long, clean, stopword-rich
    assert 0.0 <= r[4]["quality_score"] <= 1.0
    assert r[4]["punct_ratio"] > 0.5


def test_language_id(docs):
    r = _by_id(T.language_id(docs))
    assert r[0]["pred_lang"] == "en"
    assert r[3]["pred_lang"] == "de"
    assert r[1]["pred_lang"] == "und"
    assert r[4]["pred_lang"] == "und"


def test_fingerprints_ws_invariance(spark):
    rows = [(0, "Hello   World  Again"), (1, "hello world again"), (2, "other text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = _by_id(T.fingerprints(df))
    assert r[0]["content_fp"] == r[1]["content_fp"]
    assert r[0]["content_fp"] != r[2]["content_fp"]


def test_min_shingle_fp_shared_run(spark):
    shared = " ".join(f"w{i}" for i in range(30))
    rows = [(0, "prefix " + shared), (1, shared + " suffix zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = _by_id(T.fingerprints(df, shingle_words=5))
    # both docs contain all shingles of the shared 30-word run; the global
    # min shingle hash is very likely inside it (26 shared vs ~2 unique)
    assert r[0]["min_shingle_fp"] == r[1]["min_shingle_fp"]


def test_extract_text_roundtrip(spark):
    """North-rule invariant: extraction recovers the text column
    byte-identically from the rendered html for every page."""
    from pyspark.sql import functions as F

    from iscc_specs_spark.operators.extraction import extract_text
    from iscc_specs_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 60, partitions=2)
    ex = extract_text(pages)
    bad = ex.where(
        F.col("extracted_text") != F.coalesce(F.col("text"), F.lit(""))
    ).count()
    assert bad == 0


def test_extract_text_multi_paragraph(spark):
    from iscc_specs_spark.operators.extraction import extract_text

    df = spark.createDataFrame(
        [(b"<html><body><p>one</p><div>x</div><p>two\nlines</p></body></html>",)],
        "html binary",
    )
    got = extract_text(df).collect()[0]["extracted_text"]
    assert got == "one\ntwo\nlines"


def test_extract_text_malformed_utf8(spark):
    """A crawl page with invalid UTF-8 bytes must not fail the job (ANSI
    decode() would raise MALFORMED_CHARACTER_CODING): invalid sequences
    decode to U+FFFD deterministically, valid pages are byte-identical."""
    from iscc_specs_spark.operators.extraction import extract_text

    bad = b"<html><body><p>ok \xff\xfe broken</p><p>tail</p></body></html>"
    # truncated multi-byte sequence at paragraph edge
    trunc = b"<html><body><p>caf\xc3</p></body></html>"
    good = "<html><body><p>café</p></body></html>".encode("utf-8")
    df = spark.createDataFrame(
        [("u1", bad), ("u2", trunc), ("u3", good)], "url string, html binary"
    )
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_text(df).collect()
    }
    assert got["u1"] == "ok �� broken\ntail"
    assert got["u2"] == "caf�"
    assert got["u3"] == "café"


def test_fingerprints_xxh64_same_partition_as_md5(spark):
    """The production xxh64 fingerprint variant induces exactly the same
    equality classes as the md5 (oracle) variant — hash choice must not
    change which documents share a fingerprint."""
    from iscc_specs_spark.operators.textstats import fingerprints

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),   # exact dup of 0
            (2, "ALPHA  beta gamma delta epsilon zeta"),  # normalizes to 0
            (3, "different text entirely here now ok"),
            (4, ""),
        ],
        "doc_id long, text string",
    )

    def classes(hash_fn):
        rows = {r["doc_id"]: r for r in fingerprints(docs, hash_fn=hash_fn).collect()}
        by_fp: dict = {}
        for r in rows.values():
            by_fp.setdefault(r["content_fp"], set()).add(r["doc_id"])
        return sorted(map(frozenset, by_fp.values()), key=sorted), rows

    md5_cls, md5_rows = classes("md5")
    xx_cls, xx_rows = classes("xxh64")
    # content_fp equality classes are hash-invariant (same normalization)
    assert md5_cls == xx_cls
    assert len(xx_cls) == 3  # {0,1,2}, {3}, {4}
    # exact dups share min_shingle_fp under either hash (identical shingle
    # sets → identical argmin input set). NOTE: which shingle wins the min
    # legitimately differs between hashes for near-dups — only the
    # equal-min ⇒ shared-shingle direction is hash-invariant.
    for rows in (md5_rows, xx_rows):
        assert rows[0]["min_shingle_fp"] == rows[1]["min_shingle_fp"]
        assert rows[0]["min_shingle_fp"] != rows[3]["min_shingle_fp"]


def _rep_truth(text):
    """Pure-Python twin of repetition_stats for one doc (overlap-ignoring,
    capped, (cnt, charlen, gram)-max tie-break)."""
    from collections import Counter

    text = text or ""
    toks = text.strip().split() if text.strip() else []
    out = {}
    for n, kind in [(2, "top"), (3, "top"), (4, "top")] + [
        (n, "dup") for n in range(5, 11)
    ]:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        if not c or not len(text):
            out[f"{kind}{n}_frac"] = 0.0
            continue
        if kind == "top":
            cnt, charlen, _ = max((v, len(k), k) for k, v in c.items())
            frac = cnt * charlen / len(text)
        else:
            frac = sum(v * len(k) for k, v in c.items() if v >= 2) / len(text)
        out[f"{kind}{n}_frac"] = round(min(1.0, frac), 6)
    return out


def test_repetition_stats(spark):
    rows = [
        # long-and-varied: passes every threshold (short docs legitimately
        # fail top-n: one 14-char 3-gram over 59 chars is already > 0.18)
        (0, " ".join(f"word{i} tok{i * 7 % 97}" for i in range(60))),
        # heavy repetition: one 5-gram repeated 4x -> fails dup thresholds
        (1, " ".join(["alpha beta gamma delta epsilon"] * 4)),
        # top-2-gram spam: "buy now" half the doc -> fails top2
        (2, "buy now " * 8 + "unique tail words here"),
        (3, ""),
        (4, None),
        (5, "one two"),  # too short for any n>=3 gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _by_id(T.repetition_stats(df))
    assert len(got) == 6
    for doc_id, text in rows:
        truth = _rep_truth(text)
        for name, v in truth.items():
            assert got[doc_id][name] == pytest.approx(v, abs=1e-9), (
                doc_id,
                name,
            )
        ok = all(
            truth[f"top{n}_frac"] <= t
            for n, t in T.GOPHER_TOP_THRESHOLDS.items()
        ) and all(
            truth[f"dup{n}_frac"] <= t
            for n, t in T.GOPHER_DUP_THRESHOLDS.items()
        )
        assert got[doc_id]["repetition_ok"] == ok, doc_id
    # the planted cases actually exercise both failure modes
    assert got[0]["repetition_ok"]
    assert not got[1]["repetition_ok"] and got[1]["dup5_frac"] > 0.5
    assert not got[2]["repetition_ok"] and got[2]["top2_frac"] > 0.20
    assert got[3]["repetition_ok"] and got[3]["dup10_frac"] == 0.0


def test_pii_scrub(spark):
    import hashlib

    rows = [
        (0, "reach me at alice.smith+tag@mail.example.org for details"),
        (1, "call +491234567890 or +12025550123 today"),
        (2, "server at 192.168.1.250 and 10.0.0.1 responded"),
        (3, "plain text with no pii at all"),
        (4, "mixed: bob@x.co from 8.8.8.8 dial +33123456789"),
        (5, None),
        # not-PII lookalikes: short digit run after '+', version-ish dots
        (6, "v1.2.3 release +123 grade"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.pii_scrub(df).collect()}

    def fp(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 0
    assert got[0]["clean_fp"] == fp("reach me at <EMAIL> for details")
    assert got[1]["n_phone"] == 2 and got[1]["n_email"] == 0
    assert got[1]["clean_fp"] == fp("call <PHONE> or <PHONE> today")
    assert got[2]["n_ipv4"] == 2
    assert got[2]["clean_fp"] == fp("server at <IPV4> and <IPV4> responded")
    assert got[3]["n_email"] == got[3]["n_phone"] == got[3]["n_ipv4"] == 0
    assert got[3]["clean_fp"] == fp("plain text with no pii at all")
    assert (got[4]["n_email"], got[4]["n_phone"], got[4]["n_ipv4"]) == (1, 1, 1)
    assert got[4]["clean_fp"] == fp("mixed: <EMAIL> from <IPV4> dial <PHONE>")
    assert got[5]["clean_fp"] == fp("")
    # +123 is only 3 digits (< 7) and 1.2.3 has no 4th octet — no matches
    assert got[6]["n_phone"] == 0 and got[6]["n_ipv4"] == 0
    assert got[6]["clean_fp"] == fp("v1.2.3 release +123 grade")


def test_c4_filters(spark):
    import hashlib

    def fp(s):
        return hashlib.md5(s.encode()).hexdigest()

    good = "This is a perfectly fine sentence with many words."
    rows = [
        # 0: clean page, 5 kept lines x >=1 sentence each -> keep
        (0, "\n".join([good] * 5)),
        # 1: enough sentences but lorem ipsum on the page -> drop
        (1, "\n".join([good] * 5 + ["footer Lorem Ipsum text here."])),
        # 2: curly brace -> drop
        (2, "\n".join([good] * 5 + ["function f() { return 1; }"])),
        # 3: only 2 sentences -> drop (page rule), lines still reported
        (3, good + "\nAnother good sentence right here.\nno terminal punct"),
        # 4: javascript line filtered, two-word line filtered
        (4, "\n".join([good] * 5 + ["Enable JavaScript now.", "Too short."])),
        # 5: empty
        (5, ""),
    ]
    got = {
        r["doc_id"]: r
        for r in T.c4_filters(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got[0]["keep"] and got[0]["n_kept_lines"] == 5
    assert got[0]["n_sentences"] == 5
    assert got[0]["clean_fp"] == fp("\n".join([good] * 5))
    assert got[1]["has_lorem"] and not got[1]["keep"]
    assert got[2]["has_brace"] and not got[2]["keep"]
    r3 = got[3]
    assert r3["n_lines"] == 3 and r3["n_kept_lines"] == 2
    assert r3["n_sentences"] == 2 and not r3["keep"]
    assert r3["clean_fp"] == fp(good + "\nAnother good sentence right here.")
    r4 = got[4]
    # the javascript line and the 2-word line are both filtered out
    assert r4["n_lines"] == 7 and r4["n_kept_lines"] == 5 and r4["keep"]
    assert got[5]["n_kept_lines"] == 0 and not got[5]["keep"]
    assert got[5]["clean_fp"] == fp("")


class TestCompressionStats:
    def _run(self, spark, rows):
        from iscc_specs_spark.operators.textstats import compression_stats

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r.asDict() for r in compression_stats(df).collect()}

    def test_counts_match_zlib(self, spark):
        import zlib

        rows = [
            (1, "The quick brown fox jumps over the lazy dog near the bank."),
            (2, "spam " * 400),
            (3, None),
        ]
        out = self._run(spark, rows)
        for doc_id, text in rows:
            b = (text or "").encode()
            assert out[doc_id]["n_bytes"] == len(b)
            assert out[doc_id]["z_bytes"] == len(zlib.compress(b, 6))

    def test_flags(self, spark):
        import random

        rng = random.Random(7)
        noise = " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(8))
            for _ in range(300)
        )
        prose = " ".join([
            "Researchers described the method in detail and compared"
            " results across datasets.",
            "The committee voted to adopt the proposal after a lengthy"
            " public discussion.",
            "Glaciers in the region have retreated steadily over the past"
            " four decades.",
            "Her latest novel explores memory, migration, and the meaning"
            " of home.",
            "Engineers traced the outage to a misconfigured router in the"
            " old annex.",
        ])
        out = self._run(
            spark,
            [(1, "spam " * 400), (2, noise), (3, prose), (4, "")],
        )
        assert out[1]["compression_ratio"] < 0.25
        assert not out[1]["compression_ok"]          # template repetition
        assert out[2]["compression_ratio"] > 0.6
        assert out[3]["compression_ok"], out[3]      # normal prose passes
        assert out[4]["compression_ratio"] is None
        assert not out[4]["compression_ok"]          # empty doc fails


def test_compression_stats_string_id(spark):
    """id_col is generic: a url-keyed corpus (the curation plan's shape)
    must work — the mapInPandas output schema follows the input id type
    instead of hardcoding `id long`."""
    import zlib

    from iscc_specs_spark.operators.textstats import compression_stats

    df = spark.createDataFrame(
        [("https://a.example/p/1", "word " * 50), ("https://a.example/p/2", "x")],
        "url string, text string",
    )
    out = {
        r["url"]: r.asDict()
        for r in compression_stats(df, id_col="url").collect()
    }
    assert set(out) == {"https://a.example/p/1", "https://a.example/p/2"}
    b = ("word " * 50).encode()
    assert out["https://a.example/p/1"]["z_bytes"] == len(zlib.compress(b, 6))


def test_hot_ngrams_counts_and_order(spark):
    """Corpus-wide top n-grams: exact totals/doc-frequencies, min_docs
    pruning, and the deterministic (n_total DESC, gram) order the DuckDB
    twin must reproduce at the top-k cut."""
    from iscc_specs_spark.operators.textstats import hot_ngrams

    docs = spark.createDataFrame(
        [
            (1, "accept all cookies to continue reading this site"),
            (2, "please accept all cookies to continue reading now"),
            (3, "accept all cookies to continue reading please"),
            (4, "a private phrase repeated here a private phrase repeated here"),
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    rows = hot_ngrams(docs, n=5, top_k=10, min_docs=2).collect()
    got = {r["gram"]: (r["n_total"], r["n_docs"]) for r in rows}
    # the banner 5-gram spans docs 1-3; doc 4's repeat is single-doc → pruned
    assert got["accept all cookies to continue"] == (3, 3)
    assert got["all cookies to continue reading"] == (3, 3)
    assert "a private phrase repeated here" not in got
    # order: count desc, then gram text asc
    keys = [(r["n_total"], r["gram"]) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    # min_docs=1 admits the single-doc repeat with its within-doc count
    solo = {
        r["gram"]: (r["n_total"], r["n_docs"])
        for r in hot_ngrams(docs, n=5, top_k=50, min_docs=1).collect()
    }
    assert solo["a private phrase repeated here"] == (2, 1)


def test_hot_ngrams_unigram_edge(spark):
    from iscc_specs_spark.operators.textstats import hot_ngrams

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha gamma")],
        "doc_id long, text string",
    )
    got = {
        r["gram"]: (r["n_total"], r["n_docs"])
        for r in hot_ngrams(docs, n=1, top_k=5, min_docs=1).collect()
    }
    assert got["alpha"] == (3, 2)
    assert got["beta"] == (1, 1)
