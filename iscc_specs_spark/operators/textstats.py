"""Text-analysis operators for a training-data pipeline.

Everything here is native Spark SQL (JVM-side, whole-stage codegen — no
Python UDFs): token counting, quality scoring, Gopher repetition rules,
PII detection/redaction, language-ID heuristic and document fingerprinting
over a ``documents(doc_id, text, lang, ...)`` table.

Each operator is deliberately expressible in ANSI-ish SQL so the driver's
DuckDB oracle can verify it value-for-value (see __spark_entry__.oracle_sql).
Reference parity: the reference has no text-analytics surface beyond
normalization (``/root/reference/src/iscc/iscc.py:177-211``); these operators
extend the engine for web-scale corpus curation per the build brief.

Scale notes: every operator except ``repetition_stats`` is a narrow per-row
projection — no shuffle, no UDF, fully pushdown-friendly (reads only
``doc_id, text``); at 100 TB a single map stage bounded by scan bandwidth.
``repetition_stats`` adds one skew-free aggregation shuffle keyed by
(doc_id, n, gram-hash) — see its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Word-ish tokens for the BPE-ish count: runs of alphanumerics OR a single
# non-alphanumeric, non-space symbol (so "don't" -> don, ', t  = 3 tokens).
BPE_TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]"
PUNCT_RE = "[.,;:!?'\"()\\[\\]{}<>/\\\\|@#$%^&*_+=~`-]"

# Tiny deterministic stopword lexicons for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
}

# Generic (language-agnostic) stopwords for the quality score.
QUALITY_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})


def _tokens(col: str = "text"):
    """Whitespace tokens of the trimmed text; empty text -> empty array."""
    trimmed = F.trim(F.coalesce(F.col(col), F.lit("")))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, "\\s+")
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """id, n_chars, n_tokens (whitespace), n_bpe_tokens (regex)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        id_col,
        F.length(text).alias("n_chars"),
        F.size(_tokens()).alias("n_tokens"),
        F.regexp_count(text, F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", keep_cols: tuple = ()
) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + one score.

    score = 0.4·len_ok + 0.3·(1−punct_ratio clipped) + 0.3·stopword_signal —
    a deterministic heuristic in [0,1]; thresholds are corpus knobs.
    ``keep_cols`` pass through unchanged (the operator is a pure projection,
    so carrying columns beats a join-back).
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = _tokens()
    n_tok = F.size(toks)
    sw_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), sw_arr))
    # ratio of *distinct* stopwords present vs a cap (signal saturates at 5)
    stop_signal = F.least(n_stop / F.lit(5.0), F.lit(1.0))
    punct_ratio = F.when(
        F.length(text) > 0,
        F.regexp_count(text, F.lit(PUNCT_RE)) / F.length(text),
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        id_col,
        *keep_cols,
        F.size(toks).alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        n_stop.alias("n_stopwords"),
        F.round(
            0.4 * len_ok + 0.3 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
            + 0.3 * stop_signal,
            6,
        ).alias("quality_score"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language-ID heuristic.

    For each language: hits = #distinct lexicon words present in the token
    set. Predicted language = argmax hits (ties → lexicographic language
    order), 'und' (undetermined) when no lexicon hits at all.
    """
    toks = F.array_distinct(_tokens())
    hit_cols = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))
        )
        for lang, ws in sorted(STOPWORDS.items())
    }
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # build CASE lang-by-lang in reverse so earlier languages win ties
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when((best > 0) & (hit_cols[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    out = docs.select(
        "doc_id",
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in sorted(STOPWORDS)],
        pred.alias("pred_lang"),
    )
    return out


def fingerprints(
    docs: DataFrame, shingle_words: int = 5, hash_fn: str = "md5"
) -> DataFrame:
    """Document fingerprints: full-content hash + min-shingle rolling hash.

    * ``content_fp``  — hash of the casefolded, whitespace-collapsed text
      (exact-dup key).
    * ``min_shingle_fp`` — minimum hash over all ``shingle_words``-word
      shingles (a 1-permutation MinHash: equal values ⇒ shared shingle,
      the winnowing primitive for substring dedup).

    ``hash_fn``: "md5" (default — cross-engine, the DuckDB-oracled driver
    configuration) or "xxh64" (production: JVM-native xxhash64, ~2× faster,
    emits the fingerprints as zero-padded hex of the 64-bit hash — same
    equal-iff-same-content contract; same pattern as substring.py's
    md5-oracle / xxh64-production anchors).
    """
    from pyspark.sql import Window

    if hash_fn == "md5":
        hf = F.md5
    elif hash_fn == "xxh64":
        def hf(c):
            return F.lpad(F.hex(F.xxhash64(c)), 16, "0")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), "\\s+", " "
    )
    k = shingle_words
    # min-shingle via the explode + per-doc window-lead pattern
    # (repetition_stats / word_shingles): the former transform(shingles,
    # hf) evaluated slice+concat_ws+hash interpreted per shingle — the
    # documented HOF trap. Same shingle set: full k-grams where the k-th
    # lead exists; the pos-0 row alone when the document has < k tokens
    # (concat_ws skips NULL leads → the whole-text padded shingle,
    # including "" for an empty document via posexplode_outer's NULL row).
    # min(hash-string) under the aggregate is the same binary-string
    # ordering array_min used, and partial aggregation keeps the one
    # doc_id-keyed exchange narrow.
    tok_rows = docs.select(
        "doc_id", F.posexplode_outer(_tokens()).alias("pos", "t0")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = tok_rows.select(
        "doc_id",
        "pos",
        "t0",
        *[F.lead("t0", j).over(w).alias(f"t{j}") for j in range(1, k)],
    )
    gram = F.concat_ws(" ", *[F.col(f"t{j}") for j in range(k)])
    mins = (
        leads.where(
            F.col(f"t{k - 1}").isNotNull()
            | (F.coalesce(F.col("pos"), F.lit(0)) == 0)
        )
        .select("doc_id", hf(gram).alias("_h"))
        .groupBy("doc_id")
        .agg(F.min("_h").alias("min_shingle_fp"))
    )
    return docs.select("doc_id", hf(norm).alias("content_fp")).join(
        mins, "doc_id", "left"
    ).select("doc_id", "content_fp", "min_shingle_fp")


# Gopher repetition thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", arXiv:2112.11446,
# Table A1): a document passes when every fraction is <= its threshold.
GOPHER_TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def repetition_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gopher within-document repetition metrics + pass/fail flag.

    Per document (published method, Rae et al. 2021 §A.1.1):

    * ``top{n}_frac`` (n=2..4) — characters covered by the most frequent
      word n-gram: ``count * chars(gram) / n_chars``;
    * ``dup{n}_frac`` (n=5..10) — characters covered by all n-grams that
      occur more than once: ``sum(count * chars(gram)) / n_chars``;
    * ``repetition_ok`` — true iff every fraction is <= its Gopher
      threshold (GOPHER_TOP_THRESHOLDS / GOPHER_DUP_THRESHOLDS).

    Engine-defined deviation (mirrored exactly by the DuckDB oracle twin):
    overlapping occurrences are counted per-occurrence, not per distinct
    character position, so each fraction is the overlap-ignoring upper
    bound of Gopher's, capped at 1.0. The "most frequent n-gram" pick is
    (count, chars) max — a tie-break cannot change the fraction (it only
    depends on count and chars).

    Scale: tokens are exploded ONCE and the nine gram sizes are built by a
    per-document window ``lead`` + ``concat_ws`` — entirely inside
    whole-stage codegen (a higher-order ``transform``/``slice`` formulation
    was 10× slower: Catalyst interprets lambda bodies per array element).
    The gram STRING never leaves the map side: rows are projected to
    ``(doc_id, n, xxhash64(gram), length(gram))`` before the one
    aggregation shuffle keyed by (doc_id, n, gram-hash) — the doc_id in
    the key makes hot grams skew-free, and the fixed-width key keeps the
    exchange ~28 B/gram instead of shipping 10-gram strings. The DuckDB
    twin groups by the raw gram string — identical unless xxhash64
    collides within one (doc, n) (≈2⁻⁶⁴; the same documented policy as the
    LSH band oracles). The window's partition is one document (bounded);
    top and dup fractions come out of ONE per-(doc_id, n) aggregation over
    that single subtree — nothing is consumed twice. No UDFs, no joins
    against anything unbounded; cost is ~9 gram rows per token, bounded by
    scan bandwidth.
    """
    from pyspark.sql import Window

    text = F.coalesce(F.col("text"), F.lit(""))
    all_ns = sorted(GOPHER_TOP_THRESHOLDS) + sorted(GOPHER_DUP_THRESHOLDS)
    nmax = max(all_ns)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).alias("n_chars"),
        F.posexplode(_tokens()).alias("pos", "t0"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = toks.select(
        "doc_id",
        "n_chars",
        "t0",
        *[F.lead("t0", k).over(w).alias(f"t{k}") for k in range(1, nmax)],
    )

    def _gram_struct(n: int):
        # t{n-1} non-null implies t0..t{n-2} non-null (lead offsets grow
        # toward the document tail), so concat_ws never skips a middle token
        gram = F.concat_ws(" ", *[F.col(f"t{k}") for k in range(n)])
        return F.when(
            F.col(f"t{n - 1}").isNotNull(),
            F.struct(
                F.lit(n).alias("n"),
                F.xxhash64(gram).alias("gh"),
                F.length(gram).alias("charlen"),
            ),
        )

    grams = leads.select(
        "doc_id",
        "n_chars",
        F.explode(F.array(*[_gram_struct(n) for n in all_ns])).alias("g"),
    ).where(F.col("g").isNotNull())
    counts = (
        grams.select(
            "doc_id",
            "n_chars",
            F.col("g.n").alias("n"),
            F.col("g.gh").alias("gh"),
            F.col("g.charlen").alias("charlen"),
        )
        .groupBy("doc_id", "n_chars", "n", "gh", "charlen")
        .agg(F.count("*").alias("cnt"))
    )
    per_n = counts.groupBy("doc_id", "n_chars", "n").agg(
        F.max(F.struct("cnt", "charlen")).alias("t"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.col("charlen"))
        ).alias("dupchars"),
    )
    # NULL-safe 1.0 cap: F.least skips NULLs (least(1.0, NULL) = 1.0), so
    # the no-duplicated-grams case must stay NULL through the cap.
    raw = F.when(
        F.col("n") <= max(GOPHER_TOP_THRESHOLDS),
        F.col("t.cnt") * F.col("t.charlen") / F.col("n_chars"),
    ).otherwise(F.col("dupchars") / F.col("n_chars"))
    fracs = per_n.select(
        "doc_id",
        "n",
        F.round(F.when(raw > 1.0, F.lit(1.0)).otherwise(raw), 6).alias("frac"),
    )
    names = [f"top{n}_frac" for n in sorted(GOPHER_TOP_THRESHOLDS)] + [
        f"dup{n}_frac" for n in sorted(GOPHER_DUP_THRESHOLDS)
    ]
    ns = sorted(GOPHER_TOP_THRESHOLDS) + sorted(GOPHER_DUP_THRESHOLDS)
    pivoted = (
        fracs.groupBy("doc_id")
        .agg(
            *[
                F.max(F.when(F.col("n") == n, F.col("frac"))).alias(name)
                for n, name in zip(ns, names)
            ]
        )
    )
    thresholds = {
        f"top{n}_frac": t for n, t in GOPHER_TOP_THRESHOLDS.items()
    } | {f"dup{n}_frac": t for n, t in GOPHER_DUP_THRESHOLDS.items()}
    out = docs.select(F.col(id_col).alias("doc_id")).join(
        pivoted, "doc_id", "left"
    )
    filled = [F.coalesce(F.col(name), F.lit(0.0)).alias(name) for name in names]
    ok = None
    for name in names:
        cond = F.coalesce(F.col(name), F.lit(0.0)) <= F.lit(thresholds[name])
        ok = cond if ok is None else (ok & cond)
    return out.select("doc_id", *filled, ok.alias("repetition_ok"))


def hot_ngrams(
    docs: DataFrame,
    n: int = 5,
    top_k: int = 100,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide most frequent word ``n``-grams — ``(gram, n_total,
    n_docs)``, the ``top_k`` grams by total occurrence count (ties broken
    by gram text, a total order). The standard boilerplate-DISCOVERY
    report: where line_dedup and the class caps *apply* a known-boilerplate
    policy, this is how the filter lists get built in the first place
    (cookie banners, licence headers, template chrome surface at the top).
    ``min_docs`` prunes grams confined to fewer documents (within-doc
    repetition is repetition_stats' job).

    Scale: tokens explode once; grams ride the same per-document window
    ``lead`` + ``concat_ws`` whole-stage-codegen pattern as
    repetition_stats (HOF ``transform`` is interpreted per element — the
    documented 10× trap). Two aggregation exchanges, BOTH skew-free under
    map-side partial aggregation: (gram, doc_id) collapses per-doc
    occurrences, then gram alone sums totals — partial agg caps any single
    gram's exchange rows at one per upstream partition, so a viral
    boilerplate gram cannot hot-spot the shuffle. Top-k compiles to
    TakeOrderedAndProject (per-partition heap + driver merge of top_k
    rows), never a global sort or unpartitioned window.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens()).alias("pos", "t0"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = toks.select(
        "doc_id",
        "t0",
        *[F.lead("t0", k).over(w).alias(f"t{k}") for k in range(1, n)],
    )
    gram = F.concat_ws(" ", *[F.col(f"t{k}") for k in range(n)])
    grams = leads.where(F.col(f"t{n - 1}").isNotNull()).select(
        "doc_id", gram.alias("gram")
    )
    per_doc = grams.groupBy("gram", "doc_id").agg(F.count("*").alias("cnt"))
    agg = per_doc.groupBy("gram").agg(
        F.sum("cnt").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_docs"),
    )
    return (
        agg.where(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_total").desc(), F.col("gram"))
        .limit(top_k)
    )


# PII surface patterns chosen for identical semantics under Java regex
# (Spark) and RE2 (DuckDB): no backreferences, no lookaround, ASCII \b.
# Replacement order is list order; replacement tokens contain no digits or
# '@' so later patterns can never match inside an earlier redaction.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII detection + redaction for training-data hygiene: per document,
    match counts for email / international-format phone / IPv4 patterns
    (counted on the original text) and ``clean_fp`` = md5 of the text with
    every match replaced by its ``<TYPE>`` token, applied in PII_PATTERNS
    order.

    The pattern set is deliberately narrow-and-portable (see PII_PATTERNS)
    rather than recall-maximal: the point of the operator is the distributed
    shape — a zero-shuffle narrow projection, regexp entirely inside
    whole-stage codegen, no UDFs — onto which production pattern packs drop
    in. The DuckDB twin (oracles.py:pii_scrub_sql) runs the same patterns
    under RE2.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = text
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, F.md5(red).alias("clean_fp")
    )


# C4 line/page heuristics (Raffel et al. 2020 §2.2, arXiv:1910.10683):
# keep lines ending in terminal punctuation with >= 3 words and no
# "javascript"; drop pages with < 5 kept sentences, "lorem ipsum", or "{".
C4_TERMINAL_RE = r'[.!?"]$'
C4_SENTENCE_RE = r"[.!?]"


def c4_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2) as one pass.

    Line rule — a line is kept iff its trimmed text ends in terminal
    punctuation (``.!?"``), contains >= ``min_words`` whitespace words,
    and does not mention "javascript" (case-insensitive). Page rule — the
    page is kept iff its kept lines carry >= ``min_sentences`` sentence
    marks and the raw text contains neither "lorem ipsum" nor ``{``.

    Per document: ``(doc_id, n_lines, n_kept_lines, n_sentences,
    has_lorem, has_brace, keep, clean_fp)`` where ``clean_fp`` = md5 of
    the kept lines re-joined with ``\\n`` in original order (page-dropped
    docs still report their would-be clean_fp; ``keep`` is the verdict).

    Scale: page flags are computed ONCE per doc before the explode (not
    per line — that would re-scan the full text n_lines times), then one
    posexplode and one groupBy on doc_id — a single doc_id-keyed exchange,
    skew-free (doc_id in the key), bounded reassembly per doc exactly like
    line_dedup. All predicates are codegen-resident regexps; the per-doc
    sort/filter/transform HOFs run on one document's line array (the
    small-array case where interpreted HOFs are fine, CLAUDE.md).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lower(text).contains("lorem ipsum").alias("has_lorem"),
        text.contains("{").alias("has_brace"),
        F.split(text, "\n").alias("ls"),
    )
    lines = base.select(
        "doc_id", "has_lorem", "has_brace",
        F.posexplode("ls").alias("pos", "line"),
    )
    trimmed = F.trim(F.col("line"))
    kept = (
        trimmed.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(trimmed, r"\s+")) >= min_words)
        & ~F.lower(F.col("line")).contains("javascript")
    )
    agg = lines.groupBy("doc_id", "has_lorem", "has_brace").agg(
        F.count("*").alias("n_lines"),
        F.sum(kept.cast("long")).alias("n_kept_lines"),
        F.sum(
            F.when(kept, F.regexp_count(trimmed, F.lit(C4_SENTENCE_RE)))
            .otherwise(0)
            .cast("long")
        ).alias("n_sentences"),
        F.md5(
            F.array_join(
                F.transform(
                    F.filter(
                        F.sort_array(
                            F.collect_list(
                                F.struct(F.col("pos"), kept.alias("k"), F.col("line"))
                            )
                        ),
                        lambda s: s["k"],
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            )
        ).alias("clean_fp"),
    )
    return agg.select(
        "doc_id", "n_lines", "n_kept_lines", "n_sentences",
        "has_lorem", "has_brace",
        (
            (F.col("n_sentences") >= min_sentences)
            & ~F.col("has_lorem")
            & ~F.col("has_brace")
        ).alias("keep"),
        "clean_fp",
    )


# Engine-defined compressibility bounds (documented, oracle-mirrored): a
# web page whose zlib ratio is very low is near-pure repetition (template
# spam); a ratio near/above 1.0 is incompressible junk (minified blobs,
# base64, random strings). MADLAD-400 (Kudugunta et al. 2023) and several
# CC-pipeline writeups use this class of filter; the exact bounds are a
# config knob, not a published constant.
COMPRESSION_BOUNDS = (0.25, 0.95)


def compression_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
    bounds: tuple[float, float] = COMPRESSION_BOUNDS,
) -> DataFrame:
    """zlib-compressibility quality signal: ``(doc_id, n_bytes, z_bytes,
    compression_ratio, compression_ok)``.

    ``n_bytes`` — UTF-8 length of the text; ``z_bytes`` — length of
    ``zlib.compress(text, level)``; ratio = z/n rounded to 6 dp (NULL for
    empty docs, which also fail the flag); ``compression_ok`` iff
    bounds[0] <= ratio <= bounds[1].

    The compress call is the one non-SQL step (DEFLATE is not expressible
    in either engine's SQL), so it runs as ONE Arrow-batched
    ``mapInPandas`` pass emitting two ints per doc — C-call-bound like the
    image decode kernels, narrow, zero shuffle; every derivation after it
    (ratio, flag) is native SQL. Determinism: zlib output is a pure
    function of (bytes, level) for a given zlib build; the DuckDB twin
    therefore verifies the staged (n_bytes, z_bytes) pair's derivations
    (ratio arithmetic + flag), the established staged-oracle split
    (oracles.py module docstring).
    """
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": [len(b) for b in raw],
                    "z_bytes": [len(zlib.compress(b, level)) for b in raw],
                }
            )

    lo, hi = bounds
    id_type = dict(docs.dtypes)[id_col]  # works for long doc_ids AND string urls
    stats = docs.select(
        F.col(id_col), F.col(text_col)
    ).mapInPandas(run, schema=f"id {id_type}, n_bytes long, z_bytes long")
    ratio = F.when(
        F.col("n_bytes") > 0,
        F.round(F.col("z_bytes") / F.col("n_bytes"), 6),
    )
    return stats.select(
        F.col("id").alias(id_col),
        "n_bytes",
        "z_bytes",
        ratio.alias("compression_ratio"),
        F.coalesce(
            (ratio >= F.lit(lo)) & (ratio <= F.lit(hi)), F.lit(False)
        ).alias("compression_ok"),
    )
