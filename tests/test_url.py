"""URL canonicalization + registrable domains (functions/url.py):
normalization fixtures, tracking-param and fragment stripping, the
PSL-approximate domain cut, codegen purity, and composition with
exact_dedup / cap_per_group on a crawl corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.url import (
    normalize_url,
    registrable_domain,
    url_host,
)


def _one(spark, expr, value):
    return (
        spark.createDataFrame([(value,)], "u string")
        .select(expr("u").alias("out"))
        .collect()[0]["out"]
    )


def test_normalize_url_fixtures(spark):
    cases = {
        # case, default port, fragment, tracking params, param order
        "HTTP://Example.COM:80/Path?b=2&utm_source=x&a=1#frag":
            "http://example.com/Path?a=1&b=2",
        "https://example.com:443/": "https://example.com/",
        "https://example.com": "https://example.com/",
        "https://example.com/p?fbclid=abc": "https://example.com/p",
        "https://example.com/p?z=1&y=2": "https://example.com/p?y=2&z=1",
        # path case is PRESERVED (only scheme/host fold)
        "https://example.com/CaseSensitive": "https://example.com/CaseSensitive",
        # unparseable input falls back to its trimmed self
        "  not a url  ": "not a url",
    }
    for raw, want in cases.items():
        assert _one(spark, normalize_url, raw) == want, raw


def test_url_host_strips_default_ports(spark):
    assert _one(spark, url_host, "https://A.B.example.com:443/x") == "a.b.example.com"
    assert _one(spark, url_host, "http://example.com:8080/x") == "example.com:8080"


def test_registrable_domain_fixtures(spark):
    cases = {
        "https://a.b.example.com/x": "example.com",
        "https://www.example.co.uk/x": "example.co.uk",
        "sub.x.co.uk": "x.co.uk",
        "example.com": "example.com",
        "localhost": "localhost",
        "http://10.0.0.1:8080/x": "10.0.0.1",
        "news.bbc.ac.jp": "bbc.ac.jp",
    }
    for raw, want in cases.items():
        assert _one(spark, registrable_domain, raw) == want, raw


def test_expressions_are_codegen_pure(spark):
    """No Python eval nodes: the whole URL kit must stay JVM-side."""
    df = spark.createDataFrame([("https://x.example.com/a?b=1",)], "u string").select(
        normalize_url("u"), registrable_domain("u")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_composes_with_dedup_and_capping(spark):
    """The crawl-corpus shape: URL-level dedup via exact_dedup on the
    normalized key, domain capping via cap_per_group on the registrable
    domain — both existing operators, no new machinery."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        cap_per_group,
    )

    urls = [
        "https://example.com/p?utm_source=a",
        "http://EXAMPLE.com:80/p",           # same page as above after norm? (scheme differs)
        "https://example.com/p",             # dup of the first
        "https://a.example.com/1",
        "https://b.example.com/2",
        "https://c.example.com/3",
        "https://other.org/1",
    ]
    docs = spark.createDataFrame([(u, f"text {i}") for i, u in enumerate(urls)], "url string, text string")
    keyed = docs.select(
        "url", "text",
        normalize_url("url").alias("norm"),
        registrable_domain("url").alias("domain"),
    )
    # URL dedup: the utm variant and the bare https variant share one key
    deduped = keyed.dropDuplicates(["norm"])
    assert deduped.count() == len(urls) - 1  # one exact URL dup removed
    # domain capping: at most 2 docs per registrable domain
    capped = cap_per_group(keyed, "domain", n=2, id_col="url")
    per = {r["domain"]: r["n"] for r in capped.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert per["example.com"] == 2 and per["other.org"] == 1
