"""URL canonicalization and host-level corpus statistics.

Web-corpus pipelines key dedup, quota, and quality decisions on the
canonical URL and its host (one crawl page appears under http/https,
with/without ``www.``, with tracking params, etc. — C4 and RefinedWeb
both run URL-level dedup and per-host filtering before any content
pass). All transforms are single regexp passes — JVM-side,
WholeStageCodegen — so canonicalization never leaves the scan stage,
and the host aggregation is one hash-partial-aggregated groupBy on a
low-cardinality key (hosts ≪ pages; a pathological single-host crawl
is the one skew case, handled the same way as any hot aggregate key:
AQE skew handling, or pre-aggregate per (host, url-hash-salt)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def canonical_url(col: Column) -> Column:
    """Deterministic URL canonical form: lowercase, scheme stripped,
    query/fragment dropped, leading ``www.`` removed, trailing slash
    trimmed. Pure regexp chain (identical semantics in DuckDB's RE2
    for these patterns — anchored literals and char classes only)."""
    u = F.lower(col)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"^www\.", "")
    return F.regexp_replace(u, r"/$", "")


def url_host(col: Column) -> Column:
    """Host component of a canonical URL (text before the first '/')."""
    return F.regexp_extract(canonical_url(col), r"^([^/]+)", 1)


def host_suffixes(col: Column) -> Column:
    """All dot-suffixes of a host with ≥ 2 labels, longest first:
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com]``. The list is bounded by the label count (~5 for
    real hosts), so the explode it feeds is O(pages), not O(pages ×
    blocklist). Single-label hosts yield an empty list (never block on
    a bare TLD)."""
    parts = F.split(col, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - F.lit(2)),
            lambda i: F.array_join(F.slice(parts, i + F.lit(1), n - i), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def blocklist_filter(pages: DataFrame, blocklist: DataFrame,
                     host_col: str = "host", domain_col: str = "domain",
                     key_col: str = "doc_id") -> DataFrame:
    """(doc_id, host, blocked, matched_domain) — UT1/RefinedWeb-style
    URL blocklist pass: a page is blocked when its host equals a
    blocked domain OR sits under one (subdomain suffix match).

    Plan shape for a 4M-domain blocklist over 10^12 pages: hosts
    explode into their ≤ ~5 suffixes, then ONE equi-join on the suffix
    string (AQE broadcasts the blocklist when it fits, shuffles
    otherwise) — never the naive ``LIKE '%domain'`` cross-product and
    never a per-row loop over the blocklist. Ties (a host under two
    blocked domains) resolve to the lexicographically smallest domain
    so re-runs are deterministic."""
    sfx = pages.select(
        F.col(key_col),
        F.explode(host_suffixes(F.col(host_col))).alias("suffix"),
    )
    hits = (
        sfx.join(
            blocklist.select(F.col(domain_col).alias("suffix")).distinct(),
            "suffix",
        )
        .groupBy(key_col)
        .agg(F.min("suffix").alias("matched_domain"))
    )
    return pages.join(hits, key_col, "left").select(
        F.col(key_col).cast("bigint").alias("doc_id"),
        F.col(host_col).alias("host"),
        F.col("matched_domain").isNotNull().alias("blocked"),
        F.col("matched_domain"),
    )


def url_path(col: Column) -> Column:
    """Path component of a canonical URL ('/' when absent)."""
    p = F.regexp_replace(canonical_url(col), r"^[^/]*", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


#: regex metacharacters a robots path rule must have neutralized
#: before '*' becomes '.*' ('*' itself deliberately excluded; '$' is
#: stripped from the tail first — mid-rule '$' is a literal octet per
#: RFC 9309 §2.2.3).
_ROBOTS_META = ['.', '+', '?', '(', ')', '[', ']', '{', '}', '|', '^', '$']


def robots_pattern_sql(col: str) -> str:
    """SQL expression turning a robots path rule into an anchored
    regex per RFC 9309 §2.2.3: '*' matches any octet sequence, a
    TRAILING '$' anchors the end, everything else is literal. The
    expression is engine-portable and used VERBATIM by both the Spark
    operator and the DuckDB oracle — backslashes are spelled chr(92)
    because the two engines disagree on string-literal escape
    processing (Spark SQL processes backslash escapes, DuckDB does
    not), which is the one way to write one string that builds the
    same pattern in both."""
    dollar = f"substr({col}, length({col}), 1) = '$'"
    e = (f"(CASE WHEN {dollar} THEN substr({col}, 1, length({col}) - 1) "
         f"ELSE {col} END)")
    e = f"replace({e}, chr(92), chr(92) || chr(92))"
    for ch in _ROBOTS_META:
        e = f"replace({e}, '{ch}', chr(92) || '{ch}')"
    e = f"replace({e}, '*', '.*')"
    return f"'^' || {e} || CASE WHEN {dollar} THEN '$' ELSE '' END"


def robots_filter(pages: DataFrame, rules: DataFrame,
                  url_col: str = "url", key_col: str = "doc_id") -> DataFrame:
    """(doc_id, host, path, crawl_allowed, matched_rule,
    matched_prefix) — robots.txt compliance pass (RFC 9309 / REP
    longest-match) with full §2.2.3 wildcard semantics: '*' in a rule
    matches any octet sequence and a trailing '$' anchors the path
    end; among the page's host's matching rules the LONGEST rule (raw
    octets, wildcards counted — Google's documented most-specific
    metric) wins; a length tie between allow and disallow resolves to
    allow (the RFC's rule); a host with no matching rule is allowed.
    ``rules`` is (host, rule∈{allow, disallow}, path_prefix) — what a
    robots.txt fetch pass would emit, one row per directive.

    Plan shape at crawl scale: ONE equi-join on host (a host's
    directive list is small — tens of rows — so the per-page candidate
    fan-out is bounded), prefix test as a codegen'd startswith, winner
    via one partition-local window over the candidate set. The rules
    side is millions of rows at worst (hosts × directives) — AQE
    broadcasts it when it fits, shuffles on host otherwise; pages
    never move twice and text columns never enter the join."""
    p = pages.select(
        F.col(key_col),
        url_host(F.col(url_col)).alias("host"),
        url_path(F.col(url_col)).alias("path"),
    )
    compiled = rules.withColumn(
        "__pat", F.expr(robots_pattern_sql("path_prefix"))
    )
    cand = p.join(compiled, "host").filter(
        F.expr("path rlike __pat")
    ).drop("__pat")
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.length("path_prefix").desc(),
        F.when(F.col("rule") == "allow", 1).otherwise(0).desc(),
        F.col("path_prefix").desc(),
    )
    winner = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            key_col,
            F.col("rule").alias("matched_rule"),
            F.col("path_prefix").alias("matched_prefix"),
        )
    )
    return p.join(winner, key_col, "left").select(
        F.col(key_col).cast("bigint").alias("doc_id"),
        "host",
        "path",
        (
            F.col("matched_rule").isNull() | (F.col("matched_rule") == "allow")
        ).alias("crawl_allowed"),
        "matched_rule",
        "matched_prefix",
    )


def host_stats(pages: DataFrame, url_col: str = "url",
               chars_col: str = "n_chars",
               lang_col: str = "lang") -> DataFrame:
    """Per-host corpus statistics: page count, total extracted chars,
    distinct languages, smallest doc id (the per-host representative).
    The groupBy key is the canonicalized host, so http/https/www
    variants of one site aggregate together."""
    return (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            F.col(chars_col),
            F.col(lang_col),
            F.col("doc_id"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum(chars_col).cast("bigint").alias("total_chars"),
            F.countDistinct(lang_col).cast("bigint").alias("n_langs"),
            F.min("doc_id").cast("bigint").alias("first_doc_id"),
        )
    )


def detect_url_templates(pages: DataFrame, url_col: str = "url",
                         trap_threshold: int = 100) -> DataFrame:
    """(host, path_template, n_urls, depth, sample_url, is_trap) —
    URL-template explosion detection, the crawler-trap pass every
    frontier needs (calendar pages, session-id paths, faceted-search
    grids generate unbounded URL spaces under one path shape; Heritrix
    and production crawlers cap or block such templates).

    A url's template is its canonical path with every digit run
    collapsed to ``N`` (``/2024/03/15/post7`` → ``/N/N/N/postN``), so
    an infinite date crawl collapses to ONE (host, template) group
    whose ``n_urls`` explodes while legitimate sections stay small.
    ``is_trap`` uses a plain integer threshold on distinct urls —
    deterministic, partitioning-independent. ``depth`` (path segment
    count) and ``sample_url`` (lexicographic min — stable) let a
    downstream policy whitelist shallow high-value templates.

    Scale shape: template derivation is codegen'd regexp in the scan
    stage; the only movement is ONE partial-agg groupBy keyed
    (host, template) — cardinality ≪ urls by construction (that
    collapse is the point). A pathological host whose every url is a
    distinct template degrades to the url count, the same bound as
    any per-url op."""
    t = pages.select(
        url_host(F.col(url_col)).alias("host"),
        F.regexp_replace(url_path(F.col(url_col)), "[0-9]+", "N")
        .alias("path_template"),
        F.col(url_col).alias("u"),
    )
    return (
        t.groupBy("host", "path_template")
        .agg(
            F.countDistinct("u").cast("bigint").alias("n_urls"),
            F.min("u").alias("sample_url"),
        )
        .select(
            "host", "path_template", "n_urls",
            (F.size(F.split(F.col("path_template"), "/")) - 1)
            .cast("int").alias("depth"),
            "sample_url",
            (F.col("n_urls") >= trap_threshold).alias("is_trap"),
        )
    )


def resolve_redirects(redirects: DataFrame, max_hops: int = 4) -> DataFrame:
    """(src_url, final_url, n_hops, terminated) — bounded redirect-
    chain resolution over one-hop (src_url, dst_url) records (what a
    crawl's 3xx responses produce; CDX pipelines resolve these before
    url dedup and frontier scheduling, and every production crawler
    caps chain length — curl/browsers default to tens, crawlers to
    ~5). ``terminated`` is False when the chain still has an outgoing
    hop after ``max_hops`` (a loop or an over-long chain — the crawler
    gives up either way, so loops need no path tracking).

    Multiple outgoing hops for one src (dirty crawl data) collapse to
    the lexicographically smallest target first, so resolution is
    deterministic and each round's join is 1:1.

    Scale shape: ``max_hops`` rounds of one hash equi-join each
    (cur == src) over the redirect table — redirects ≪ pages, the
    same small-table regime as host_pagerank; rows that already
    stopped carry NULL joins and pass through. No text, no windows,
    no global sort."""
    r = redirects.groupBy(F.col("src_url").alias("s")).agg(
        F.min("dst_url").alias("d")
    )
    out = r.select(
        F.col("s").alias("src_url"),
        F.col("d").alias("cur"),
        F.lit(1).cast("int").alias("n_hops"),
    )
    for _ in range(max_hops - 1):
        nxt = r.select(F.col("s").alias("cur"), F.col("d").alias("nxt"))
        out = (
            out.join(nxt, "cur", "left")
            .select(
                "src_url",
                F.coalesce(F.col("nxt"), F.col("cur")).alias("cur"),
                F.when(F.col("nxt").isNotNull(), F.col("n_hops") + 1)
                .otherwise(F.col("n_hops")).cast("int").alias("n_hops"),
            )
        )
    fin = r.select(F.col("s").alias("cur"), F.lit(True).alias("has_out"))
    return (
        out.join(fin, "cur", "left")
        .select(
            "src_url",
            F.col("cur").alias("final_url"),
            "n_hops",
            F.col("has_out").isNull().alias("terminated"),
        )
    )


def surt_key(col: Column) -> Column:
    """SURT-form urlkey (Sort-friendly URI Reordering Transform — the
    key scheme of Internet Archive / Common Crawl CDX indexes, IIPC
    CDXJ spec): lowercase, scheme and fragment dropped, leading
    ``www.`` and default ports stripped, host labels REVERSED and
    comma-joined so one host's pages sort contiguously (the property
    range lookups and per-site extraction depend on), ``)`` between
    host and path, query parameters sorted so param order never splits
    one page into two keys.

    ``https://WWW.news.Example.com:443/A/b?b=2&a=1#x`` →
    ``com,example,news)/a/b?a=1&b=2``. Pure codegen regexp/array
    chain — never leaves the scan stage."""
    u = F.lower(col)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"#.*$", "")
    host = F.regexp_extract(u, r"^([^/?]+)", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_replace(u, r"^[^/?]+", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    # a surviving non-default port stays AFTER the hostname
    # (com,example:8080), not inside the reversed label list
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    hostname = F.regexp_replace(host, r":\d+$", "")
    revhost = F.concat(
        F.array_join(F.reverse(F.split(hostname, r"\.")), ","), port
    )
    return F.concat(
        revhost,
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")),
    )


def cdx_index(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", payload_col: str = "html",
              mime: str = "text/html", mime_col: str | None = None,
              status_col: str | None = None) -> DataFrame:
    """(urlkey, ts14, url, mime, status, digest, length) — the CDX(J)
    capture index every crawl archive ships beside its WARC/WET files
    (the lookup structure wayback-style replay, per-site extraction,
    and revisit-dedup all consume). Together with ``sources.warc``
    (read) and ``wet_records`` (write) this closes the archive-interop
    surface: WARC in, WET + CDX out.

    ``digest`` is hex SHA-256 of the raw payload bytes (the archival
    role of CC's SHA-1/base32 digest with a stdlib-available codec —
    revisit records dedup on digest equality, so any collision-safe
    stable hash serves); ``length`` is payload octets; ``ts14`` the
    WARC 14-digit timestamp. Over a ``read_warc_captures`` scan pass
    ``mime_col``/``status_col`` to index the REAL HTTP capture
    metadata; over a pages table (which drops the HTTP layer) the
    literal ``mime`` and status 200 stand in. Zero shuffles — a
    narrow codegen map; a CDX writer sorts by (urlkey, ts14) via
    range repartition + sortWithinPartitions, the scalable
    total-sort shape."""
    mime_expr = (
        F.col(mime_col) if mime_col is not None else F.lit(mime)
    )
    status_expr = (
        F.col(status_col).cast("int") if status_col is not None
        else F.lit(200)
    )
    return pages.select(
        surt_key(F.col(url_col)).alias("urlkey"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
        F.col(url_col).alias("url"),
        mime_expr.alias("mime"),
        status_expr.alias("status"),
        F.sha2(F.col(payload_col), 256).alias("digest"),
        F.octet_length(F.col(payload_col)).cast("bigint").alias("length"),
    )


def sitemap_urls(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """(loc_url, n_sitemaps, already_crawled) — URL discovery from
    sitemap XML pages (sitemaps.org protocol; production crawlers
    feed these into the frontier beside X40's outlink pass, and
    sitemap-declared URLs are the publisher's own canonical list):
    pages whose bytes carry a ``<urlset``/``<sitemapindex`` root emit
    every ``<loc>`` entry; entries are trimmed, de-duplicated with the
    declaring-sitemap count kept (a URL in many sitemaps is a strong
    liveness prior), and anti-checked against the crawled URL set so
    the frontier only ever sees genuinely new work.

    Scale shape: narrow map (lossy binary→string cast — one mangled
    page must not kill the task — root-marker filter, ONE codegen'd
    ``regexp_extract_all``, explode) then one partial-agg groupBy on
    the loc string and a LEFT ANTI-shaped membership join against the
    distinct crawled set (hash equi-join on url; both sides are url
    strings, never page bytes)."""
    html_str = F.col(html_col).cast("string")
    is_sitemap = html_str.rlike(r"<\s*(urlset|sitemapindex)[\s>]")
    exploded = pages.filter(is_sitemap).select(
        F.explode(
            F.regexp_extract_all(
                html_str, F.lit(r"<loc>\s*([^<]+?)\s*</loc>"), F.lit(1)
            )
        ).alias("loc_url")
    )
    # sitemap XML escapes URL metacharacters — query-param URLs carry
    # &amp; in the wild; decode the five XML entities (amp LAST so
    # '&amp;lt;' decodes to the literal '&lt;' it encodes)
    loc = F.col("loc_url")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    locs = (
        exploded.select(loc.alias("loc_url"))
        .groupBy("loc_url")
        .agg(F.count("*").cast("bigint").alias("n_sitemaps"))
    )
    crawled = pages.select(F.col(url_col).alias("loc_url")).distinct()
    return locs.join(
        crawled.withColumn("__c", F.lit(True)), "loc_url", "left"
    ).select(
        "loc_url",
        "n_sitemaps",
        F.coalesce(F.col("__c"), F.lit(False)).alias("already_crawled"),
    )


def revisit_stats(captures: DataFrame, urlkey_col: str = "urlkey",
                  ts_col: str = "ts14",
                  digest_col: str = "digest") -> DataFrame:
    """(urlkey, n_captures, n_unique, n_revisits, revisit_rate_bp,
    first_ts) — WARC revisit-record semantics over a CDX capture
    index (ISO 28500 §6.7.2: a capture whose payload digest equals a
    previous capture of the same URI is stored as a body-less
    ``revisit`` record): per urlkey, how many captures exist, how many
    distinct payloads, how many captures archive-dedup to a prior one,
    and the first capture timestamp. The rate drives recrawl-interval
    policy (X26's snapshot diff decides WHAT changed; this decides
    HOW OFTEN a url is worth refetching) and storage-dedup accounting.

    Scale shape: two stacked partial-agg groupBys — (urlkey, digest)
    then urlkey — both map-side combinable, shuffle carries only key
    strings and counts; the rate is bigint `div` basis points,
    bit-reproducible."""
    per_digest = captures.groupBy(
        F.col(urlkey_col).alias("urlkey"), F.col(digest_col).alias("digest")
    ).agg(
        F.count("*").cast("bigint").alias("n_caps"),
        F.min(ts_col).alias("first_ts"),
    )
    per_key = per_digest.groupBy("urlkey").agg(
        F.sum("n_caps").cast("bigint").alias("n_captures"),
        F.count("*").cast("bigint").alias("n_unique"),
        F.min("first_ts").alias("first_ts"),
    )
    return per_key.select(
        "urlkey",
        "n_captures",
        "n_unique",
        (F.col("n_captures") - F.col("n_unique")).alias("n_revisits"),
        F.expr("(10000 * (n_captures - n_unique)) div n_captures")
        .cast("bigint").alias("revisit_rate_bp"),
        "first_ts",
    )


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    txt_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url) — Sitemap directive extraction from
    robots.txt bodies (RFC 9309 §2.3: a NON-group line, valid
    anywhere in the file, case-insensitive key, absolute URL value) —
    the discovery step that feeds X57's sitemap fetch/parse pass;
    together: robots.txt → sitemap URLs → fetch → ``sitemap_urls`` →
    frontier. Duplicate declarations collapse.

    One codegen multiline regexp + explode + distinct — robots bodies
    are tiny (RFC caps parse at 500 KiB) and hosts ≪ pages, so even
    the distinct is a small shuffle of (host, url) strings."""
    locs = F.regexp_extract_all(
        F.col(txt_col),
        F.lit(r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"),
        F.lit(1),
    )
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.explode(locs).alias("sitemap_url"),
        )
        .distinct()
    )


def robots_crawl_delays(robots: DataFrame, host_col: str = "host",
                        txt_col: str = "robots_txt",
                        cap_ms: int = 60_000) -> DataFrame:
    """(host, delay_ms) — Crawl-delay extraction from robots.txt
    bodies: the producer for ``frontier.schedule_fetches``'s
    ``delays`` override (together with X66's Sitemap pass this
    completes the robots.txt consumption surface: filter rules X38,
    sitemaps X66, delays here). Crawl-delay is a de-facto extension
    (not in RFC 9309 but honored by Yandex/Bing and emitted by a
    large fraction of real robots files); the value is SECONDS,
    integer or decimal — parsed to integer milliseconds without
    floats (seconds·1000 + zero-padded fraction prefix) so both
    engines agree digit-for-digit.

    A file with several directives (one per user-agent group) yields
    the MOST CONSERVATIVE (max) delay — this pass is agent-agnostic;
    values are capped at ``cap_ms`` (hostile 'Crawl-delay: 86400'
    files would otherwise park a fetcher for a day). One codegen
    multiline regexp + partial-agg max per host."""
    m = F.regexp_extract_all(
        F.col(txt_col),
        F.lit(r"(?im)^[ \t]*crawl-delay:[ \t]*(\d+(?:\.\d+)?)"),
        F.lit(1),
    )
    vals = robots.select(
        F.col(host_col).alias("host"), F.explode(m).alias("v")
    )
    secs = F.regexp_extract(F.col("v"), r"^(\d+)", 1).cast("bigint")
    fraw = F.regexp_extract(F.col("v"), r"\.(\d+)$", 1)
    # rpad BEFORE the empty test would turn '' into '000'
    frac_ms = F.when(fraw == "", F.lit(0)).otherwise(
        F.substring(F.rpad(fraw, 3, "0"), 1, 3).cast("bigint")
    )
    return (
        vals.select(
            "host",
            F.least(secs * 1000 + frac_ms, F.lit(cap_ms)).alias("ms"),
        )
        .groupBy("host")
        .agg(F.max("ms").cast("bigint").alias("delay_ms"))
    )


def recrawl_priority(captures: DataFrame, asof_date: str,
                     urlkey_col: str = "urlkey", ts_col: str = "ts14",
                     digest_col: str = "digest") -> DataFrame:
    """(urlkey, n_captures, n_changes, change_rate_bp, last_ts,
    age_days, priority) — change-rate-driven recrawl scheduling (Cho
    & Garcia-Molina, "Effective page refresh policies for Web
    crawlers", TODS 2003): estimate each URL's change frequency from
    its capture history and rank refresh candidates by estimated
    staleness. X58's revisit_stats answers "how much storage do
    revisits dedup away"; this answers the crawler's next question —
    WHICH urls to spend today's fetch budget on.

      change_rate_bp = 10000 · n_changes div (n_captures − 1)
                       (the naive X/n estimator over observed
                        intervals; NULL when only one capture exists
                        — no interval observed)
      priority       = coalesce(change_rate_bp, 10000) · age_days
                       (never-re-observed urls get the optimistic
                        rate — unknown pages must not starve)

    A change is a capture whose payload digest differs from the
    previous capture of the same urlkey, ordered by (ts, digest) —
    the digest tie-break makes the lag deterministic under capture
    collisions. Ages are whole DAYS from the capture date to
    ``asof_date`` (date arithmetic only — no epoch seconds, so no
    engine/session timezone can perturb the integers).

    Scale shape: one per-urlkey window (partition-local sort over a
    url's handful of captures) + one partial-agg groupBy; only keys,
    14-char timestamps, and digests shuffle. All arithmetic is
    bigint; bit-reproducible."""
    from pyspark.sql import Window

    w = Window.partitionBy("urlkey").orderBy("ts", "digest")
    seq = captures.select(
        F.col(urlkey_col).alias("urlkey"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn("prev_digest", F.lag("digest").over(w))
    per_key = seq.groupBy("urlkey").agg(
        F.count("*").cast("bigint").alias("n_captures"),
        F.sum(
            F.when(
                F.col("prev_digest").isNotNull()
                & (F.col("digest") != F.col("prev_digest")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_changes"),
        F.max("ts").alias("last_ts"),
    )
    rate = F.when(
        F.col("n_captures") > 1,
        F.expr("(10000 * n_changes) div (n_captures - 1)"),
    ).cast("bigint")
    aged = per_key.select(
        "urlkey", "n_captures", "n_changes",
        rate.alias("change_rate_bp"),
        "last_ts",
        F.datediff(
            F.lit(asof_date).cast("date"),
            F.to_date(F.substring("last_ts", 1, 8), "yyyyMMdd"),
        ).cast("bigint").alias("age_days"),
    )
    return aged.select(
        "*",
        (F.coalesce(F.col("change_rate_bp"), F.lit(10000))
         * F.col("age_days")).cast("bigint").alias("priority"),
    )


def host_churn(diff: DataFrame, url_col: str = "url",
               status_col: str = "status") -> DataFrame:
    """(host, n_old, n_new, n_added, n_removed, n_changed,
    n_unchanged, birth_rate_bp, death_rate_bp, churn_bp) — per-host
    page birth/death/change rates from an X26 snapshot-diff table
    (Ntoulas, Cho & Olston, "What's new on the web? The evolution of
    the web from a search engine perspective", WWW 2004: ~8%/week new
    pages, ~80% of change concentrated in a small host subset).
    Recrawl budgeting reads this, not per-url diffs: a host with
    churn ~0 drops to monthly refresh, a high-birth host gets
    frontier budget for DISCOVERY (new urls) rather than refresh.

      birth_rate_bp = 10000 · added   div new-snapshot size
      death_rate_bp = 10000 · removed div old-snapshot size
      churn_bp      = 10000 · (added+removed+changed) div union size

    Scale shape: one codegen host extraction + ONE partial-agg
    groupBy(host) of conditional counts — the diff table (already the
    minimum two-snapshot movement) never re-shuffles more than host
    strings and six counters; rates are bigint div basis points."""
    counts = (
        diff.select(
            url_host(F.col(url_col)).alias("host"),
            F.col(status_col).alias("st"),
        )
        .groupBy("host")
        .agg(
            *[
                F.sum(F.when(F.col("st") == s, 1).otherwise(0))
                .cast("bigint").alias(f"n_{s}")
                for s in ("added", "removed", "changed", "unchanged")
            ]
        )
    )
    return counts.select(
        "host",
        (F.col("n_removed") + F.col("n_changed") + F.col("n_unchanged"))
        .alias("n_old"),
        (F.col("n_added") + F.col("n_changed") + F.col("n_unchanged"))
        .alias("n_new"),
        "n_added", "n_removed", "n_changed", "n_unchanged",
        F.expr(
            "(10000 * n_added) div greatest(n_added + n_changed + "
            "n_unchanged, 1)"
        ).cast("bigint").alias("birth_rate_bp"),
        F.expr(
            "(10000 * n_removed) div greatest(n_removed + n_changed + "
            "n_unchanged, 1)"
        ).cast("bigint").alias("death_rate_bp"),
        F.expr(
            "(10000 * (n_added + n_removed + n_changed)) div "
            "greatest(n_added + n_removed + n_changed + n_unchanged, 1)"
        ).cast("bigint").alias("churn_bp"),
    )


def sitemap_coverage(declared: DataFrame, crawled: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """(host, n_declared, n_crawled, n_both, n_gap, n_orphan,
    coverage_bp, orphan_bp) — per-host reconciliation of
    sitemap-declared urls against what the crawl actually fetched
    (Schonfeld & Shivakumar, "Sitemaps: Above and Beyond the Crawl of
    Duty", WWW 2009: sitemaps and discovery crawling each see urls the
    other misses). ``coverage_bp`` (fetched share of the declared set)
    tells the crawl team which hosts' sitemaps they are wasting —
    X57/X66 discovered the urls, nobody fetched them; ``orphan_bp``
    (fetched urls the sitemap never declared) bounds how much of a
    host would VANISH if the crawler trusted sitemaps alone.

    Scale shape: per-side url distinct (partial-agg), ONE full-outer
    equi-join on url — the minimum movement for a two-set
    reconciliation, same shape as X26 — then one partial-agg host
    rollup of three conditional counters; url strings are the widest
    shuffle. Integer bigint-div bp."""
    d = declared.select(F.col(url_col).alias("u")).distinct().select(
        "u", url_host(F.col("u")).alias("host"), F.lit(1).alias("dec")
    )
    c = crawled.select(F.col(url_col).alias("u")).distinct().select(
        "u", url_host(F.col("u")).alias("host"), F.lit(1).alias("crw")
    )
    both = d.join(c, ["u", "host"], "full_outer")
    agg = both.groupBy("host").agg(
        F.sum(F.coalesce(F.col("dec"), F.lit(0))).cast("bigint")
        .alias("n_declared"),
        F.sum(F.coalesce(F.col("crw"), F.lit(0))).cast("bigint")
        .alias("n_crawled"),
        F.sum(
            F.when(F.col("dec").isNotNull() & F.col("crw").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_both"),
    )
    return agg.select(
        "host", "n_declared", "n_crawled", "n_both",
        (F.col("n_declared") - F.col("n_both")).alias("n_gap"),
        (F.col("n_crawled") - F.col("n_both")).alias("n_orphan"),
        F.expr("(10000 * n_both) div greatest(n_declared, 1)")
        .cast("bigint").alias("coverage_bp"),
        F.expr("(10000 * (n_crawled - n_both)) div greatest(n_crawled, 1)")
        .cast("bigint").alias("orphan_bp"),
    )


_TRACKING_KEY_RE = (
    "^(utm_[a-z]+|gclid|fbclid|msclkid|yclid|ref|referrer|sessionid|"
    "sid|phpsessid|jsessionid)$"
)


def url_param_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, n_urls, n_with_query, n_tracking, query_share_bp,
    tracking_share_bp, n_distinct_params) — per-host query-parameter
    audit: how much of a host's URL space is parameterized, how much
    of THAT is pure tracking decoration (utm_*/gclid/session ids),
    and how wide the parameter vocabulary runs. This quantifies the
    DUST mass ("Do Not Crawl in the DUST: different URLs with similar
    text", Bar-Yossef, Keidar & Schonfeld, WWW 2007) that
    ``canonical_url`` collapses: a host with tracking_share ~10000 bp
    is pure alias load (safe to canonicalize hard), while a host with
    many distinct NON-tracking params (X45's trap signature) needs
    per-template rules before its urls are deduped away.

    Scale shape: one codegen pass (regexp query-string extract +
    array ops, no explode for the flags) + one partial-agg host
    groupBy; the distinct-param count explodes ONLY urls that have a
    query string, into (host, key) pairs — strings far smaller than
    urls — for a second partial-agg groupBy. Integer bigint-div bp."""
    q = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    keys = F.transform(
        F.filter(F.split(q, "&"), lambda kv: kv != ""),
        lambda kv: F.lower(F.regexp_extract(kv, "^([^=]+)", 1)),
    )
    has_tracking = F.exists(
        keys, lambda k: k.rlike(_TRACKING_KEY_RE)
    )
    base = pages.select(
        url_host(F.col(url_col)).alias("host"),
        (q != "").alias("has_q"),
        has_tracking.alias("has_t"),
        keys.alias("keys"),
    )
    agg = base.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.sum(F.when(F.col("has_q"), 1).otherwise(0)).cast("bigint")
        .alias("n_with_query"),
        F.sum(F.when(F.col("has_t"), 1).otherwise(0)).cast("bigint")
        .alias("n_tracking"),
    )
    distinct_params = (
        base.where(F.col("has_q"))
        .select("host", F.explode("keys").alias("k"))
        .where(F.col("k") != "")
        .groupBy("host")
        .agg(F.countDistinct("k").cast("bigint").alias("n_distinct_params"))
    )
    return (
        agg.join(distinct_params, "host", "left")
        .select(
            "host", "n_urls", "n_with_query", "n_tracking",
            F.expr("(10000 * n_with_query) div n_urls").cast("bigint")
            .alias("query_share_bp"),
            F.expr("(10000 * n_tracking) div n_urls").cast("bigint")
            .alias("tracking_share_bp"),
            F.coalesce(F.col("n_distinct_params"), F.lit(0)).cast("bigint")
            .alias("n_distinct_params"),
        )
    )


def dust_rules(pages: DataFrame, url_col: str = "url",
               text_col: str = "text", max_group: int = 8,
               min_support: int = 3) -> DataFrame:
    """(rule_from, rule_to, n_pairs, n_hosts) — DUST rule mining
    (Bar-Yossef, Keidar & Schonfeld, "Do not crawl in the DUST:
    different URLs with similar text", WWW 2007): from pairs of URLs
    on the SAME host carrying the SAME content fingerprint, derive the
    substring-substitution rule that maps one path to the other
    (longest common prefix and suffix stripped; the differing middles
    are the rule), then keep rules whose support clears
    ``min_support`` pairs. Mined rules ('index.html' ↔ '',
    '?session=…' ↔ '', '/amp' ↔ '') are what a crawler feeds its URL
    normalizer so the NEXT crawl never fetches the alias at all —
    X16's canonical_url hardcodes the universal rules; this learns the
    host-specific ones from evidence.

    Scale shape: fingerprints group per (host, fp) — never cross-host;
    each group is capped at ``max_group`` URLs by a partition-local
    row_number before the self-join, so a pathological host/fp group
    (a 10^6-alias session trap) contributes at most
    C(max_group, 2) = 28 pairs instead of 5·10^11. Rule derivation is
    pure codegen string arithmetic (no UDFs); the final rollup is one
    partial-agged groupBy on the (tiny) rule key.

    Query strings are kept in the path on purpose — parameter aliases
    ARE dust — and the empty-side guard keeps Spark's descending
    ``sequence(1, 0)`` from fabricating positions.

    Reference anchor: none — the reference fetches what it is handed
    (docling_serve/app.py source union); alias suppression is
    crawl-side machinery the engine adds."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.dedup import norm_text

    u = F.lower(F.regexp_replace(F.col(url_col), r"^https?://", ""))
    base = pages.select(
        F.regexp_extract(u, r"^([^/]+)", 1).alias("host"),
        F.regexp_replace(u, r"^[^/]*", "").alias("path"),
        F.md5(norm_text(F.col(text_col))).alias("fp"),
    ).distinct()
    w = Window.partitionBy("host", "fp").orderBy("path")
    capped = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_group)
        .drop("rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.host") == F.col("b.host"))
        & (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.path") < F.col("b.path")),
    ).select(
        F.col("a.host").alias("host"),
        F.col("a.path").alias("pa"),
        F.col("b.path").alias("pb"),
    )
    lcp = (
        "CASE WHEN least(length(pa), length(pb)) = 0 THEN 0 "
        "ELSE coalesce(get(filter(sequence(1, least(length(pa), length(pb))), "
        "i -> substr(pa, i, 1) <> substr(pb, i, 1)), 0) - 1, "
        "least(length(pa), length(pb))) END"
    )
    lcs = (
        "CASE WHEN least(length(pa), length(pb)) = 0 THEN 0 "
        "ELSE coalesce(get(filter(sequence(1, least(length(pa), length(pb))), "
        "i -> substr(reverse(pa), i, 1) <> substr(reverse(pb), i, 1)), 0) - 1, "
        "least(length(pa), length(pb))) END"
    )
    mids = pairs.select(
        "host",
        F.expr(f"({lcp})").alias("lcp"),
        F.expr(f"({lcs})").alias("lcs_raw"),
        "pa", "pb",
    ).select(
        "host", "pa", "pb", "lcp",
        F.expr("least(lcs_raw, length(pa) - lcp, length(pb) - lcp)")
        .alias("lcs"),
    ).select(
        "host",
        F.expr("substr(pa, lcp + 1, length(pa) - lcp - lcs)")
        .alias("rule_from"),
        F.expr("substr(pb, lcp + 1, length(pb) - lcp - lcs)")
        .alias("rule_to"),
    )
    return (
        mids.groupBy("rule_from", "rule_to")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
        )
        .filter(F.col("n_pairs") >= min_support)
    )


def sitemap_staleness(sitemap_pages: DataFrame, crawled: DataFrame,
                      url_col: str = "url", html_col: str = "html",
                      crawl_url_col: str = "url",
                      crawl_ts_col: str = "warc_ts") -> DataFrame:
    """(host, n_declared, n_with_lastmod, n_uncrawled, n_stale,
    n_fresh, stale_bp) — publisher-declared freshness vs the crawl
    warehouse: parse ``<url><loc>…<lastmod>…`` entries from sitemap
    XML bodies (sitemaps.org protocol) and classify every declared URL
    against its latest crawl date — uncrawled (frontier debt the X57
    discovery pass feeds), stale (the publisher says the page changed
    AFTER we last fetched it — the highest-precision recrawl signal
    there is, complementing X90's statistical change rates with the
    site's own declaration), or fresh. stale_bp is the share of
    lastmod-bearing crawled URLs needing a refetch, per host — the
    number that reorders a recrawl budget.

    A URL declared in several sitemaps keeps its most recent lastmod;
    lastmod values are W3C datetimes, compared at day grain (the
    protocol allows date-only values, and sub-day staleness is noise
    at crawl cadence); unparseable ones count as absent. Scale shape:
    narrow XML block explode (one codegen extract_all per page), one
    partial-agg per loc, one partial-agg per crawled url, ONE
    equi-join on the url string, one host rollup — page bytes never
    shuffle."""
    html_str = F.col(html_col).cast("string")
    blocks = sitemap_pages.filter(
        html_str.rlike(r"<\s*urlset[\s>]")
    ).select(
        F.explode(
            F.regexp_extract_all(html_str, F.lit(r"(?is)<url\s*>.*?</url\s*>"),
                                 F.lit(0))
        ).alias("block")
    )
    entries = blocks.select(
        F.trim(
            F.regexp_extract(F.col("block"), r"(?is)<loc\s*>\s*([^<]*?)\s*</loc", 1)
        ).alias("loc"),
        F.regexp_extract(F.col("block"),
                         r"(?is)<lastmod\s*>\s*([^<]*?)\s*</lastmod", 1)
        .alias("lastmod_raw"),
    ).filter(F.col("loc") != "").select(
        "loc",
        # try_cast: a malformed lastmod counts as absent, never fails
        # the task (ANSI to_date throws on junk)
        F.expr("try_cast(substr(lastmod_raw, 1, 10) AS date)")
        .alias("lastmod"),
    )
    decl = entries.groupBy("loc").agg(F.max("lastmod").alias("lastmod"))
    crawl = (
        crawled.select(
            F.col(crawl_url_col).alias("loc"),
            F.to_date(F.col(crawl_ts_col)).alias("crawl_date"),
        )
        .groupBy("loc")
        .agg(F.max("crawl_date").alias("crawl_date"))
    )
    j = decl.join(crawl, "loc", "left").select(
        url_host(F.col("loc")).alias("host"),
        "lastmod", "crawl_date",
    )
    uncrawled = F.col("crawl_date").isNull()
    stale = (~uncrawled) & F.col("lastmod").isNotNull() \
        & (F.col("crawl_date") < F.col("lastmod"))
    return (
        j.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_declared"),
            F.sum(F.when(F.col("lastmod").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_with_lastmod"),
            F.sum(F.when(uncrawled, 1).otherwise(0))
            .cast("bigint").alias("n_uncrawled"),
            F.sum(F.when(stale, 1).otherwise(0))
            .cast("bigint").alias("n_stale"),
            F.sum(F.when(~uncrawled & ~stale, 1).otherwise(0))
            .cast("bigint").alias("n_fresh"),
            F.sum(F.when(F.col("lastmod").isNotNull() & ~uncrawled, 1)
                  .otherwise(0)).cast("bigint").alias("__n_rate_base"),
        )
        .withColumn(
            "stale_bp",
            F.expr("(10000 * n_stale) div greatest(__n_rate_base, 1)")
            .cast("bigint"),
        )
        .drop("__n_rate_base")
    )


def url_date_profile(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, n_urls, n_dated, dated_bp, min_date, max_date) — corpus
    freshness from URL paths alone: news/blog CMSes embed publication
    dates as /YYYY/MM/DD/ path segments or YYYY-MM-DD slugs, and
    mining them gives per-host publication-time coverage WITHOUT
    lastmod (X111) or capture history (X90) — the freshness prior a
    mixture builder uses to keep a news-heavy source from skewing the
    corpus toward one news cycle, and the dating signal benchmark
    builders use for temporal splits (X62) when fetch time lies (a
    2024 crawl of a 2015 article is 2015 content).

    Calendar-validated: candidate segments must match real
    month/day ranges AND survive ``try_cast`` to DATE (so 2023-02-31
    counts as undated — both engines validate the calendar
    identically); the slash form wins when both appear. One codegen
    regexp pass + one partial-agg host rollup; dated_bp =
    (10000 · n_dated) div n_urls in bigint."""
    u = F.col(url_col)
    m1 = F.regexp_extract(
        u,
        r"/((?:19|20)\d{2}/(?:0[1-9]|1[0-2])/(?:0[1-9]|[12]\d|3[01]))(?:/|$)",
        1,
    )
    m2 = F.regexp_extract(
        u, r"((?:19|20)\d{2}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]))", 1
    )
    ds = (
        F.when(m1 != "", F.replace(m1, F.lit("/"), F.lit("-")))
        .when(m2 != "", m2)
        .otherwise(F.lit(None).cast("string"))
    )
    rows = pages.select(
        url_host(u).alias("host"),
        ds.alias("__ds"),
    ).select(
        "host", F.expr("try_cast(__ds AS date)").alias("d")
    )
    return (
        rows.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.sum(F.when(F.col("d").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_dated"),
            F.min("d").alias("min_date"),
            F.max("d").alias("max_date"),
        )
        .select(
            "host", "n_urls", "n_dated",
            F.expr("(10000 * n_dated) div greatest(n_urls, 1)")
            .cast("bigint").alias("dated_bp"),
            "min_date", "max_date",
        )
    )


def delta_chain_stats(captures: DataFrame, url_col: str = "url",
                      ts_col: str = "ts", sim_col: str = "simhash",
                      host_col: str = "host",
                      max_hamming: int = 3) -> DataFrame:
    """(host, n_captures, n_identical, n_delta, n_novel, identical_bp,
    delta_bp) — delta-archiving estimator over a capture index: each
    capture is classed against the PREVIOUS capture of the same url
    (lag over (url, ts)) as identical (simhash distance 0 — the
    body-less WARC ``revisit`` case X58 already prices), delta-
    encodable (distance 1..max_hamming — a template page whose only
    change is a timestamp/counter, the case delta-compression
    archiving exploits; Kreymer/Internet Archive WARC-dedup practice),
    or novel (first capture / real change). X58 counts identical
    payloads SET-wise; this walks the TIME chain, which is what a
    storage planner prices: a capture identical to one from last year
    still re-enters the delta window.

    Scale shape: ONE url-keyed shuffle for the lag window (partition-
    local sort by ts), ONE host partial agg; Hamming via
    bit_count(xor) on 64-bit codes — no payload bytes move."""
    from pyspark.sql import Window

    # simhash breaks timestamp ties so the chain walk (and the class
    # counts) are deterministic under any partitioning — the stream
    # twin and the DuckDB oracle order the same way
    w = Window.partitionBy(url_col).orderBy(ts_col, sim_col)
    prev = F.lag(F.col(sim_col)).over(w)
    dist = F.bit_count(
        F.col(sim_col).bitwiseXOR(prev)
    )
    cls = (
        F.when(prev.isNull(), "novel")
        .when(dist == 0, "identical")
        .when(dist <= F.lit(int(max_hamming)), "delta")
        .otherwise("novel")
    )
    return (
        captures.select(F.col(host_col).alias("host"), cls.alias("cls"))
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_captures"),
            F.sum(F.when(F.col("cls") == "identical", 1).otherwise(0))
            .cast("bigint").alias("n_identical"),
            F.sum(F.when(F.col("cls") == "delta", 1).otherwise(0))
            .cast("bigint").alias("n_delta"),
            F.sum(F.when(F.col("cls") == "novel", 1).otherwise(0))
            .cast("bigint").alias("n_novel"),
        )
        .select(
            "host", "n_captures", "n_identical", "n_delta", "n_novel",
            F.expr("(10000 * n_identical) div greatest(n_captures, 1)")
            .cast("bigint").alias("identical_bp"),
            F.expr("(10000 * n_delta) div greatest(n_captures, 1)")
            .cast("bigint").alias("delta_bp"),
        )
        .orderBy("host")
    )


#: AI / LLM-training crawler user-agent product tokens (public,
#: vendor-documented): the agents a compliance audit checks robots.txt
#: opt-outs for before a corpus ingest.
AI_AGENTS = ("gptbot", "ccbot", "google-extended", "anthropic-ai",
             "claudebot", "bytespider")


def ai_optout(robots: DataFrame, agents: tuple[str, ...] = AI_AGENTS,
              host_col: str = "host",
              body_col: str = "body") -> DataFrame:
    """(host, agent, blocked, via) — AI-crawler opt-out audit over raw
    robots.txt bodies: for each host and each AI/LLM-training
    user-agent token, does the file opt the agent out of the whole
    site? This is the compliance gate responsible corpus builders run
    before ingesting a crawl (the REP is the only machine-readable
    opt-out channel most publishers have; honoring it is the
    train-data analog of X44's noindex honor list and X156's license
    signals).

    RFC 9309 group model, line-grain: comments strip at '#';
    consecutive ``User-agent:`` lines stack onto ONE group, and a
    User-agent line that follows a directive line starts a NEW group;
    a group opts the agent out iff it contains ``Disallow: /`` (an
    empty Disallow allows everything). Per §2.2.1, if any group names
    the agent specifically, those groups alone decide
    (``via='specific'``); otherwise the ``*`` groups decide
    (``via='wildcard'``); a file with neither leaves the agent
    unmatched (``via='none'``, not blocked). Agent matching is the
    case-insensitive product token.

    Scale shape: one posexplode over robots LINES (bodies are KB-small
    by the REP's own 500 KiB cap, so per-host windows over line
    numbers are bounded); group structure via one lag + running-sum
    window per host; the agent probe is a ≤ len(agents)-row broadcast
    cross join against per-group summaries (rows = hosts × groups,
    never lines). Bodies never shuffle — only (host, gid, token/flag)
    rows do."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.lower(F.col(body_col)), "\n"))
        .alias("pos", "__raw"),
    ).select(
        "host", "pos",
        F.trim(F.regexp_replace(F.col("__raw"), "#.*$", "")).alias("line"),
    )
    w_seq = Window.partitionBy("host").orderBy("pos")
    # blank lines are group-INTERNAL per RFC 9309's ABNF (emptyline may
    # sit between startgrouplines of one group — real files blank-
    # separate stacked UA lines); drop them BEFORE the lag so the
    # group-start flag reads the last non-empty line, and a blank line
    # neither starts nor splits a group
    marked = lines.filter(F.col("line") != "").select(
        "host", "pos", "line",
        F.col("line").rlike("^user-agent:").alias("is_ua"),
    ).withColumn(
        "__gstart",
        F.col("is_ua")
        & ~F.coalesce(F.lag("is_ua").over(w_seq), F.lit(False)),
    ).withColumn(
        "gid", F.sum(F.col("__gstart").cast("int")).over(w_seq)
    ).filter(F.col("gid") >= 1)
    group_uas = marked.filter(F.col("is_ua")).select(
        "host", "gid",
        F.regexp_extract("line", r"^user-agent:\s*(\S+)", 1).alias("token"),
    )
    group_block = marked.groupBy("host", "gid").agg(
        F.max(
            (F.trim(F.regexp_replace("line", "^disallow:", "")) == "/")
            & F.col("line").rlike("^disallow:")
        ).alias("has_block")
    )
    groups = group_uas.join(group_block, ["host", "gid"])
    agent_lit = F.explode(
        F.array(*[F.lit(a) for a in agents])
    ).alias("agent")
    probe = robots.select(F.col(host_col).alias("host")).distinct() \
        .select("host", agent_lit)
    spec = groups.join(
        probe, (groups["host"] == probe["host"])
        & (groups["token"] == probe["agent"]),
    ).groupBy(probe["host"].alias("host"), "agent").agg(
        F.max("has_block").alias("__spec_block")
    )
    wild = groups.filter(F.col("token") == "*").groupBy("host").agg(
        F.max("has_block").alias("__wild_block")
    )
    return (
        probe.join(spec, ["host", "agent"], "left")
        .join(wild, "host", "left")
        .select(
            "host", "agent",
            F.coalesce(
                "__spec_block", "__wild_block", F.lit(False)
            ).alias("blocked"),
            F.when(F.col("__spec_block").isNotNull(), F.lit("specific"))
            .when(F.col("__wild_block").isNotNull(), F.lit("wildcard"))
            .otherwise(F.lit("none")).alias("via"),
        )
    )


def optout_impact(audit: DataFrame, host_tokens: DataFrame,
                  host_col: str = "host",
                  tokens_col: str = "n_tokens") -> DataFrame:
    """(agent, n_hosts, n_hosts_blocked, tokens_blocked,
    token_share_bp) — what honoring each AI agent's robots opt-outs
    COSTS the corpus: join the X165 verdicts against per-host token
    mass and report, per agent, the blocked host count and the share
    of corpus tokens that must be dropped. This is the number the
    ingest decision actually turns on — opt-outs concentrate on
    high-traffic publishers, so the token share routinely dwarfs the
    host share (the reason it must be measured in tokens, not hosts).

    One equi-join of the ≤ hosts×agents audit against the host token
    table, one agent-keyed partial agg, and a one-row broadcast total;
    share in basis points by bigint div."""
    t = host_tokens.select(
        F.col(host_col).alias("host"),
        F.col(tokens_col).cast("bigint").alias("__tok"),
    )
    total = t.agg(F.sum("__tok").cast("bigint").alias("__total"))
    return (
        audit.join(t, "host")
        .groupBy("agent")
        .agg(
            F.count("*").cast("bigint").alias("n_hosts"),
            F.sum(F.col("blocked").cast("bigint")).cast("bigint")
            .alias("n_hosts_blocked"),
            F.sum(F.when(F.col("blocked"), F.col("__tok")).otherwise(0))
            .cast("bigint").alias("tokens_blocked"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "agent", "n_hosts", "n_hosts_blocked", "tokens_blocked",
            F.expr("(10000 * tokens_blocked) div greatest(__total, 1)")
            .cast("bigint").alias("token_share_bp"),
        )
    )


def host_categories(pages: DataFrame, rules: DataFrame,
                    url_col: str = "url",
                    default_category: str = "other") -> DataFrame:
    """(category, n_hosts, n_pages, page_share_bp) — rule-based host
    taxonomy, the corpus-composition dimension training-data
    datasheets report (Dolma's and RefinedWeb's source/domain
    breakdowns; Gebru et al.'s datasheet prompts ask for exactly
    this): classify each HOST by the first matching rule and roll up
    the corpus mix. ``rules`` is (category, pattern, priority) — a
    human-curated regex table (RE2/Java-common subset), smallest
    priority wins, unmatched hosts fall to ``default_category``.

    Scale shape: hosts are DISTINCT-ed before classification (the
    rules join runs at host grain, ~10^7 rows at web scale, not
    page grain), the rules table broadcasts (tens of rows), the match
    is one rlike filter over the host×rules fan-out bounded by the
    rule count, winner via one min-priority agg, and page counts come
    from one host-keyed partial agg joined back at category grain."""
    from pyspark.sql import Window

    host_pages = pages.select(
        url_host(F.col(url_col)).alias("host")
    ).groupBy("host").agg(F.count("*").cast("bigint").alias("n_pages"))
    matched = (
        host_pages.select("host")
        .join(F.broadcast(rules), F.expr("host rlike pattern"), "left")
        .groupBy("host")
        .agg(
            F.min(F.struct("priority", "category")).getField("category")
            .alias("category")
        )
        .select(
            "host",
            F.coalesce("category", F.lit(default_category))
            .alias("category"),
        )
    )
    w_all = Window.partitionBy()
    return (
        host_pages.join(matched, "host")
        .groupBy("category")
        .agg(
            F.count("*").cast("bigint").alias("n_hosts"),
            F.sum("n_pages").cast("bigint").alias("n_pages"),
        )
        .withColumn(
            "__total", F.sum("n_pages").over(w_all).cast("bigint")
        )
        .select(
            "category", "n_hosts", "n_pages",
            F.expr("(10000 * n_pages) div greatest(__total, 1)")
            .cast("bigint").alias("page_share_bp"),
        )
    )


# UTS #39-style confusable skeleton: ASCII digit homoglyphs + the
# Cyrillic lowercase letters whose glyphs are indistinguishable from
# Latin in common fonts. 1:1 char map so both engines can use
# translate(); hyphens are stripped separately (typosquats insert
# them: pay-pal). A production table would carry the full Unicode
# confusables.txt; this subset covers the digit/Cyrillic families that
# dominate real homograph abuse.
CONFUSABLE_SRC = "013457аеорсухіѕ"
CONFUSABLE_DST = "oleastaeopcyxis"


def confusable_hosts(pages: DataFrame, host_col: str = "host") -> DataFrame:
    """(skeleton, n_hosts, n_docs, hosts) — IDN-homograph / typosquat
    host families: every host is folded through a confusable-skeleton
    map (UTS #39 "Confusable Detection": two strings are confusable
    iff their skeletons are equal), and skeletons claimed by MORE THAN
    ONE distinct raw host are emitted with the sorted member list. A
    crawl that treats ``exаmple.com`` (Cyrillic а) and ``example.com``
    as unrelated hosts double-counts mirrors past per-host quotas
    (X23) and lets spoof hosts inherit a reputable host's quality
    prior (X131); this is the join key that collapses them.

    Scale shape: pages reduce to host grain with one partial-agg
    groupBy (the exchange carries host strings only, never text),
    hosts reduce to skeleton grain with a second — host cardinality is
    ~10^7 at crawl scale, trivially shuffle-safe; collect_set runs at
    host grain (members per skeleton are a handful). No windows, no
    joins."""
    hosts = pages.groupBy(
        F.col(host_col).alias("host")
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
    skel = F.regexp_replace(
        F.translate(F.lower(F.col("host")),
                    CONFUSABLE_SRC, CONFUSABLE_DST),
        "-", "",
    )
    return (
        hosts.select(skel.alias("skeleton"), "host", "n_docs")
        .groupBy("skeleton")
        .agg(
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("host")), ",")
            .alias("hosts"),
        )
        .filter(F.col("n_hosts") > 1)
    )


def typo_host_pairs(hosts: DataFrame,
                    host_col: str = "host") -> DataFrame:
    """X239 — typosquatting detection: all DISTINCT host pairs at
    Levenshtein distance EXACTLY 1, found by a deletion-neighborhood
    join (FastSS; Bocek et al., U. Zurich TR 2007): each host emits
    itself + every 1-char-deletion variant; any pair at distance <= 1
    MUST share a key (substitution at i -> equal deletion-at-i
    variants; insertion/deletion -> the shorter string IS a variant
    of the longer) — so the candidate join is a LOSSLESS superset,
    then one codegen levenshtein verifies exactly. The complement of
    X189's homograph fold (confusable SCRIPTS there, fat-finger EDITS
    here); both feed the phishing/brand-protection blocklists.

    Shape at scale: hosts explode to len+1 keys of host-length
    strings (hosts ~tens of chars — bounded fan-out), ONE equi-join
    on the variant key, exact-distance verify on the candidates only
    (never all pairs), id-ordered dedupe. Emits (host_a, host_b)
    with host_a < host_b.

    Determinism: candidates via distinct; DuckDB's levenshtein is
    the oracle's verifier — both engines compute the classic DP."""
    h = hosts.select(F.col(host_col).alias("host")).where(
        F.col("host").isNotNull() & (F.col("host") != "")
    ).distinct()
    variants = h.select(
        "host",
        F.explode(
            F.array_union(
                F.array(F.col("host")),
                F.transform(
                    F.sequence(F.lit(1), F.length("host")),
                    lambda i: F.concat(
                        # Column-arg substr (F.substring only takes
                        # int literals for pos/len)
                        F.col("host").substr(F.lit(1), (i - 1).cast("int")),
                        F.col("host").substr(
                            i + 1, F.length("host") - i + 1
                        ),
                    ),
                ),
            )
        ).alias("key"),
    ).distinct()
    a = variants.select(F.col("host").alias("host_a"), "key")
    b = variants.select(F.col("host").alias("host_b"), "key")
    cand = (
        a.join(b, "key")
        .filter(F.col("host_a") < F.col("host_b"))
        .select("host_a", "host_b")
        .distinct()
    )
    return cand.filter(
        F.levenshtein(F.col("host_a"), F.col("host_b")) == 1
    )
