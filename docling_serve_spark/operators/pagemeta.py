"""Page-level HTML metadata at scan speed: title, meta description,
canonical URL, robots noindex, heading count.

Crawl pipelines need indexing metadata for every fetched page long
before (and independently of) main-content extraction: the canonical
link collapses URL aliases ahead of dedup, `noindex` is a
publisher-stated exclusion signal many corpora honor (and a quality
prior), and title/description are the snippet fields retrieval and
labeling passes read. Running the full DOM-building extraction UDF
(`extract/html_extract.py`) for five header fields would pay the
Python/Arrow round-trip per page; this operator instead stays
entirely in WholeStageCodegen — a handful of regexp passes over the
head of the document — so at 100 TB it is scan-bound, shuffle-free,
and composable with any downstream groupBy.

Attribute-order robustness: real pages write both
``<meta name="description" content="...">`` and the reversed
``<meta content="..." name="description">`` — each field tries the
name-first pattern and falls back to the content-first one. The html
column is a lossy binary→string cast (Spark 4's ``F.decode`` throws
on invalid UTF-8; one mangled crawl page must not kill a task — same
rule as `operators/webgraph.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _clean(col: Column) -> Column:
    """Snippet normalization: collapse whitespace runs, trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _first_nonempty(*cols: Column) -> Column:
    """First column with a non-empty value (all-empty → last col)."""
    expr = cols[-1]
    for c in reversed(cols[:-1]):
        expr = F.when(c != "", c).otherwise(expr)
    return expr


def _attr_pair(h: Column, tag: str, key_attr: str, key_val: str,
               val_attr: str) -> Column:
    """Extract ``val_attr``'s value from the ``tag`` element whose
    ``key_attr`` equals ``key_val`` — both attribute orders; double-
    quoted, single-quoted, AND unquoted values (HTML5 allows all
    three and real crawls carry all three; noindex under-matching
    over-collects, so recall here is a compliance property). Priority:
    double-quoted, then single-quoted, then unquoted — so a quoted
    value containing an apostrophe or space is never truncated. The
    key's own quotes are optional (``name=description`` matches),
    terminated by quote/whitespace//>/ so ``description-x`` cannot
    false-match; an unquoted value runs to the first whitespace or
    '>' per the HTML5 tokenizer. Patterns stay RE2-compatible (no
    lookahead) so the DuckDB oracle twin is byte-identical."""
    key = f'{key_attr}=["\']?{key_val}["\'\\s/>]'
    pats = []
    vals = [f'{val_attr}="([^"]*)"',        # double-quoted first
            f"{val_attr}='([^']*)'",        # then single-quoted
            val_attr + "=([^\"'\\s>][^\\s>]*)"]  # then unquoted
    for val in vals:
        pats.append(f"(?is)<{tag}[^>]*{key}[^>]*{val}")
        pats.append(f"(?is)<{tag}[^>]*{val}[^>]*{key}")
    return _first_nonempty(*[F.regexp_extract(h, p, 1) for p in pats])


def extract_page_meta(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(url, title, meta_description, canonical, noindex, n_h1) —
    header metadata per page; absent fields are empty strings
    (never null, so downstream filters need no three-valued logic),
    ``noindex`` is a boolean, ``n_h1`` counts top-level heading tags
    (a weak page-structure quality signal). Attributes are matched in
    either order and with double-quoted, single-quoted, or unquoted
    values (noindex is a publisher opt-out — under-matching it
    over-collects)."""
    h = F.col(html_col).cast("string")
    title = F.regexp_extract(h, "(?is)<title[^>]*>([^<]*)</title>", 1)
    desc = _attr_pair(h, "meta", "name", "description", "content")
    canonical = _attr_pair(h, "link", "rel", "canonical", "href")
    robots = _attr_pair(h, "meta", "name", "robots", "content")
    return pages.select(
        F.col(url_col).alias("url"),
        _clean(title).alias("title"),
        _clean(desc).alias("meta_description"),
        F.trim(canonical).alias("canonical"),
        F.lower(robots).contains("noindex").alias("noindex"),
        F.size(F.regexp_extract_all(h, F.lit("(?i)<h1[ >]"), F.lit(0)))
        .cast("int").alias("n_h1"),
    )


#: high-precision parked-lander phrases (the registrar boilerplate).
PARKED_PHRASES = ("domain is for sale", "buy this domain",
                  "domain may be for sale", "parked free",
                  "domain parking", "this page is parked")


def parked_page_stats(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html",
                      density_threshold_bp: int = 6000,
                      min_anchors: int = 5) -> DataFrame:
    """(url, n_anchors, anchor_chars, visible_chars, link_density_bp,
    has_parked_phrase, is_parked) — parked-domain / ad-lander
    detection on raw page bytes. Registrar landers and ad farms are a
    well-known crawl pollution class (RefinedWeb and C4 both exclude
    them); their signature is text that is almost entirely link
    anchors plus registrar boilerplate. Two signals, both codegen:

    - link density: anchor-text chars over tag-stripped visible
      chars, in integer basis points floor(10^4·a/v) — a parked
      lander is nearly all links, article pages sit far below;
      gated by a minimum anchor count so a one-link stub page
      cannot flag.
    - parked phrases: a case-folded alternation of registrar
      boilerplate ("this domain is for sale", …) — high precision,
      flags regardless of density.

    Same lossy binary→string cast as the other html operators; pure
    narrow map, zero shuffles (plan-asserted with page_meta)."""
    h = F.col(html_col).cast("string")
    anchors = F.regexp_extract_all(h, F.lit(">([^<]+)</a>"), F.lit(1))
    anchor_chars = F.length(F.array_join(anchors, "")).cast("bigint")
    visible = F.trim(
        F.regexp_replace(F.regexp_replace(h, "<[^>]*>", " "), r"\s+", " ")
    )
    visible_chars = F.length(visible).cast("bigint")
    phrase_re = "(?i)" + "|".join(p.replace(" ", r"\s+")
                                  for p in PARKED_PHRASES)
    n_anchors = F.size(anchors).cast("int")
    has_phrase = F.regexp_count(h, F.lit(phrase_re)) > 0
    base = pages.select(
        F.col(url_col).alias("url"),
        n_anchors.alias("n_anchors"),
        anchor_chars.alias("anchor_chars"),
        visible_chars.alias("visible_chars"),
        has_phrase.alias("has_parked_phrase"),
    )
    # bigint `div`, never double floor — the rate stays exact past
    # 2^53 and both engines share one integer semantics.
    density_bp = F.expr(
        "(10000 * anchor_chars) div greatest(visible_chars, 1)"
    ).cast("bigint")
    return base.select(
        "url", "n_anchors", "anchor_chars", "visible_chars",
        density_bp.alias("link_density_bp"),
        "has_parked_phrase",
        (
            F.col("has_parked_phrase")
            | ((density_bp >= density_threshold_bp)
               & (F.col("n_anchors") >= min_anchors))
        ).alias("is_parked"),
    )


def extract_hreflang(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """(src_url, hreflang, alt_url) — the page's declared language
    alternates, one row per ``<link rel="alternate" hreflang=..
    href=..>``. Publisher-declared hreflang clusters are how
    parallel-document candidates are mined from a general crawl
    (ParaCrawl's placement pipeline starts exactly here): each triple
    says "the same content exists at alt_url in language hreflang",
    giving aligned-document pairs orders of magnitude cheaper than
    content-based bitext mining.

    Extraction is the two-pass tag regexp of `extract_anchor_texts`:
    pull whole ``<link …>`` tags (codegen extract_all), keep those
    declaring ``rel="alternate"`` AND an hreflang, then per-tag group
    extracts — so attribute order never matters. hreflang values are
    lowercased (BCP 47 is case-insensitive), empties and missing
    hrefs drop, duplicates collapse. Narrow map + one distinct;
    html never shuffles — only (url, lang, url) triples."""
    h = F.col(html_col).cast("string")
    tags = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(h, F.lit("(?i)<link[^>]*>"), F.lit(0))
        ).alias("tag"),
    ).filter(
        F.lower(F.col("tag")).contains('rel="alternate"')
        & F.lower(F.col("tag")).contains("hreflang=")
    )
    return (
        tags.select(
            "src_url",
            F.lower(
                F.regexp_extract(F.col("tag"), '(?i)hreflang="([^"]*)"', 1)
            ).alias("hreflang"),
            F.regexp_extract(F.col("tag"), '(?i)href="([^"]*)"', 1)
            .alias("alt_url"),
        )
        .filter((F.col("hreflang") != "") & (F.col("alt_url") != ""))
        .distinct()
    )


def host_health(pages: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """(host, n_pages, n_noindex, noindex_bp, n_parked, parked_bp,
    mean_h1_x100) — the per-host publication-health rollup a crawl
    operator reads before spending recrawl budget on a site: a host
    that is mostly ``noindex`` (publisher opted out) or mostly parked
    (registrar lander) is dropped at the HOST grain, not page by page
    — the same grain RefinedWeb applies its URL/host exclusions at.

    Composes this module's two already-oracle-proven per-page passes
    (X44 metadata, X51 parked detection) and rolls up on the
    canonical host: one codegen scan pass computing both signal sets,
    one partial-agg groupBy(host) — page bytes never shuffle, rates
    are bigint-div basis points, mean_h1 is kept as an integer
    centi-count (×100) so the column never carries a float."""
    from docling_serve_spark.operators.urltools import url_host

    meta = extract_page_meta(pages, url_col=url_col, html_col=html_col)
    parked = parked_page_stats(pages, url_col=url_col, html_col=html_col)
    j = meta.join(parked.select("url", "is_parked"), "url")
    agg = j.groupBy(url_host(F.col("url")).alias("host")).agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum(F.when(F.col("noindex"), 1).otherwise(0))
        .cast("bigint").alias("n_noindex"),
        F.sum(F.when(F.col("is_parked"), 1).otherwise(0))
        .cast("bigint").alias("n_parked"),
        F.sum("n_h1").cast("bigint").alias("h1_total"),
    )
    return agg.select(
        "host", "n_pages", "n_noindex",
        F.expr("(10000 * n_noindex) div n_pages").cast("bigint")
        .alias("noindex_bp"),
        "n_parked",
        F.expr("(10000 * n_parked) div n_pages").cast("bigint")
        .alias("parked_bp"),
        F.expr("(100 * h1_total) div n_pages").cast("bigint")
        .alias("mean_h1_x100"),
    )


def title_dup_candidates(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(url, title_fp, group_size, rep_url, is_candidate) —
    metadata-only duplicate candidates by normalized-title
    fingerprint: the dedup pass an operator can run from the INDEX
    alone (CDX + titles), before fetching or extracting any body —
    title collisions are how wayback-style archives and SEO audits
    shortlist duplicate clusters cheaply. Body-level confirmation is
    X2/X4's job; this is the recall-oriented shortlist.

    Empty/missing titles are NEVER candidates (every untitled page
    would otherwise collide into one giant pseudo-cluster — the
    ubiquitous-key trap, same class as X46's df-cap). ``rep_url`` is
    the lexicographic minimum of the group (deterministic
    representative). One codegen title pass + one partial-agg
    groupBy on the 32-hex fingerprint + one equi-join back — page
    bytes never shuffle."""
    from docling_serve_spark.operators.dedup import norm_text

    meta = extract_page_meta(pages, url_col=url_col, html_col=html_col)
    t = norm_text(F.col("title"))
    per = meta.select(
        "url",
        F.md5(t).alias("title_fp"),
        (t == "").alias("__empty"),
    )
    groups = (
        per.filter(~F.col("__empty"))
        .groupBy("title_fp")
        .agg(
            F.count("*").cast("bigint").alias("group_size"),
            F.min("url").alias("rep_url"),
        )
    )
    return per.join(groups, "title_fp", "left").select(
        "url",
        "title_fp",
        F.coalesce(F.col("group_size"), F.lit(0)).cast("bigint")
        .alias("group_size"),
        "rep_url",
        (F.coalesce(F.col("group_size"), F.lit(0)) >= 2).alias("is_candidate"),
    )


def canonical_trust(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html",
                    text_col: str = "text") -> DataFrame:
    """(host, n_pages, n_with_canonical, n_self, n_agree, n_disagree,
    n_dangling, trust_bp) — per-host audit of whether rel=canonical
    declarations can be TRUSTED: a canonical pointing at a crawled
    page with the same content fingerprint confirms the declaration
    (agree); one pointing at different content is the spam/misconfig
    signature search engines demote canonical trust for (disagree;
    cf. Google's published guidance that conflicting canonicals are
    treated as hints, not directives); one pointing at an uncrawled
    URL is frontier debt (dangling). trust_bp =
    (10000 · (n_self + n_agree)) div n_with_canonical is the score a
    dedup tier consults before letting declared canonicals override
    fingerprint clustering (X33 picks canonicals BY content; this
    measures whether the host's own declarations would have agreed).

    If several crawled URLs normalize to the same canonical target,
    the lexicographically-smallest fingerprint stands for the target —
    a deterministic tie rule, mirrored in the oracle.

    Scale shape: metadata extraction and fingerprinting are one
    codegen pass; the target probe is ONE equi-join on the normalized
    canonical URL (never cross-host fan-out — the key is a full URL);
    the rollup is one partial-agged groupBy on host. All counters
    bigint, score by integer div."""
    from docling_serve_spark.operators.dedup import norm_text
    from docling_serve_spark.operators.urltools import canonical_url, url_host

    base = pages.select(
        F.col(url_col).alias("url"),
        F.md5(norm_text(F.col(text_col))).alias("fp"),
    )
    meta = extract_page_meta(pages, url_col, html_col).select(
        "url", "canonical"
    )
    m = meta.join(base, "url").select(
        url_host(F.col("url")).alias("host"),
        canonical_url(F.col("url")).alias("u"),
        F.when(F.col("canonical") == "", F.lit(""))
        .otherwise(canonical_url(F.col("canonical"))).alias("cu"),
        "fp",
    )
    targets = base.groupBy(
        canonical_url(F.col("url")).alias("cu")
    ).agg(F.min("fp").alias("target_fp"))
    j = m.join(targets, "cu", "left")
    has = F.col("cu") != ""
    self_ = has & (F.col("cu") == F.col("u"))
    cross = has & (F.col("cu") != F.col("u"))
    agree = cross & (F.col("target_fp") == F.col("fp"))
    disagree = cross & F.col("target_fp").isNotNull() \
        & (F.col("target_fp") != F.col("fp"))
    dangling = cross & F.col("target_fp").isNull()
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        j.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            one(has).alias("n_with_canonical"),
            one(self_).alias("n_self"),
            one(agree).alias("n_agree"),
            one(disagree).alias("n_disagree"),
            one(dangling).alias("n_dangling"),
        )
        .withColumn(
            "trust_bp",
            F.expr("(10000 * (n_self + n_agree)) "
                   "div greatest(n_with_canonical, 1)").cast("bigint"),
        )
    )


def hreflang_reciprocity(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(src_url, n_declared, n_self, n_reciprocal, n_unreturned,
    reciprocal_bp) — the hreflang RETURN-TAG audit: search engines
    honor a declared alternate cluster only when the target page links
    BACK (Google's documented "return links" requirement — clusters
    without them are ignored), and ParaCrawl-style bitext mining that
    trusts unreturned declarations inherits whatever the publisher
    misconfigured. Per page: declared alternates (X52's triples),
    self-references (recommended, trivially valid), cross alternates
    confirmed by a reverse edge, and the unreturned remainder;
    reciprocal_bp scores the cross edges only. Reciprocity is checked
    on the URL pair — the return tag's language label may legitimately
    differ, so hreflang values don't participate. Pages declaring
    nothing emit no row (this audits declarations, not coverage).

    Scale shape: one extraction pass (narrow map + distinct), ONE
    self-equi-join on the (src, alt) URL pair — alternate clusters
    are tiny and host-local in practice, and the join key is the full
    URL pair so nothing fans out — then one partial-agg rollup per
    page."""
    edges = extract_hreflang(pages, url_col, html_col).select(
        "src_url", "alt_url"
    ).distinct()
    cross = edges.filter(F.col("src_url") != F.col("alt_url"))
    rev = cross.select(
        F.col("alt_url").alias("src_url"),
        F.col("src_url").alias("alt_url"),
        F.lit(True).alias("returned"),
    )
    tagged = edges.join(rev, ["src_url", "alt_url"], "left").select(
        "src_url",
        (F.col("src_url") == F.col("alt_url")).alias("is_self"),
        (F.col("returned").isNotNull()
         & (F.col("src_url") != F.col("alt_url"))).alias("is_rec"),
    )
    return (
        tagged.groupBy("src_url")
        .agg(
            F.count("*").cast("bigint").alias("n_declared"),
            F.sum(F.when(F.col("is_self"), 1).otherwise(0))
            .cast("bigint").alias("n_self"),
            F.sum(F.when(F.col("is_rec"), 1).otherwise(0))
            .cast("bigint").alias("n_reciprocal"),
        )
        .select(
            "src_url", "n_declared", "n_self", "n_reciprocal",
            (F.col("n_declared") - F.col("n_self") - F.col("n_reciprocal"))
            .cast("bigint").alias("n_unreturned"),
            F.expr("(10000 * n_reciprocal) "
                   "div greatest(n_declared - n_self, 1)")
            .cast("bigint").alias("reciprocal_bp"),
        )
    )


def structured_data_stats(pages: DataFrame, url_col: str = "url",
                          html_col: str = "html") -> DataFrame:
    """(host, n_pages, n_jsonld, n_microdata, jsonld_bp, top_type,
    top_type_n) — schema.org structured-data coverage per host:
    JSON-LD blocks, microdata markers, and the host's dominant
    declared @type. Structured data is a corpus ENRICHMENT source
    (recipes, QA pairs, product/article metadata are mined from
    exactly these blocks — schema.org adoption is why), so a mixture
    builder wants to know which hosts carry machine-readable payloads
    worth a dedicated extraction pass — and a host whose pages are
    100% 'Product' is a shop, not prose, whatever its text quality
    scores say.

    Detection is containment + one @type regexp over the raw bytes
    (no JSON parse — a 10^12-page audit pass must not pay per-page
    json decoding for a coverage statistic; the dedicated extraction
    pass that follows does the real parsing on the flagged subset).
    Scale shape: narrow map, one host partial agg, one (host, type)
    partial agg + per-host top-1 window over the tiny type table."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.urltools import url_host

    h = F.col(html_col).cast("string")
    base = pages.select(
        url_host(F.col(url_col)).alias("host"),
        F.lower(h).contains('type="application/ld+json"')
        .alias("has_jsonld"),
        F.lower(h).contains("itemscope").alias("has_microdata"),
        F.regexp_extract_all(
            h, F.lit(r'(?i)"@type"\s*:\s*"([^"]+)"'), F.lit(1)
        ).alias("types"),
    )
    per_host = base.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum(F.when(F.col("has_jsonld"), 1).otherwise(0))
        .cast("bigint").alias("n_jsonld"),
        F.sum(F.when(F.col("has_microdata"), 1).otherwise(0))
        .cast("bigint").alias("n_microdata"),
    ).withColumn(
        "jsonld_bp",
        F.expr("(10000 * n_jsonld) div greatest(n_pages, 1)")
        .cast("bigint"),
    )
    type_counts = (
        base.select("host", F.explode("types").alias("t"))
        .groupBy("host", "t")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n").desc(), F.col("t").asc()
    )
    top = (
        type_counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("host", F.col("t").alias("top_type"),
                F.col("n").alias("top_type_n"))
    )
    return per_host.join(top, "host", "left").select(
        "host", "n_pages", "n_jsonld", "n_microdata", "jsonld_bp",
        F.coalesce(F.col("top_type"), F.lit("")).alias("top_type"),
        F.coalesce(F.col("top_type_n"), F.lit(0)).cast("bigint")
        .alias("top_type_n"),
    )


def render_required_stats(pages: DataFrame, url_col: str = "url",
                          html_col: str = "html",
                          min_text_chars: int = 200,
                          script_share_bp: int = 7000) -> DataFrame:
    """(host, n_pages, n_render_required, render_bp, script_share_bp)
    — headless-browser budget planning: the share of a host's pages
    whose content is NOT in the fetched bytes because it renders
    client-side. A page is flagged when its server-side visible text
    is tiny (< ``min_text_chars`` after script/tag stripping) AND it
    either carries an empty SPA mount point (<div id="root"/app">,
    the React/Vue shell shape) or is script-dominated (script bytes ≥
    ``script_share_bp`` of the page). Crawl planners split the fetch
    fleet on exactly this signal: plain-HTTP fetchers for static
    hosts, the ~100× dearer rendering fetchers only where this audit
    says the text lives in JS (Google's own crawler documents the
    two-tier render queue).

    Detection is two regexp strips + one contains over the raw bytes
    — a coverage audit must not pay a JS engine per page; unclosed
    <script> blocks deliberately fall through to the text side
    (identical in both engines). Narrow map + ONE host partial agg;
    rates in bigint basis points."""
    from docling_serve_spark.operators.urltools import url_host

    h = F.col(html_col).cast("string")
    stripped = F.regexp_replace(h, r"(?is)<script.*?</script>", "")
    text = F.regexp_replace(stripped, r"(?s)<[^>]*>", "")
    base = pages.select(
        url_host(F.col(url_col)).alias("host"),
        F.length(h).cast("bigint").alias("total_chars"),
        (F.length(h) - F.length(stripped)).cast("bigint")
        .alias("script_chars"),
        F.length(F.trim(text)).cast("bigint").alias("text_chars"),
        h.rlike(r'(?i)<div[^>]*id="(root|app)"[^>]*>\s*</div>')
        .alias("spa_shell"),
    )
    required = (
        F.col("spa_shell")
        | (F.expr("(10000 * script_chars) div greatest(total_chars, 1)")
           >= F.lit(int(script_share_bp)))
    ) & (F.col("text_chars") < F.lit(int(min_text_chars)))
    return (
        base.select("host", "total_chars", "script_chars",
                    required.alias("required"))
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum(F.when(F.col("required"), 1).otherwise(0))
            .cast("bigint").alias("n_render_required"),
            F.sum("total_chars").alias("t"),
            F.sum("script_chars").alias("s"),
        )
        .select(
            "host", "n_pages", "n_render_required",
            F.expr("(10000 * n_render_required) div greatest(n_pages, 1)")
            .cast("bigint").alias("render_bp"),
            F.expr("(10000 * s) div greatest(t, 1)")
            .cast("bigint").alias("script_share_bp"),
        )
        .orderBy("host")
    )


def table_mining_stats(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """(host, n_pages, n_tables, n_mineable, mineable_bp,
    pages_with_mineable_bp) — table-extraction coverage per host: how
    many <table> blocks a host carries and how many are worth a
    structure-extraction pass (≥2 rows AND ≥2 cells per row on
    average — single-row headers and one-column layout scaffolding
    are presentation, not data; the WDC Web Table corpus pipeline
    applies exactly this class of relational-vs-layout pre-filter
    before its extractor). Pairs with X125: JSON-LD tells you which
    hosts declare structure, this tells you which carry implicit
    relational payloads the C4-row table extractor (docling's table
    stage at web scale) should be pointed at.

    Counting is regexp-only over raw bytes (per-table row/cell counts
    via ONE extract_all + codegen higher-order transforms — no DOM
    parse in a coverage audit; unclosed tables fall out of the lazy
    match identically in both engines). Narrow map + ONE host
    partial agg."""
    from docling_serve_spark.operators.urltools import url_host

    h = F.col(html_col).cast("string")
    tables = F.regexp_extract_all(
        h, F.lit(r"(?is)<table[^>]*>.*?</table>"), F.lit(0)
    )
    # per-table (rows, cells) -> mineable flag, all inside one
    # codegen expression tree
    mineable = F.expr(
        "size(filter(transform(tables, t -> named_struct("
        "'r', size(regexp_extract_all(t, '(?i)<tr', 0)), "
        "'c', size(regexp_extract_all(t, '(?i)<t[dh]', 0)))), "
        "s -> s.r >= 2 AND s.c >= 2 * s.r))"
    )
    base = pages.select(
        url_host(F.col(url_col)).alias("host"),
        tables.alias("tables"),
    ).select(
        "host",
        F.size("tables").cast("bigint").alias("nt"),
        mineable.cast("bigint").alias("nm"),
    )
    return (
        base.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum("nt").cast("bigint").alias("n_tables"),
            F.sum("nm").cast("bigint").alias("n_mineable"),
            F.sum(F.when(F.col("nm") > 0, 1).otherwise(0))
            .cast("bigint").alias("pages_with"),
        )
        .select(
            "host", "n_pages", "n_tables", "n_mineable",
            F.expr("(10000 * n_mineable) div greatest(n_tables, 1)")
            .cast("bigint").alias("mineable_bp"),
            F.expr("(10000 * pages_with) div greatest(n_pages, 1)")
            .cast("bigint").alias("pages_with_mineable_bp"),
        )
        .orderBy("host")
    )


_SOFT404_PAT = (
    r"(page|file|document) not found|error 404|404 error|"
    r"no longer (available|exists)|page (doesn.t|does not) exist"
)


def soft404_stats(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html",
                  min_text_chars: int = 500) -> DataFrame:
    """(host, n_pages, n_soft404, soft404_bp) — soft-404 detection
    per host (Bar-Yossef et al., WWW 2004 "Sic transit gloria telae":
    servers that answer 200 for dead pages poison both the crawl
    frontier and the corpus with error boilerplate): a page is a
    soft 404 when its <title> carries a not-found marker, OR its body
    carries one AND the tag-stripped text is short (an article
    DISCUSSING 404 pages is long and stays). Archives route these to
    the X43 frontier as dead ends and the corpus filter drops them —
    at 200-status face value they look like perfectly healthy
    documents.

    One title extract + one marker regexp + the X134 tag-strip,
    all riding the scan; ONE host partial agg."""
    from docling_serve_spark.operators.urltools import url_host

    h = F.col(html_col).cast("string")
    title = F.lower(
        F.regexp_extract(h, r"(?is)<title[^>]*>(.*?)</title>", 1)
    )
    body_text = F.regexp_replace(
        F.regexp_replace(h, r"(?is)<script.*?</script>", ""),
        r"(?s)<[^>]*>", "",
    )
    marker_title = title.rlike(_SOFT404_PAT)
    marker_body = F.lower(h).rlike(_SOFT404_PAT)
    soft = marker_title | (
        marker_body
        & (F.length(F.trim(body_text)) < F.lit(int(min_text_chars)))
    )
    return (
        pages.select(
            url_host(F.col(url_col)).alias("host"), soft.alias("soft")
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum(F.when(F.col("soft"), 1).otherwise(0))
            .cast("bigint").alias("n_soft404"),
        )
        .select(
            "host", "n_pages", "n_soft404",
            F.expr("(10000 * n_soft404) div greatest(n_pages, 1)")
            .cast("bigint").alias("soft404_bp"),
        )
        .orderBy("host")
    )


_PAYWALL_PAT = (
    r"subscribe to (continue|read)|subscribers? only|"
    r"to continue reading|remaining free articles?|"
    r"unlock (this|unlimited) (article|access)|already a subscriber"
)


def paywall_stats(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(host, n_pages, n_declared, n_marker, n_paywalled, paywalled_bp)
    — paywall coverage per host from BOTH channels: the declared
    schema.org signal (``"isAccessibleForFree": false`` — the markup
    news publishers ship so Google can flexible-sample them) and
    textual meter markers ('subscribe to continue…'). A paywalled
    host's extracted text is teaser truncations wearing a full-page
    status — the mixture builder down-weights it, and the crawler
    stops spending budget on pages whose payload it can never get.
    Declared and marker channels are counted separately: hosts where
    ONLY markers fire are the silent-paywall set the declared signal
    misses.

    Two containment/regexp tests over raw bytes riding the scan, ONE
    host partial agg."""
    from docling_serve_spark.operators.urltools import url_host

    h = F.lower(F.col(html_col).cast("string"))
    declared = h.rlike(
        r'"isaccessibleforfree"\s*:\s*(false|"false")'
    )
    marker = h.rlike(_PAYWALL_PAT)
    return (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            declared.alias("d"), marker.alias("m"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum(F.when(F.col("d"), 1).otherwise(0))
            .cast("bigint").alias("n_declared"),
            F.sum(F.when(F.col("m"), 1).otherwise(0))
            .cast("bigint").alias("n_marker"),
            F.sum(F.when(F.col("d") | F.col("m"), 1).otherwise(0))
            .cast("bigint").alias("n_paywalled"),
        )
        .select(
            "host", "n_pages", "n_declared", "n_marker", "n_paywalled",
            F.expr("(10000 * n_paywalled) div greatest(n_pages, 1)")
            .cast("bigint").alias("paywalled_bp"),
        )
        .orderBy("host")
    )


def amp_variant_stats(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(host, n_pages, n_amp_pages, n_declared_pairs, n_resolved_pairs,
    amp_bp) — AMP variant accounting per host: canonical pages declare
    their mobile twin via <link rel="amphtml" href=…>, and the twin
    duplicates the content under a different url — a systematic
    variant channel exact dedup sees as distinct documents unless it
    is resolved FIRST (the AMP analog of X106's rel=canonical audit;
    Google's AMP spec mandates exactly this two-way link markup).
    ``n_declared_pairs`` counts amphtml declarations, ``n_amp_pages``
    counts pages that ARE amp documents (⚡/amp html marker), and
    ``n_resolved_pairs`` counts declarations whose target url exists
    in the crawl — the dedupable mass; declared − resolved is frontier
    debt (X128's class: the variant is linked but never fetched).

    One link-extract regexp + one marker test riding the scan, one
    url-membership equi-join (AQE-broadcast of the distinct amp
    targets against the crawled url set), ONE host partial agg."""
    from docling_serve_spark.operators.urltools import url_host

    h = F.col(html_col).cast("string")
    amp_href = F.regexp_extract(
        h, r'(?is)<link[^>]*rel="amphtml"[^>]*href="([^"]+)"', 1
    )
    is_amp = h.rlike(r"(?is)<html[^>]*\s(amp|⚡)[\s>]")
    base = pages.select(
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        amp_href.alias("amp_href"),
        is_amp.alias("is_amp"),
    )
    crawled = base.select(F.col("url").alias("amp_href")).distinct()
    declared = base.filter(F.col("amp_href") != "")
    resolved = declared.join(
        crawled.withColumn("resolved", F.lit(1)), "amp_href", "left"
    ).select("host", F.coalesce(F.col("resolved"), F.lit(0)).alias("res"))
    per_decl = resolved.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_declared_pairs"),
        F.sum("res").cast("bigint").alias("n_resolved_pairs"),
    )
    per_page = base.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum(F.when(F.col("is_amp"), 1).otherwise(0))
        .cast("bigint").alias("n_amp_pages"),
    )
    return (
        per_page.join(per_decl, "host", "left")
        .select(
            "host", "n_pages", "n_amp_pages",
            F.coalesce("n_declared_pairs", F.lit(0)).cast("bigint")
            .alias("n_declared_pairs"),
            F.coalesce("n_resolved_pairs", F.lit(0)).cast("bigint")
            .alias("n_resolved_pairs"),
            F.expr("(10000 * n_amp_pages) div greatest(n_pages, 1)")
            .cast("bigint").alias("amp_bp"),
        )
        .orderBy("host")
    )


def license_signal_stats(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(host, n_pages, n_open, n_restrictive, open_bp, top_license) —
    license-signal audit per host: Creative-Commons license links
    (rel=license / creativecommons.org hrefs, class extracted:
    by / by-sa / by-nc… / cc0-publicdomain) versus explicit
    all-rights-reserved markers. The compliance signal open-corpus
    builders mine at exactly this level (the Common-Corpus /
    OpenLicense-class pipelines whitelist hosts by declared license
    before ingesting them): a host that consistently declares CC is
    an open-ingest candidate, one that declares ARR goes to the
    opt-out ledger next to X44's noindex honor list. Declarations are
    SIGNALS, not legal conclusions — the audit feeds a human
    whitelist, which is why the dominant declared class per host is
    the deliverable.

    Two regexp extracts + one marker test riding the scan, ONE host
    partial agg + top-license window over the tiny (host, class)
    table."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.urltools import url_host

    h = F.lower(F.col(html_col).cast("string"))
    cc = F.regexp_extract(
        h, r"creativecommons\.org/licenses/([a-z-]+)/", 1
    )
    cc0 = h.contains("creativecommons.org/publicdomain")
    arr = h.rlike(r"all rights reserved")
    license_class = (
        F.when(cc != "", cc)
        .when(cc0, F.lit("cc0"))
        .otherwise(F.lit(""))
    )
    base = pages.select(
        url_host(F.col(url_col)).alias("host"),
        license_class.alias("lic"),
        arr.alias("arr"),
    )
    per_host = base.groupBy("host").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum(F.when(F.col("lic") != "", 1).otherwise(0))
        .cast("bigint").alias("n_open"),
        F.sum(F.when(F.col("arr") & (F.col("lic") == ""), 1).otherwise(0))
        .cast("bigint").alias("n_restrictive"),
    )
    lic = (
        base.filter(F.col("lic") != "")
        .groupBy("host", "lic").agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n").desc(), F.col("lic").asc()
    )
    top = lic.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") == 1) \
        .select("host", F.col("lic").alias("top_license"))
    return (
        per_host.join(top, "host", "left")
        .select(
            "host", "n_pages", "n_open", "n_restrictive",
            F.expr("(10000 * n_open) div greatest(n_pages, 1)")
            .cast("bigint").alias("open_bp"),
            F.coalesce("top_license", F.lit("")).alias("top_license"),
        )
        .orderBy("host")
    )


def title_body_overlap(pages: DataFrame, title_col: str = "title",
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       min_title_words: int = 3,
                       clickbait_cut_bp: int = 3000) -> DataFrame:
    """(doc_id, n_title_words, n_found, overlap_bp, is_inconsistent) —
    title/body consistency: the share of a page's content title words
    (≥3 chars, lowercased) that actually occur in its body text. A
    title that barely intersects its own body is the classic
    SEO-bait / aggregator-stub signature — and, equally important
    here, a MISEXTRACTION tell: when the boilerplate stripper keeps
    chrome and drops the article, the real title stops matching what
    survived (pair with X132's yield audit when a host flags). Quality
    stacks since C4 keep title-consistency among their heuristics;
    this is the integer-exact form.

    Pure per-row set arithmetic in the JVM (split, filter,
    array_intersect on deduplicated word sets) — zero shuffles, no
    Python. The flag requires ≥ ``min_title_words`` content words so
    one-word titles cannot flag."""
    t_words = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(title_col)), r"[^a-z0-9]+"),
            lambda w: F.length(w) >= 3,
        )
    )
    b_words = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda w: F.length(w) >= 3,
        )
    )
    base = pages.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(t_words).cast("bigint").alias("n_title_words"),
        F.size(F.array_intersect(t_words, b_words)).cast("bigint")
        .alias("n_found"),
    )
    overlap = F.expr("(10000 * n_found) div greatest(n_title_words, 1)")
    return base.select(
        "doc_id", "n_title_words", "n_found",
        overlap.cast("bigint").alias("overlap_bp"),
        (
            (F.col("n_title_words") >= min_title_words)
            & (overlap < clickbait_cut_bp)
        ).alias("is_inconsistent"),
    )


def pagination_chains(docs: DataFrame, text_col: str = "text",
                      k: int = 5, max_len: int = 6) -> DataFrame:
    """(root_id, pos, doc_id, chain_len) — multi-page article
    reassembly: a CMS that paginates one article over N URLs leaves a
    seam the crawler can re-stitch — page p+1 opens with the tokens
    page p closed on (continuation teasers, repeated bridge
    sentences). Each doc is reduced to a HEAD hash (first k tokens)
    and a TAIL hash (last k tokens); A chains to B when A's tail
    equals B's head (successor = min doc_id when several match —
    deterministic), roots are chain starts (head matched by no tail)
    with at least one successor, and each root walks forward at most
    ``max_len`` hops. Treating the parts as independent documents
    both fragments training sequences (X21/X68 chunk mid-article) and
    triple-counts the article against per-host quotas; the chain is
    the unit to pack.

    Scale shape: docs collapse to (doc_id, 2×16-byte hashes) in one
    scan — text never shuffles; the successor table is one hash
    equi-join + min-agg; the walk is ``max_len`` bounded rounds of
    (chain × successor) joins on doc_id, each round localCheckpoint'd
    (kcore/seed_distance discipline). Docs with < k tokens have no
    seam and are excluded."""
    from docling_serve_spark.operators.dedup import hof_let, tokens

    feat = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        hof_let(
            tokens(F.col(text_col)),
            lambda t: F.when(
                F.size(t) >= k,
                F.struct(
                    F.md5(F.concat_ws(" ", F.slice(t, 1, k)))
                    .alias("head_h"),
                    F.md5(F.concat_ws(
                        " ", F.slice(t, F.size(t) - k + 1, k)))
                    .alias("tail_h"),
                ),
            ),
        ).alias("__f"),
    ).filter(F.col("__f").isNotNull()).select(
        "doc_id", F.col("__f.head_h").alias("head_h"),
        F.col("__f.tail_h").alias("tail_h"),
    ).localCheckpoint(eager=True)

    nexts = (
        feat.alias("a")
        .join(feat.alias("b"),
              (F.col("a.tail_h") == F.col("b.head_h"))
              & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.min(F.col("b.doc_id")).alias("next_id"))
        .localCheckpoint(eager=True)
    )
    roots = (
        feat.join(feat.select(F.col("tail_h").alias("head_h"))
                  .distinct(), "head_h", "left_anti")
        .join(nexts, "doc_id", "leftsemi")
        .select(F.col("doc_id").alias("root_id"))
    )
    cur = roots.select(
        "root_id", F.lit(0).cast("bigint").alias("pos"),
        F.col("root_id").alias("doc_id"),
    ).localCheckpoint(eager=True)
    chain = cur
    for r in range(1, max_len):
        cur = (
            cur.join(nexts, "doc_id")
            .select("root_id", F.lit(r).cast("bigint").alias("pos"),
                    F.col("next_id").alias("doc_id"))
            # cycle guard: a seam cycle reachable from a root (mutual
            # "continue reading" boilerplate) would otherwise re-emit
            # the same doc at growing positions until max_len — each
            # doc appears at most once per root, so the walk stops
            # where the cycle closes instead of inflating chain_len
            .join(chain.select("root_id", "doc_id"),
                  ["root_id", "doc_id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        chain = chain.unionByName(cur)
    sizes = chain.groupBy("root_id").agg(
        F.count("*").cast("bigint").alias("chain_len")
    )
    return chain.join(sizes, "root_id").select(
        "root_id", "pos", "doc_id", "chain_len"
    )


def dom_skeletons(pages: DataFrame, html_col: str = "html",
                  host_col: str = "host") -> DataFrame:
    """(skeleton, n_docs, n_hosts, share_bp, example_host) — DOM-shape
    template families: each page reduces to its TAG SKELETON (the
    ordered sequence of opening-tag names, text stripped) and pages
    hash-group on it. A skeleton claimed by thousands of pages is a
    CMS template — listing/tag/archive chrome whose text is
    navigation, not content (the density-based boilerplate strip C8
    uses assumes article-shaped pages; skeleton grouping finds the
    pages where that assumption fails wholesale, cf. the
    template-detection line of Gibson/Punera/Tomkins, "The volume and
    evolution of web page templates", WWW 2005). Cross-host skeleton
    reuse also exposes mirror networks X46 misses when mirrors rewrap
    the same template around different text.

    Scale shape: the skeleton is ONE codegen regexp_extract_all over
    the scan (no DOM build — tag names only), reduced to a 16-byte
    md5 before any shuffle; then one (skeleton) partial-agg groupBy
    with a min-host exemplar. share_bp denominators ride a one-row
    broadcast total."""
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(r"<([a-zA-Z][a-zA-Z0-9]*)"), 1
    )
    skel = F.md5(F.array_join(F.transform(tags, F.lower), ">"))
    d = pages.select(
        skel.alias("skeleton"), F.col(host_col).alias("host")
    )
    total = d.select(F.count("*").cast("bigint").alias("__n"))
    return (
        d.groupBy("skeleton")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
            F.min("host").alias("example_host"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "skeleton", "n_docs", "n_hosts",
            F.expr("(10000 * n_docs) div __n").cast("bigint")
            .alias("share_bp"),
            "example_host",
        )
    )
