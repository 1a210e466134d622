"""Host-level web-graph centrality.

Crawl pipelines rank hosts by link centrality to prioritize fetch
frontiers and to weight quality signals (a host heavily linked by
other hosts is worth more crawl budget than an orphan — the original
PageRank use case, Page et al. 1999). This module computes PageRank
over a HOST graph — hosts ≪ pages by many orders of magnitude, so the
graph fits comfortably in a shuffle even at 10^12 pages: building the
edge list is the expensive (but narrow + one-groupBy) part, the
power iteration runs on the tiny host table.

Float discipline (same as the micro-nat LMs): ranks live in NANO
units (bigint, scale 1e9) and every step is floor-division with
bounded denominators (out-degree, damping 17/20, node count) — each
true quotient is a rational whose distance from any integer is far
larger than double rounding error, so floor() is engine-exact and the
iteration is bit-reproducible across Spark, DuckDB, and any
partitioning (the sums are integer sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCALE = 1_000_000_000  # nano-units
_D_NUM, _D_DEN = 17, 20  # damping 0.85 as an exact rational


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """(src_host, dst_host, n_links) — host-level outlink edges from
    raw page bytes: absolute http(s) hrefs pulled with ONE codegen'd
    ``regexp_extract_all`` over the decoded html (no Python, no DOM
    build — a link pass over a crawl is orders cheaper than the text
    pass, and webgraph pipelines run it standalone exactly like this),
    targets canonicalized to hosts, same-host/relative/mailto targets
    dropped, multiplicity kept as ``n_links``. Output feeds
    ``host_pagerank``.

    Scale shape: narrow map (decode + regexp + explode) then one
    partial-agg groupBy on (src_host, dst_host) — html bytes never
    shuffle, only host-pair strings. Decoding is the lossy
    binary->string CAST, not ``F.decode``: Spark 4's decode THROWS
    [MALFORMED_CHARACTER_CODING] on invalid UTF-8, and one mangled
    crawl page must not kill the task; under the cast, hrefs in valid
    regions still match and junk regions simply fail the regexp."""
    from docling_serve_spark.operators.urltools import url_host

    html_str = F.col(html_col).cast("string")
    links = pages.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(
                html_str, F.lit('(?i)href="(https?://[^"]+)"'), F.lit(1)
            )
        ).alias("target"),
    )
    return (
        links.select(
            "src_host", url_host(F.col("target")).alias("dst_host")
        )
        .filter(
            (F.col("dst_host") != "") & (F.col("dst_host") != F.col("src_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("bigint").alias("n_links"))
    )


def extract_anchor_texts(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html", k: int = 3) -> DataFrame:
    """(dst_host, anchor, n_links, n_src_hosts, rank) — inbound
    anchor-text aggregation: the top-``k`` normalized anchor strings
    pointing at each external host. Anchor text is the classic
    off-page relevance/quality signal (Brin & Page 1998 §2.2; used by
    web-corpus pipelines to label and rank hosts the crawler has not
    yet fetched), and for training data it supplies short human-written
    descriptions of a target page.

    Extraction is two codegen'd regexp passes, no DOM build: one
    ``regexp_extract_all`` pulls whole ``<a href="http(s)…">text</a>``
    tags (text anchors only — an anchor wrapping markup like ``<img>``
    is skipped by construction), then per-tag group extracts split
    href and anchor. Anchors are normalized (lowercase, whitespace
    collapsed, trimmed); empty anchors, non-http(s) targets and
    same-host links are dropped, multiplicity kept.

    Scale shape: narrow map (cast + regexp + explode) so html bytes
    never shuffle — only (dst_host, anchor) string pairs; one
    partial-agg groupBy, then the top-k window partitioned by
    dst_host. Ordering is integer-exact (n_links desc, anchor asc), so
    the result is partitioning-independent. The same lossy
    binary→string cast as `extract_outlinks` (Spark 4's F.decode
    throws on invalid UTF-8; one mangled page must not kill a task)."""
    from pyspark.sql import Window

    from docling_serve_spark.operators.urltools import url_host

    html_str = F.col(html_col).cast("string")
    tag_re = '(?i)<a[^>]*href="https?://[^"]*"[^>]*>[^<]*</a>'
    tags = pages.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(tag_re), F.lit(0))
        ).alias("tag"),
    )
    pairs = tags.select(
        "src_host",
        url_host(
            F.regexp_extract(F.col("tag"), '(?i)href="(https?://[^"]*)"', 1)
        ).alias("dst_host"),
        F.trim(
            F.regexp_replace(
                F.lower(F.regexp_extract(F.col("tag"), ">([^<]*)</a>", 1)),
                r"\s+", " ",
            )
        ).alias("anchor"),
    ).filter(
        (F.col("dst_host") != "")
        & (F.col("dst_host") != F.col("src_host"))
        & (F.col("anchor") != "")
    )
    agg = pairs.groupBy("dst_host", "anchor").agg(
        F.count("*").cast("bigint").alias("n_links"),
        F.countDistinct("src_host").cast("bigint").alias("n_src_hosts"),
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_links").desc(), F.col("anchor").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def host_pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(host, rank_nano, rank, out_degree, in_degree) — damped
    PageRank power iteration over a distinct (src, dst) host edge
    list, ``iterations`` rounds from the uniform start.

    r_{k+1}(v) = (1-d)/n + d * Σ_{u→v} floor(r_k(u) / outdeg(u))
    in nano-units with d = 17/20. Dangling mass is NOT redistributed
    (every host that appears only as a dst keeps contributing nothing)
    — acceptable for frontier ranking and what keeps every step a
    single equi-join + integer aggregation.

    Scale shape: one driver count() of the (tiny) host table; each
    round is one hash equi-join on src + one partial-agg sum keyed on
    dst — the host graph is millions of rows where the page table is
    trillions, so even k rounds are noise next to the page scan that
    built the edges. Deterministic: integer arithmetic throughout,
    no partition-order dependence."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    n = nodes.count()
    odeg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("odeg"))
    base = (_SCALE * (_D_DEN - _D_NUM)) // (_D_DEN * n)
    r = nodes.withColumn("r", F.lit(_SCALE // n).cast("bigint"))
    for _ in range(iterations):
        contrib = (
            e.join(r, e["src"] == r["host"])
            .join(odeg, "src")
            .select(
                F.col("dst").alias("host"),
                F.floor(F.col("r") / F.col("odeg")).cast("bigint").alias("c"),
            )
        )
        s = contrib.groupBy("host").agg(F.sum("c").cast("bigint").alias("s"))
        r = nodes.join(s, "host", "left").select(
            "host",
            (
                F.lit(base)
                + F.floor(
                    F.lit(_D_NUM)
                    * F.coalesce(F.col("s"), F.lit(0))
                    / F.lit(_D_DEN)
                )
            ).cast("bigint").alias("r"),
        )
    ideg = e.groupBy(F.col("dst").alias("host")).agg(
        F.count("*").cast("bigint").alias("in_degree")
    )
    return (
        r.join(odeg.withColumnRenamed("src", "host"), "host", "left")
        .join(ideg, "host", "left")
        .select(
            "host",
            F.col("r").alias("rank_nano"),
            F.round(F.col("r") / F.lit(float(_SCALE)), 6).alias("rank"),
            F.coalesce(F.col("odeg"), F.lit(0)).cast("bigint").alias("out_degree"),
            F.coalesce(F.col("in_degree"), F.lit(0)).cast("bigint").alias("in_degree"),
        )
    )


def trustrank(edges: DataFrame, seeds: list[str],
              iterations: int = 3) -> DataFrame:
    """(host, trust_nano, trust, is_seed) — TrustRank (Gyöngyi,
    Garcia-Molina & Pedersen, "Combating Web Spam with TrustRank",
    VLDB 2004): a power iteration identical to ``host_pagerank``
    except the teleport mass lands ONLY on a hand-vetted seed set, so
    trust decays with link distance from the seeds and link-farm
    neighborhoods (which inflate vanilla PageRank) receive almost
    none. Corpus pipelines weight sources by trust and flag
    high-PageRank/low-trust hosts as spam (the paper's "spam mass").

    Same NANO-bigint arithmetic as host_pagerank (d = 17/20 exact
    rational, floor division everywhere) so results are
    bit-reproducible across engines and partitionings:

      r_0(v)    = SCALE // |seeds| if v ∈ seeds else 0
      r_{k+1}(v)= [v ∈ seeds] * (SCALE*(20-17)) // (20*|seeds|)
                  + floor(17 * Σ_{u→v} floor(r_k(u)/outdeg(u)) / 20)

    Scale shape: identical to host_pagerank — the seed set is a
    literal isin() filter (thousands of hosts at most, Open Directory
    scale in the paper), each round one equi-join + one partial-agg
    sum on the host-grain graph."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    n_seeds = max(len(seeds), 1)
    is_seed = F.col("host").isin(list(seeds))
    odeg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("odeg"))
    seed_base = (_SCALE * (_D_DEN - _D_NUM)) // (_D_DEN * n_seeds)
    r = nodes.withColumn(
        "r",
        F.when(is_seed, F.lit(_SCALE // n_seeds)).otherwise(F.lit(0))
        .cast("bigint"),
    )
    for _ in range(iterations):
        contrib = (
            e.join(r, e["src"] == r["host"])
            .join(odeg, "src")
            .select(
                F.col("dst").alias("host"),
                F.floor(F.col("r") / F.col("odeg")).cast("bigint").alias("c"),
            )
        )
        s = contrib.groupBy("host").agg(F.sum("c").cast("bigint").alias("s"))
        r = nodes.join(s, "host", "left").select(
            "host",
            (
                F.when(is_seed, F.lit(seed_base)).otherwise(F.lit(0))
                + F.floor(
                    F.lit(_D_NUM)
                    * F.coalesce(F.col("s"), F.lit(0))
                    / F.lit(_D_DEN)
                )
            ).cast("bigint").alias("r"),
        )
    return r.select(
        "host",
        F.col("r").alias("trust_nano"),
        F.round(F.col("r") / F.lit(float(_SCALE)), 6).alias("trust"),
        is_seed.alias("is_seed"),
    )


def spam_mass(edges: DataFrame, seeds: list[str], iterations: int = 3,
              threshold_bp: int = 9000) -> DataFrame:
    """(host, rank_nano, trust_nano, spam_mass_bp, is_spam) — relative
    spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen, "Link Spam
    Detection Based on Mass Estimation", VLDB 2006): the fraction of a
    host's PageRank NOT explainable by trusted sources,
    ``(rank - trust) / rank``. Hosts whose rank is almost entirely
    spam-sourced (mass ≥ threshold) are the link-spam verdicts corpus
    pipelines subtract before domain-mix sampling.

    The two power iterations are FUSED into one dual-column loop:
    PageRank and TrustRank share the identical join structure (edge
    list × current rank × out-degree, then a sum keyed on dst), so
    each round carries (r_pr, r_tr) through ONE equi-join and ONE
    partial-agg groupBy instead of two of each — at web-graph scale
    that halves the shuffle count versus composing ``host_pagerank``
    and ``trustrank`` separately. Every elementwise floor/sum is the
    same operation those operators apply, so the result is
    bit-identical to the naive composition (and to the unrolled
    dual-CTE oracle). The ratio is integer basis points via bigint
    ``div`` (rank_nano ≤ 10^9 ⇒ 10^4·rank fits int64 with six decades
    of headroom). Trust can exceed rank on seed hosts (teleport mass
    concentrates on |seeds| instead of n) — mass clamps at 0, per the
    paper's max(0, ·)."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    n = nodes.count()
    n_seeds = max(len(seeds), 1)
    is_seed = F.col("host").isin(list(seeds))
    odeg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("odeg"))
    pr_base = (_SCALE * (_D_DEN - _D_NUM)) // (_D_DEN * n)
    tr_base = (_SCALE * (_D_DEN - _D_NUM)) // (_D_DEN * n_seeds)
    r = nodes.select(
        "host",
        F.lit(_SCALE // n).cast("bigint").alias("r_pr"),
        F.when(is_seed, F.lit(_SCALE // n_seeds)).otherwise(F.lit(0))
        .cast("bigint").alias("r_tr"),
    )
    for _ in range(iterations):
        contrib = (
            e.join(r, e["src"] == r["host"])
            .join(odeg, "src")
            .select(
                F.col("dst").alias("host"),
                F.floor(F.col("r_pr") / F.col("odeg")).cast("bigint").alias("c_pr"),
                F.floor(F.col("r_tr") / F.col("odeg")).cast("bigint").alias("c_tr"),
            )
        )
        s = contrib.groupBy("host").agg(
            F.sum("c_pr").cast("bigint").alias("s_pr"),
            F.sum("c_tr").cast("bigint").alias("s_tr"),
        )
        r = nodes.join(s, "host", "left").select(
            "host",
            (
                F.lit(pr_base)
                + F.floor(
                    F.lit(_D_NUM) * F.coalesce(F.col("s_pr"), F.lit(0))
                    / F.lit(_D_DEN)
                )
            ).cast("bigint").alias("r_pr"),
            (
                F.when(is_seed, F.lit(tr_base)).otherwise(F.lit(0))
                + F.floor(
                    F.lit(_D_NUM) * F.coalesce(F.col("s_tr"), F.lit(0))
                    / F.lit(_D_DEN)
                )
            ).cast("bigint").alias("r_tr"),
        )
    j = r.select(
        "host",
        F.col("r_pr").alias("rank_nano"),
        F.col("r_tr").alias("trust_nano"),
    )
    mass = F.expr(
        "(10000 * greatest(rank_nano - trust_nano, 0)) "
        "div greatest(rank_nano, 1)"
    ).cast("bigint")
    return j.select(
        "host", "rank_nano", "trust_nano",
        mass.alias("spam_mass_bp"),
        (mass >= threshold_bp).alias("is_spam"),
    )


def hits(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """(host, hub_nano, auth_nano, hub, auth) — HITS hubs & authorities
    (Kleinberg, "Authoritative Sources in a Hyperlinked Environment",
    JACM 1999) over the distinct self-loop-free host edge list.
    Authorities are hosts pointed at by good hubs; hubs are hosts
    pointing at good authorities — the complementary centrality to
    PageRank that crawl pipelines use to find *directories/portals*
    (hubs) worth deep-crawling and to separate linked-to authority
    content from the link-page scaffolding around it.

    Integer discipline: scores live in NANO units. Each half-round is
      h_raw(u) = Σ_{u→v} a(v)   then   h = (SCALE·h_raw) div max(h_raw)
      a_raw(v) = Σ_{u→v} h(u)   then   a = (SCALE·a_raw) div max(a_raw)
    from the uniform start a_0 = SCALE. Max-normalization replaces the
    usual L2 norm (a square root is not engine-exact); the fixed point
    is the same principal eigenvector direction, and every step is
    integer sum + integer floor-division, so results are
    bit-reproducible across Spark, DuckDB, and any partitioning.
    The SCALE·h_raw product runs in DECIMAL(38,0) (DuckDB promotes
    BIGINT·BIGINT to HUGEINT; Spark would wrap): h_raw ≤ 10^9·indeg,
    so int64 would overflow past indeg ≈ 9 — decimal is exact to
    h_raw < 10^29, far beyond any real in-degree.

    Scale shape: same regime as ``host_pagerank`` — the host graph is
    millions of rows where the page table is trillions. Each
    half-round is one hash equi-join + one partial-agg sum; the
    normalizer is a ONE-ROW max broadcast back with a crossJoin
    (never a window over the node table)."""
    if iterations < 1:
        raise ValueError("hits() needs at least one iteration")
    # materialize the (tiny, host-grain) edge and node tables once —
    # the lazy plan would otherwise re-derive the distinct edge list
    # from the page scan in EVERY half-round join (4 rescans at
    # iterations=2; same localCheckpoint discipline as dup_components)
    e = (
        edges.select("src", "dst").where(F.col("src") != F.col("dst"))
        .distinct().localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct().localCheckpoint(eager=True)
    )
    norm = F.expr(
        "CAST((CAST(1000000000 AS DECIMAL(38,0)) * raw) "
        "div greatest(m, CAST(1 AS DECIMAL(38,0))) AS BIGINT)"
    )

    def _half(score: DataFrame, key: str, out: str) -> DataFrame:
        # key = 'dst' sums a(v) over out-links into hub scores keyed
        # on src; key = 'src' sums h(u) over in-links into authority
        # scores keyed on dst.
        other = "src" if key == "dst" else "dst"
        raw = (
            e.join(score, e[key] == score["host"])
            .groupBy(F.col(other).alias("host"))
            .agg(F.sum("s").cast("decimal(38,0)").alias("raw"))
        )
        m = raw.agg(F.max("raw").alias("m"))
        # localCheckpoint per half-round: the next half references
        # this result in BOTH its contribution join and (via the max
        # normalizer) its aggregate, so a lazy plan doubles the
        # upstream subtree every half-round — ~2^(2·iterations) plan
        # growth, all compile/schedule overhead. The score table is
        # host-grain (tiny); truncating lineage each half keeps every
        # round one join + one agg + one one-row broadcast.
        return (
            nodes.join(raw, "host", "left")
            .crossJoin(F.broadcast(m))
            .select(
                "host",
                F.coalesce(norm, F.lit(0)).cast("bigint").alias(out),
            )
            .localCheckpoint(eager=True)
        )

    a = nodes.withColumn("a", F.lit(_SCALE).cast("bigint"))
    for _ in range(iterations):
        h = _half(a.select("host", F.col("a").alias("s")), "dst", "h")
        a = _half(h.select("host", F.col("h").alias("s")), "src", "a")
    return (
        h.join(a, "host")
        .select(
            "host",
            F.col("h").alias("hub_nano"),
            F.col("a").alias("auth_nano"),
            F.round(F.col("h") / F.lit(float(_SCALE)), 6).alias("hub"),
            F.round(F.col("a") / F.lit(float(_SCALE)), 6).alias("auth"),
        )
    )


def cocitation_similarity(edges: DataFrame, min_common: int = 2,
                          max_out_degree: int = 1000) -> DataFrame:
    """(host_a, host_b, n_common, indeg_a, indeg_b, jaccard_bp) —
    co-citation similarity between hosts: how many sources link to
    BOTH (Small 1973; the related-page/trawling signal of Kumar,
    Raghavan, Rajagopalan & Tomkins, WWW 1999). Two hosts co-cited by
    many independent sources are topically related even when neither
    links the other — corpus pipelines use it to expand seed lists
    ("find hosts like these") and to group mirrors/affiliates that
    X46's content fingerprints miss because their text differs.

    ``jaccard_bp = floor(10^4 · |in(a)∩in(b)| / |in(a)∪in(b)|)`` over
    the DF-CAPPED graph: sources with out-degree > ``max_out_degree``
    are dropped BEFORE the pair join — one mega-directory linking 10^5
    hosts would otherwise emit 10^10 pairs, and (as with df-capped
    postings in X46) a link from a page that links everyone carries no
    topical signal. In-degrees come from the same capped edge set, so
    numerator and denominator count the same universe and the ratio is
    exact on that graph.

    Scale shape: out-degree cap first (one partial-agg groupBy + one
    semi-join), then ONE self-equi-join of the capped edge list on
    src with ``dst_a < dst_b`` (each co-citing source emits at most
    C(cap,2) pairs — bounded per row, never hosts²), one partial-agg
    groupBy on the pair, and two joins against the (tiny, host-grain)
    in-degree table. All-integer output, bit-reproducible."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    kept_src = (
        e.groupBy("src").agg(F.count("*").alias("odeg"))
        .filter(F.col("odeg") <= max_out_degree)
        .select("src")
    )
    k = e.join(kept_src, "src")
    a = k.select("src", F.col("dst").alias("host_a"))
    b = k.select("src", F.col("dst").alias("host_b"))
    common = (
        a.join(b, "src")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    ideg = k.groupBy(F.col("dst").alias("host")).agg(
        F.count("*").cast("bigint").alias("indeg")
    )
    return (
        common
        .join(ideg.select(F.col("host").alias("host_a"),
                          F.col("indeg").alias("indeg_a")), "host_a")
        .join(ideg.select(F.col("host").alias("host_b"),
                          F.col("indeg").alias("indeg_b")), "host_b")
        .select(
            "host_a", "host_b", "n_common", "indeg_a", "indeg_b",
            F.expr(
                "(10000 * n_common) div "
                "(indeg_a + indeg_b - n_common)"
            ).cast("bigint").alias("jaccard_bp"),
        )
    )


def reciprocal_link_stats(edges: DataFrame, farm_threshold_bp: int = 8000,
                          min_out_degree: int = 2) -> DataFrame:
    """(host, out_degree, n_reciprocal, reciprocal_bp, is_farm) —
    link-reciprocity per host over the distinct self-loop-free host
    edge list. A dense mutual-linking neighborhood is the classic
    link-farm / link-exchange signature (Fetterly, Manasse & Najork,
    WebDB 2004; Gyöngyi & Garcia-Molina, AIRWeb 2005): organic links
    are overwhelmingly one-directional, so a host whose out-links are
    mostly reciprocated is selling or swapping links — a spam prior
    for corpus weighting and a PageRank-gaming flag (X39's input can
    be pruned by this verdict).

    ``reciprocal_bp`` = floor(10^4 · n_reciprocal / out_degree) —
    integer basis points, bit-reproducible; ``is_farm`` requires both
    the ratio threshold and ``min_out_degree`` (a single mutual link
    between two blogs is not a farm).

    Scale shape: the reciprocity test is ONE self-equi-join of the
    distinct edge list on the reversed key — (src,dst) = (dst,src) —
    i.e. a hash join on a 2-string key, never a per-host neighborhood
    materialization; both aggregations are partial-agg groupBys on
    host. Edge list ≪ pages, same regime as host_pagerank."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    odeg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("out_degree"))
    rev = e.select(F.col("src").alias("dst"), F.col("dst").alias("src"))
    recip = (
        e.join(rev, ["src", "dst"])
        .groupBy("src")
        .agg(F.count("*").cast("bigint").alias("n_reciprocal"))
    )
    return (
        odeg.join(recip, "src", "left")
        .select(
            F.col("src").alias("host"),
            "out_degree",
            F.coalesce(F.col("n_reciprocal"), F.lit(0)).cast("bigint")
            .alias("n_reciprocal"),
        )
        .withColumn(
            "reciprocal_bp",
            F.expr("(10000 * n_reciprocal) div out_degree").cast("bigint"),
        )
        .withColumn(
            "is_farm",
            (F.col("reciprocal_bp") >= farm_threshold_bp)
            & (F.col("out_degree") >= min_out_degree),
        )
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """(host, degree, n_triangles, clustering_bp) — per-host triangle
    counts and local clustering coefficient over the UNDIRECTED host
    graph (direction dropped; a link either way is an affinity).
    Dense triangle neighborhoods separate organic communities from
    link farms (X47's reciprocity is the 2-cycle special case;
    triangles are the 3-cycle signal — Fetterly et al., WebDB 2004),
    and the coefficient feeds host-quality priors.

    ``clustering_bp = floor(10^4 · 2·T(v) / (deg(v)·(deg(v)−1)))``
    (Watts & Strogatz 1998), integer basis points, 0 for degree < 2.

    Scale shape — the degree-ordered orientation of Suri &
    Vassilvitskii ("Counting Triangles and the Curse of the Last
    Reducer", WWW 2011): orient every canonical edge from its
    lower-(degree, host) endpoint to the higher one, build wedges by
    self-joining the oriented list on the source, and close each
    wedge with ONE more equi-join. Each triangle is found exactly
    once, and a degree-d hub generates wedges only from edges where
    it is the LOWER endpoint — O(m^1.5) total work instead of
    Σ deg² — so the web's mega-hubs cannot create a last-reducer
    straggler. Integer arithmetic throughout; bit-reproducible."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    canon = e.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    deg = (
        canon.select(F.col("u").alias("host"))
        .union(canon.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    withdeg = (
        canon
        .join(deg.select(F.col("host").alias("u"),
                         F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("host").alias("v"),
                         F.col("degree").alias("dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"),
                         F.col("db").alias("dx"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"),
                         F.col("db").alias("dy"))
    wedges = o1.join(o2, "a").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    triangles = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
    ).select("a", "x", "y")
    tri_per_host = (
        triangles.select(
            F.explode(F.array("a", "x", "y")).alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return (
        deg.join(tri_per_host, "host", "left")
        .select(
            "host",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
            .alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(10000 * 2 * coalesce(n_triangles, 0)) div "
                    "(degree * (degree - 1))"
                ),
            ).otherwise(F.lit(0)).cast("bigint").alias("clustering_bp"),
        )
    )


def seed_distance(edges: DataFrame, seeds: list[str],
                  max_hops: int = 4) -> DataFrame:
    """(host, seed_hops, reachable) — minimum link-hop distance from
    a vetted seed set, bounded at ``max_hops`` (unreachable-within-
    bound hosts report ``seed_hops = -1``). BFS depth from trusted
    seeds is the classic crawl-ordering prior — Najork & Wiener,
    "Breadth-first search crawling yields high-quality pages"
    (WWW 2001) — and the discrete companion to X77's TrustRank: where
    trust is a damped mass, hops are the raw radius, used to cap how
    far from the seed whitelist a frontier is allowed to wander and
    to bucket X80's spam-mass verdicts by seed proximity.

    Level-synchronous frontier iteration: round ``i`` joins the edge
    list against ONLY the hosts first reached at round ``i-1`` (the
    frontier), dedups the targets, and fills still-unlabelled hosts
    via one left join + coalesce. Hops are small integers — exactly
    reproducible in any engine, no float anywhere.

    Scale shape: per round, one equi-join (frontier side shrinks
    every round and is broadcastable long before the periphery is
    exhausted) + one distinct + one left join — all on the host-grain
    graph, hosts ≪ pages. ``max_hops`` bounds the job count; web host
    graphs reach most of their crawlable mass within a handful of
    hops from any decent seed list, which is exactly the radius a
    frontier policy cares about."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    is_seed = F.col("host").isin(list(seeds))
    dist = nodes.select(
        "host",
        F.when(is_seed, F.lit(0)).cast("int").alias("d"),
    )
    for i in range(1, max_hops + 1):
        frontier = dist.where(F.col("d") == i - 1).select(
            F.col("host").alias("src")
        )
        reached = (
            e.join(frontier, "src")
            .select(F.col("dst").alias("host"))
            .distinct()
            .withColumn("nd", F.lit(i).cast("int"))
        )
        # localCheckpoint per level: round i+1 references `dist` twice
        # (the frontier filter AND the left-join base), so a lazy plan
        # doubles the upstream subtree every round — 2^max_hops plan
        # growth in compile/schedule overhead on a host-grain table.
        dist = dist.join(reached, "host", "left").select(
            "host", F.coalesce(F.col("d"), F.col("nd")).alias("d")
        ).localCheckpoint(eager=True)
    return dist.select(
        "host",
        F.coalesce(F.col("d"), F.lit(-1)).cast("bigint").alias("seed_hops"),
        F.col("d").isNotNull().alias("reachable"),
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """(direction, bin, bin_lo, bin_hi, n_hosts, total_degree) —
    log2-binned in/out-degree histogram of the host graph, the
    power-law audit of Broder et al., "Graph structure in the web"
    (WWW 2000): healthy crawl graphs show straight log-log degree
    lines; a bump in the high-degree out-bins is a directory/spam-farm
    signature, a truncated in-tail means the crawl frontier never
    reached the long tail. Run per crawl as a one-row-per-bin
    datasheet entry beside X50.

    ``bin`` is the integer bit-length of the degree (bin b covers
    degrees [2^(b−1), 2^b − 1]) — computed as ``length(bin(deg))``,
    pure integer, identical in any engine; no log() doubles anywhere.

    Scale shape: two partial-agg groupBys on the distinct edge list
    (per-endpoint degree), then one tiny (direction, bin) rollup —
    shuffles carry host strings and counts only; output is ≤ 64 rows
    per direction regardless of corpus size."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    degs = (
        e.groupBy(F.col("src").alias("host"))
        .agg(F.count("*").cast("bigint").alias("deg"))
        .withColumn("direction", F.lit("out"))
        .union(
            e.groupBy(F.col("dst").alias("host"))
            .agg(F.count("*").cast("bigint").alias("deg"))
            .withColumn("direction", F.lit("in"))
        )
    )
    binned = degs.withColumn(
        "bin", F.expr("length(bin(deg))").cast("bigint")
    )
    return (
        binned.groupBy("direction", "bin")
        .agg(
            F.count("*").cast("bigint").alias("n_hosts"),
            F.sum("deg").cast("bigint").alias("total_degree"),
        )
        .select(
            "direction", "bin",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT) - 1)")
            .alias("bin_lo"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT)) - 1")
            .alias("bin_hi"),
            "n_hosts", "total_degree",
        )
    )


def anchor_spam_stats(pages: DataFrame, spam_terms: list[str],
                      url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(dst_host, n_anchor_links, n_spam_links, n_spam_src_hosts,
    spam_bp) — commercial anchor-text density per link TARGET: the
    share of a host's inbound anchors hitting a commercial-spam term
    list ('casino', 'viagra', payday-loan vocabulary...). Link-spam
    campaigns buy/inject anchors with exactly these money terms
    (the TrustRank-era signal: Gyöngyi & Garcia-Molina, "Web spam
    taxonomy", AIRWeb 2005 — anchor-keyword stuffing is its own
    category), so a host whose inbound anchor profile is
    commercial-term-heavy while its own content is not is a paid-link
    target — evidence that feeds the X80 spam-mass verdict from the
    ANCHOR side rather than the graph-structure side. Terms are
    re.escape'd into one word-bounded alternation (the c4_clean
    blocklist discipline — metacharacters in a term must not change
    match semantics).

    Scale shape: the X41 anchor extraction (narrow map, html never
    shuffles) + one flag regexp + ONE partial-agg groupBy on dst_host;
    distinct spamming sources via the conditional countDistinct.
    spam_bp = (10000 · n_spam) div n_links in bigint."""
    import re as _re

    from pyspark.sql import Window  # noqa: F401  (parity with siblings)
    from docling_serve_spark.operators.urltools import url_host

    html_str = F.col(html_col).cast("string")
    tag_re = '(?i)<a[^>]*href="https?://[^"]*"[^>]*>[^<]*</a>'
    tags = pages.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(html_str, F.lit(tag_re), F.lit(0))
        ).alias("tag"),
    )
    pairs = tags.select(
        "src_host",
        url_host(
            F.regexp_extract(F.col("tag"), '(?i)href="(https?://[^"]*)"', 1)
        ).alias("dst_host"),
        F.trim(
            F.regexp_replace(
                F.lower(F.regexp_extract(F.col("tag"), ">([^<]*)</a>", 1)),
                r"\s+", " ",
            )
        ).alias("anchor"),
    ).filter(
        (F.col("dst_host") != "")
        & (F.col("dst_host") != F.col("src_host"))
        & (F.col("anchor") != "")
    )
    pat = "|".join(_re.escape(t.lower()) for t in spam_terms)
    flagged = pairs.withColumn(
        "is_spam", F.col("anchor").rlike(rf"\b({pat})\b")
    )
    return (
        flagged.groupBy("dst_host")
        .agg(
            F.count("*").cast("bigint").alias("n_anchor_links"),
            F.sum(F.when(F.col("is_spam"), 1).otherwise(0))
            .cast("bigint").alias("n_spam_links"),
            F.countDistinct(
                F.when(F.col("is_spam"), F.col("src_host"))
            ).cast("bigint").alias("n_spam_src_hosts"),
        )
        .withColumn(
            "spam_bp",
            F.expr("(10000 * n_spam_links) div greatest(n_anchor_links, 1)")
            .cast("bigint"),
        )
    )


def link_rot_stats(pages: DataFrame, crawled: DataFrame,
                   url_col: str = "url", html_col: str = "html",
                   crawl_url_col: str = "url") -> DataFrame:
    """(src_host, n_outlinks, n_resolved, n_dangling, rot_bp) — how
    much of each host's outbound link surface points OUTSIDE the
    crawled corpus: per source host, absolute http(s) link targets
    canonicalized and probed against the crawled URL set. High
    dangling share is either frontier debt (the crawler never reached
    what this host links to — X43 should prioritize it) or genuine
    link rot (the classic web-decay measurement: Ntoulas, Cho & Olston
    WWW 2004 found ~80% of links dead or changed within a year), and
    for a training corpus it bounds how much of the citation/anchor
    context (X41) can ever be resolved to actual documents.

    Scale shape: X40's narrow href extraction (html bytes never
    shuffle), the crawled side reduced to its DISTINCT canonical url
    strings, ONE left semi-style equi-join on the full URL key, one
    src_host partial agg. rot_bp = (10000 · n_dangling) div
    n_outlinks, bigint."""
    from docling_serve_spark.operators.urltools import canonical_url, url_host

    html_str = F.col(html_col).cast("string")
    links = pages.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(
                html_str, F.lit('(?i)href="(https?://[^"]*)"'), F.lit(1)
            )
        ).alias("target"),
    ).select(
        "src_host", canonical_url(F.col("target")).alias("curl")
    ).filter(F.col("curl") != "")
    known = crawled.select(
        canonical_url(F.col(crawl_url_col)).alias("curl")
    ).distinct().withColumn("__hit", F.lit(True))
    probed = links.join(known, "curl", "left")
    return (
        probed.groupBy("src_host")
        .agg(
            F.count("*").cast("bigint").alias("n_outlinks"),
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_resolved"),
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_dangling"),
        )
        .withColumn(
            "rot_bp",
            F.expr("(10000 * n_dangling) div greatest(n_outlinks, 1)")
            .cast("bigint"),
        )
    )


def bad_neighborhood_stats(edges: DataFrame, blocklist: DataFrame,
                           src_col: str = "src_host",
                           dst_col: str = "dst_host",
                           domain_col: str = "domain") -> DataFrame:
    """(src_host, n_dst_hosts, n_bad_hosts, bad_bp) — linking-to-spam
    score per source host: the share of a host's DISTINCT outlink
    destinations that sit on (or under) a blocklisted domain. The
    inverse-TrustRank neighborhood signal (Gyöngyi et al. VLDB 2004
    §4: trust flows forward, distrust flows BACKWARD from a blocklist
    through inlinks — a host whose outlinks concentrate on blocked
    domains is selling links or already captured) — the graph-side
    complement to X25's per-page blocklist verdicts and an input
    X80's spam-mass adjudication can consume.

    Distinct (src, dst) edges first (one partial-agg dedup), dst
    hosts explode to ≤ ~5 suffixes, ONE suffix equi-join against the
    blocklist (AQE-broadcast when it fits), ONE src partial agg —
    the X25 shape lifted to edges; never LIKE-%, never per-row
    blocklist loops."""
    from docling_serve_spark.operators.urltools import host_suffixes

    pairs = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    sfx = pairs.select(
        "src", "dst", F.explode(host_suffixes(F.col("dst"))).alias("suffix")
    )
    bad = (
        sfx.join(
            blocklist.select(F.col(domain_col).alias("suffix")).distinct(),
            "suffix",
        )
        .select("src", "dst").distinct()
        .withColumn("is_bad", F.lit(1))
    )
    return (
        pairs.join(bad, ["src", "dst"], "left")
        .groupBy(F.col("src").alias("src_host"))
        .agg(
            F.count("*").cast("bigint").alias("n_dst_hosts"),
            F.sum(F.coalesce(F.col("is_bad"), F.lit(0)))
            .cast("bigint").alias("n_bad_hosts"),
        )
        .select(
            "src_host", "n_dst_hosts", "n_bad_hosts",
            F.expr("(10000 * n_bad_hosts) div greatest(n_dst_hosts, 1)")
            .cast("bigint").alias("bad_bp"),
        )
        .orderBy("src_host")
    )


def kcore_peel(edges: DataFrame, k: int = 2,
               max_rounds: int = 8) -> DataFrame:
    """(host, degree0, peel_round, in_core, converged) — k-core
    membership plus
    the ONION LAYER each host dies in: iteratively delete every node
    whose degree in the surviving subgraph is < k (Seidman, "Network
    structure and minimum degree", Social Networks 1983; the
    distributed peel is Montresor et al., "Distributed k-core
    decomposition", IEEE TPDS 2013). peel_round is the 1-based round a
    host was removed (-1 = survives = k-core member). Spam link farms
    live in dense cores their PageRank (X39) alone can't separate from
    popular hosts — a high-rank host in a shallow layer is endorsed, a
    mid-rank host deep in a dense core is mutually inflated (pair with
    X47/X148); peel depth is also the standard coarse "structural
    importance" tier for crawl-budget apportionment (X141).

    Exactly ``max_rounds`` peel rounds run (a path of 2L+1 nodes fully
    peels at k=2 in L+1 rounds — bound the cascade, don't poll for
    convergence: both engines run the same fixed schedule, so results
    are engine-identical even mid-cascade). ``converged`` reports
    whether the final round removed nobody — the fixpoint was reached
    and ``in_core`` is proof; when false, survivors might still have
    been peeled by later rounds and consumers must treat in_core as
    "outlived the schedule", not core membership. Scale shape: everything
    after edge canonicalization is HOST-grain (hosts ≪ pages); each
    round is one neighbor semi-join + one partial-agg degree count,
    localCheckpoint'd so the loop's lineage stays flat; the alive set
    only shrinks."""
    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    nbrs = canon.unionByName(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    deg0 = nbrs.groupBy(F.col("u").alias("host")).agg(
        F.count("*").cast("bigint").alias("degree0")
    ).localCheckpoint(eager=True)

    alive = deg0.select("host")
    peeled = None
    for r in range(1, max_rounds + 1):
        # degree within the induced surviving subgraph: both endpoints
        # must still be alive
        deg = (
            nbrs.join(alive, nbrs.u == alive.host, "leftsemi")
            .join(alive.select(F.col("host").alias("__v")),
                  F.col("v") == F.col("__v"), "leftsemi")
            .groupBy(F.col("u").alias("host"))
            .agg(F.count("*").alias("__deg"))
        )
        survivors = (
            alive.join(deg, "host", "left")
            .filter(F.coalesce(F.col("__deg"), F.lit(0)) >= k)
            .select("host")
            .localCheckpoint(eager=True)
        )
        removed = alive.join(survivors, "host", "left_anti").select(
            "host", F.lit(r).cast("bigint").alias("peel_round")
        )
        peeled = removed if peeled is None else peeled.unionByName(removed)
        alive = survivors

    result = alive.select(
        "host", F.lit(-1).cast("bigint").alias("peel_round")
    )
    if peeled is not None:
        result = result.unionByName(peeled.localCheckpoint(eager=True))
    # fixpoint detection: if the FINAL scheduled round removed nobody,
    # the peel converged and every survivor is a genuine k-core
    # member; otherwise survivors might still have been peeled by
    # later rounds, and consumers must not read in_core as proof —
    # the `converged` column says which regime this run is in
    conv = (
        (peeled.filter(F.col("peel_round") == max_rounds)
         if peeled is not None else alive.limit(0)
         .select(F.lit(0).cast("bigint").alias("peel_round")))
        .agg((F.count("*") == 0).alias("converged"))
    )
    return (
        deg0.join(result, "host")
        .crossJoin(F.broadcast(conv))
        .select("host", "degree0", "peel_round",
                (F.col("peel_round") == -1).alias("in_core"),
                "converged")
    )


def host_reputation(edges: DataFrame, pages: DataFrame,
                    host_col: str = "host",
                    quality_col: str = "is_quality",
                    w_central: int = 4000, w_quality: int = 3000,
                    w_spam: int = 3000, keep_cut: int = 4000,
                    review_cut: int = 2000) -> DataFrame:
    """(host, rank_nano, centrality_bp, quality_bp, reciprocal_bp,
    score_bp, verdict) — the DECISION layer over the graph tier: a
    single keep/review/drop verdict per host fusing link centrality
    (X39 PageRank, max-normalized to bp), on-page quality rate (share
    of the host's pages passing the caller's gate), and the
    link-farm reciprocity prior (X47) as a penalty. Every signal
    alone is gameable — farms buy centrality (Gyöngyi &
    Garcia-Molina, AIRWeb 2005 frame spam fighting as exactly this
    multi-signal fusion), quality gates pass templated filler, and
    reciprocity alone flags small blog circles — so the corpus
    decision reads the weighted sum, with the weights (bp, summing to
    10000 across |w|) and both cuts explicit parameters, not policy
    buried in code.

    score_bp = (w_central·centrality + w_quality·quality −
    w_spam·reciprocity) div 10000, all-bigint. Hosts in the graph but
    without pages carry quality 0 (unknown content earns nothing);
    hosts with no out-links carry reciprocity 0 (no evidence, no
    penalty). Scale shape: every input and join is HOST-grain
    (pagerank + reciprocity ride the edge list, the quality rate is
    one partial-agg rollup of the page table); the max-rank
    normalizer is a one-row broadcast."""
    pr = host_pagerank(edges, iterations=3).select("host", "rank_nano")
    rec = reciprocal_link_stats(edges).select("host", "reciprocal_bp")
    q = pages.groupBy(F.col(host_col).alias("host")).agg(
        F.expr(
            f"(10000 * sum(CASE WHEN {quality_col} THEN 1 ELSE 0 END))"
            " div count(*)"
        ).cast("bigint").alias("quality_bp")
    )
    mx = pr.agg(F.max("rank_nano").cast("bigint").alias("__mx"))
    return (
        pr.crossJoin(F.broadcast(mx))
        .select(
            "host", "rank_nano",
            F.expr("(10000 * rank_nano) div __mx").cast("bigint")
            .alias("centrality_bp"),
        )
        .join(rec, "host", "left")
        .join(q, "host", "left")
        .select(
            "host", "rank_nano", "centrality_bp",
            F.coalesce(F.col("quality_bp"), F.lit(0)).cast("bigint")
            .alias("quality_bp"),
            F.coalesce(F.col("reciprocal_bp"), F.lit(0)).cast("bigint")
            .alias("reciprocal_bp"),
        )
        .withColumn(
            "score_bp",
            # the numerator clamps at 0 BEFORE the division: Spark's
            # div truncates toward zero while DuckDB's // floors, so
            # a negative score would divide differently per engine —
            # and a negative fusion is 'drop' regardless of magnitude
            F.expr(
                f"greatest({w_central} * centrality_bp + {w_quality} * "
                f"quality_bp - {w_spam} * reciprocal_bp, 0) div 10000"
            ).cast("bigint"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("score_bp") >= keep_cut, F.lit("keep"))
            .when(F.col("score_bp") >= review_cut, F.lit("review"))
            .otherwise(F.lit("drop")),
        )
    )


def label_propagation(edges: DataFrame, seeds: DataFrame,
                      iterations: int = 2) -> DataFrame:
    """X206-wave — semi-supervised label propagation over the host
    graph (Zhu & Ghahramani 2002 / Raghavan et al. 2007, made
    deterministic): a small hand-labelled seed set (host → category)
    spreads to unlabelled hosts along UNDIRECTED edges; each round,
    every non-seed host takes the PLURALITY label of its currently-
    labelled neighbours (each distinct neighbour votes once), ties
    broken by ascending label; seeds are clamped (never overwritten);
    hosts with no labelled neighbour stay unlabelled (absent from the
    frontier). Synchronous schedule: round t votes with round t-1's
    labels only, so the result is partition-order independent and
    bit-reproducible.

    Emits (host, label, is_seed) for every host labelled after
    ``iterations`` rounds.

    Shape at scale: the host graph is tiny relative to pages (the
    PageRank argument, module docstring), and each round is one
    shuffle join (edges ⋈ labels on src) + one hash aggregation +
    one per-host window over ≤|labels| candidate rows — the classic
    Pregel step as DataFrames. ``iterations`` is a fixed small
    constant, so the unrolled plan stays bounded."""
    from pyspark.sql import Window

    und = (
        edges.select(F.col("src"), F.col("dst"))
        .unionByName(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    seeds = seeds.select(
        F.col("host"), F.col("label").cast("string").alias("label")
    )
    labels = seeds
    w = Window.partitionBy("host").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    for _ in range(iterations):
        votes = (
            und.join(labels.withColumnRenamed("host", "src"), "src")
            .select(F.col("dst").alias("host"), "label")
            .groupBy("host", "label")
            .agg(F.count("*").cast("bigint").alias("votes"))
        )
        winners = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("host", "label")
        )
        labels = seeds.unionByName(
            winners.join(F.broadcast(seeds.select("host")),
                         "host", "left_anti")
        )
    return labels.join(
        F.broadcast(seeds.select("host", F.lit(True).alias("is_seed"))),
        "host", "left",
    ).select(
        "host", "label",
        F.coalesce(F.col("is_seed"), F.lit(False)).alias("is_seed"),
    )


_NF_B = 4                     # 2^4 = 16 registers per node
_NF_M = 1 << _NF_B
_NF_WBITS = 32 - _NF_B        # 28-bit rank word
_NF_RMAX = _NF_WBITS + 1
# alpha_16 (Flajolet et al. 2007, fig. 3)
_NF_ALPHA = 0.673


def neighborhood_function(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """X225 — the HyperANF neighborhood function (Boldi/Rosa/Vigna,
    WWW 2011): per radius r, the estimated number of (source,
    reachable-within-r) pairs over the directed host graph, computed
    by giving every node a HyperLogLog sketch of its ball and
    advancing one radius per round via B_{r+1}(v) = B_r(v) ∪
    ⋃_{v→w} B_r(w) — register-max union, the X218 mergeability
    property doing graph work. THE technique for distance
    distributions / effective diameter on graphs too big to BFS per
    node (HyperANF measured Facebook's four degrees of separation);
    n·m register rows replace n BFS frontiers.

    Relational form: sketches live at (node, reg, max_rho) grain —
    never packed blobs — so each round is ONE union (own registers +
    out-edge-joined neighbor registers) + ONE (node, reg) max
    aggregation, both map-side combinable; the estimate is computed
    per node from ≤ m register rows, quantized to MICRO-PAIR bigints
    per node BEFORE the global sum (integer sum — partition-
    invariant; a raw double sum over nodes would be order-dependent).

    Emits (r, est_pairs_micro) for r = 1..rounds; the catalog query
    joins an exact BFS pair count alongside (err_bp audit) — viable
    only at HOST grain; at 10^12 pages the sketch column is the only
    one that survives, which is the entire point."""
    est = _nf_node_estimates(edges, rounds)
    return est.groupBy("r").agg(
        F.sum("est_micro").cast("bigint").alias("est_pairs_micro")
    )

def _nf_node_estimates(edges: DataFrame, rounds: int) -> DataFrame:
    """Shared HyperANF machinery: per-node ball-size estimates for
    r = 1..rounds as one DataFrame (node, r, est_micro) — the same
    register-advance as neighborhood_function, kept at node grain so
    centrality measures can consume per-node ball growth."""
    dedges = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    nodes = (
        dedges.select(F.col("src").alias("node"))
        .unionByName(dedges.select(F.col("dst").alias("node")))
        .distinct()
    )
    from docling_serve_spark.operators.sketches import hll_reg_rho

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("nf:"), F.col("node"))), 1, 8),
        16, 10,
    ).cast("bigint")
    reg, rho = hll_reg_rho(h, _NF_WBITS)
    regs = nodes.select("node", reg.alias("reg"), rho.alias("rho"))
    outs = []
    for r in range(1, rounds + 1):
        via = (
            dedges.join(regs.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "reg", "rho")
        )
        regs = (
            regs.unionByName(via)
            .groupBy("node", "reg")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=False)
        )
        per = regs.groupBy("node").agg(
            F.count("*").cast("bigint").alias("n_regs"),
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("sp"),
        )
        v = (F.lit(_NF_M) - F.col("n_regs")).cast("double")
        s = F.col("sp") + v
        raw = F.lit(_NF_ALPHA * _NF_M * _NF_M) / s
        est = F.when(
            (raw <= 2.5 * _NF_M) & (v > 0),
            F.lit(float(_NF_M)) * F.log(F.lit(float(_NF_M)) / v),
        ).otherwise(raw)
        outs.append(per.select(
            "node",
            F.lit(r).cast("int").alias("r"),
            F.round(est * 1_000_000.0).cast("bigint").alias("est_micro"),
        ))
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), outs)


def harmonic_centrality(edges: DataFrame, rounds: int = 3,
                        k: int = 15) -> DataFrame:
    """X231 — sketch-based harmonic centrality (Boldi & Vigna,
    "Axioms for centrality", Internet Math 2014; computed HyperBall-
    style, Boldi/Vigna WebSci 2014): H(v) = Σ_u 1/d(v,u) estimated
    from the per-radius ball growth of X225's HLL sketches —
    Σ_r (|B_r| − |B_{r−1}|)/r with |B_0| = 1 (self, excluded from
    the sum). The centrality that, unlike closeness, handles
    disconnected graphs natively, computed for every node in
    ``rounds`` register-max passes instead of n BFS runs.

    Integer discipline: per-node ball estimates arrive as micro
    bigints; each radius shell contributes
    ``greatest(0, est_r − est_{r−1}) div r`` (estimator noise can
    make a shell negative — clamped, and the division is on
    non-negative ints so Spark's truncating div == DuckDB's floor).
    Emits the top-k (node, harmonic_micro, rank), ties by node."""
    est = _nf_node_estimates(edges, rounds)
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("r")
    prev = F.coalesce(
        F.lag("est_micro").over(w), F.lit(1_000_000).cast("bigint")
    )
    shells = (
        est.withColumn("__prev", prev)
        .withColumn(
            "contrib",
            F.expr("greatest(0, est_micro - __prev) div r").cast("bigint"),
        )
    )
    agg = shells.groupBy("node").agg(
        F.sum("contrib").cast("bigint").alias("harmonic_micro")
    )
    top = agg.orderBy(
        F.col("harmonic_micro").desc(), F.col("node").asc()
    ).limit(k)
    wr = Window.orderBy(F.col("harmonic_micro").desc(), F.col("node").asc())
    return top.withColumn("rank", F.row_number().over(wr).cast("int"))


def bowtie_structure(edges: DataFrame, rounds: int = 5) -> DataFrame:
    """X237 — the bow-tie decomposition of the host graph (Broder et
    al., "Graph structure in the Web", WWW 2000): from a deterministic
    pivot (the lexicographically smallest host), CORE = nodes both
    reachable from and reaching the pivot (its SCC), IN = reaches the
    pivot but not reached, OUT = reached but not reaching, OTHER =
    tendrils/disconnected. The macro-shape number every crawl
    strategist reads: a tiny CORE with a huge IN means the seeds sit
    downstream of most of the web (crawl backwards from anchors);
    a huge OUT means link-following alone inflates into low-quality
    sinks.

    Forward/backward reachability by ``rounds`` frontier joins
    (distinct-node frontier, localCheckpoint lineage control, same
    discipline as X89/X190) — bounded radius, so on graphs with
    diameter > rounds the CORE is the radius-bounded approximation
    (documented; host-graph diameters are small). Emits
    (component, n_hosts), components sorted by the fixed
    core/in/out/other order via an explicit rank column."""
    dedges = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    nodes = (
        dedges.select(F.col("src").alias("node"))
        .unionByName(dedges.select(F.col("dst").alias("node")))
        .distinct()
    )
    pivot = nodes.agg(F.min("node").alias("node"))

    def reach(e: DataFrame) -> DataFrame:
        cur = pivot
        for _ in range(rounds):
            step = (
                e.join(cur.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"))
            )
            cur = cur.unionByName(step).distinct().localCheckpoint(
                eager=False
            )
        return cur

    fw = reach(dedges)
    bw = reach(dedges.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    tagged = (
        nodes.join(fw.withColumn("__fw", F.lit(True)), "node", "left")
        .join(bw.withColumn("__bw", F.lit(True)), "node", "left")
        .select(
            "node",
            F.when(F.col("__fw") & F.col("__bw"), F.lit("core"))
            .when(F.col("__bw").isNotNull(), F.lit("in"))
            .when(F.col("__fw").isNotNull(), F.lit("out"))
            .otherwise(F.lit("other")).alias("component"),
        )
    )
    return tagged.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_hosts")
    )
