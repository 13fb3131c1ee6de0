"""Crawl discovery — sitemaps, feed autodiscovery, RSS/Atom entries,
JSON-LD metadata.

Closes the crawl-side loop around the existing operators: ``robots.py``
answers *may I fetch*, ``graph.py`` follows links already seen, and this
module finds the URLs a polite crawler is *told about* — ``sitemap.xml``
trees (plain and index files), ``<link rel=alternate>`` feed
autodiscovery, the feeds themselves, and the schema.org JSON-LD blocks
that carry publication metadata CommonCrawl-style corpora key on
(article type, headline, publish date).

Scale shape: every operator here is a scan-stage projection chain —
``regexp_extract_all`` + ``posexplode`` + per-fragment ``regexp_extract``
— zero UDFs, zero shuffles, whole-stage codegen end-to-end, exactly like
``operators/extract_html.py``.  At 10^12 pages discovery is a side
column of the ingest scan, not a job of its own.  Patterns are written in
the Java∩RE2 dialect ((?is) flags, lazy quantifiers, no backrefs) so the
pytest DuckDB differential can replay them verbatim
(``tests/test_discover.py``).

Reference scope note: the EDS-PDF reference has no crawl layer (its
sources are local files/parquet, ``edspdf/data/files.py:184-281``); this
family is part of the engine's web-corpus mandate (BASELINE.json
north_star: Common-Crawl-style pages), mirroring the public
sitemaps.org protocol and RSS 2.0 / Atom (RFC 4287) formats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_sitemap",
    "walk_sitemap_tree",
    "with_pub_date",
    "discover_feeds",
    "parse_feed",
    "extract_jsonld",
    "discovery_candidates",
]


# --- shared fragment helpers -------------------------------------------------

#: strip a single CDATA wrapper and surrounding whitespace from a fragment
def _cdata(col: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.trim(col), r"(?s)^<!\[CDATA\[(.*)\]\]>$", "$1")
    )


def _tag_text(frag: Column, tag: str) -> Column:
    """First ``<tag>…</tag>`` text inside an XML fragment ('' if absent)."""
    return _cdata(
        F.regexp_extract(frag, rf"(?is)<{tag}(?:\s[^>]*)?>(.*?)</{tag}\s*>", 1)
    )


def _decoded(df: DataFrame, col: str, charset: str) -> Column:
    c = df.schema[col].dataType.simpleString()
    x = F.col(col)
    return F.decode(x, charset) if c == "binary" else x.cast("string")


# --- sitemap.xml --------------------------------------------------------------

def parse_sitemap(
    df: DataFrame,
    xml_col: str = "xml",
    src_col: str = "sitemap_url",
    charset: str = "utf-8",
) -> DataFrame:
    """sitemaps(src, xml) → one row per referenced URL.

    Handles both document kinds of the sitemaps.org protocol in one
    pass: ``<urlset>`` leaves (``<url>`` entries with loc / lastmod /
    changefreq / priority) and ``<sitemapindex>`` nodes (``<sitemap>``
    entries pointing at child sitemaps — feed those rows back through
    this parser after fetching to walk the tree level by level; each
    level is one distributed pass, no driver recursion).

    Returns ``(src_col, kind, entry_idx, loc, lastmod, changefreq,
    priority)`` where ``kind`` is ``'url'`` or ``'sitemap'`` and
    ``priority`` is the raw decimal string (absent fields are ``''``,
    never NULL, so downstream grouping keys stay total).
    """
    x = _decoded(df, xml_col, charset)
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    entries = F.concat(
        # tag each fragment with its kind up front so one explode serves both
        F.transform(
            F.regexp_extract_all(x, F.lit(r"(?is)<url\s*>(.*?)</url\s*>"), 1),
            lambda e: F.struct(F.lit("url").alias("kind"), e.alias("frag")),
        ),
        F.transform(
            F.regexp_extract_all(
                x, F.lit(r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"), 1
            ),
            lambda e: F.struct(F.lit("sitemap").alias("kind"), e.alias("frag")),
        ),
    )
    e = df.select(src_col, F.posexplode(entries).alias("entry_idx", "_e"))
    frag = F.col("_e").getField("frag")
    return e.select(
        src_col,
        F.col("_e").getField("kind").alias("kind"),
        "entry_idx",
        _tag_text(frag, "loc").alias("loc"),
        _tag_text(frag, "lastmod").alias("lastmod"),
        _tag_text(frag, "changefreq").alias("changefreq"),
        _tag_text(frag, "priority").alias("priority"),
    ).where(F.col("loc") != "")


def walk_sitemap_tree(
    roots: DataFrame,
    fetch,
    max_depth: int = 5,
    xml_col: str = "xml",
    src_col: str = "sitemap_url",
    charset: str = "utf-8",
) -> DataFrame:
    """Walk a sitemap TREE (sitemapindex → child sitemaps → urlsets) to
    its leaf URLs, level by level: each level is ONE distributed
    :func:`parse_sitemap` pass, and only the next level's not-yet-visited
    sitemap locations go back through ``fetch`` — no driver recursion, no
    per-sitemap round trips.

    ``roots`` is a ``(src_col, xml_col)`` frame (the already-fetched root
    sitemaps). ``fetch`` is the caller's fetch layer: a callable taking a
    one-column DataFrame of ``src_col`` locations and returning a
    ``(src_col, xml_col)`` frame for those it could retrieve (HTTP in
    production, a lookup join in tests; missing rows are simply not
    descended into). Returns every ``kind='url'`` entry from every level
    with its ``depth`` (0 = found in a root).

    Wild-web safety, the two traps this walk guards:

    * **cycles** — index files referencing each other (or themselves) are
      common; visited locations are tracked level-to-level with a
      left-anti join, so each sitemap is fetched at most once;
    * **unbounded depth** — ``max_depth`` caps the walk (the protocol
      allows arbitrary index nesting; real trees are ≤3 deep).

    The visited set lives as a DataFrame (left-anti joined, never
    collected), so a million-sitemap crawl tree walks without any
    driver-side membership structure; per-level ``localCheckpoint``
    truncates the growing union lineage.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    level = roots
    visited = roots.select(F.col(src_col)).distinct()
    urls = None
    for depth in range(int(max_depth)):
        parsed = parse_sitemap(level, xml_col=xml_col, src_col=src_col, charset=charset)
        leaf = parsed.where(F.col("kind") == "url").withColumn(
            "depth", F.lit(depth)
        )
        urls = leaf if urls is None else urls.unionByName(leaf)
        urls = urls.localCheckpoint()
        children = (
            parsed.where(F.col("kind") == "sitemap")
            .select(F.col("loc").alias(src_col))
            .distinct()
            .join(visited, on=src_col, how="left_anti")
        )
        if depth == max_depth - 1 or children.isEmpty():
            break
        level = fetch(children)
        if level is None:
            break
        # pin the fetch result: several actions consume `level` below
        # (emptiness probes, the visited union, next round's parse), and
        # without a checkpoint each would re-execute the fetch layer —
        # re-downloading every sitemap ~5x per level in an HTTP fetch,
        # and letting a non-deterministic fetch feed DIFFERENT rows to
        # the visited set than to the parser
        level = level.localCheckpoint()
        if level.isEmpty():
            break
        # a fetch layer may key its results by redirect-RESOLVED URLs
        # rather than the requested ones; those resolved locations were
        # never added to visited, so a redirect cycle would re-fetch and
        # re-parse the same sitemap every level. Drop results already
        # visited, then mark BOTH the requested and the actually-fetched
        # locations as visited before parsing.
        level = level.join(visited, on=src_col, how="left_anti")
        if level.isEmpty():
            break
        visited = (
            visited.unionByName(children)
            .unionByName(level.select(F.col(src_col)))
            .distinct()
            .localCheckpoint()
        )
    return urls


# --- feed autodiscovery from HTML heads ---------------------------------------

_LINK_TAG_RE = r"(?is)<link\b[^>]*>"
_HREF_RES = (
    r"""(?is)\bhref\s*=\s*"([^"]*)\"""",
    r"(?is)\bhref\s*=\s*'([^']*)'",
)


def discover_feeds(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    charset: str = "utf-8",
) -> DataFrame:
    """pages(url, html) → ``(url, feed_url, feed_kind)`` — the RSS/Atom
    autodiscovery links (``<link rel="alternate"
    type="application/rss+xml|atom+xml" href=…>``), attribute order and
    quote style both handled by probing per-tag rather than one mega
    regex. One page can announce many feeds; pages with none emit no
    rows.
    """
    h = _decoded(pages, html_col, charset)
    tags = F.regexp_extract_all(h, F.lit(_LINK_TAG_RE), 0)
    t = pages.select(url_col, F.explode(tags).alias("_tag"))
    tag = F.col("_tag")
    is_alt = tag.rlike(r"""(?is)\brel\s*=\s*["']?\s*alternate\b""")
    kind = F.when(
        tag.rlike(r"(?is)application/rss\+xml"), F.lit("rss")
    ).when(tag.rlike(r"(?is)application/atom\+xml"), F.lit("atom"))
    href = F.coalesce(
        *[F.nullif(F.regexp_extract(tag, p, 1), F.lit("")) for p in _HREF_RES]
    )
    return (
        t.select(
            url_col,
            href.alias("feed_url"),
            kind.alias("feed_kind"),
            is_alt.alias("_alt"),
        )
        .where(F.col("_alt") & F.col("feed_kind").isNotNull() & F.col("feed_url").isNotNull())
        .drop("_alt")
    )


# --- RSS 2.0 / Atom entry parsing ----------------------------------------------

def parse_feed(
    df: DataFrame,
    xml_col: str = "xml",
    src_col: str = "feed_url",
    charset: str = "utf-8",
) -> DataFrame:
    """feeds(src, xml) → one row per entry, RSS ``<item>`` and Atom
    ``<entry>`` unified into ``(src_col, feed_kind, entry_idx, title,
    link, published, entry_id)``.

    Field mapping — RSS: title / ``<link>text</link>`` / pubDate / guid;
    Atom: title / ``<link … href=…/>`` attribute / published (falling
    back to updated) / id. CDATA wrappers are stripped; entities are
    left as-is (same policy as ``extract_html_meta``). Absent fields are
    ``''``.
    """
    x = _decoded(df, xml_col, charset)
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    entries = F.concat(
        F.transform(
            F.regexp_extract_all(
                x, F.lit(r"(?is)<item(?:\s[^>]*)?>(.*?)</item\s*>"), 1
            ),
            lambda e: F.struct(F.lit("rss").alias("kind"), e.alias("frag")),
        ),
        F.transform(
            F.regexp_extract_all(
                x, F.lit(r"(?is)<entry(?:\s[^>]*)?>(.*?)</entry\s*>"), 1
            ),
            lambda e: F.struct(F.lit("atom").alias("kind"), e.alias("frag")),
        ),
    )
    e = df.select(src_col, F.posexplode(entries).alias("entry_idx", "_e"))
    frag = F.col("_e").getField("frag")
    kind = F.col("_e").getField("kind")
    # Atom entries commonly list rel="self"/"edit"/"enclosure" links
    # BEFORE the article link — prefer the first rel-less or
    # rel="alternate" <link> (RFC 4287 §4.2.7.2: no rel means alternate),
    # falling back to the first link of any rel
    link_tags = F.regexp_extract_all(frag, F.lit(r"(?is)<link\b[^>]*>"), 0)
    is_alternate = lambda t: (~t.rlike(r"(?is)\brel\s*=")) | t.rlike(
        r"""(?is)\brel\s*=\s*["']?alternate"""
    )
    chosen_tag = F.coalesce(
        F.get(F.filter(link_tags, is_alternate), 0), F.get(link_tags, 0)
    )
    atom_href = F.coalesce(
        *[
            F.nullif(F.regexp_extract(chosen_tag, p, 1), F.lit(""))
            for p in _HREF_RES
        ],
        F.lit(""),
    )
    link = F.when(kind == "rss", _tag_text(frag, "link")).otherwise(atom_href)
    published = F.when(
        kind == "rss", _tag_text(frag, "pubDate")
    ).otherwise(
        F.when(_tag_text(frag, "published") != "", _tag_text(frag, "published"))
        .otherwise(_tag_text(frag, "updated"))
    )
    entry_id = F.when(kind == "rss", _tag_text(frag, "guid")).otherwise(
        _tag_text(frag, "id")
    )
    return e.select(
        src_col,
        kind.alias("feed_kind"),
        "entry_idx",
        _tag_text(frag, "title").alias("title"),
        link.alias("link"),
        published.alias("published"),
        entry_id.alias("entry_id"),
    )


# --- schema.org JSON-LD ---------------------------------------------------------

_JSONLD_RE = (
    r"""(?is)<script\b[^>]*type\s*=\s*["']application/ld\+json["'][^>]*>(.*?)</script\s*>"""
)


def extract_jsonld(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    charset: str = "utf-8",
) -> DataFrame:
    """pages(url, html) → one row per ``<script type="application/ld+json">``
    block: ``(url, block_idx, ld_type, headline, date_published,
    author_name, jsonld)`` — the schema.org fields article corpora key
    on, pulled with JVM-side ``get_json_object`` (malformed JSON yields
    NULL fields but keeps the raw block for downstream repair; top-level
    JSON arrays — the ``@graph``-less list form — are probed at ``$[0]``
    as a fallback).
    """
    h = _decoded(pages, html_col, charset)
    blocks = F.regexp_extract_all(h, F.lit(_JSONLD_RE), 1)
    b = pages.select(url_col, F.posexplode(blocks).alias("block_idx", "_j"))
    j = F.trim(F.col("_j"))

    def field(path: str) -> Column:
        return F.coalesce(
            F.get_json_object(j, "$" + path),
            F.get_json_object(j, "$[0]" + path),
        )

    return b.select(
        url_col,
        "block_idx",
        field("['@type']").alias("ld_type"),
        field(".headline").alias("headline"),
        field(".datePublished").alias("date_published"),
        F.coalesce(field(".author.name"), field(".author[0].name")).alias(
            "author_name"
        ),
        j.alias("jsonld"),
    )


def with_pub_date(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    source_url_col: str | None = None,
    charset: str = "utf-8",
) -> DataFrame:
    """Resolve a page's publication date from its four usual carriers,
    first-wins by trustworthiness: ``<meta property="article:
    published_time">`` → JSON-LD ``datePublished`` → ``<time datetime>``
    → a ``/YYYY/MM/DD/`` URL-path segment. Appends ``pub_date``
    (DATE, NULL if nothing parses) and ``pub_date_source``
    (``'meta'|'jsonld'|'time'|'url'|NULL``) — the recency signal
    freshness-weighted corpus cuts key on.

    All four probes are scan-stage regex/JSON-path projections (zero
    UDFs, zero shuffle); values run through ``try_to_date`` on their
    first 10 chars, so ISO timestamps parse, garbage and out-of-range
    months/days go NULL instead of erroring under ANSI mode, and a
    malformed higher-precedence carrier FALLS THROUGH to the next one.
    ``source_url_col`` lets the path-date probe read a different column
    than the row key (crawl frames often key rows by doc id).
    """
    raw = _decoded(pages, html_col, charset)
    # comments are stripped for EVERY probe (a commented-out carrier must
    # not fabricate a date); script-ish containers are stripped only for
    # the meta/time probes — JSON-LD legitimately lives inside a <script
    # type="application/ld+json"> block and is extracted from the
    # comment-stripped text by its own typed pattern
    no_comment = F.regexp_replace(raw, r"(?s)<!--.*?-->", " ")
    h = F.regexp_replace(
        no_comment,
        r"(?is)<(script|style|template|noscript)\b[^>]*>.*?</\1\s*>",
        " ",
    )
    u = F.col(source_url_col or url_col)

    def _ex(col, pat):
        # regexp_extract yields '' on no-match; NULL is what coalesce needs
        return F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))

    meta_raw = F.coalesce(
        _ex(
            h,
            r'(?is)<meta\b[^>]*property\s*=\s*["\x27]article:published_time["\x27][^>]*content\s*=\s*["\x27]([^"\x27>]+)',
        ),
        _ex(
            h,
            r'(?is)<meta\b[^>]*content\s*=\s*["\x27]([^"\x27>]+)["\x27][^>]*property\s*=\s*["\x27]article:published_time',
        ),
    )
    # probe EVERY JSON-LD block, not just the first — pages routinely
    # lead with an Organization/WebSite block and carry datePublished in
    # a later NewsArticle block (F.get is the ANSI-safe out-of-bounds
    # NULL; element_at would throw on a page with no blocks)
    ld_blocks = F.regexp_extract_all(no_comment, F.lit(_JSONLD_RE), 1)
    ld_dates = F.filter(
        F.transform(
            ld_blocks,
            lambda b: F.coalesce(
                F.get_json_object(b, "$.datePublished"),
                F.get_json_object(b, "$[0].datePublished"),
            ),
        ),
        lambda v: v.isNotNull() & (v != ""),
    )
    ld_raw = F.get(ld_dates, 0)
    time_raw = _ex(h, r'(?is)<time\b[^>]*datetime\s*=\s*["\x27]([^"\x27>]+)')
    url_raw = F.regexp_extract(u, r"/((?:19|20)\d{2})/(\d{2})/(\d{2})(?:/|$)", 0)
    url_iso = F.when(
        url_raw != "",
        F.concat_ws(
            "-",
            F.regexp_extract(u, r"/((?:19|20)\d{2})/(\d{2})/(\d{2})(?:/|$)", 1),
            F.regexp_extract(u, r"/((?:19|20)\d{2})/(\d{2})/(\d{2})(?:/|$)", 2),
            F.regexp_extract(u, r"/((?:19|20)\d{2})/(\d{2})/(\d{2})(?:/|$)", 3),
        ),
    )

    def parsed(raw: Column) -> Column:
        return F.try_to_date(F.substring(F.nullif(raw, F.lit("")), 1, 10))

    d_meta = parsed(meta_raw)
    d_ld = parsed(ld_raw)
    d_time = parsed(time_raw)
    d_url = parsed(url_iso)
    pub = F.coalesce(d_meta, d_ld, d_time, d_url)
    src = (
        F.when(d_meta.isNotNull(), "meta")
        .when(d_ld.isNotNull(), "jsonld")
        .when(d_time.isNotNull(), "time")
        .when(d_url.isNotNull(), "url")
    )
    return pages.withColumn("pub_date", pub).withColumn("pub_date_source", src)


# --- the composed discovery step ----------------------------------------------

def discovery_candidates(
    pages: DataFrame,
    robots: Optional[DataFrame] = None,
    sitemap_fetch=None,
    max_sitemap_depth: int = 3,
    url_col: str = "url",
    html_col: str = "html",
    charset: str = "utf-8",
) -> DataFrame:
    """One discovery pass over a fetched page corpus → the next crawl
    cycle's candidate URL frame ``(url, discovered_via)``:

    - ``link``    — every ``href`` target on the pages
      (:func:`~edspdf_spark.functions.graph.extract_links`);
    - ``feed``    — RSS/Atom autodiscovery links (:func:`discover_feeds`);
    - ``sitemap`` — leaf URLs of the sitemap trees the hosts' own
      ``robots.txt`` announce (``robots`` = a ``(host, robots_txt)``
      frame; ``sitemap_fetch`` = the caller's fetch layer, handed to
      :func:`walk_sitemap_tree` — roots are fetched through it too;
      omitted ⇒ the sitemap leg is skipped).

    Candidates are canonicalized
    (:func:`~edspdf_spark.functions.urls.canonicalize_url`) and deduped
    with source precedence sitemap > feed > link (a publisher-announced
    URL beats an incidental link when both discover it). Non-absolute
    targets (relative hrefs, ``javascript:`` …) are dropped — the URL
    quality gate would zero them anyway, and the frontier needs
    fetchable keys.

    Feed this straight into
    :func:`~edspdf_spark.functions.frontier.frontier_recipe` (with the
    same ``robots`` frame) for the polite fetch schedule — together they
    are the whole crawl loop: fetch → discover → gate → schedule.

    Plan: three scan-stage projection legs unioned, one canonical-url
    keyed aggregation (map-side partials; the min-struct picks the
    precedence winner). The sitemap leg adds
    :func:`walk_sitemap_tree`'s per-level passes.
    """
    from edspdf_spark.functions.graph import extract_links
    from edspdf_spark.functions.urls import canonicalize_url

    legs = [
        extract_links(pages, url_col=url_col, html_col=html_col, charset=charset)
        .select(F.col("dst").alias("_u"))
        .withColumn("_via", F.lit("link"))
        .withColumn("_rank", F.lit(2)),
        discover_feeds(pages, html_col=html_col, url_col=url_col, charset=charset)
        .select(F.col("feed_url").alias("_u"))
        .withColumn("_via", F.lit("feed"))
        .withColumn("_rank", F.lit(1)),
    ]
    if robots is not None and sitemap_fetch is not None:
        from edspdf_spark.functions.robots import parse_robots_sitemaps

        roots = parse_robots_sitemaps(robots).select(
            F.col("sitemap_url")
        ).distinct()
        fetched = sitemap_fetch(roots)
        if fetched is not None and not fetched.isEmpty():
            leaves = walk_sitemap_tree(
                fetched, sitemap_fetch, max_depth=max_sitemap_depth
            )
            legs.append(
                leaves.select(F.col("loc").alias("_u"))
                .withColumn("_via", F.lit("sitemap"))
                .withColumn("_rank", F.lit(0))
            )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    canon = canonicalize_url(F.col("_u"))
    return (
        cand.withColumn("_c", canon)
        # fetchable keys only: canonicalize_url passes non-absolute
        # strings through untouched, so "has scheme://" is the gate
        .where(F.col("_c").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"))
        .groupBy(F.col("_c").alias(url_col))
        .agg(
            F.min(
                F.struct(F.col("_rank").alias("r"), F.col("_via").alias("v"))
            ).alias("_best")
        )
        .select(url_col, F.col("_best.v").alias("discovered_via"))
    )
