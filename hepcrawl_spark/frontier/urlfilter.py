"""Frontier URL filtering (blocklist gate).

The crawl-side counterpart of the reference's per-spider
`allowed_domains` / URL-pattern guards (e.g.
/root/reference/hepcrawl/spiders/desy_spider.py restricts scheme+path
shape before enqueueing) generalized to the gate every production
crawler runs in front of the frontier: scheme allowlist, registrable
domain-suffix blocklist, and path-extension blocklist.

100 TB shape: every predicate is a plan literal over columns the
frontier already carries (``url_host`` from ``with_url_identity``,
path via ``parse_url``), so the whole gate is ONE whole-stage-codegen
scan over the candidate stream — no join, no shuffle, no Python.
Suffix matching enumerates the host's own dot-suffixes (bounded by
label count, ≤ ~10) and tests membership against the literal list —
O(labels × |blocklist|) per row in the worst case but the IN compiles
to a hash probe, so effectively O(labels).  For blocklists past plan
literal size (≳100k domains) use :func:`url_filter_df`, which keeps
the same semantics through an exploded broadcast-hash semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# plan-literal blocklists stay comfortably under codegen limits up to
# this many entries; beyond it, use url_filter_df (broadcast join)
MAX_LITERAL_DOMAINS = 10_000


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname with >= 2 labels, plus the host
    itself: ``a.b.example.com`` -> [a.b.example.com, b.example.com,
    example.com].  Blocking ``example.com`` therefore blocks every
    subdomain, the standard registrable-domain blocklist semantics.
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - 2, F.lit(0))),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


def _path_ext(url: Column) -> Column:
    """Lowercased final extension of the URL path ('' when none)."""
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    return F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,8})$", 1))


def url_filter(
    candidates: DataFrame,
    blocked_domains: list[str] | None = None,
    blocked_extensions: list[str] | None = None,
    allowed_schemes: tuple[str, ...] = ("http", "https"),
    url_col: str = "canon_url",
) -> DataFrame:
    """Annotate candidates with the blocklist verdict: adds
    ``scheme_ok`` / ``domain_blocked`` / ``ext_blocked`` / ``keep``
    (keep = scheme_ok AND NOT domain_blocked AND NOT ext_blocked).

    Callers that only want the survivors filter on ``keep``; the
    full annotation is kept so dropped candidates can be counted per
    reason (the crawl-health metric every operator dashboard wants).

    Expects ``url_host`` on the frame (``with_url_identity``); all
    three predicates are literal column expressions — see module
    docstring for the scale argument.
    """
    blocked_domains = blocked_domains or []
    blocked_extensions = blocked_extensions or []
    if len(blocked_domains) > MAX_LITERAL_DOMAINS:
        raise ValueError(
            f"blocked_domains has {len(blocked_domains)} entries; the "
            f"plan-literal gate caps at {MAX_LITERAL_DOMAINS} — use "
            "url_filter_df for large blocklists"
        )
    url = F.col(url_col)
    scheme = F.lower(
        F.coalesce(F.parse_url(url, F.lit("PROTOCOL")), F.lit(""))
    )
    scheme_ok = scheme.isin(*allowed_schemes)
    if blocked_domains:
        domain_blocked = F.exists(
            host_suffixes(F.col("url_host")),
            lambda s: s.isin(*blocked_domains),
        )
    else:
        domain_blocked = F.lit(False)
    if blocked_extensions:
        ext_blocked = _path_ext(url).isin(
            *[e.lower().lstrip(".") for e in blocked_extensions]
        )
    else:
        ext_blocked = F.lit(False)
    return (
        candidates
        .withColumn("scheme_ok", scheme_ok)
        .withColumn("domain_blocked", domain_blocked)
        .withColumn("ext_blocked", ext_blocked)
        .withColumn(
            "keep",
            F.col("scheme_ok")
            & ~F.col("domain_blocked")
            & ~F.col("ext_blocked"),
        )
    )


def url_filter_df(
    candidates: DataFrame,
    blocked_domains: DataFrame,
    blocked_extensions: list[str] | None = None,
    allowed_schemes: tuple[str, ...] = ("http", "https"),
    url_col: str = "canon_url",
    id_col: str = "url",
) -> DataFrame:
    """Same verdict columns as :func:`url_filter` but the domain
    blocklist is a DataFrame (column ``domain``) — the shape for
    blocklists too large to be a plan literal.

    Scale path: explode the host's suffixes (≤ ~10 per row), inner
    broadcast-hash join against the blocklist (map-side, output only
    the hits), distinct the hit ids, then mark via a second broadcast
    join of the (small) hit set back onto the stream.  The candidate
    stream itself never shuffles; only the hit set (bounded by the
    number of BLOCKED candidates) moves.
    """
    sfx = candidates.select(
        F.col(id_col),
        F.explode(host_suffixes(F.col("url_host"))).alias("_sfx"),
    )
    hits = (
        sfx.join(
            F.broadcast(blocked_domains.select(F.col("domain").alias("_sfx"))),
            on="_sfx",
            how="inner",
        )
        .select(id_col)
        .distinct()
        .withColumn("_dom_hit", F.lit(True))
    )
    marked = candidates.join(F.broadcast(hits), on=id_col, how="left")
    out = url_filter(
        marked,
        blocked_domains=None,
        blocked_extensions=blocked_extensions,
        allowed_schemes=allowed_schemes,
        url_col=url_col,
    ).withColumn(
        "domain_blocked", F.coalesce(F.col("_dom_hit"), F.lit(False))
    )
    return out.withColumn(
        "keep",
        F.col("scheme_ok") & ~F.col("domain_blocked")
        & ~F.col("ext_blocked"),
    ).drop("_dom_hit")


# ---------------------------------------------------------------------------
# Crawl-trap detection (URL-pattern explosion per host)
# ---------------------------------------------------------------------------

# hex runs first (digits are a subset of hex — the session-id rule
# must win before the digit rule eats half the token), then digit
# runs; both classes read identically in Java regex, RE2 and
# Python re.
_TRAP_HEX_RE = r"[0-9a-f]{8,}"
_TRAP_DIGIT_RE = r"[0-9]+"


def url_pattern_col(url: Column) -> Column:
    """Normalized URL path pattern: hex runs >= 8 chars (session ids,
    content hashes) collapse to ``~h``, digit runs to ``~d``.

    ``/cal/2026/08/19`` and ``/cal/1999/01/02`` both become
    ``/cal/~d/~d/~d`` — the equivalence classing under which a
    calendar or session-id trap collapses to ONE exploding pattern.
    SQL mirror: the same two ``regexp_replace`` calls in the same
    order.
    """
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    return F.regexp_replace(
        F.regexp_replace(F.lower(path), _TRAP_HEX_RE, "~h"),
        _TRAP_DIGIT_RE, "~d",
    )


def detect_traps(
    candidates: DataFrame,
    min_pattern_urls: int = 100,
    min_share: float = 0.5,
    url_col: str = "url",
    host_col: str = "url_host",
) -> DataFrame:
    """Per-host crawl-trap verdict from URL-pattern explosion.

    A trap host (calendar pages, session-id links, faceted-search
    combinatorics) emits unbounded distinct URLs that all collapse to
    one normalized pattern; an honest host's URL mass spreads over
    many patterns or stays small.  The reference crawler never needs
    this (its spiders walk finite listings, e.g. the per-spider page
    guards in /root/reference/hepcrawl/spiders/wsp_spider.py), but a
    10^10-URL frontier dies without it — trap hosts eat the
    politeness budget.

    Verdict: ``trap`` iff the host's hottest pattern holds >=
    ``min_pattern_urls`` distinct URLs AND >= ``min_share`` of the
    host's distinct-URL mass (tie on counts resolves to the
    lexicographically smallest pattern).  Output one row per host:
    ``url_host, host_urls, pattern_cnt, top_pattern,
    top_pattern_urls, trap``.

    100 TB shape: pattern projection is pure codegen over the
    candidate scan; the (host, pattern) rollup partial-aggregates
    map-side (a mega-host's trap rows collapse to one partial per
    task before the exchange); the per-host rollup is a single
    ``min_by`` hash aggregate at host x pattern cardinality — orders
    of magnitude below the URL stream, with NO per-host window sort
    (a 10^8-URL trap host never sorts, it folds).  No Python, no
    window, no join.
    """
    per_pat = (
        candidates
        .select(
            F.col(host_col),
            url_pattern_col(F.col(url_col)).alias("pattern"),
            F.col(url_col).alias("_u"),
        )
        .groupBy(host_col, "pattern")
        .agg(F.countDistinct("_u").alias("pattern_urls"))
    )
    # min_by over (-count, pattern) = the window-free argmax with the
    # deterministic (count DESC, pattern ASC) tie-break
    top = F.min_by(
        F.struct(
            F.col("pattern").alias("top_pattern"),
            F.col("pattern_urls").alias("top_pattern_urls"),
        ),
        F.struct((-F.col("pattern_urls")).alias("neg_urls"),
                 F.col("pattern").alias("pat")),
    )
    return (
        per_pat
        .groupBy(host_col)
        .agg(
            F.sum("pattern_urls").cast("long").alias("host_urls"),
            F.count(F.lit(1)).cast("long").alias("pattern_cnt"),
            top.alias("_top"),
        )
        .select(
            host_col,
            "host_urls",
            "pattern_cnt",
            F.col("_top.top_pattern").alias("top_pattern"),
            F.col("_top.top_pattern_urls").alias("top_pattern_urls"),
            (
                (F.col("_top.top_pattern_urls")
                 >= F.lit(int(min_pattern_urls)))
                & (F.col("_top.top_pattern_urls").cast("double")
                   >= F.lit(float(min_share))
                   * F.col("host_urls").cast("double"))
            ).alias("trap"),
        )
    )


# ---------------------------------------------------------------------------
# URL spam scoring (lexical features, UT1/RefinedWeb-style URL gate)
# ---------------------------------------------------------------------------

# feature thresholds and weights — integer points so the score is
# exact on every engine; tuned to the public URL-filter heuristics
# (long URLs, session-id digit runs, keyword-stuffed hyphen paths,
# deep auto-generated trees, parameter farms)
SPAM_LONG_URL = 80        # chars
SPAM_DIGIT_RUN = r"[0-9]{6,}"
SPAM_MIN_HYPHENS = 4
SPAM_MIN_DEPTH = 6        # '/' count in path
SPAM_MIN_PARAMS = 3       # '=' count in query
SPAM_FLAG_AT = 5          # points


def url_spam_score(candidates: DataFrame,
                   url_col: str = "canon_url") -> DataFrame:
    """Annotate candidates with a lexical URL-spam score: adds
    ``spam_score`` (weighted integer points: +2 long URL, +3 digit
    run >= 6, +2 hyphen-stuffed path, +1 deep path, +2 parameter
    farm) and ``spam_flag`` (score >= :data:`SPAM_FLAG_AT`).

    The frontier-side cheap gate every public pipeline runs before
    fetching (the UT1-blocklist family generalized to lexical
    features): one codegen projection over the candidate scan — no
    join, no shuffle, no Python — so at 10^10-URL frontier scale it
    costs the same pass that already computes the URL identity.
    """
    url = F.col(url_col)
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))

    def _cnt(c: Column, ch: str) -> Column:
        return F.length(c) - F.length(F.replace(c, F.lit(ch), F.lit("")))

    score = (
        F.when(F.length(url) > SPAM_LONG_URL, 2).otherwise(0)
        + F.when(path.rlike(SPAM_DIGIT_RUN), 3).otherwise(0)
        + F.when(_cnt(path, "-") >= SPAM_MIN_HYPHENS, 2).otherwise(0)
        + F.when(_cnt(path, "/") >= SPAM_MIN_DEPTH, 1).otherwise(0)
        + F.when(_cnt(query, "=") >= SPAM_MIN_PARAMS, 2).otherwise(0)
    ).cast("int")
    return candidates.select(
        "*", score.alias("spam_score"),
        (score >= F.lit(SPAM_FLAG_AT)).cast("int").alias("spam_flag"),
    )


def apply_dust_rules(candidates: DataFrame, rules: DataFrame,
                     url_col: str = "url",
                     host_col: str = "host") -> DataFrame:
    """Rewrite URLs by stripping the query parameters
    :func:`dust_params` proved irrelevant — the apply half of the
    DUST loop (Bar-Yossef et al., WWW 2007): once the miner knows
    ``?utm=…`` never changes what ``host`` serves, the canonicalizer
    drops it so Different URLs with Similar Text collapse to ONE
    frontier entry and the politeness budget stops re-fetching
    aliases.  The reference never needs this (its spiders construct
    URLs themselves, e.g. the listing walkers in
    /root/reference/hepcrawl/spiders/wsp_spider.py), but a 10^10-URL
    frontier fed by link extraction does.

    ``rules`` is :func:`dust_params` output (or any frame with
    ``host, param, irrelevant``); only rows with ``irrelevant = 1``
    are applied, per host.  Adds ``dust_url`` (the rewritten URL:
    query params whose key is in the host's irrelevant set removed,
    '?' dropped when nothing survives) and ``n_stripped`` (how many
    params were cut).  URLs on hosts with no rules, and URLs with no
    query, pass through unchanged with ``n_stripped = 0``.  Fragments
    are assumed already stripped (frontier URLs are canonicalized by
    ``with_url_identity`` before they get here).

    100 TB shape: the rule table lives at (host, param) cardinality —
    many orders below the URL stream — so it folds to one array per
    host and BROADCASTS; the rewrite itself is codegen higher-order
    functions (split → filter → array_join) on the existing candidate
    scan.  The URL stream never shuffles and no Python runs.
    """
    per_host = (
        rules.filter(F.col("irrelevant") == 1)
        .groupBy(host_col)
        .agg(F.collect_set("param").alias("_drop_params"))
    )
    url = F.col(url_col)
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    q = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    parts = F.split(q, "&")
    kept = F.filter(
        parts,
        lambda p: ~F.array_contains(
            F.col("_drop_params"), F.split(p, "=").getItem(0)
        ),
    )
    rewritten = F.when(
        F.size(kept) == 0, base
    ).otherwise(F.concat(base, F.lit("?"), F.array_join(kept, "&")))
    untouched = F.col("_drop_params").isNull() | (q == "")
    return (
        candidates.join(F.broadcast(per_host), on=host_col, how="left")
        .withColumn(
            "dust_url", F.when(untouched, url).otherwise(rewritten)
        )
        .withColumn(
            "n_stripped",
            F.when(untouched, F.lit(0))
            .otherwise(F.size(parts) - F.size(kept))
            .cast("long"),
        )
        .drop("_drop_params")
    )


def dust_params(pages: DataFrame, url_col: str = "url",
                host_col: str = "host", text_col: str = "text",
                min_support: int = 3) -> DataFrame:
    """DUST-style irrelevant-query-parameter mining (Bar-Yossef,
    Keidar & Schonfeld, WWW 2007 "Do not crawl in the DUST") — learn,
    per host, which query parameters do not change the served
    content, so the canonicalizer can strip them and the frontier
    stops fetching Different URLs with Similar Text.

    Evidence model (the single-param case — iterative application
    covers stacked params in practice, and multi-param URLs are
    skipped rather than guessed about): a URL ``base?k=v`` pairs with
    its parameter-free alias ``base`` when the crawl has BOTH; the
    pair supports rule "strip k on this host" when the two bodies are
    identical.  A rule is emitted as ``irrelevant`` when every
    observed pair agreed (no counterexample) and support reaches
    ``min_support`` — the paper's validity-threshold shape with a
    strict agreement bar.

    Returns (host, param, n_urls, n_alias, n_same, irrelevant):
    URLs carrying the param / of those, with a crawled alias / of
    those, serving identical content.

    100 TB shape: key extraction and base-URL derivation are codegen
    regexes on the scan; the alias lookup is ONE equi-join on the
    parameter-free URL (both sides pre-hashed content, so the
    compare ships 32 hex chars, not bodies); the rollup
    partial-aggregates at (host, param) cardinality.  No Python, no
    window, no quadratic stage.
    """
    content = F.md5(F.col(text_col).cast("string"))
    q = F.coalesce(F.parse_url(F.col(url_col), F.lit("QUERY")), F.lit(""))
    base = F.regexp_extract(F.col(url_col), r"^([^?#]*)", 1)
    withq = (
        pages.filter((q != "") & ~q.contains("&"))
        .select(
            F.col(host_col).alias("host"),
            F.regexp_extract(q, r"^([^=&]+)", 1).alias("param"),
            base.alias("base_url"),
            content.alias("q_content"),
        )
    )
    bare = (
        pages.filter(q == "")
        .select(F.col(url_col).alias("base_url"),
                content.alias("b_content"))
        .distinct()
    )
    j = withq.join(bare, on="base_url", how="left")
    return (
        j.groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count("b_content").alias("n_alias"),
            F.sum(
                F.when(F.col("q_content") == F.col("b_content"), 1)
                .otherwise(0)
            ).cast("long").alias("n_same"),
        )
        .select(
            "host", "param", "n_urls", "n_alias", "n_same",
            ((F.col("n_same") >= min_support)
             & (F.col("n_same") == F.col("n_alias")))
            .cast("int").alias("irrelevant"),
        )
    )
