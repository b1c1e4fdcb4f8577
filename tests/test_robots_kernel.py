"""robots.txt parse kernel tests (politeness semantics)."""

from warctools_spark.kernels.robots import is_allowed, parse_robots


def test_star_group():
    r = parse_robots(
        b"User-agent: *\nDisallow: /private\nAllow: /private/ok\nCrawl-delay: 2\n"
    )
    assert r.crawl_delay_ms == 2000
    assert r.disallow == ["/private"]
    assert r.allow == ["/private/ok"]


def test_other_agent_ignored():
    r = parse_robots(
        b"User-agent: foo\nDisallow: /foo-only\n\n"
        b"User-agent: *\nDisallow: /all\n"
    )
    assert r.disallow == ["/all"]


def test_combined_agent_group():
    r = parse_robots(b"User-agent: *\nUser-agent: foo\nDisallow: /x\n")
    assert r.disallow == ["/x"]


def test_group_reset_after_rules():
    r = parse_robots(
        b"User-agent: *\nDisallow: /a\n"
        b"User-agent: foo\nDisallow: /b\n"
    )
    assert r.disallow == ["/a"]


def test_fractional_crawl_delay_and_comments():
    r = parse_robots(b"User-agent: *  # all\nCrawl-delay: 0.5\nDisallow: /q # hmm\n")
    assert r.crawl_delay_ms == 500
    assert r.disallow == ["/q"]


def test_malformed_lines_tolerated():
    r = parse_robots(b"garbage\nUser-agent: *\nDisallow /oops\nDisallow: /ok\n")
    assert r.disallow == ["/ok"]


def test_is_allowed_longest_match():
    r = parse_robots(
        b"User-agent: *\nDisallow: /p\nAllow: /p/public\n"
    )
    assert not is_allowed(r, "/p/secret")
    assert is_allowed(r, "/p/public/x")
    assert is_allowed(r, "/other")
    # allow wins ties
    r2 = parse_robots(b"User-agent: *\nDisallow: /d\nAllow: /d\n")
    assert is_allowed(r2, "/d/x")


def test_empty_and_none():
    r = parse_robots(b"")
    assert r.crawl_delay_ms is None and r.disallow == [] and r.allow == []
    assert is_allowed(r, "/anything")


def test_sitemap_directive_is_global():
    from warctools_spark.kernels.robots import parse_robots

    txt = (b"Sitemap: http://h/top.xml\n"
           b"User-agent: other\nDisallow: /x\n"
           b"Sitemap: http://h/mid.xml\n"
           b"User-agent: *\nDisallow: /p\n"
           b"Sitemap: http://h/in-group.xml\n")
    r = parse_robots(txt)
    # all three captured regardless of group membership
    assert r.sitemaps == [
        "http://h/top.xml", "http://h/mid.xml", "http://h/in-group.xml"
    ]
    assert r.disallow == ["/p"]
