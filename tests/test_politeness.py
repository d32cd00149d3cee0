"""Robots parsing + politeness scheduling (ref: trpoliteness.pas)."""

from texrex_ray.state.politeness import PolitenessManager, parse_robots


ROBOTS = """
User-agent: othercrawler
Disallow: /

User-agent: texrex
Disallow: /private
Crawl-delay: 2

User-agent: *
Disallow: /all
Crawl-delay: 9
"""


def test_parser_precedence_exact_over_star():
    r = parse_robots(ROBOTS, agent="texrex")
    assert r.disallows == ["/private"]
    assert r.crawl_delay == 2
    r2 = parse_robots(ROBOTS, agent="unknownbot")
    assert r2.disallows == ["/all"] and r2.crawl_delay == 9


def test_parser_prefix_match():
    body = "User-agent: tex\nDisallow: /t\n\nUser-agent: *\nDisallow: /star\n"
    r = parse_robots(body, agent="texrex")
    assert r.disallows == ["/t"]  # prefix beats *


def test_allows_paths():
    r = parse_robots("User-agent: *\nDisallow: /p1\n")
    assert not r.allows("/p1")
    assert not r.allows("/p1/sub")
    assert r.allows("/p2")
    assert r.allows("/")


def test_seconds_until_retrieval():
    pm = PolitenessManager(min_politeness=1)
    pm.set_robots("h.com", "User-agent: *\nCrawl-delay: 3\nDisallow: /no\n", now=0)
    # never accessed → 0
    assert pm.seconds_until_retrieval("http://h.com/a", now=5) == 0
    pm.retrieved("http://h.com/a", now=5)
    assert pm.seconds_until_retrieval("http://h.com/b", now=5) == 3
    assert pm.seconds_until_retrieval("http://h.com/b", now=7) == 1
    assert pm.seconds_until_retrieval("http://h.com/b", now=9) == 0
    # disallowed → -1 regardless
    assert pm.seconds_until_retrieval("http://h.com/no/x", now=99) == -1


def test_min_politeness_floor():
    pm = PolitenessManager(min_politeness=4)
    pm.set_robots("h.com", None, now=0)
    pm.retrieved("http://h.com/a", now=0)
    assert pm.seconds_until_retrieval("http://h.com/b", now=1) == 3


def test_snapshot_restore():
    pm = PolitenessManager(min_politeness=2)
    pm.set_robots("h.com", "User-agent: *\nCrawl-delay: 5\n", now=3)
    pm.retrieved("http://h.com/a", now=4)
    pm2 = PolitenessManager.restore(pm.snapshot())
    assert pm2.seconds_until_retrieval("http://h.com/b", now=6) == 3
    assert not pm2.needs_robots("h.com", now=10)
