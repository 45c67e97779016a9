"""RFC 9309 robots.txt semantics (stages/robots.py): group selection,
longest-match precedence, Allow-on-tie, wildcards/$, empty Disallow,
and the actor-pool gate end to end."""
from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd

from dupers_ray.stages.robots import (
    _CompiledRules,
    parse_robots,
    robots_check,
)

TXT = """
# comment
User-agent: googlebot
Disallow: /g

User-agent: *
Disallow: /private
Allow: /private/pub
Disallow: /tmp/*.bak$
Disallow: /exact$
Disallow:
"""


def _allowed(txt: str, path: str, agent: str = "*") -> bool:
    return _CompiledRules(parse_robots(txt, agent=agent)).allowed(path)


def test_group_selection_and_fallback():
    assert not _allowed(TXT, "/g/x", agent="googlebot")
    assert _allowed(TXT, "/private/x", agent="googlebot")  # own group only
    assert not _allowed(TXT, "/private/x", agent="otherbot")  # * fallback
    assert parse_robots("Disallow: /orphan", agent="*") == []  # no group


def test_longest_match_and_allow_tie():
    assert not _allowed(TXT, "/private/secret")
    assert _allowed(TXT, "/private/pub/x")  # longer Allow beats Disallow
    # exact tie: Allow wins per RFC 9309
    tie = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    assert _allowed(tie, "/a/x")


def test_wildcard_and_anchor():
    assert not _allowed(TXT, "/tmp/old.bak")  # * + $ anchored
    assert _allowed(TXT, "/tmp/old.bak.txt")  # $ means END
    assert not _allowed(TXT, "/exact")
    assert _allowed(TXT, "/exact/sub")


def test_empty_disallow_and_unknown_host():
    assert _allowed("User-agent: *\nDisallow:\n", "/anything")
    assert _CompiledRules([]).allowed("/x")  # no robots.txt -> allowed


def test_robots_check_actor_pool():
    pages = pa.table({
        "doc_id": [0, 1, 2, 3],
        "host": ["a.example", "a.example", "b.example", "c.example"],
        "path": ["/private/x", "/private/pub/y", "/private/x", "/free"],
    })
    robots = {
        "a.example": "User-agent: *\nDisallow: /private\nAllow: /private/pub\n",
        "b.example": "User-agent: *\nDisallow:\n",
        # c.example has no robots.txt
    }
    out = robots_check(
        rd.from_arrow(pages).repartition(2), robots, concurrency=2
    )
    got = {r["doc_id"]: r["allowed"] for r in out.take_all()}
    assert got == {0: False, 1: True, 2: True, 3: True}
