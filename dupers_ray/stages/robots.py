"""robots.txt matching — RFC 9309 (Robots Exclusion Protocol), from the
public spec.

A crawl-scale corpus keeps one robots.txt per host; pages must be
checked against their host's group before training-data use (the
politeness rule crawlers applied at fetch time, re-checked at curation
time when policies changed between crawl and use).

Semantics implemented (RFC 9309 §2):
- groups of ``User-agent:`` lines followed by ``Allow:`` / ``Disallow:``
  rules; the group whose agent token equals the caller's (case-
  insensitive) wins, else the ``*`` group;
- ``*`` in a path matches any characters, ``$`` anchors the end;
- the MOST SPECIFIC rule (longest pattern) decides; on a tie Allow
  wins; no matching rule → allowed; empty Disallow → allow-all.

Scale shape: the per-host rule table is tiny next to the corpus (one
robots.txt per host), so it broadcasts via ``ray.put`` once, and
:class:`RobotsGate` is an ACTOR-POOL stage — regexes compile once per
actor in ``__init__``, batches stream through ``__call__``. The
reference has no link/crawl surface (engine-new, like linkgraph).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data


def parse_robots(txt: str, *, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt → [(path_pattern, is_allow)] for the given agent.
    Group selection per RFC 9309: exact agent-token match (case-
    insensitive) preferred, else the ``*`` group. Unknown directives
    are ignored; a blank line does NOT end a group (the RFC keys
    groups on user-agent lines only)."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    collecting_agents = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                current = []
                collecting_agents = True
            a = val.lower()
            current.append(a)
            groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if key == "disallow" and val == "":
                continue  # empty Disallow = allow-all (no rule)
            for a in current:
                groups[a].append((val, key == "allow"))
    return groups.get(agent.lower(), groups.get("*", []))


def _rule_regex(pattern: str) -> "re.Pattern[str]":
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


class _CompiledRules:
    __slots__ = ("rules",)

    def __init__(self, parsed: list[tuple[str, bool]]):
        # sort by specificity DESC (pattern length), Allow first on ties
        # → the first matching rule decides
        self.rules = sorted(
            ((len(p), allow, _rule_regex(p)) for p, allow in parsed),
            key=lambda r: (-r[0], not r[1]),
        )

    def allowed(self, path: str) -> bool:
        for _, allow, rx in self.rules:
            if rx.match(path):
                return allow
        return True


class RobotsGate:
    """Actor-pool stage: flag every page against its host's robots
    rules. ``robots_ref`` is a ``ray.put`` dict {host: robots_txt};
    parsing + regex compilation happen ONCE per actor here in
    ``__init__`` — batches only pay dict lookups and pre-compiled
    matches."""

    def __init__(self, robots_ref, *, agent: str = "*"):
        raw: dict[str, str] = ray.get(robots_ref)
        self.by_host = {
            h: _CompiledRules(parse_robots(t, agent=agent))
            for h, t in raw.items()
        }
        self.default = _CompiledRules([])

    def __call__(self, t: pa.Table) -> pa.Table:
        hosts = t.column("host").to_pylist()
        paths = t.column("path").to_pylist()
        flags = np.fromiter(
            (
                self.by_host.get(h, self.default).allowed(p or "/")
                for h, p in zip(hosts, paths)
            ),
            dtype=bool, count=len(hosts),
        )
        return t.append_column("allowed", pa.array(flags))


def robots_check(
    pages: "ray.data.Dataset",
    robots_by_host: dict[str, str],
    *,
    agent: str = "*",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Flag pages (host, path, …) against per-host robots.txt — rules
    broadcast once, compiled once per actor."""
    ref = ray.put(robots_by_host)
    return pages.map_batches(
        RobotsGate,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"agent": agent},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
