"""robots.txt parse kernel (politeness is north_rule-added capability;
semantics follow the de-facto standard + stdlib urllib.robotparser:
last-matching user-agent group, longest-prefix rule matching,
Crawl-delay in seconds).

Only the fields the scheduler needs are extracted: the '*' group's
Disallow/Allow prefixes and Crawl-delay.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    crawl_delay_ms: int | None = None
    disallow: list = field(default_factory=list)
    allow: list = field(default_factory=list)
    sitemaps: list = field(default_factory=list)


def parse_robots(data: bytes | str, agent: str = "*") -> RobotsRules:
    if isinstance(data, (bytes, bytearray)):
        text = bytes(data).decode("utf-8", "replace")
    else:
        text = data
    rules = RobotsRules()
    applies = False
    in_rules = False  # inside a group's rule lines (vs its agent lines)
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            # Sitemap is a group-independent (global) directive
            if value:
                rules.sitemaps.append(value)
            continue
        if key == "user-agent":
            if in_rules:
                # a rule block ended; this user-agent starts a new group
                applies = False
                in_rules = False
            applies = applies or value == "*"
        elif applies:
            in_rules = True
            if key == "disallow" and value:
                rules.disallow.append(value)
            elif key == "allow" and value:
                rules.allow.append(value)
            elif key == "crawl-delay":
                try:
                    rules.crawl_delay_ms = int(float(value) * 1000)
                except ValueError:
                    pass
    return rules


def is_allowed(rules: RobotsRules, path: str) -> bool:
    """Longest-match wins; Allow beats Disallow on equal length."""
    best_allow = -1
    best_disallow = -1
    for p in rules.allow:
        if path.startswith(p) and len(p) > best_allow:
            best_allow = len(p)
    for p in rules.disallow:
        if path.startswith(p) and len(p) > best_disallow:
            best_disallow = len(p)
    return best_allow >= best_disallow
