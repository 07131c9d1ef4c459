"""robots.txt parsing and rule evaluation — reference-compatible.

Matched behavior:

* parser (``robots/RobotsTxt.kt:35-63``): every line is split on ``:``;
  a line with no ``:`` at all (including blank lines!) raises in the
  reference, turning the whole response into an ``ErrorResponse``
  (``http/Requests.kt:188-193``) which the minder treats as allow-all
  (``robots/RoboMinder.kt:70-74``). Values containing ``:`` keep only
  the first split part — both quirks preserved.
* agent resolution (``RoboMinder.kt:71``):
  ``rules[userAgent] ?? rules["*"] ?? {}`` — agent value is
  case-sensitive, keys (``user-agent``/``disallow``) are lowercased.
* rule evaluation (``RoboMinder.kt:55-68``): ``"" ∈ rules`` → allow
  all; ``"/" ∈ rules`` → deny all; otherwise deny iff any rule string
  *equals* ``"/" + segment`` for some path segment (segment equality,
  NOT prefix matching — ``/invalid`` blocks ``/invalid/`` and
  ``/a/invalid`` but not ``/invalidpage``).
* the query string is stripped before evaluation (``RoboMinder.kt:87``).
* missing robots.txt (fetch error) → allow-all.
"""

from __future__ import annotations

from typing import Dict, Optional, Set

__all__ = ["RobotsParseError", "parse_robots", "rules_for_agent", "is_allowed", "eval_frame"]


class RobotsParseError(ValueError):
    """Raised on any line without a colon — maps to the reference's
    ErrorResponse path (⇒ allow-all)."""


def parse_robots(body) -> Dict[str, Set[str]]:
    """robots.txt body → {user-agent value: set(disallow values)}."""
    if body is None:
        raise RobotsParseError("no robots.txt body")
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    rules: Dict[str, Set[str]] = {}
    agent = ""
    for line in body.splitlines():
        parts = [p.strip() for p in line.split(":")]
        if len(parts) < 2:
            raise RobotsParseError(f"colon-less line: {line!r}")
        key = parts[0].lower()
        value = parts[1]
        if key == "user-agent":
            agent = value
        elif key == "disallow":
            rules.setdefault(agent, set()).add(value)
    return rules


def rules_for_agent(rules: Dict[str, Set[str]], user_agent: str) -> Set[str]:
    """RoboMinder.kt:71 agent resolution."""
    got = rules.get(user_agent)
    if got is None:
        got = rules.get("*")
    return got if got is not None else set()


def is_allowed(agent_rules: Optional[Set[str]], path: str) -> bool:
    """Evaluate one path (query already stripped) against one agent's
    disallow set. ``None`` rules = robots fetch/parse error → allow."""
    if agent_rules is None:
        return True
    if "" in agent_rules:
        return True
    if "/" in agent_rules:
        return False
    segments = {"/" + seg for seg in path.split("/")}
    return not any(rule in segments for rule in agent_rules)


def allowed_for(body, user_agent: str, path: str) -> bool:
    """End-to-end convenience: body may be None (no robots.txt row)."""
    if body is None:
        return True
    try:
        rules = parse_robots(body)
    except RobotsParseError:
        return True
    no_query = path.split("?")[0]
    return is_allowed(rules_for_agent(rules, user_agent), no_query)


# ---------------------------------------------------------------------------
# Arrow-vectorized batch wrapper: evaluate (path, robots_body) rows.
# Bodies repeat per host within a batch, so parse results are memoized.
# ---------------------------------------------------------------------------

def eval_frame(paths, bodies, user_agent: str):
    """pd.Series[path], pd.Series[robots body|None] → pd.Series[bool]."""
    import pandas as pd

    cache: dict = {}

    def _rules(body):
        if body is None or (isinstance(body, float)):
            return None  # fetch error → allow-all sentinel
        key = bytes(body) if isinstance(body, (bytes, bytearray)) else body
        if key in cache:
            return cache[key]
        try:
            r = rules_for_agent(parse_robots(body), user_agent)
        except RobotsParseError:
            r = None
        cache[key] = r
        return r

    out = [
        is_allowed(_rules(b), (p or "").split("?")[0])
        for p, b in zip(paths, bodies)
    ]
    return pd.Series(out, index=paths.index, dtype="bool")
