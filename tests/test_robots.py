"""Ported robots goldens: RobotsTxtTest.kt:42-65 and
RoboMinderTest.kt:51-82 truth tables."""

import pandas as pd
import pytest

from krawler_spark.functions.robots import (
    RobotsParseError,
    allowed_for,
    eval_frame,
    is_allowed,
    parse_robots,
    rules_for_agent,
)

DISALLOW_ALL = "User-Agent: * \n Disallow: / "
DISALLOW_ME = "User-Agent: AGENT-A \n Disallow: / \n User-Agent: * \n Disallow: "
ALLOW_ME = "User-Agent: AGENT-A \n Disallow: \n User-Agent: * \n Disallow: /"
ALLOW_ALL = "User-Agent: * \n Disallow: "
UNRELATED = "User-Agent: Google \n Disallow: /"
SPECIFIC = "User-Agent: AGENT-A \n Disallow: /invalid"


def test_user_agents():  # RobotsTxtTest.kt:42-50
    assert set(parse_robots(ALLOW_ALL)) == {"*"}
    assert set(parse_robots(ALLOW_ME)) == {"AGENT-A", "*"}
    assert set(parse_robots(DISALLOW_ALL)) == {"*"}
    assert set(parse_robots(DISALLOW_ME)) == {"AGENT-A", "*"}
    assert set(parse_robots(UNRELATED)) == {"Google"}
    assert set(parse_robots(SPECIFIC)) == {"AGENT-A"}


def test_disallow_rules():  # RobotsTxtTest.kt:52-65
    assert parse_robots(ALLOW_ALL)["*"] == {""}
    assert parse_robots(DISALLOW_ME)["AGENT-A"] == {"/"}
    assert parse_robots(DISALLOW_ME)["*"] == {""}
    assert parse_robots(ALLOW_ME)["AGENT-A"] == {""}
    assert parse_robots(ALLOW_ME)["*"] == {"/"}
    assert parse_robots(UNRELATED)["Google"] == {"/"}
    assert parse_robots(SPECIFIC)["AGENT-A"] == {"/invalid"}


def _process(body, agent="AGENT-A"):
    return rules_for_agent(parse_robots(body), agent)


def test_process_truth_table():  # RoboMinderTest.kt:51-82
    assert not is_allowed(_process(DISALLOW_ALL), "")
    assert not is_allowed(_process(DISALLOW_ME), "")
    assert is_allowed(_process(ALLOW_ME), "")
    assert is_allowed(_process(ALLOW_ALL), "")
    assert is_allowed(_process(UNRELATED), "")
    # error response → allow-all
    assert is_allowed(None, "")
    # segment-specific: /invalid blocks /invalid/ but not /valid
    assert not is_allowed(_process(SPECIFIC), "/invalid/")
    assert is_allowed(_process(SPECIFIC), "/valid")


def test_segment_equality_not_prefix():
    rules = _process(SPECIFIC)
    assert not is_allowed(rules, "/a/invalid/b")
    assert is_allowed(rules, "/invalidpage")


def test_colonless_line_raises():
    # blank lines and bare tokens kill the parse (RobotsTxt.kt:43-45)
    with pytest.raises(RobotsParseError):
        parse_robots("User-Agent: *\n\nDisallow: /")
    with pytest.raises(RobotsParseError):
        parse_robots("garbage line")
    # ...which end-to-end means allow-all
    assert allowed_for("User-Agent: *\n\nDisallow: /", "AGENT-A", "/anything")


def test_value_keeps_first_colon_part_only():
    rules = parse_robots("User-Agent: *\nDisallow: /foo:bar")
    assert rules[""] == set() if "" in rules else True
    assert rules["*"] == {"/foo"}


def test_query_string_stripped():
    assert allowed_for(SPECIFIC, "AGENT-A", "/valid?x=/invalid")
    assert not allowed_for(SPECIFIC, "AGENT-A", "/invalid?x=1")


def test_eval_frame():
    paths = pd.Series(["/invalid/", "/valid", "/x", None])
    bodies = pd.Series([SPECIFIC, SPECIFIC, None, DISALLOW_ALL])
    out = eval_frame(paths, bodies, "AGENT-A")
    assert list(out) == [False, True, True, False]
