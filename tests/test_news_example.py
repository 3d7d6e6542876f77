"""The news-intelligence example app must run end-to-end offline
(the examples are the behavioral spec; SURVEY §2.13)."""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="module")
def db_path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("news") / "db")


def test_demo_all_phases(db_path, capsys):
    from examples.news_intelligence.demo import main
    main(["--articles", "400", "--db-path", db_path, "--fresh"])
    out = capsys.readouterr().out
    assert "DEMO COMPLETE" in out
    assert "SEARCH DEMONSTRATIONS" in out
    assert "KNOWLEDGE GRAPH DEMONSTRATIONS" in out
    assert "TRENDING" in out.upper()
    assert "PERSISTENCE ROUNDTRIP" in out
    assert "search works: True" in out


def test_query_cli_scripted(db_path, capsys):
    from examples.news_intelligence.query_cli import main
    main(["--db-path", db_path, "--commands",
          "search chip supply;read 1;entity Northwind Compute;"
          "trending;stats;keyword fusion;hybrid storage;quit"])
    out = capsys.readouterr().out
    assert "search: 'chip supply'" in out
    assert "ENTITY: Northwind Compute" in out
    assert "TRENDING ENTITIES" in out
    assert "CATEGORY STATISTICS" in out
    assert "bye" in out


def test_cli_read_by_number_and_id(db_path, capsys):
    from examples.news_intelligence.query_cli import (NewsQueryInterface,
                                                      ensure_platform)
    import argparse
    ns = argparse.Namespace(db_path=db_path, articles=400)
    qi = NewsQueryInterface(ensure_platform(ns))
    hits = qi.search("earnings guidance", k=5)
    assert hits
    rid = qi.resolve("1")
    assert rid == hits[0].id
    art = qi.read_article(rid)
    assert art and art["metadata"]["headline"]
    assert qi.resolve("99") is None
    assert qi.resolve(rid) == rid
