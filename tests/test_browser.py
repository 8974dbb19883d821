"""Browser SQLite extraction tests — real DBs built with sqlite3 and
embedded in evidence (reference src/parsers/sqlite_db.rs:655-925 builds
its fixtures the same way with rusqlite)."""

from __future__ import annotations

import dataclasses
import os
import sqlite3

import pytest

from swiftbeaver_spark.config import DEFAULT_CONFIG
from swiftbeaver_spark.engine import Engine
from swiftbeaver_spark.parsers.sqlite_pages import scan_pages

WEBKIT_TS = 13_303_449_600_000_000  # 2022-07-28 in webkit µs
UNIX_TS_US = 1_628_553_600_000_000  # 2021-08-10


def build_chrome_db(path: str) -> None:
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE urls(id INTEGER PRIMARY KEY, url TEXT, title TEXT,
                          last_visit_time INTEGER);
        CREATE TABLE visits(id INTEGER PRIMARY KEY, url INTEGER,
                            visit_time INTEGER, transition INTEGER);
        CREATE TABLE cookies(host_key TEXT, name TEXT, value TEXT, path TEXT,
                             expires_utc INTEGER, last_access_utc INTEGER,
                             creation_utc INTEGER, is_secure INTEGER,
                             is_httponly INTEGER);
        CREATE TABLE downloads(id INTEGER PRIMARY KEY, target_path TEXT,
                               tab_url TEXT, start_time INTEGER,
                               end_time INTEGER, total_bytes INTEGER,
                               state INTEGER);
        CREATE TABLE downloads_url_chains(id INTEGER, chain_index INTEGER,
                                          url TEXT);
        """
    )
    conn.execute(
        "INSERT INTO urls VALUES (1, 'https://example.com/', 'Example', ?)",
        (WEBKIT_TS,),
    )
    conn.execute("INSERT INTO visits VALUES (1, 1, ?, 1)", (WEBKIT_TS,))
    conn.execute("INSERT INTO visits VALUES (2, 1, ?, 0)", (WEBKIT_TS + 60_000_000,))
    conn.execute(
        "INSERT INTO cookies VALUES ('example.com', 'sid', 'abc', '/', ?, ?, ?, 1, 0)",
        (WEBKIT_TS, WEBKIT_TS, WEBKIT_TS),
    )
    conn.execute(
        "INSERT INTO downloads VALUES (7, '/tmp/file.bin', 'https://tab.example.com', ?, ?, 1024, 1)",
        (WEBKIT_TS, WEBKIT_TS + 1_000_000),
    )
    conn.execute(
        "INSERT INTO downloads_url_chains VALUES (7, 0, 'https://chain.example.com/file.bin')"
    )
    conn.commit()
    conn.close()


def build_firefox_db(path: str) -> None:
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE moz_places(id INTEGER PRIMARY KEY, url TEXT, title TEXT,
                                last_visit_date INTEGER);
        CREATE TABLE moz_historyvisits(id INTEGER PRIMARY KEY,
                                       place_id INTEGER, visit_date INTEGER,
                                       visit_type INTEGER);
        CREATE TABLE moz_cookies(host TEXT, name TEXT, value TEXT, path TEXT,
                                 expiry INTEGER, lastAccessed INTEGER,
                                 creationTime INTEGER, isSecure INTEGER,
                                 isHttpOnly INTEGER);
        """
    )
    conn.execute(
        "INSERT INTO moz_places VALUES (1, 'https://mozilla.org/', 'Mozilla', ?)",
        (UNIX_TS_US,),
    )
    conn.execute("INSERT INTO moz_historyvisits VALUES (1, 1, ?, 2)", (UNIX_TS_US,))
    conn.execute(
        "INSERT INTO moz_cookies VALUES ('mozilla.org', 'tok', 'xyz', '/', ?, ?, ?, 0, 1)",
        (UNIX_TS_US // 1_000_000, UNIX_TS_US, UNIX_TS_US),
    )
    conn.commit()
    conn.close()


@pytest.fixture(scope="module")
def browser_run(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("browser")
    chrome, firefox = str(tmp / "History"), str(tmp / "places.sqlite")
    build_chrome_db(chrome)
    build_firefox_db(firefox)
    evidence = bytearray(b"\x00" * 4096)
    offsets = {}
    for name, p in (("chrome", chrome), ("firefox", firefox)):
        blob = open(p, "rb").read()
        offsets[name] = len(evidence)
        evidence.extend(blob)
        evidence.extend(b"\x00" * (4096 - len(blob) % 4096))
    path = str(tmp / "evidence.raw")
    with open(path, "wb") as fh:
        fh.write(bytes(evidence))
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        chunk_size=64 * 1024,
        overlap=4096,
        file_types=tuple(ft for ft in DEFAULT_CONFIG.file_types if ft.type_id == "sqlite"),
    )
    return Engine(spark, cfg).run(evidence_path=path)


def test_chrome_history_join(browser_run):
    rows = [r for r in browser_run["browser_history"].collect() if r.browser == "chrome"]
    assert len(rows) == 2  # two visits joined to one url
    assert {r.url for r in rows} == {"https://example.com/"}
    assert {r.visit_source for r in rows} == {"typed", "link"}
    typed = next(r for r in rows if r.visit_source == "typed")
    assert typed.title == "Example"
    assert typed.visit_time is not None and typed.visit_time.year == 2022
    assert typed.profile == "Default"


def test_firefox_history_join(browser_run):
    rows = [r for r in browser_run["browser_history"].collect() if r.browser == "firefox"]
    assert len(rows) == 1
    assert rows[0].url == "https://mozilla.org/"
    assert rows[0].visit_source == "typed"
    assert rows[0].visit_time.year == 2021


def test_cookies_both_browsers(browser_run):
    rows = browser_run["browser_cookies"].collect()
    chrome = next(r for r in rows if r.browser == "chrome")
    assert (chrome.host, chrome.name, chrome.value) == ("example.com", "sid", "abc")
    assert chrome.is_secure is True and chrome.is_http_only is False
    assert chrome.expires_utc.year == 2022
    firefox = next(r for r in rows if r.browser == "firefox")
    assert (firefox.host, firefox.name) == ("mozilla.org", "tok")
    assert firefox.is_http_only is True
    assert firefox.expires_utc.year == 2021  # seconds -> timestamp


def test_chrome_downloads_coalesce(browser_run):
    rows = [r for r in browser_run["browser_downloads"].collect() if r.browser == "chrome"]
    assert len(rows) == 1
    # chain url wins the COALESCE over tab_url
    assert rows[0].url == "https://chain.example.com/file.bin"
    assert rows[0].target_path == "/tmp/file.bin"
    assert rows[0].total_bytes == 1024
    assert rows[0].state == "1"


def test_page_recovery_scan(tmp_path):
    """Page scraper finds URL rows without using the sqlite library,
    including an overflow-page TEXT (reference sqlite_pages.rs:420-443)."""
    p = str(tmp_path / "pages.sqlite")
    conn = sqlite3.connect(p)
    conn.execute("PRAGMA page_size=512")
    conn.execute("CREATE TABLE t(url TEXT, title TEXT, ts INTEGER)")
    long_url = "https://recovered.example.com/" + "a" * 1200  # spans overflow
    conn.execute("INSERT INTO t VALUES (?, 'Long One', ?)", (long_url, WEBKIT_TS))
    conn.execute(
        "INSERT INTO t VALUES ('https://recovered.example.com/b', 'small', ?)",
        (UNIX_TS_US,),
    )
    conn.commit()
    conn.close()
    rows = scan_pages(open(p, "rb").read(), "pages.sqlite")
    urls = {r[0] for r in rows}
    assert urls == {long_url, "https://recovered.example.com/b"}
    by_url = {r[0]: r for r in rows}
    assert by_url[long_url][1] == "Long One"
    assert by_url[long_url][2].year == 2022
    assert by_url["https://recovered.example.com/b"][1] == "small"
    assert by_url["https://recovered.example.com/b"][2].year == 2021
