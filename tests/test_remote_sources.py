"""S8 partial-zip + S10 paged-catalog algorithms (sources/remote.py):
the properties the driver query can't check — the byte budget that makes
the read 'partial', and the retry/pagination behavior."""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from burst_db_spark.sources import remote


def _make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("data/a.csv", "1,one\n2,two",
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("data/b.csv", "3,three" * 40,
                   compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("junk/huge.bin", b"\xab" * 2_000_000)


def test_partial_zip_reads_only_member_ranges(tmp_path):
    path = str(tmp_path / "a.zip")
    _make_zip(path)
    base_fetch, size = remote.file_fetcher(path)
    fetched = []

    def counting_fetch(off, length):
        fetched.append((off, length))
        return base_fetch(off, length)

    members = remote.list_zip_members(counting_fetch, size)
    assert {m.filename for m in members} == {
        "data/a.csv", "data/b.csv", "junk/huge.bin"
    }
    wanted = [m for m in members if m.filename.startswith("data/")]
    for m in wanted:
        body = remote.read_zip_member(counting_fetch, m)
        assert len(body) == m.uncomp_size
    # the 2 MB decoy's payload was never fetched: total bytes moved is
    # tail scan + central directory + the two small members
    total = sum(l for _, l in fetched)
    assert total < 100_000, total
    assert size > 2_000_000
    # stored and deflated members both round-trip
    a = remote.read_zip_member(base_fetch, wanted[0])
    assert b"one" in a or b"three" in a


def test_partial_zip_rejects_non_zip(tmp_path):
    p = str(tmp_path / "x.bin")
    with open(p, "wb") as f:
        f.write(b"\x00" * 1024)
    fetch, size = remote.file_fetcher(p)
    with pytest.raises(ValueError, match="no end-of-central-directory"):
        remote.list_zip_members(fetch, size)


def test_stac_pagination_and_retry(tmp_path):
    pages = {
        "p0.json": {"links": [
            {"rel": "item", "title": "S1A_IW_SLC__1SDV_A-SLC"},
            {"rel": "self", "href": "p0.json"},
            {"rel": "next", "href": "p1.json"},
        ]},
        "p1.json": {"links": [
            {"rel": "item", "title": "S1A_EW_SLC__1SDV_B-SLC"},  # beam chaff
            {"rel": "item", "title": "S1A_IW_SLC__1ZZZ_C-SLC"},  # pol chaff
            {"rel": "item", "title": "S1B_IW_SLC__1SSH_D-SLC"},
        ]},
    }
    calls = {"n": 0}

    def flaky_fetch(url):
        name = url.rsplit("/", 1)[-1]
        calls["n"] += 1
        if name == "p1.json" and calls["n"] < 3:
            raise OSError("transient")
        return pages[name]

    items = remote.stac_paged_items(flaky_fetch, "p0.json")
    assert len(items) == 4  # retry recovered page 1

    names = remote.asf_safe_names(
        lambda u: pages[u.rsplit("/", 1)[-1]], ["p0.json"]
    )
    assert names == ["S1A_IW_SLC__1SDV_A", "S1B_IW_SLC__1SSH_D"]

    # a page that never succeeds is skipped (reference's HTTPError branch)
    def dead(url):
        raise OSError("down")

    assert remote.asf_safe_names(dead, ["p0.json"]) == []


def test_dir_json_fetcher(tmp_path):
    doc = {"links": []}
    with open(os.path.join(str(tmp_path), "x.json"), "w") as f:
        json.dump(doc, f)
    assert remote.dir_json_fetcher(str(tmp_path))("http://any/x.json") == doc
