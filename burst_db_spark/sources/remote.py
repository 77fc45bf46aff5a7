"""Remote-source algorithms with the transport injected (SURVEY.md §2.1
S8 + S10).

The reference drives both through live HTTP:

- S8 — ``unzip_http.RemoteZipFile`` (_land_usgs.py:24-44): open a
  multi-GB zip on a server and extract two shapefile members WITHOUT
  downloading the archive, by range-reading the end-of-central-directory
  record, the central directory, and just the wanted members' byte
  ranges.
- S10 — the CMR/STAC paged catalog walk
  (scripts/historical_bursts/download_asf_granule_list.py:41-128): fetch
  a per-date page, keep ``rel == "item"`` links, filter granule names,
  follow pagination, with retry/backoff.

Here the ALGORITHMS are implemented in full and the transport is a
plain ``fetch(offset, size) -> bytes`` / ``fetch_json(url) -> dict``
callable. A local file (or an in-memory dict of pages) is the test
transport; an HTTP transport is a drop-in (urllib ``Range:`` header /
``GET``) and stays driver-side exactly like the reference's. No network
is touched anywhere in this repo.
"""

from __future__ import annotations

import fnmatch
import struct
import zlib
from collections.abc import Callable, Iterable
from dataclasses import dataclass

Fetch = Callable[[int, int], bytes]

_EOCD_SIG = 0x06054B50
_CDH_SIG = 0x02014B50
_LFH_SIG = 0x04034B50


def file_fetcher(path: str) -> tuple[Fetch, int]:
    """The local-file transport: (fetch, total_size). Reads ONLY the
    requested ranges — the test harness asserts the byte budget, which
    is what makes the 'partial' in partial-zip checkable offline."""
    import os

    size = os.path.getsize(path)

    def fetch(offset: int, length: int) -> bytes:
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(length)

    return fetch, size


@dataclass(frozen=True)
class ZipMember:
    filename: str
    method: int          # 0 = stored, 8 = deflate
    comp_size: int
    uncomp_size: int
    header_offset: int   # local file header offset


def list_zip_members(fetch: Fetch, size: int) -> list[ZipMember]:
    """Parse the central directory via ranged reads: tail scan for the
    EOCD record, then one read of the central directory. Total bytes
    fetched ≈ 64 KiB + the directory — independent of archive size."""
    tail_len = min(size, 65_536 + 22)
    tail = fetch(size - tail_len, tail_len)
    pos = tail.rfind(struct.pack("<I", _EOCD_SIG))
    if pos < 0:
        raise ValueError("not a zip: no end-of-central-directory record")
    (_, _, _, _, n_entries, cd_size, cd_offset, _) = struct.unpack(
        "<IHHHHIIH", tail[pos : pos + 22]
    )
    if n_entries == 0xFFFF or cd_offset == 0xFFFFFFFF:
        raise NotImplementedError("zip64 archives not supported")
    cd = fetch(cd_offset, cd_size)
    members: list[ZipMember] = []
    off = 0
    for _ in range(n_entries):
        (sig, _, _, _, method, _, _, _, csize, usize, nlen, elen, clen,
         _, _, _, lfh_off) = struct.unpack("<IHHHHHHIIIHHHHHII", cd[off : off + 46])
        if sig != _CDH_SIG:
            raise ValueError("corrupt central directory")
        name = cd[off + 46 : off + 46 + nlen].decode("utf-8")
        members.append(ZipMember(name, method, csize, usize, lfh_off))
        off += 46 + nlen + elen + clen
    return members


def read_zip_member(fetch: Fetch, member: ZipMember) -> bytes:
    """Extract ONE member with two ranged reads: the local header (to
    find where the data starts — its name/extra lengths can differ from
    the central directory's) and the compressed payload; raw-deflate
    inflate for method 8."""
    lfh = fetch(member.header_offset, 30)
    sig, = struct.unpack("<I", lfh[:4])
    if sig != _LFH_SIG:
        raise ValueError(f"corrupt local header for {member.filename!r}")
    nlen, elen = struct.unpack("<HH", lfh[26:30])
    data_off = member.header_offset + 30 + nlen + elen
    raw = fetch(data_off, member.comp_size)
    if member.method == 0:
        out = raw
    elif member.method == 8:
        out = zlib.decompressobj(-15).decompress(raw)
    else:
        raise NotImplementedError(f"zip method {member.method}")
    if len(out) != member.uncomp_size:
        raise ValueError(f"bad size for {member.filename!r}")
    return out


def read_partial_zip(
    spark,
    fetch: Fetch,
    size: int,
    patterns: Iterable[str],
):
    """S8 end-to-end: glob-select members (the reference's
    ``fnmatch`` over ``rzf.infolist()``, _land_usgs.py:30-38), extract
    only those via ranged reads, and return (filename, content) rows.
    The listing + extraction is driver-side BY NATURE (one archive, one
    transport — the reference's loop is too); the payloads land in a
    DataFrame for everything downstream to stay distributed."""
    members = [
        m
        for m in list_zip_members(fetch, size)
        if any(fnmatch.fnmatch(m.filename, g) for g in patterns)
    ]
    rows = [(m.filename, read_zip_member(fetch, m)) for m in members]
    return spark.createDataFrame(rows, "filename string, content binary")


# ---------------------------------------------------------------------------
# S10 — paged STAC/CMR catalog scan


def stac_paged_items(
    fetch_json: Callable[[str], dict],
    first_url: str,
    max_pages: int = 10_000,
    max_tries: int = 3,
) -> list[dict]:
    """Walk a paged STAC catalog: collect every ``rel == "item"`` link,
    follow ``rel == "next"`` pagination, retry each page fetch up to
    ``max_tries`` times (the reference decorates with
    ``backoff.on_exception(expo, max_tries=3)``)."""
    items: list[dict] = []
    url: str | None = first_url
    pages = 0
    while url and pages < max_pages:
        last_err: Exception | None = None
        doc = None
        for _ in range(max_tries):
            try:
                doc = fetch_json(url)
                break
            except Exception as e:  # noqa: BLE001 - retry surface
                last_err = e
        if doc is None:
            raise RuntimeError(f"page fetch failed after {max_tries}: {url}") from last_err
        links = doc.get("links", [])
        items.extend(l for l in links if l.get("rel") == "item")
        url = next((l["href"] for l in links if l.get("rel") == "next"), None)
        pages += 1
    return items


def asf_safe_names(
    fetch_json: Callable[[str], dict],
    page_urls: Iterable[str],
    allowed_pols: tuple[str, ...] = ("SDV", "SDH", "SSV", "SSH"),
) -> list[str]:
    """The reference's granule-name filter over per-date pages
    (download_asf_granule_list.py:48-82): strip ``-SLC``, keep IW beam
    mode (chars 4:6), keep the allowed polarizations (chars 13:16 — the
    reference's comment says "only save" these; its ``in … continue``
    test inverts that, which we take as the typo it reads as). Pages
    that fail even after retries are skipped, like the reference's
    HTTPError branch."""
    names: list[str] = []
    for url in page_urls:
        try:
            items = stac_paged_items(fetch_json, url)
        except RuntimeError:
            continue
        for item in items:
            s = item.get("title", "").replace("-SLC", "")
            if s[4:6] != "IW":
                continue
            if s[13:16] not in allowed_pols:
                continue
            names.append(s)
    return names


def dir_json_fetcher(base_dir: str) -> Callable[[str], dict]:
    """Test transport: resolve page 'URLs' against a local directory of
    JSON documents."""
    import json
    import os

    def fetch_json(url: str) -> dict:
        name = url.rsplit("/", 1)[-1]
        with open(os.path.join(base_dir, name)) as f:
            return json.load(f)

    return fetch_json
