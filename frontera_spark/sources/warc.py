"""WARC (ISO 28500 / WARC 1.0) archival sink + reader.

The crawl-archive surface frontera itself never had but every production
frontier feeds: Heritrix writes WARC, Common Crawl publishes WARC, and a
spider-log consumer that cannot emit WARC cannot hand fetched payloads to
the rest of the archival ecosystem. Reference semantics: the public
WARC 1.0 spec (ISO 28500; warc-specifications.iipc.github.io) — record
framing ``header CRLF CRLF block CRLF CRLF``, named headers, per-record
gzip members for ``.warc.gz`` (each record its own gzip member, the layout
Common Crawl uses so readers can seek to a record offset and inflate one
member).

Spark-first split:

- :func:`warc_record` — record BYTES as a pure-codegen column expression
  (string concat + UTF-8 encode + binary concat; no UDF, no shuffle).
  Record IDs are deterministic (``<urn:md5:md5(target-uri)>``) so the same
  crawl always archives byte-identically — the property the snapshot
  layer's replay/resume story needs (a re-run iteration overwrites its
  part files with identical bytes).
- :func:`write_warc` — one ``part-{pid:05d}.warc.gz`` per partition via a
  single ``mapInPandas`` pass (embarrassingly parallel, no shuffle; at
  cluster scale each executor streams its partition straight to shared
  storage). Every part file opens with a ``warcinfo`` record (spec §6.2).
- :func:`read_warc` — ``binaryFile`` scan + per-file record parse back to
  rows. Per-record gzip members mean a 100 TB archive splits at member
  boundaries; the in-sandbox reader inflates whole part files (they are
  one partition each by construction).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION = "WARC/1.0"
# deterministic archive timestamp: callers pass the crawl's logical clock
# (iteration-derived), tests use this fixed epoch — WARC-Date is required
# by spec but wall-clock stamps would break replay determinism
WARC_TEST_DATE = "2026-01-01T00:00:00Z"
_CRLF = "\r\n"

WARC_READ_SCHEMA = (
    "source_file string, warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, content_length long, payload binary, "
    "payload_digest string, refers_to string, profile string"
)

# WARC 1.0 §6.7.2: a ``revisit`` record with this profile archives a page
# whose payload digest matches an earlier capture WITHOUT storing the body
# again — the Heritrix/Common Crawl mirror-dedup convention
REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def warc_record(
    url: Column,
    payload: Column,
    content_type: Column,
    date: Column,
    warc_type: str = "response",
    record_id: Column | None = None,
) -> Column:
    """Full WARC record bytes (header + block + trailing CRLF CRLF) as one
    binary column — pure codegen, priced per byte moved, nothing leaves the
    JVM. ``payload`` must be binary; ``Content-Length`` is its exact octet
    count (spec: length of the block, not the record)."""
    if record_id is None:
        record_id = F.concat(F.lit("<urn:md5:"), F.md5(url), F.lit(">"))
    header = F.concat(
        F.lit(WARC_VERSION + _CRLF),
        F.lit("WARC-Type: " + warc_type + _CRLF),
        F.lit("WARC-Record-ID: "), record_id, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("Content-Type: "), content_type, F.lit(_CRLF),
        F.lit("Content-Length: "), F.length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    return F.concat(F.encode(header, "UTF-8"), payload, F.encode(F.lit(_CRLF + _CRLF), "UTF-8"))


def warc_revisit_record(
    url: Column,
    refers_to: Column,
    digest: Column,
    date: Column,
) -> Column:
    """A ``revisit`` record (identical-payload-digest profile): archives a
    duplicate capture as a REFERENCE — refers-to URI + payload digest,
    Content-Length 0 — instead of storing the body twice. Pure codegen,
    like :func:`warc_record`. ``digest`` is the labelled digest of the
    referred payload (``sha1:<hex>`` — pair with ``F.sha1(bytes)``)."""
    record_id = F.concat(F.lit("<urn:md5:"), F.md5(url), F.lit(">"))
    header = F.concat(
        F.lit(WARC_VERSION + _CRLF),
        F.lit("WARC-Type: revisit" + _CRLF),
        F.lit("WARC-Record-ID: "), record_id, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Profile: " + REVISIT_PROFILE + _CRLF),
        F.lit("WARC-Refers-To-Target-URI: "), refers_to, F.lit(_CRLF),
        F.lit("WARC-Payload-Digest: "), digest, F.lit(_CRLF),
        F.lit("Content-Length: 0" + _CRLF + _CRLF),
    )
    return F.concat(F.encode(header, "UTF-8"), F.encode(F.lit(_CRLF + _CRLF), "UTF-8"))


def _warcinfo_bytes(date: str, part: int) -> bytes:
    """The file-opening ``warcinfo`` record (spec §6.2): software + format,
    deterministic per part file."""
    block = (
        "software: frontera-spark" + _CRLF + "format: WARC File Format 1.0" + _CRLF
    ).encode()
    header = (
        f"{WARC_VERSION}{_CRLF}"
        f"WARC-Type: warcinfo{_CRLF}"
        f"WARC-Record-ID: <urn:frontera-spark:warcinfo:part-{part:05d}>{_CRLF}"
        f"WARC-Date: {date}{_CRLF}"
        f"Content-Type: application/warc-fields{_CRLF}"
        f"Content-Length: {len(block)}{_CRLF}{_CRLF}"
    ).encode()
    return header + block + b"\r\n\r\n"


def _gzip_member(raw: bytes) -> bytes:
    """One gzip member per record, mtime pinned to 0 so archive bytes are a
    pure function of the crawl content (replay-idempotent part files)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) — the canonical CDX
    index key (public pywb/OpenWayback convention): reversed
    comma-separated host + ``)`` + path?query, scheme and port dropped,
    lowercased. ``https://img.Example.test/p?q=1`` →
    ``test,example,img)/p?q=1``."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    host = parts.netloc.partition(":")[0].lower()
    key = ",".join(reversed(host.split("."))) + ")" + (parts.path or "/")
    if parts.query:
        key += "?" + parts.query
    return key.lower()


def _payload_digest(payload: bytes) -> str:
    """``sha1:<hex>`` — the labelled-digest form (spec §5.8 allows any
    encoding as long as it is labelled). Hex rather than the Common Crawl
    base32 so the Python CDX digest and the codegen ``F.sha1`` column the
    dedup path groups on are the SAME string — one digest vocabulary
    across index, revisit records, and the dedup join."""
    import hashlib

    return "sha1:" + hashlib.sha1(payload).hexdigest()


def write_warc(
    records: DataFrame,
    path: str,
    record_col: str = "record",
    date: str = WARC_TEST_DATE,
    compress: bool = True,
    index: bool = False,
) -> pd.DataFrame:
    """Write one ``part-{pid:05d}.warc[.gz]`` per partition of ``records``
    (single mapInPandas pass, no shuffle; partition id from TaskContext so a
    re-run overwrites the same files with the same bytes). Returns the
    per-part manifest (part, n_records, n_bytes, file) as a pandas frame —
    O(partitions), the write itself never moves rows to the driver.

    ``index=True`` additionally writes a ``part-{pid:05d}.cdxj`` sidecar
    per part (pywb's CDXJ layout: SURT key, 14-digit timestamp, JSON blob
    with url/digest/offset/length/filename), lines sorted by key — the
    random-access map :func:`fetch_record` serves one gzip member from.
    Offsets/lengths are MEMBER offsets, so a reader seeks + inflates one
    record without touching the rest of the file — the property that lets
    a 100 TB archive serve point lookups."""
    os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}{ext}")
        base = os.path.basename(fname)
        n = 0
        idx_lines = []
        tmp = fname + ".inprogress"
        with open(tmp, "wb") as fh:
            info = _warcinfo_bytes(date, pid)
            fh.write(_gzip_member(info) if compress else info)
            for pdf in batches:
                for raw in pdf[record_col]:
                    raw = bytes(raw)
                    member = _gzip_member(raw) if compress else raw
                    if index:
                        rec = parse_warc_bytes(raw)[0]
                        ts = "".join(c for c in rec["warc_date"] if c.isdigit())
                        idx_lines.append(
                            surt_key(rec["target_uri"])
                            + " "
                            + ts
                            + " "
                            + json.dumps(
                                {
                                    "url": rec["target_uri"],
                                    "mime": rec["content_type"],
                                    # revisit records carry the referred
                                    # payload's digest in their own header
                                    "digest": rec["payload_digest"]
                                    or _payload_digest(rec["payload"]),
                                    "offset": fh.tell(),
                                    "length": len(member),
                                    "filename": base,
                                },
                                sort_keys=True,
                            )
                        )
                    fh.write(member)
                    n += 1
        os.replace(tmp, fname)  # atomic publish, crash-safe partial files
        if index:
            itmp = os.path.join(path, f"part-{pid:05d}.cdxj.inprogress")
            with open(itmp, "w") as ih:
                ih.write("\n".join(sorted(idx_lines)) + ("\n" if idx_lines else ""))
            os.replace(itmp, os.path.join(path, f"part-{pid:05d}.cdxj"))
        yield pd.DataFrame(
            {
                "part": pd.Series([pid], dtype="int32"),
                "n_records": pd.Series([n], dtype="int64"),
                "n_bytes": pd.Series([os.path.getsize(fname)], dtype="int64"),
                "file": [fname],
            }
        )

    manifest = (
        records.select(record_col)
        .mapInPandas(_write, "part int, n_records long, n_bytes long, file string")
        .toPandas()
    )
    return manifest.sort_values("part").reset_index(drop=True)


CDX_SCHEMA = (
    "surt string, timestamp string, url string, mime string, digest string, "
    "offset long, length long, filename string"
)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """The archive's index as a DataFrame (one task per sidecar): join a
    URL batch against it to locate records, then :func:`fetch_record` the
    hits — the distributed point-lookup path into a WARC archive."""
    import json

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in CDX_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for line in bytes(content).decode().splitlines():
                    if not line.strip():
                        continue
                    key, ts, blob = line.split(" ", 2)
                    d = json.loads(blob)
                    rows.append(
                        {
                            "surt": key,
                            "timestamp": ts,
                            "url": d["url"],
                            "mime": d.get("mime", ""),
                            "digest": d.get("digest", ""),
                            "offset": d["offset"],
                            "length": d["length"],
                            "filename": d["filename"],
                        }
                    )
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "part-*.cdxj")
    ).select("content")
    return files.mapInPandas(_parse, CDX_SCHEMA)


def fetch_record(archive_dir: str, filename: str, offset: int, length: int) -> dict:
    """Random access: seek to a CDX entry's member, inflate that one
    member, parse the single record — O(record), independent of archive
    size. Plain ``.warc`` members are raw record bytes at the same
    offsets."""
    with open(os.path.join(archive_dir, filename), "rb") as fh:
        fh.seek(offset)
        member = fh.read(length)
    raw = gzip.decompress(member) if filename.endswith(".gz") else member
    recs = parse_warc_bytes(raw, filename)
    if len(recs) != 1:
        raise ValueError(f"{filename}@{offset}+{length}: expected 1 record, got {len(recs)}")
    return recs[0]


def parse_warc_bytes(raw: bytes, source: str = "") -> list[dict]:
    """Parse a (fully inflated) WARC stream into record dicts — the shared
    scanner for :func:`read_warc` and tests. Tolerates exactly the framing
    :func:`warc_record` emits plus any spec-conformant named headers."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"{source}: unterminated WARC header at offset {pos}")
        lines = raw[pos:head_end].decode("utf-8").split(_CRLF)
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"{source}: bad record magic {lines[0]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        block_start = head_end + 4
        out.append(
            {
                "source_file": source,
                "warc_type": fields.get("warc-type", ""),
                "record_id": fields.get("warc-record-id", ""),
                "warc_date": fields.get("warc-date", ""),
                "target_uri": fields.get("warc-target-uri", ""),
                "content_type": fields.get("content-type", ""),
                "content_length": clen,
                "payload": raw[block_start : block_start + clen],
                "payload_digest": fields.get("warc-payload-digest", ""),
                "refers_to": fields.get("warc-refers-to-target-uri", ""),
                "profile": fields.get("warc-profile", ""),
            }
        )
        pos = block_start + clen
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Archive scan: one task per part file (binaryFile source), inflate +
    parse in-executor, rows out. ``warcinfo`` records are included — filter
    on ``warc_type`` to drop them."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if fpath.endswith(".gz"):
                    raw = gzip.decompress(raw)  # multi-member streams supported
                rows.extend(parse_warc_bytes(raw, os.path.basename(fpath)))
            cols = [c.split()[0] for c in WARC_READ_SCHEMA.split(", ")]
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "part-*.warc*")
    ).select("path", "content")
    return files.mapInPandas(_parse, WARC_READ_SCHEMA)
