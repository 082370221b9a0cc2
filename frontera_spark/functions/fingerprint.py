"""URL fingerprint functions.

Reference: frontera/utils/fingerprint.py:~10-45 — ``sha1(key)`` (default URL
fingerprint, 40-char hex), ``md5(key)``, and ``hostname_local_fingerprint``
(pack(">i16s", crc32(host), md5(rest)) → 20-byte hex giving HBase key locality
per host); frontera/utils/misc.py:~10-20 ``get_crc32`` (SIGNED zlib crc32).

Engine-side identity is a 64-bit fingerprint (BASELINE input_hint phash:int64
style): ``F.xxhash64(canonical_url)`` — JVM-side, collision-safe at 10^10 URLs
only probabilistically (~2.7e-3 expected collisions per 10^10 via birthday
bound ≈ n²/2^65 ≈ 2.7); the exact-seen-set joins key on fingerprint AND the
engine keeps canonical_url alongside, so a collision can be detected/broken by
the url column. Parity helpers keep the exact reference hex formats for
golden-vector tests.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha1_hex(key: str) -> str:
    """frontera/utils/fingerprint.py:~10-18 — hex sha1 of utf8 bytes."""
    return hashlib.sha1(key.encode("utf-8", "ignore")).hexdigest()


def md5_hex(key: str) -> str:
    """frontera/utils/fingerprint.py:~18-25."""
    return hashlib.md5(key.encode("utf-8", "ignore")).hexdigest()


def crc32_signed(name: str | bytes) -> int:
    """frontera/utils/misc.py:~10-20 — SIGNED zlib crc32 (py2 semantics)."""
    data = name.encode("utf-8", "ignore") if isinstance(name, str) else name
    value = zlib.crc32(data)  # py3: unsigned
    return value - 0x1_0000_0000 if value >= 0x8000_0000 else value


def hostname_local_fingerprint(url: str) -> str:
    """frontera/utils/fingerprint.py:~25-45 — 20-byte hex, host-prefixed.

    pack(">i16s", crc32(host), md5(path+';'+params+query+fragment).digest())
    Groups a host's URLs contiguously under a sorted key (HBase locality).
    """
    from urllib.parse import urlparse

    p = urlparse(url)
    host = p.netloc or url
    rest = ";".join([p.path, p.params, p.query, p.fragment])
    packed = struct.pack(">i16s", crc32_signed(host), hashlib.md5(rest.encode("utf-8", "ignore")).digest())
    return packed.hex()


def hostname_local_fingerprint64(url: str) -> int:
    """64-bit variant (documented deviation, SURVEY.md §2.8 F3):
    (crc32(host) << 32) | (first 4 bytes of md5(rest)) — same host-prefix
    locality property, int64-sized for columnar joins."""
    from urllib.parse import urlparse

    p = urlparse(url)
    host = p.netloc or url
    rest = ";".join([p.path, p.params, p.query, p.fragment])
    hi = zlib.crc32(host.encode("utf-8", "ignore")) & 0xFFFF_FFFF
    lo = int.from_bytes(hashlib.md5(rest.encode("utf-8", "ignore")).digest()[:4], "big")
    v = (hi << 32) | lo
    return v - 0x1_0000_0000_0000_0000 if v >= 0x8000_0000_0000_0000 else v


# ---------------------------------------------------------------- Spark side


def fingerprint64_col(canonical_url: Column) -> Column:
    """Engine identity hash: JVM-side xxhash64 over the canonical URL."""
    return F.xxhash64(canonical_url)


def crc32_signed_col(name: Column) -> Column:
    """Signed crc32 as a Spark column (F.crc32 returns unsigned bigint).

    Exact parity with frontera's get_crc32: ((u + 2^31) % 2^32) - 2^31.
    """
    u = F.crc32(F.encode(name, "utf-8"))
    return ((u + F.lit(2**31)) % F.lit(2**32) - F.lit(2**31)).cast("int")


def partition_id_col(host: Column, partitions: int) -> Column:
    """Crc32NamePartitioner parity (frontera/contrib/backends/partitioners.py:~1-25):
    partition = crc32(host) % n, computed on the SIGNED value with Python's
    floored modulo (always non-negative for n>0)."""
    return F.pmod(crc32_signed_col(host), F.lit(partitions)).cast("int")


def fingerprint_partition_id_col(fingerprint: Column, partitions: int) -> Column:
    """FingerprintPartitioner parity (partitioners.py:~25-40): spider-log
    partitioning by URL fingerprint."""
    return F.pmod(fingerprint, F.lit(partitions)).cast("int")
