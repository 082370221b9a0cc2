from frontera_spark.functions.fingerprint import (  # noqa: F401
    crc32_signed,
    fingerprint64_col,
    hostname_local_fingerprint,
    hostname_local_fingerprint64,
    md5_hex,
    sha1_hex,
)
from frontera_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    canonicalize_urls_udf,
    parse_domain_info,
    parse_domains_udf,
)
