"""URL normalization (SURVEY Table B: north-rule scalar additions).

Canonical form for vertex identity: scheme+host lowercased, default ports
stripped, fragment dropped, duplicate slashes collapsed in the path,
trailing slash trimmed (except root). Two flavors:

* ``normalize_url_py``  — scalar (stdlib; tests / link extractor)
* ``normalize_url_col`` — pure JVM column expression (the hot path at
  10^12 rows: whole-stage codegen, no Python)

Both implement the SAME spec; a test pins them equal on a URL corpus.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_url_py(url: str) -> str:
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    return urlunsplit((scheme, netloc, path or "/", parts.query, ""))


def normalize_url_col(col: str | Column) -> Column:
    """JVM-side equivalent of normalize_url_py for well-formed http(s) URLs
    without userinfo (the web-crawl shape). Regex column ops only."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    raw_auth = F.lower(F.regexp_extract(c, r"^[^:]+://([^/?#]*)", 1))
    authority = (
        F.when(scheme == "http", F.regexp_replace(raw_auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(raw_auth, r":443$", ""))
        .otherwise(raw_auth)
    )
    path = F.regexp_extract(c, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    return F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
