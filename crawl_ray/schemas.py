"""Arrow schemas for every logical table in the engine (SURVEY.md §1.2).

The reference is row-oriented (one in-flight ``Request``/``Response``
struct per job, ``request.go:13-32``, ``response.go:15-20``); here every
per-record field becomes a column of an Arrow table flowing through Ray
Data blocks.

Design choices:

* ``url.Values`` fields (form/query/cookies) and string maps
  (headers/metadata) are stored as **JSON-encoded strings** ("" =
  absent).  Arrow map types survive shuffles poorly and none of these
  fields is filtered on, so an opaque payload column is both faster and
  simpler; they are decoded only inside the fetch/construct kernel.
* ``callbacks`` stays ``list<string>`` — the dispatch stage routes on it.
* ``seq_path`` is the deterministic schedule path (SURVEY.md §3.4): a
  fixed 4-bytes-per-level big-endian index path.  Equal-depth paths
  compare lexicographically in exact FIFO schedule order, giving a
  total order per round without any global dense-rank pass.
"""

from __future__ import annotations

import pyarrow as pa

# the synthetic web (BASELINE.json input_hint)
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# the Request row (request.go:13-32) + scheduling state (SURVEY.md §1.2)
FRONTIER_FIELDS = [
    pa.field("url", pa.string()),
    pa.field("req_url", pa.string()),  # as-scheduled URL ("" until canonicalize);
                                       # error rows report THIS (request_error.go
                                       # wraps the raw Request, not the resolved URL)
    pa.field("url_hash", pa.uint64()),
    pa.field("host", pa.string()),
    pa.field("method", pa.string()),
    pa.field("referer", pa.string()),
    pa.field("form", pa.string()),      # JSON dict[str, list[str]], "" = absent
    pa.field("query", pa.string()),     # JSON dict[str, list[str]], "" = absent
    pa.field("cookies", pa.string()),   # JSON dict[str, list[str]], "" = absent
    pa.field("headers", pa.string()),   # JSON dict[str, str], "" = absent
    pa.field("raw", pa.bool_()),
    pa.field("callbacks", pa.list_(pa.string())),
    pa.field("depth", pa.int32()),
    pa.field("seq_path", pa.binary()),
    pa.field("priority", pa.float32()),
    pa.field("deadline", pa.timestamp("us")),  # nullable
    pa.field("metadata", pa.string()),  # JSON dict[str, str], "" = absent
]
FRONTIER_SCHEMA = pa.schema(FRONTIER_FIELDS)

# fetch-stage output = frontier columns + page join columns (§1.2:
# "Response is the fetch stage output batch")
FETCH_EXTRA_FIELDS = [
    pa.field("status", pa.int32()),
    pa.field("html", pa.binary()),
    pa.field("fetch_ts", pa.timestamp("us")),
]
RESPONSE_SCHEMA = pa.schema(FRONTIER_FIELDS + FETCH_EXTRA_FIELDS)

# handler extraction output
RECORDS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("handler", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("seq_path", pa.binary()),
        pa.field("fields", pa.string()),  # JSON dict[str, str]
    ]
)

# errors side-output (RequestError, request_error.go:6-14 + error kind)
ERRORS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("method", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("seq_path", pa.binary()),
        pa.field("error_kind", pa.string()),
        pa.field("error", pa.string()),
    ]
)

# per-round, per-stage metrics (SURVEY.md §2.6 A1)
METRICS_SCHEMA = pa.schema(
    [
        pa.field("round", pa.int32()),
        pa.field("stage", pa.string()),
        pa.field("metric", pa.string()),
        pa.field("value", pa.int64()),
    ]
)

SEQ_LEVEL_BYTES = 4  # 4-byte big-endian per level → out-degree cap 2^32-1


def seq_child(parent: bytes, index: int) -> bytes:
    """Child schedule path: parent path + 4-byte big-endian link index."""
    return parent + index.to_bytes(SEQ_LEVEL_BYTES, "big")


def seq_root(index: int) -> bytes:
    """Seed schedule path (round-0 injection order)."""
    return index.to_bytes(SEQ_LEVEL_BYTES, "big")


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
