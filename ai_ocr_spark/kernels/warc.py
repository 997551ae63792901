"""Minimal WARC/1.0 reader + emitter (stdlib only) — the container
Common Crawl actually ships. Same contract as kernels.pdf/xlsx: the
emitter produces the fixture subset, the parser round-trips it and
never raises on malformed input.

Scope: uncompressed WARC streams (whole-file gzip is handled one level
up by the transparent gzip transport in kernels.oracle) holding
`WARC-Type: response` records whose payload is an HTTP/1.x response;
the page body is everything after the HTTP header block. Other record
types (warcinfo, request, metadata) are skipped, exactly like a crawl
pipeline does.
"""

from __future__ import annotations

CRLF = b"\r\n"


def emit_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    """[(url, iso_date, body_bytes)] -> WARC/1.0 stream with one
    response record per page (HTTP 200 wrapper, text/html)."""
    out = bytearray()
    for url, date, body in records:
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html" + CRLF
            + b"Content-Length: " + str(len(body)).encode() + CRLF
            + CRLF
            + body
        )
        headers = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + b"WARC-Target-URI: " + url.encode() + CRLF
            + b"WARC-Date: " + date.encode() + CRLF
            + b"Content-Type: application/http;msgtype=response" + CRLF
            + b"Content-Length: " + str(len(http)).encode() + CRLF
        )
        out += headers + CRLF + http + CRLF + CRLF
    return bytes(out)


def _http_body(payload: bytes) -> bytes:
    """HTTP response bytes -> body (after the header block); a payload
    with no header/body separator is returned whole (lenient, like
    real-world WARC consumers)."""
    sep = payload.find(CRLF + CRLF)
    if sep < 0:
        return payload
    return payload[sep + 4 :]


def parse_warc(stream: bytes, first_only: bool = False) -> list[dict]:
    """WARC stream -> [{url, date, body}] for every response record.
    Malformed records end the scan (best effort, never raises).
    first_only stops after the first response record (the payload-unwrap
    path needs exactly one — scanning a whole CC file per row would be
    O(stream) wasted work)."""
    out: list[dict] = []
    i, n = 0, len(stream)
    while i < n:
        if not stream.startswith(b"WARC/", i):
            nxt = stream.find(b"\r\nWARC/", i)
            if nxt < 0:
                break
            i = nxt + 2
            continue
        hdr_end = stream.find(CRLF + CRLF, i)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in stream[i:hdr_end].split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                # WARC headers are UTF-8 (the emitter writes UTF-8 URIs;
                # latin-1 here would mojibake every non-ASCII IRI)
                headers[k.strip().decode("utf-8", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = stream[hdr_end + 4 : hdr_end + 4 + clen]
        if headers.get("warc-type") == "response":
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "date": headers.get("warc-date", ""),
                    "body": _http_body(payload),
                }
            )
            if first_only:
                return out
        i = hdr_end + 4 + clen
        # skip the record-terminating blank lines
        while stream.startswith(CRLF, i):
            i += 2
    return out


def first_response_body(stream: bytes) -> bytes:
    """Body of the first response record ('' when none) — the payload
    unwrap used by the transparent WARC branch in kernels.oracle.
    Stops scanning at the first response record."""
    recs = parse_warc(stream, first_only=True)
    return recs[0]["body"] if recs else b""
