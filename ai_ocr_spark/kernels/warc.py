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

from collections.abc import Iterable, Iterator

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


# Incremental-parse bounds. _HDR_MAX: a record whose header block never
# closes (no CRLFCRLF within 64 KiB) is hostile, not buffering-lag.
# _REC_MAX: real CC response records are <~1 MiB; a 64 MiB+ payload is a
# bomb — refusing it keeps streaming-parse memory bounded per task.
# _TAIL_KEEP: bytes kept across chunk boundaries so a "\r\nWARC/" magic
# straddling two chunks is never missed.
_HDR_MAX = 64 * 1024
_REC_MAX = 64 * 1024 * 1024
_TAIL_KEEP = 8


_RESPONSE_ONLY = frozenset({"response"})


def _parse_core(
    stream: bytes,
    final: bool,
    max_records: int | None = None,
    max_record_bytes: int | None = _REC_MAX,
    want_types: frozenset[str] = _RESPONSE_ONLY,
) -> tuple[list[dict], int, str | None]:
    """Parse COMPLETE records from a stream prefix.

    Returns (records, consumed_bytes, fatal_reason). With final=False
    an incomplete trailing record is left unconsumed (the caller keeps
    stream[consumed:] and retries with more bytes); with final=True it
    is discarded (best effort at EOF). fatal_reason is non-None for
    unrecoverable malformation (negative/garbage/oversized
    Content-Length, unterminated header block) — the scan stops there
    so a hostile record can neither wedge the cursor in a loop nor
    force unbounded buffering.
    """
    out: list[dict] = []
    i, n = 0, len(stream)
    while i < n:
        if not stream.startswith(b"WARC/", i):
            nxt = stream.find(b"\r\nWARC/", i)
            if nxt < 0:
                i = n if final else max(i, n - _TAIL_KEEP)
                break
            i = nxt + 2
            continue
        hdr_end = stream.find(CRLF + CRLF, i)
        if hdr_end < 0:
            if n - i > _HDR_MAX:
                return out, i, "unterminated header block"
            if final:
                i = n
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
            return out, i, "bad content-length"
        if clen < 0:
            # A negative Content-Length would move the cursor BACKWARDS
            # (i = hdr_end + 4 + clen), and the \r\nWARC/ rescan would
            # re-find the same record forever — a hostile/corrupt record
            # must not wedge an executor in an infinite loop.
            return out, i, "negative content-length"
        if max_record_bytes is not None and clen > max_record_bytes:
            return out, i, "record exceeds size cap"
        if hdr_end + 4 + clen > n:
            if not final:
                break  # wait for more bytes; record starts at i
            i = n
            break  # truncated at EOF: best effort, drop it
        payload = stream[hdr_end + 4 : hdr_end + 4 + clen]
        i = hdr_end + 4 + clen
        # skip the record-terminating blank lines
        while stream.startswith(CRLF, i):
            i += 2
        rtype = headers.get("warc-type")
        if rtype in want_types:
            out.append(
                {
                    "url": headers.get("warc-target-uri", ""),
                    "date": headers.get("warc-date", ""),
                    # response payloads are HTTP messages (body after the
                    # header block); conversion/WET payloads ARE the body
                    "body": _http_body(payload) if rtype == "response" else payload,
                }
            )
            if max_records is not None and len(out) >= max_records:
                return out, i, None
    return out, i, None


def parse_warc(stream: bytes, first_only: bool = False) -> list[dict]:
    """WARC stream -> [{url, date, body}] for every response record.
    Malformed records end the scan (best effort, never raises).
    first_only stops after the first response record (the payload-unwrap
    path needs exactly one — scanning a whole CC file per row would be
    O(stream) wasted work)."""
    recs, _, _ = _parse_core(
        stream,
        final=True,
        max_records=1 if first_only else None,
        # the in-memory payload path is already size-capped upstream
        # (transport unwrap / MAX_PAYLOAD_BYTES); no per-record cap here
        # so pre-cap callers keep their exact behavior
        max_record_bytes=None,
    )
    return recs


def iter_warc_stream(chunks: Iterable[bytes]) -> Iterator[dict]:
    """Incrementally parse an iterable of byte chunks into response
    records — the file-source path for real Common Crawl segments,
    which inflate to several GB: memory stays bounded by
    (chunk size + largest record), never the whole inflated file.

    Yields record dicts; a final {"_error": reason} dict is yielded
    instead of silently stopping when the stream is unrecoverably
    malformed, so callers can surface the failure as a diagnostic row.
    """
    buf = bytearray()
    for chunk in chunks:
        buf += chunk
        recs, consumed, fatal = _parse_core(bytes(buf), final=False)
        yield from recs
        if fatal is not None:
            yield {"_error": fatal}
            return
        del buf[:consumed]
    recs, _, fatal = _parse_core(bytes(buf), final=True)
    yield from recs
    if fatal is not None:
        yield {"_error": fatal}


def first_response_body(stream: bytes) -> bytes:
    """Body of the first response record ('' when none) — the payload
    unwrap used by the transparent WARC branch in kernels.oracle.
    Stops scanning at the first response record."""
    recs = parse_warc(stream, first_only=True)
    return recs[0]["body"] if recs else b""


def parse_wet(stream: bytes) -> list[dict]:
    """WET stream -> [{url, date, text}] for every `conversion` record
    (the WARC record type WET extracts ship as — one text/plain payload
    per source page). Same never-raise contract as parse_warc; payload
    bytes are the extracted text verbatim, decoded as the UTF-8 the
    writer emitted (replace, not raise, on alien bytes)."""
    recs, _, _ = _parse_core(
        stream,
        final=True,
        max_record_bytes=None,
        want_types=frozenset({"conversion"}),
    )
    return [
        {
            "url": r["url"],
            "date": r["date"],
            "text": r["body"].decode("utf-8", "replace"),
        }
        for r in recs
    ]
