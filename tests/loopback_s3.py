"""Loopback S3-compatible HTTP server (stdlib) for wire-testing
merlin_tpu.data.storage's stdlib client path (VERDICT r4 #8).

Speaks just enough S3 REST for the data path: GetObject (with Range) and
ListObjectsV2 (XML, 2-keys-per-page pagination via continuation-token).
Every request's SigV4 signature is verified by RE-DERIVING the canonical
request from the raw wire data (request line, query string, received
header values) — independently of the client's own canonical-request
builder — so a client that signs one thing and sends another fails here
the way it would against a real store.
"""

from __future__ import annotations

import hashlib
import hmac
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


class LoopbackS3Server:
    """store: {(bucket, key): bytes}. Credentials checked on every request."""

    PAGE = 2  # ListObjectsV2 keys per page — forces pagination in tests

    def __init__(self, store, access_key: str, secret_key: str,
                 session_token: str | None = None):
        self.store = store
        self.access_key = access_key
        self.secret_key = secret_key
        self.session_token = session_token
        self.requests = []  # (method, path, dict(query)) audit trail
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                try:
                    outer._handle(self)
                except BrokenPipeError:
                    pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    @property
    def endpoint_url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._httpd.shutdown()
        self._httpd.server_close()

    # -- SigV4 verification (independent re-derivation) -------------------

    def _verify(self, h) -> str | None:
        """Returns an error string, or None when the signature matches."""
        auth = h.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            return "missing/invalid Authorization algorithm"
        fields = dict(p.strip().split("=", 1)
                      for p in auth[len("AWS4-HMAC-SHA256 "):].split(","))
        cred = fields.get("Credential", "")
        ak, _, scope = cred.partition("/")
        if ak != self.access_key:
            return f"unknown access key {ak!r}"
        date, region, service, term = scope.split("/")
        if (service, term) != ("s3", "aws4_request"):
            return f"bad scope {scope!r}"
        signed = fields.get("SignedHeaders", "").split(";")
        if not {"host", "x-amz-date", "x-amz-content-sha256"} <= set(signed):
            return f"required headers not signed: {signed}"
        if self.session_token and "x-amz-security-token" not in signed:
            return "session token present but not signed"
        if (self.session_token
                and h.headers.get("x-amz-security-token")
                != self.session_token):
            return "wrong session token"
        amz_date = h.headers.get("x-amz-date", "")
        if not amz_date.startswith(date):
            return f"x-amz-date {amz_date!r} outside credential date {date!r}"

        raw_path, _, raw_query = h.path.partition("?")
        # canonical query: re-encode each decoded pair, sorted
        pairs = urllib.parse.parse_qsl(raw_query, keep_blank_values=True)
        enc = lambda s: urllib.parse.quote(s, safe="-._~")
        cqs = "&".join(f"{enc(k)}={enc(v)}" for k, v in sorted(pairs))
        canon_headers = "".join(
            f"{name}:{' '.join((h.headers.get(name) or '').split())}\n"
            for name in sorted(signed))
        creq = "\n".join([
            "GET", raw_path, cqs, canon_headers, ";".join(sorted(signed)),
            h.headers.get("x-amz-content-sha256", "")])
        sts = "\n".join([
            "AWS4-HMAC-SHA256", amz_date,
            f"{date}/{region}/s3/aws4_request",
            hashlib.sha256(creq.encode()).hexdigest()])
        k = _hmac(("AWS4" + self.secret_key).encode(), date)
        for part in (region, "s3", "aws4_request"):
            k = _hmac(k, part)
        expect = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
        if not hmac.compare_digest(expect, fields.get("Signature", "")):
            return "signature mismatch"
        return None

    # -- request handling --------------------------------------------------

    def _handle(self, h):
        raw_path, _, raw_query = h.path.partition("?")
        query = dict(urllib.parse.parse_qsl(raw_query,
                                            keep_blank_values=True))
        path = urllib.parse.unquote(raw_path)
        self.requests.append(("GET", path, dict(query)))
        err = self._verify(h)
        if err:
            self._send(h, 403, f"<Error><Code>SignatureDoesNotMatch</Code>"
                               f"<Message>{err}</Message></Error>".encode())
            return
        parts = path.lstrip("/").split("/", 1)
        bucket = parts[0]
        if query.get("list-type") == "2":
            self._list(h, bucket, query)
            return
        key = parts[1] if len(parts) > 1 else ""
        data = self.store.get((bucket, key))
        if data is None:
            self._send(h, 404, b"<Error><Code>NoSuchKey</Code></Error>")
            return
        rng = h.headers.get("Range")
        if rng and rng.startswith("bytes="):
            lo, _, hi = rng[len("bytes="):].partition("-")
            lo = int(lo or 0)
            hi = int(hi) if hi else len(data) - 1
            part = data[lo:hi + 1]
            h.send_response(206)
            h.send_header("Content-Range",
                          f"bytes {lo}-{lo + len(part) - 1}/{len(data)}")
            h.send_header("Content-Length", str(len(part)))
            h.end_headers()
            h.wfile.write(part)
            return
        self._send(h, 200, data)

    def _list(self, h, bucket, query):
        prefix = query.get("prefix", "")
        keys = sorted(k for (b, k) in self.store
                      if b == bucket and k.startswith(prefix))
        start = int(query.get("continuation-token") or 0)
        page = keys[start:start + self.PAGE]
        truncated = start + self.PAGE < len(keys)
        items = "".join(
            f"<Contents><Key>{k}</Key>"
            f"<Size>{len(self.store[(bucket, k)])}</Size></Contents>"
            for k in page)
        nxt = (f"<NextContinuationToken>{start + self.PAGE}"
               f"</NextContinuationToken>" if truncated else "")
        body = (f'<?xml version="1.0" encoding="UTF-8"?>'
                f'<ListBucketResult '
                f'xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
                f"<Name>{bucket}</Name><Prefix>{prefix}</Prefix>"
                f"<KeyCount>{len(page)}</KeyCount>"
                f"<IsTruncated>{str(truncated).lower()}</IsTruncated>"
                f"{items}{nxt}</ListBucketResult>").encode()
        self._send(h, 200, body)

    @staticmethod
    def _send(h, status, body: bytes):
        h.send_response(status)
        h.send_header("Content-Type", "application/xml")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)
