"""Serving protocol shared by controller/worker/clients.

Wire format matches the reference (engine/serve/*): JSON request bodies,
``\\0``-delimited JSON chunks for streaming generate, error codes 1/2/3 for
worker/absent/timeout failures (controller.py:193-215), heartbeats every
15s with 30s controller-side expiry (constants.py:1-2).
"""

from __future__ import annotations

import dataclasses
import enum
import json
from typing import Dict, Iterator, Optional

from merlin_tpu.utils.constants import (
    CONTROLLER_HEART_BEAT_EXPIRATION, WORKER_HEART_BEAT_INTERVAL)

DELIMITER = b"\0"


class ErrorCode(enum.IntEnum):
    WORKER_ERROR = 1
    WORKER_ABSENT = 2
    TIMEOUT = 3


@dataclasses.dataclass
class WorkerStatus:
    model_names: list
    speed: float = 1.0
    queue_length: int = 0


def pack_chunk(payload: Dict) -> bytes:
    return json.dumps(payload, ensure_ascii=False).encode() + DELIMITER


def iter_chunks(stream) -> Iterator[Dict]:
    """Parse a \\0-delimited JSON chunk stream from a file-like object."""
    buf = b""
    while True:
        data = stream.read(4096)
        if not data:
            break
        buf += data
        while DELIMITER in buf:
            chunk, buf = buf.split(DELIMITER, 1)
            if chunk:
                yield json.loads(chunk)


def http_json(method: str, url: str, payload: Optional[Dict] = None,
              timeout: float = 15.0) -> Dict:
    """Tiny JSON-over-HTTP client (urllib; the env has no requests-free
    guarantee but urllib is stdlib)."""
    import urllib.request

    data = json.dumps(payload or {}).encode()
    req = urllib.request.Request(
        url, data=data if method == "POST" else None,
        headers={"Content-Type": "application/json"}, method=method)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
    return json.loads(body) if body else {}
