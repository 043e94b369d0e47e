"""Object-store adapter tests against a FAKE boto3 (boto3/s3fs are not
installed in CI): credential plumbing from env, endpoint propagation,
streaming-body wrapping (incl. tar streaming), and paginated glob
listing — the reference's boto3/megfile semantics
(base_dataset.py:33-54) without a real store.
"""

import io
import sys
import tarfile
import types

import pytest


class _FakeBody:
    def __init__(self, data: bytes):
        self._bio = io.BytesIO(data)

    def read(self, n=-1):
        return self._bio.read(n)

    def close(self):
        pass


class _FakeClient:
    def __init__(self, store, recorded):
        self._store = store
        self._recorded = recorded

    def get_object(self, Bucket, Key):
        return {"Body": _FakeBody(self._store[(Bucket, Key)])}

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        keys = sorted(k for (b, k) in self._store if b == Bucket
                      and k.startswith(Prefix))
        # paginate 2 at a time to exercise continuation handling
        start = int(ContinuationToken or 0)
        page = keys[start:start + 2]
        out = {"Contents": [{"Key": k} for k in page],
               "IsTruncated": start + 2 < len(keys)}
        if out["IsTruncated"]:
            out["NextContinuationToken"] = str(start + 2)
        return out


@pytest.fixture()
def fake_s3(monkeypatch):
    store = {}
    recorded = {}

    fake = types.ModuleType("boto3")

    class Session:
        def __init__(self, **kw):
            recorded["session"] = kw

        def client(self, service, endpoint_url=None):
            recorded["endpoint_url"] = endpoint_url
            return _FakeClient(store, recorded)

    fake.Session = Session
    monkeypatch.setitem(sys.modules, "boto3", fake)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKTEST")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "SECRET")
    monkeypatch.setenv("AWS_ENDPOINT_URL", "https://oss.example")
    # the credential-keyed client cache would otherwise hand a previous
    # test's client (bound to ITS store dict) to this test
    from merlin_tpu.data import storage
    storage._CLIENT_CACHE.clear()
    yield store, recorded
    storage._CLIENT_CACHE.clear()


def test_smart_open_s3_credentials_and_bytes(fake_s3):
    from merlin_tpu.data.storage import smart_open

    store, recorded = fake_s3
    store[("bkt", "dir/a.json")] = b'{"x": 1}'
    with smart_open("s3://bkt/dir/a.json", "r") as f:
        import json
        assert json.load(f) == {"x": 1}
    assert recorded["session"]["aws_access_key_id"] == "AKTEST"
    assert recorded["session"]["aws_secret_access_key"] == "SECRET"
    assert recorded["endpoint_url"] == "https://oss.example"


def test_smart_open_s3_tar_streaming(fake_s3):
    """tarfile stream mode ('r|*') over the wrapped streaming body — the
    shard-reading path (shards._open_shard)."""
    from merlin_tpu.data.shards import indexed_tar_samples

    store, _ = fake_s3
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in range(3):
            for ext in ("jpg", "txt"):
                data = f"payload{i}".encode()
                info = tarfile.TarInfo(f"s{i:03d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    store[("bkt", "shards/s0.tar")] = buf.getvalue()

    samples = list(indexed_tar_samples("s3://bkt/shards/s0.tar"))
    assert len(samples) == 3
    assert samples[0][1]["txt"] == b"payload0"


def test_list_keys_glob_and_pagination(fake_s3):
    from merlin_tpu.data.storage import list_keys

    store, _ = fake_s3
    for i in range(5):
        store[("bkt", f"data/part-{i}.tar")] = b""
    store[("bkt", "data/readme.md")] = b""
    out = list_keys("s3://bkt/data/part-*.tar")
    assert out == [f"s3://bkt/data/part-{i}.tar" for i in range(5)]


def test_list_keys_glob_does_not_cross_slash(fake_s3):
    """``*`` must stop at '/' (fs.glob/megfile semantics) — fnmatch would
    let data/*.tar swallow data/sub/x.tar. ``**`` opts back in."""
    from merlin_tpu.data.storage import list_keys

    store, _ = fake_s3
    store[("bkt", "data/a.tar")] = b""
    store[("bkt", "data/sub/b.tar")] = b""
    assert list_keys("s3://bkt/data/*.tar") == ["s3://bkt/data/a.tar"]
    assert list_keys("s3://bkt/data/**.tar") == [
        "s3://bkt/data/a.tar", "s3://bkt/data/sub/b.tar"]
    assert list_keys("s3://bkt/data/?.tar") == ["s3://bkt/data/a.tar"]
    # globstar matches ZERO components too (fs.glob semantics): a/**/x
    # must find both data/a.tar and data/sub/a.tar-level keys
    assert list_keys("s3://bkt/data/**/a.tar") == ["s3://bkt/data/a.tar"]
    assert list_keys("s3://bkt/data/**/b.tar") == ["s3://bkt/data/sub/b.tar"]


def test_glob_re_character_classes():
    """fnmatch-compatible class parsing: leading ']' is a literal member,
    '!' negates, backslashes in the body stay literal."""
    from merlin_tpu.data.storage import _glob_re

    assert _glob_re("data/[]].tar").match("data/].tar")
    assert _glob_re("data/[!x].tar").match("data/a.tar")
    assert not _glob_re("data/[!x].tar").match("data/x.tar")
    assert _glob_re("data/[ab]/c.tar").match("data/a/c.tar")
    assert not _glob_re("data/[ab]/c.tar").match("data/z/c.tar")
    assert _glob_re("a/**/b/c.tar").match("a/b/c.tar")
    assert _glob_re("a/**/b/c.tar").match("a/x/y/b/c.tar")
    assert not _glob_re("a/**/b/c.tar").match("a/c.tar")


def test_registry_spec_expands_s3_glob(fake_s3):
    from merlin_tpu.data.registry import WebdataSpec

    store, _ = fake_s3
    for i in range(3):
        store[("bkt", f"laion/{i:05d}.tar")] = b""
    spec = WebdataSpec(path="s3://bkt/laion/*.tar", size=10)
    assert spec.shard_list() == [
        f"s3://bkt/laion/{i:05d}.tar" for i in range(3)]


def test_smart_open_local_passthrough(tmp_path):
    from merlin_tpu.data.storage import smart_open

    p = tmp_path / "f.txt"
    p.write_text("hello")
    with smart_open(str(p), "r") as f:
        assert f.read() == "hello"


def test_smart_open_s3_write_rejected(fake_s3):
    from merlin_tpu.data.storage import smart_open

    with pytest.raises(NotImplementedError):
        smart_open("s3://bkt/x", "wb")


# ---------------------------------------------------------------------------
# Loopback WIRE tests (VERDICT r4 #8): the stdlib SigV4 client path in
# storage.py talks real HTTP to an in-process S3-compatible server that
# independently re-derives every request's signature from the wire data.
# A malformed canonical request, unsigned session token, broken
# pagination, or mis-encoded path fails these the way a real store would.
# ---------------------------------------------------------------------------


@pytest.fixture()
def wire_s3(monkeypatch):
    from tests.loopback_s3 import LoopbackS3Server

    store = {}
    srv = LoopbackS3Server(store, "AKWIRE", "wire-secret",
                           session_token="tok-123")
    with srv:
        # force the stdlib branch even if boto3 ever appears in the env
        monkeypatch.setitem(sys.modules, "boto3", None)
        monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKWIRE")
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "wire-secret")
        monkeypatch.setenv("AWS_SESSION_TOKEN", "tok-123")
        monkeypatch.setenv("AWS_ENDPOINT_URL", srv.endpoint_url)
        from merlin_tpu.data import storage
        storage._CLIENT_CACHE.clear()
        yield store, srv
        storage._CLIENT_CACHE.clear()


def test_wire_get_object_bytes_and_text(wire_s3):
    from merlin_tpu.data.storage import smart_open

    store, srv = wire_s3
    store[("bkt", "dir/a.json")] = b'{"x": 1}'
    with smart_open("s3://bkt/dir/a.json", "rb") as f:
        assert f.read() == b'{"x": 1}'
    with smart_open("s3://bkt/dir/a.json", "r") as f:
        assert f.read() == '{"x": 1}'
    assert ("GET", "/bkt/dir/a.json", {}) in [
        (m, p, q) for m, p, q in srv.requests]


def test_wire_tar_streaming(wire_s3):
    from merlin_tpu.data.storage import smart_open

    store, _ = wire_s3
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w") as tf:
        for name, data in [("0.txt", b"alpha"), ("1.jpg", b"\xff\xd8beta")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    store[("bkt", "shards/000.tar")] = bio.getvalue()

    with smart_open("s3://bkt/shards/000.tar", "rb") as f:
        with tarfile.open(fileobj=f, mode="r|*") as tf:
            members = {m.name: tf.extractfile(m).read() for m in tf}
    assert members == {"0.txt": b"alpha", "1.jpg": b"\xff\xd8beta"}


def test_wire_list_keys_glob_pagination(wire_s3):
    from merlin_tpu.data.storage import list_keys

    store, srv = wire_s3
    for i in range(5):  # 5 keys, server pages 2 at a time -> 3 pages
        store[("bkt", f"laion/{i:05d}.tar")] = b"x"
    store[("bkt", "laion/readme.md")] = b"no"
    store[("bkt", "laion/sub/9.tar")] = b"no"  # '*' must not cross '/'
    got = list_keys("s3://bkt/laion/*.tar")
    assert got == [f"s3://bkt/laion/{i:05d}.tar" for i in range(5)]
    lists = [q for m, p, q in srv.requests if q.get("list-type") == "2"]
    assert len(lists) >= 3, "pagination did not happen on the wire"
    assert all(q.get("prefix") == "laion/" for q in lists)


def test_wire_bad_secret_rejected(wire_s3, monkeypatch):
    from merlin_tpu.data import storage

    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "WRONG")
    storage._CLIENT_CACHE.clear()
    store, _ = wire_s3
    store[("bkt", "k")] = b"data"
    with pytest.raises(OSError, match="403"):
        storage.smart_open("s3://bkt/k", "rb")


def test_wire_unsigned_session_token_rejected(wire_s3):
    """The server demands the session token be SIGNED — a client that
    sends it unsigned (or not at all) must be rejected."""
    from merlin_tpu.data.s3http import S3HttpClient

    store, srv = wire_s3
    store[("bkt", "k")] = b"data"
    no_token = S3HttpClient("AKWIRE", "wire-secret",
                            endpoint_url=srv.endpoint_url)
    with pytest.raises(OSError, match="403"):
        no_token.get_object(Bucket="bkt", Key="k")


def test_wire_ranged_get(wire_s3):
    from merlin_tpu.data.storage import _s3_client

    store, _ = wire_s3
    store[("bkt", "k")] = b"0123456789"
    resp = _s3_client().get_object(Bucket="bkt", Key="k",
                                   Range="bytes=3-6")
    assert resp["Body"].read() == b"3456"
    resp["Body"].close()


def test_wire_special_chars_in_key(wire_s3):
    """Keys with spaces/'+' exercise path URI-encoding consistency between
    the request line and the signed canonical request."""
    from merlin_tpu.data.storage import smart_open

    store, _ = wire_s3
    store[("bkt", "dir name/a+b c.txt")] = b"enc"
    with smart_open("s3://bkt/dir name/a+b c.txt", "rb") as f:
        assert f.read() == b"enc"
