"""Serving tier end-to-end on localhost: worker registration, heartbeat
semantics, dispatch, and streaming generate through the controller relay."""

import json
import threading
import time

import pytest

from merlin_tpu.serve import controller as controller_mod
from merlin_tpu.serve import worker as worker_mod
from merlin_tpu.serve.cli import stream_request
from merlin_tpu.serve.protocol import http_json
from merlin_tpu.serve.tools import test_message as send_test_message


@pytest.fixture(scope="module")
def tiny_bundle():
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)

    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16),
        TrainingArguments(gradient_checkpointing=False, model_max_length=128),
        tiny=True)
    init_or_load_params(bundle)
    return bundle


@pytest.fixture(scope="module")
def stack(tiny_bundle):
    ctrl_server = controller_mod.serve(host="127.0.0.1", port=0)
    ctrl_port = ctrl_server.server_address[1]
    ctrl_addr = f"http://127.0.0.1:{ctrl_port}"
    threading.Thread(target=ctrl_server.serve_forever, daemon=True).start()

    worker = worker_mod.ModelWorker(
        tiny_bundle, worker_address="PLACEHOLDER",
        controller_address=None)
    wk_server = worker_mod.ThreadingHTTPServer(
        ("127.0.0.1", 0), worker_mod.make_handler(worker))
    wk_port = wk_server.server_address[1]
    worker.worker_address = f"http://127.0.0.1:{wk_port}"
    worker.controller_address = ctrl_addr
    threading.Thread(target=wk_server.serve_forever, daemon=True).start()
    worker.register()

    yield dict(ctrl=ctrl_addr, worker=worker.worker_address,
               controller=ctrl_server.controller, worker_obj=worker)
    ctrl_server.shutdown()
    wk_server.shutdown()


def test_register_and_list_models(stack):
    models = http_json("POST", stack["ctrl"] + "/list_models")["models"]
    assert "merlin-tpu" in models


def test_get_worker_address_dispatch(stack):
    resp = http_json("POST", stack["ctrl"] + "/get_worker_address",
                     {"model": "merlin-tpu"})
    assert resp["address"] == stack["worker"]
    none = http_json("POST", stack["ctrl"] + "/get_worker_address",
                     {"model": "missing-model"})
    assert none["address"] == ""


def test_heartbeat_updates_and_unknown_worker(stack):
    ok = http_json("POST", stack["ctrl"] + "/receive_heart_beat",
                   {"worker_name": stack["worker"], "queue_length": 3})
    assert ok["exist"]
    unknown = http_json("POST", stack["ctrl"] + "/receive_heart_beat",
                        {"worker_name": "http://nowhere:1", "queue_length": 0})
    assert not unknown["exist"]  # triggers worker re-registration


def test_worker_stream_direct(stack):
    chunks = list(stream_request(stack["worker"], {
        "prompt": "hello there", "temperature": 0.0,
        "max_new_tokens": 4, "stop": "</s>"}))
    assert chunks
    assert all(c["error_code"] == 0 for c in chunks)
    assert isinstance(chunks[-1]["text"], str)


def test_stream_through_controller_relay(stack):
    chunks = list(stream_request(stack["ctrl"], {
        "model": "merlin-tpu", "prompt": "USER: hi ASSISTANT:",
        "temperature": 0.0, "max_new_tokens": 4, "stop": "</s>"}))
    assert chunks and chunks[-1]["error_code"] == 0


def test_controller_relay_absent_model(stack):
    chunks = list(stream_request(stack["ctrl"], {
        "model": "missing", "prompt": "x", "max_new_tokens": 2}))
    assert chunks[-1]["error_code"] == 2  # WORKER_ABSENT


def test_message_tool(stack):
    out = send_test_message(stack["ctrl"], message="hi", max_new_tokens=3,
                       print_fn=lambda *a, **k: None)
    assert isinstance(out, str)


def test_stale_worker_expiry(stack):
    ctrl = stack["controller"]
    name = stack["worker"]
    ctrl.workers[name].last_heart_beat = time.time() - 999
    ctrl.remove_stale_workers()
    assert name not in ctrl.workers
    # re-register for any later tests
    stack["worker_obj"].register()
    assert name in ctrl.workers


def test_engine_backed_worker_streams(tiny_bundle):
    """Worker with continuous batching serves concurrent text requests."""
    import concurrent.futures

    worker = worker_mod.ModelWorker(
        tiny_bundle, worker_address="local", controller_address=None,
        use_engine=True, engine_slots=2, engine_max_len=64)
    try:
        def one(i):
            chunks = list(worker.generate_stream({
                "prompt": f"hello number {i}", "temperature": 0.0,
                "max_new_tokens": 4, "stop": "</s>"}))
            assert chunks and all(
                json.loads(c[:-1])["error_code"] == 0 for c in chunks)
            return json.loads(chunks[-1][:-1])["text"]

        with concurrent.futures.ThreadPoolExecutor(3) as ex:
            results = list(ex.map(one, range(3)))
        assert len(results) == 3
    finally:
        worker.stop()


def test_engine_worker_spec_and_hybrid_prefill_match_plain(tiny_bundle):
    """An engine-backed worker with engine-integrated speculative decode
    + hybrid chunked prefill returns the SAME greedy text as the plain
    engine-backed worker (both paths are token-exact in f32)."""
    req = {"prompt": "hello there hello there", "temperature": 0.0,
           "max_new_tokens": 6, "stop": "</s>"}

    def final_text(**extra):
        worker = worker_mod.ModelWorker(
            tiny_bundle, worker_address="local", controller_address=None,
            use_engine=True, engine_slots=2, engine_max_len=64,
            engine_cache_dtype="f32", **extra)
        try:
            chunks = list(worker.generate_stream(dict(req)))
            assert chunks and all(
                json.loads(c[:-1])["error_code"] == 0 for c in chunks)
            return json.loads(chunks[-1][:-1])["text"]
        finally:
            worker.stop()

    plain = final_text()
    fancy = final_text(engine_spec_draft=2, engine_prefill_chunk=8,
                       engine_prefill_chunk_min=4)
    assert plain == fancy


def test_speculative_worker_matches_plain_text(tiny_bundle):
    """--speculative K worker: greedy responses carry the SAME final text
    as the plain per-token path (speculative decode is greedy-exact),
    delivered as one chunk."""
    req = {"prompt": "hello there", "temperature": 0.0,
           "max_new_tokens": 6, "stop": "</s>"}
    plain = worker_mod.ModelWorker(
        tiny_bundle, worker_address="local", controller_address=None)
    want = json.loads(list(plain.generate_stream(dict(req)))[-1][:-1])["text"]
    plain.stop()

    spec = worker_mod.ModelWorker(
        tiny_bundle, worker_address="local", controller_address=None,
        speculative=3)
    chunks = list(spec.generate_stream(dict(req)))
    assert len(chunks) == 1  # one-shot delivery
    got = json.loads(chunks[0][:-1])
    assert got["error_code"] == 0
    assert got["text"] == want
    # generator cache is bucketed: different small budgets share one
    # compiled generator (client-chosen max_new cannot mint unbounded
    # cached executables)
    list(spec.generate_stream(dict(req, max_new_tokens=9)))
    assert len(spec._spec_gens) == 1
    spec.stop()


# --- web UI server (gradio_web_server parity features) ----------------------

def test_template_for_model():
    from merlin_tpu.serve.web import template_for_model

    # gradio_web_server.py:176-200 selection rules
    assert template_for_model("llava-llama-2-13b") == "llama_2"
    assert template_for_model("llava-v1.5-7b") == "v1"
    assert template_for_model("llava-v1-mmtag") == "plain"
    assert template_for_model("llava-pretrain-plain") == "plain"
    assert template_for_model("llava-mpt-7b") == "mpt"
    assert template_for_model("llava-13b") == "v0"
    assert template_for_model("mpt-30b-chat") == "mpt"
    assert template_for_model("Llama-2-13b-chat") == "llama_2"
    assert template_for_model("vicuna-13b") == "vicuna_v1"


def test_web_vote_and_chat_logging(stack, tmp_path):
    import base64
    import glob as _glob
    import urllib.request

    from merlin_tpu.serve import web as web_mod

    log_dir = str(tmp_path / "weblogs")
    srv = web_mod.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        web_mod.make_handler(stack["ctrl"], "merlin-tpu", log_dir))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        # vote endpoint writes the reference's JSONL record (:92-119)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/vote",
            data=json.dumps({"type": "flag",
                             "history": [["USER", "hi"]]}).encode())
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())["ok"] is True

        # chat relays through controller -> worker and logs with image hash
        from PIL import Image
        import io
        buf = io.BytesIO()
        Image.new("RGB", (8, 8), (9, 9, 9)).save(buf, "PNG")
        img_b64 = base64.b64encode(buf.getvalue()).decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/chat",
            data=json.dumps({"history": [["USER", "hello"]],
                             "images": [img_b64],
                             "max_new_tokens": 4}).encode())
        with urllib.request.urlopen(req, timeout=60) as r:
            raw = r.read()
        assert b"\0" in raw  # streamed chunk protocol

        logs = _glob.glob(log_dir + "/conv-*.jsonl")
        assert logs
        records = [json.loads(l) for l in open(logs[0])]
        types = [r["type"] for r in records]
        assert "flag" in types and "chat" in types
        chat = [r for r in records if r["type"] == "chat"][0]
        assert chat["model"] == "merlin-tpu" and len(chat["images"]) == 1
        # the uploaded image was archived once under its md5
        archived = _glob.glob(log_dir + "/serve_images/*/*.jpg")
        assert len(archived) == 1
        assert chat["images"][0] in archived[0]
    finally:
        srv.shutdown()
