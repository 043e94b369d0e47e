"""Model worker (reference engine/serve/model_worker.py rebuilt).

Loads the model once, registers with the controller, heartbeats every 15s
(re-registering if forgotten, model_worker.py:101-102), and serves:

  POST /worker_get_status       -> {model_names, speed, queue_length}
  POST /worker_generate_stream  {prompt, images(base64 list), temperature,
                                 max_new_tokens, stop} -> \\0-delimited
                                 {text, error_code} chunks

Generation runs through the jitted streaming decoder; base64 images are
decoded and ``<image>`` placeholders expanded to patch runs
(model_worker.py:124-147). A semaphore caps concurrency (:30,225-238) —
the TPU executes one batch at a time, queued requests report through
queue_length for the controller's dispatch.
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Iterator, List, Optional

import numpy as np

from merlin_tpu.serve.protocol import (
    ErrorCode, WORKER_HEART_BEAT_INTERVAL, http_json, pack_chunk)
from merlin_tpu.utils import constants as C
from merlin_tpu.utils.logging import setup_logger

logger = setup_logger(name="merlin_tpu.worker")


class ModelWorker:
    def __init__(self, bundle, *, worker_address: str,
                 controller_address: Optional[str] = None,
                 model_names: Optional[List[str]] = None,
                 limit_concurrency: int = 5,
                 conv_template: str = "v1",
                 use_engine: bool = False, engine_slots: int = 4,
                 engine_max_len: int = 2048, engine_chunk_steps: int = 8,
                 engine_pipeline: int = 1, engine_cache_dtype=None,
                 engine_spec_draft: int = 0,
                 engine_prefill_chunk: int = 0,
                 engine_prefill_chunk_min: int = 0,
                 speculative: int = 0):
        from merlin_tpu.eval.runner import EvalConfig, EvalModel

        self.bundle = bundle
        # prompt-lookup speculative decode for GREEDY per-request decodes
        # (generate/speculative.py); 0 = off. Responses arrive as one
        # final chunk instead of token-streaming — the speed trade the
        # flag opts into.
        self.speculative = max(int(speculative), 0)
        self._spec_gens = {}
        self.worker_address = worker_address
        self.controller_address = controller_address
        self.model_names = model_names or ["merlin-tpu"]
        self.semaphore = threading.Semaphore(limit_concurrency)
        self._queue = 0
        self._lock = threading.Lock()
        self._eval_cfg = EvalConfig(conv_template=conv_template)
        self._model = EvalModel(bundle, self._eval_cfg)
        self._stop = threading.Event()
        self.engine = None
        if use_engine:
            # continuous batching: text-only requests share decode steps
            # across slots (image requests still run the per-request path)
            from merlin_tpu.serve.engine import ServingEngine

            import jax.numpy as jnp

            kw = {}
            if engine_cache_dtype:
                kw["cache_dtype"] = {"bf16": jnp.bfloat16,
                                     "int8": jnp.int8,
                                     "f32": jnp.float32}[engine_cache_dtype]
            self.engine = ServingEngine(
                bundle.model, bundle.params, num_slots=engine_slots,
                max_len=engine_max_len, chunk_steps=engine_chunk_steps,
                pipeline=engine_pipeline,
                spec_draft=engine_spec_draft,
                prefill_chunk=engine_prefill_chunk,
                prefill_chunk_min=engine_prefill_chunk_min,
                eos_id=bundle.tokenizer.eos_token_id,
                pad_id=bundle.tokenizer.pad_token_id, **kw)
            threading.Thread(target=self._engine_loop, daemon=True).start()
        if controller_address:
            self.register()
            threading.Thread(target=self._heartbeat_loop,
                             daemon=True).start()

    def _engine_loop(self):
        import time as _time

        while not self._stop.is_set():
            try:
                if self.engine.step() == 0:
                    _time.sleep(0.005)
            except Exception as e:
                # a dead device path must not silently kill this thread:
                # clients would hang on their queues while heartbeats
                # keep reporting healthy. Fail everything in flight, back
                # off, and keep serving — transient faults recover, and
                # persistent ones fail each request fast.
                logger.exception("engine step failed; failing in-flight "
                                 "requests")
                try:
                    self.engine.fail_all(f"engine failure: {e}")
                except Exception:
                    logger.exception("engine fail_all also failed")
                _time.sleep(1.0)

    # ------------------------------------------------------------------
    def status(self) -> Dict:
        return {"model_names": self.model_names, "speed": 1.0,
                "queue_length": self._queue}

    def register(self):
        try:
            http_json("POST", self.controller_address + "/register_worker", {
                "worker_name": self.worker_address,
                "check_heart_beat": True,
                "worker_status": self.status()})
        except Exception as e:
            logger.warning("register failed: %s", e)

    def _heartbeat_loop(self):
        while not self._stop.wait(WORKER_HEART_BEAT_INTERVAL):
            try:
                resp = http_json(
                    "POST", self.controller_address + "/receive_heart_beat",
                    {"worker_name": self.worker_address,
                     "queue_length": self._queue})
                if not resp.get("exist"):
                    self.register()  # controller forgot us
            except Exception as e:
                logger.warning("heartbeat failed: %s", e)

    # ------------------------------------------------------------------
    def _decode_images(self, images_b64: List[str]) -> List:
        from PIL import Image

        out = []
        for data in images_b64 or []:
            out.append(Image.open(
                io.BytesIO(base64.b64decode(data))).convert("RGB"))
        return out

    def generate_stream(self, params: Dict) -> Iterator[bytes]:
        """Yield accumulated-text chunks (model_worker.py:162-187)."""
        import jax.numpy as jnp
        from merlin_tpu.generate.decode import (
            GenerateConfig, Generator, truncate_at_keywords)

        with self._lock:
            self._queue += 1
        acquired = self.semaphore.acquire(timeout=60)
        try:
            if not acquired:
                yield pack_chunk({"text": "", "error_code": ErrorCode.TIMEOUT})
                return
            prompt = params["prompt"]
            images = self._decode_images(params.get("images"))
            temperature = float(params.get("temperature", 1.0))
            max_new = int(params.get("max_new_tokens", 256))
            stop = params.get("stop") or C.DEFAULT_EOS_TOKEN

            tok = self.bundle.tokenizer

            text = self._model.build_prompt(prompt, num_images=len(images)) \
                if "USER:" not in prompt else prompt
            # placeholder expansion when the client sends raw <image> tags
            placeholder = C.image_placeholder(
                self.bundle.config.image_token_len,
                self.bundle.config.use_im_start_end)
            text = text.replace(C.DEFAULT_IMAGE_TOKEN, placeholder)
            enc = tok(text)["input_ids"]
            ids = np.asarray(
                enc[0] if enc and isinstance(enc[0], list) else enc,
                np.int32)[None]

            if self.engine is not None and not images:
                # continuous-batching path: share decode steps across slots
                import queue as _q

                token_q: "_q.Queue" = _q.Queue()
                self.engine.submit(
                    ids[0], max_new_tokens=max_new,
                    temperature=temperature,
                    emit=lambda t, d: token_q.put((t, d)))
                collected = []
                while True:
                    t, done = token_q.get(timeout=600)
                    if t < 0:  # engine error sentinel (see Request.emit)
                        yield pack_chunk({
                            "text": "request rejected by engine",
                            "error_code": ErrorCode.WORKER_ERROR})
                        return
                    collected.append(int(t))
                    out_text = tok.decode(collected,
                                          skip_special_tokens=True)
                    hit = stop and stop in out_text
                    out_text = truncate_at_keywords(out_text, [stop])
                    yield pack_chunk({"text": out_text, "error_code": 0})
                    if done or hit:
                        return

            imgs = self._model.preprocess_images(images)
            kwargs = {"images": jnp.asarray(imgs)} if imgs is not None else {}

            if self.speculative and temperature <= 1e-4:
                # greedy-exact speculative decode: same tokens, fewer
                # forwards; emitted as one final chunk
                from merlin_tpu.generate.speculative import (
                    SpeculativeGenerator)

                # bucket the token budget so client-chosen max_new values
                # cannot mint unbounded cached generators/compiles; the
                # output is sliced back to the requested budget (greedy:
                # identical prefix)
                bucket = 32
                while bucket < max_new and bucket < 2048:
                    bucket *= 2
                # a single-token stop keyword can stop INSIDE the jitted
                # loop (multi-token keywords fall back to post-truncation
                # and pay the full budget — the latency trade this flag
                # opts into)
                stop_ids = ()
                if stop:
                    enc = tok(stop, add_special_tokens=False)["input_ids"]
                    enc = enc[0] if enc and isinstance(enc[0], list) else enc
                    if len(enc) == 1 and enc[0] != tok.eos_token_id:
                        stop_ids = (int(enc[0]),)
                key = (bucket, stop_ids)
                spec = self._spec_gens.get(key)
                if spec is None:
                    spec = SpeculativeGenerator(
                        self.bundle.model,
                        GenerateConfig(max_new_tokens=bucket,
                                       do_sample=False,
                                       eos_id=tok.eos_token_id,
                                       pad_id=tok.pad_token_id,
                                       stop_token_ids=stop_ids),
                        draft_len=self.speculative)
                    if len(self._spec_gens) >= 8:
                        self._spec_gens.pop(next(iter(self._spec_gens)))
                    self._spec_gens[key] = spec
                out, _, gen_len = spec(self.bundle.params, ids, **kwargs)
                n = min(int(gen_len[0]), max_new)
                toks = [int(t) for t in out[0][:n]]
                text = tok.decode(toks, skip_special_tokens=True)
                text = truncate_at_keywords(text, [stop])
                yield pack_chunk({"text": text, "error_code": 0})
                return

            gen = Generator(self.bundle.model, GenerateConfig(
                max_new_tokens=max_new, do_sample=temperature > 1e-4,
                temperature=max(temperature, 1e-4),
                eos_id=tok.eos_token_id, pad_id=tok.pad_token_id))

            collected: List[int] = []
            for step_tokens in gen.stream(
                    self.bundle.params, ids, tokenizer=tok,
                    keywords=[stop], **kwargs):
                collected.append(int(step_tokens[0]))
                out_text = tok.decode(collected, skip_special_tokens=True)
                out_text = truncate_at_keywords(out_text, [stop])
                yield pack_chunk({"text": out_text, "error_code": 0})
        except Exception as e:
            logger.exception("generate failed")
            yield pack_chunk({"text": str(e),
                              "error_code": ErrorCode.WORKER_ERROR})
        finally:
            if acquired:
                self.semaphore.release()
            with self._lock:
                self._queue -= 1

    def stop(self):
        self._stop.set()


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _read(self) -> Dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_POST(self):
            if self.path == "/worker_get_status":
                body = json.dumps(worker.status()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/worker_generate_stream":
                params = self._read()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                for chunk in worker.generate_stream(params):
                    self.wfile.write(chunk)
                    self.wfile.flush()
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def serve(bundle, *, host: str = "0.0.0.0", port: int = 21002,
          controller_address: Optional[str] = None,
          model_names: Optional[List[str]] = None,
          use_engine: bool = False, engine_slots: int = 4,
          engine_max_len: int = 2048, engine_chunk_steps: int = 8,
          engine_pipeline: int = 1,
          engine_cache_dtype=None,
          engine_spec_draft: int = 0,
          engine_prefill_chunk: int = 0,
          engine_prefill_chunk_min: int = 0,
          speculative: int = 0) -> ThreadingHTTPServer:
    worker = ModelWorker(
        bundle, worker_address=f"http://{host}:{port}",
        controller_address=controller_address, model_names=model_names,
        use_engine=use_engine, engine_slots=engine_slots,
        engine_max_len=engine_max_len, engine_chunk_steps=engine_chunk_steps,
        engine_pipeline=engine_pipeline,
        engine_cache_dtype=engine_cache_dtype,
        engine_spec_draft=engine_spec_draft,
        engine_prefill_chunk=engine_prefill_chunk,
        engine_prefill_chunk_min=engine_prefill_chunk_min,
        speculative=speculative)
    server = ThreadingHTTPServer((host, port), make_handler(worker))
    server.worker = worker
    return server


def main():
    import argparse
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import parse_args

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=21002)
    p.add_argument("--controller-address", default=None)
    p.add_argument("--model-path", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--engine", action="store_true",
                   help="continuous-batching decode across slots")
    p.add_argument("--engine-slots", type=int, default=4)
    p.add_argument("--engine-chunk-steps", type=int, default=8,
                   help="decode steps per jitted chunk (1 = no-scan path, "
                        "lowest memory; fits full-7B on one 16GB chip)")
    p.add_argument("--engine-pipeline", type=int, default=1,
                   help="record tokens N chunks behind the dispatch "
                        "(hides the host round trip; 8 recommended behind "
                        "a remote tunnel)")
    p.add_argument("--engine-cache-dtype", default=None,
                   choices=[None, "bf16", "int8", "f32"],
                   help="int8 halves KV pool memory (per-token-head scales)")
    p.add_argument("--engine-spec-draft", type=int, default=0, metavar="K",
                   help="ENGINE-integrated speculative decoding: every "
                        "engine step verifies K prompt-lookup draft "
                        "tokens per slot through the multi-token paged "
                        "forward (greedy slots commit up to K+1 tokens "
                        "per forward; sampled slots ride at 1)")
    p.add_argument("--engine-prefill-chunk", type=int, default=0,
                   metavar="C",
                   help="admit prompts in (1, C) windows interleaved "
                        "with decode (bounds the decode stall a long "
                        "prompt's admission causes)")
    p.add_argument("--engine-prefill-chunk-min", type=int, default=0,
                   metavar="T",
                   help="hybrid admission: prompts <= T tokens take the "
                        "whole-prompt prefill path (faster at short "
                        "lengths); longer ones chunk")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="prompt-lookup speculative decode with K-token "
                        "drafts for greedy requests (exact same tokens, "
                        "fewer forwards; response arrives as one chunk "
                        "instead of streaming) — see "
                        "generate/speculative.py")
    p.add_argument("--int8-weights", action="store_true",
                   help="weight-only int8 LM kernels (per-output-channel "
                        "scales): halves parameter HBM reads, the decode "
                        "bottleneck; tower/projector stay full precision")
    p.add_argument("--scan-decode", action="store_true",
                   help="scan the LM layer stack: ONE paged-attention "
                        "kernel instance serves every layer (minutes "
                        "less compile at 7B; checkpoints stack at load)")
    args, rest = p.parse_known_args()

    margs, dargs, targs = parse_args(rest)
    if args.model_path:
        margs.model_name_or_path = args.model_path
    if args.scan_decode:
        margs.scan_layers = True
    bundle = build_model_tokenizer(margs, dargs, targs, tiny=args.tiny)
    init_or_load_params(bundle, composite_checkpoint=margs.pretrain_model)
    if args.int8_weights:
        from merlin_tpu.models.builder import quantize_bundle_lm_int8

        bundle = quantize_bundle_lm_int8(bundle)
    server = serve(bundle, host=args.host, port=args.port,
                   controller_address=args.controller_address,
                   use_engine=args.engine, engine_slots=args.engine_slots,
                   engine_max_len=targs.model_max_length,
                   engine_chunk_steps=args.engine_chunk_steps,
                   engine_pipeline=args.engine_pipeline,
                   engine_cache_dtype=args.engine_cache_dtype,
                   engine_spec_draft=args.engine_spec_draft,
                   engine_prefill_chunk=args.engine_prefill_chunk,
                   engine_prefill_chunk_min=args.engine_prefill_chunk_min,
                   speculative=args.speculative)
    logger.info("worker listening on %s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
