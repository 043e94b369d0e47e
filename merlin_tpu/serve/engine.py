"""Continuous-batching serving engine over a pooled paged KV cache.

The reference serves one request at a time per worker (asyncio semaphore,
model_worker.py:30). This engine keeps a fixed set of decode slots hot:
requests admit into free slots (prefill runs per-request and its pages are
scattered into pool pages), every engine step decodes ALL active slots in
one jitted call against the shared paged cache, and slots free on
EOS/length — so throughput scales with occupancy instead of queueing.

Paging is vLLM-style and real: physical pages come from one shared
``PagePool``; admission reserves only the prompt's pages (a page-table
scatter, no contiguous per-slot reservation and no copies), decode grows a
sequence one page at a time as it crosses page boundaries, and a request
that cannot grow preempts the youngest other request (its pages are
released and it re-queues for recompute-style resumption — the vLLM
recompute preemption policy). Physical page 0 is reserved as a trash page:
inactive slots' table rows point at it so the unconditional decode-step KV
scatter for masked slots can never corrupt a live request's pages.

Static shapes: the decode step is compiled once per engine configuration
(slots x page geometry); prefill compiles once per prompt bucket.
"""

from __future__ import annotations

import collections
import dataclasses
import threading
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from merlin_tpu.generate.speculative import _scatter_rows
from merlin_tpu.models.decoder import init_kv_cache
from merlin_tpu.ops.paged_attention import PagePool

_TRASH = "__trash__"   # PagePool seq-id pinning physical page 0


def _multi_query_model(model):
    """Clone the serving model with cfg.paged_multi_query=True.

    Flax modules are stateless, so the clone shares the exact param tree;
    only the s_q>1 paged branch changes (verify windows over arbitrary
    tables instead of identity-mapped prefill)."""
    import dataclasses as dc

    cfg = model.cfg
    if hasattr(cfg, "lm"):
        cfg = dc.replace(cfg, lm=dc.replace(cfg.lm, paged_multi_query=True))
    else:
        cfg = dc.replace(cfg, paged_multi_query=True)
    return type(model)(cfg)


@dataclasses.dataclass
class Request:
    req_id: int
    input_ids: np.ndarray          # (prompt_len,)
    max_new_tokens: int = 128
    temperature: float = 0.0
    # streaming callback (token, done). A NEGATIVE token is the error
    # sentinel: the request failed (``error`` holds the message), done is
    # True, and the token must not be decoded as text.
    emit: Optional[Callable[[int, bool], None]] = None

    # filled by the engine
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None
    # tokens of `generated` already folded into input_ids by a previous
    # preemption (a twice-preempted request must not duplicate them)
    baked_generated: int = 0


class ServingEngine:
    """Fixed-slot continuous batching. Single-threaded step() driver; a
    background thread wrapper (`serve_forever`) is provided for workers."""

    def __init__(self, model, params, *, num_slots: int = 4,
                 max_len: int = 2048, eos_id: int = 2, pad_id: int = 0,
                 prompt_bucket: int = 128, page_size: int = 128,
                 cache_dtype=jnp.bfloat16, rng_seed: int = 0,
                 chunk_steps: int = 8, pipeline: int = 1,
                 mesh=None, param_shardings=None,
                 spec_draft: int = 0, spec_ngram: int = 2,
                 prefill_chunk: int = 0,
                 prefill_windows_per_step: int = 4,
                 prefill_chunk_min: int = 0):
        # --- engine-integrated speculative decoding --------------------
        # spec_draft=k > 0 turns each engine step into prompt-lookup
        # verify WINDOWS: every active slot proposes k draft tokens from
        # its own token history (n-gram continuation), one (k+1)-token
        # multi-token paged forward scores them, and the accepted prefix
        # commits — greedy slots emit up to k+1 tokens per forward at
        # one forward's HBM cost (decode is parameter-read-bound).
        # Rejected drafts need NO rollback machinery: per-slot `lengths`
        # snap back and later windows overwrite the dead page rows.
        # Sampled (temperature>0) slots ride along at 1 token/window.
        # chunk_steps then counts WINDOWS per jitted chunk.
        self.spec_draft = int(spec_draft)
        self.spec_ngram = int(spec_ngram)
        # --- chunked prefill -------------------------------------------
        # prefill_chunk=C > 0 admits prompts in fixed (1, C) windows
        # through the multi-token paged path, writing K/V DIRECTLY into
        # the slot's pool pages (arbitrary tables) instead of
        # prefill-into-identity-pages + insert scatter. One jit
        # signature regardless of prompt length (vs one compile per
        # prompt bucket), no small-cache allocation, no insert pass.
        # Keep C a multiple of page_size so windows tile pool pages
        # exactly. (The r3 "2..64-token forwards relayout every weight"
        # cliff does NOT reproduce on the current toolchain — 32-layer
        # probe temp 0.0 GB, tools/layout_probe.py — so C's floor is
        # page alignment, not layout avoidance.)
        self.prefill_chunk = int(prefill_chunk)
        # per-STEP window budget (vLLM max_num_batched_tokens analogue,
        # in units of C): bounds the decode stall any one step pays to
        # admissions at budget*C window-tokens, while letting short
        # prompts (<= budget windows) admit in a single step — one
        # window per slot per step made EVERY multi-window prompt pay
        # n interleaved steps of TTFT and stalls scale with the number
        # of concurrently admitting slots (measured: chunked TTFT 1.42 s
        # vs 0.99 s whole-prompt on 90-350-token prompts)
        self.prefill_windows_per_step = max(int(prefill_windows_per_step),
                                            1)
        # hybrid admission: prompts of true length <= prefill_chunk_min
        # take the WHOLE-PROMPT prefill+insert path even when chunking is
        # on (measured: at 90-350-token prompts the n-step windowed
        # admission only delays first tokens — 1.42 s vs 0.99 s TTFT —
        # while long prompts still need chunking to bound the decode
        # stall one admission causes). 0 = always chunk (the single
        # compiled prompt signature). Both prefill paths are jitted
        # lazily, so a long-only workload never compiles the bucketed
        # whole-prompt signature.
        self.prefill_chunk_min = int(prefill_chunk_min)
        # slot -> in-progress chunked-prefill state (slot occupied but
        # not yet decoding; windows advance oldest-first per step)
        self._prefilling = {}
        self.chunk_steps = max(int(chunk_steps), 1)
        # worst-case cache/token growth of one jitted chunk
        self.tokens_per_chunk = self.chunk_steps * (
            (self.spec_draft + 1) if self.spec_draft else 1)
        # in-flight chunks whose tokens are synced one step late: reading
        # a chunk's result pays compute + the full host<->device round
        # trip (~27 ms through the remote tunnel — measured to DOUBLE a
        # 7B decode step), so the next chunk is dispatched first and the
        # device stays busy during the sync. Token recording (and thus
        # EOS detection) lags by `pipeline` chunks; a finishing request
        # wastes at most pipeline*chunk_steps decode tokens. A stale
        # write to a freed page is safe: any page re-allocated to another
        # sequence has every position overwritten before that sequence's
        # length (the read gate) passes it.
        self.pipeline = max(int(pipeline), 0)
        self._inflight: "collections.deque" = collections.deque()
        self.model = model
        # --- tensor-parallel serving over a device mesh ----------------
        # params shard per `param_shardings` (core/partitioning rules via
        # sharding_for_tree); the paged pool shards its head-packed lane
        # dim over 'tensor' (a lane shard IS a head shard); GSPMD + the
        # decoder's shard_map'd paged token step do the rest. int8 pools
        # shard too via the strided scale-lane layout (requires
        # hkv | 128 so the stride survives sharding).
        self.mesh = mesh
        self._prev_mesh = None
        if mesh is not None:
            from merlin_tpu.core.mesh import get_global_mesh, set_global_mesh

            self._prev_mesh = get_global_mesh()
            set_global_mesh(mesh)  # gates the kernels' shard_map wrap
            if param_shardings is not None:
                params = jax.device_put(params, param_shardings)
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.prompt_bucket = prompt_bucket
        self.page_size = page_size

        lm_cfg = model.cfg.lm if hasattr(model.cfg, "lm") else model.cfg
        self.lm_cfg = lm_cfg
        self.cache = init_kv_cache(lm_cfg, num_slots, max_len=max_len,
                                   dtype=cache_dtype, layout="paged",
                                   page_size=page_size)
        self.pages_per_slot = self.cache["page_tables"].shape[1]
        layers = self.cache["layers"]
        self._stacked = isinstance(layers, dict)
        kp = layers["k_pages"] if self._stacked else layers[0]["k_pages"]
        self._cache_dtype = kp.dtype
        total_pages = kp.shape[1] if self._stacked else kp.shape[0]
        self.pool = PagePool(total_pages, page_size, self.pages_per_slot)
        self.pool.allocate(_TRASH, 1)   # pins physical page 0
        # host mirror of the device page tables; rows of zeros alias the
        # trash page (inactive slots write there, never read)
        self._tables = np.zeros((num_slots, self.pages_per_slot), np.int32)
        self._tables_dirty = False
        self.cache["page_tables"] = jnp.asarray(self._tables)
        if mesh is not None and mesh.shape.get("tensor", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self._cache_dtype == jnp.int8 and 128 % lm_cfg.kv_heads:
                raise ValueError(
                    "tensor-sharded int8 pools need kv_heads | 128 (the "
                    "strided scale-lane layout must align to the shard)")
            tp = mesh.shape["tensor"]
            if lm_cfg.num_heads % tp or lm_cfg.kv_heads % tp:
                # an undivisible pool would shard mid-head AND skip the
                # decoder's shard_map fast path: GSPMD would reshard on
                # every step — fail loudly instead
                raise ValueError(
                    f"heads ({lm_cfg.num_heads}/{lm_cfg.kv_heads}) must "
                    f"divide the tensor axis ({tp})")

            def pool_shard(x):
                # pages: (.., page, hkv*d) — lanes sharded; bookkeeping
                # arrays (tables/lengths) replicated
                spec = (P(*((None,) * (x.ndim - 1)), "tensor")
                        if x.ndim >= 3 else P())
                return jax.device_put(x, NamedSharding(mesh, spec))

            self.cache = jax.tree.map(pool_shard, self.cache)

        self.slots: List[Optional[Request]] = [None] * num_slots
        self._queue: "collections.deque[Request]" = collections.deque()
        self._rng = jax.random.key(rng_seed)
        self._next_id = 0
        self._lock = threading.Lock()
        self._slot_tokens = np.zeros(self.num_slots, np.int32)
        self._slot_len = np.zeros(self.num_slots, np.int64)
        # device-side mirrors, invalidated on admission (upload caching)
        self._tokens_dev = None
        self._active_np = None
        self._active_dev = None
        self._temps_dev = None

        # --- jitted pieces --------------------------------------------
        def prefill(params, ids, mask, small_cache):
            b, s = ids.shape
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
            logits, new_cache = model.apply(
                {"params": params}, ids,
                segment_ids=mask.astype(jnp.int32), positions=positions,
                kv_cache=small_cache)
            length = mask.sum(axis=1).astype(jnp.int32)
            next_logits = jnp.take_along_axis(
                logits, (length - 1)[:, None, None], axis=1)[:, 0]
            return next_logits, new_cache, length

        def insert(big_layers, small_layers, phys, slot, lengths,
                   small_lengths):
            """Scatter one prefilled sequence's pages into pool pages.

            ``phys``: (n_small_pages,) physical page ids from the pool —
            arbitrary, not contiguous. Pages are head-packed
            (P, page, hkv*d), so each page is one contiguous row block.
            Handles both cache forms: a tuple of per-layer dicts (loop
            decoder) and one dict of (L, P, ...) stacked arrays (scanned
            decoder — the pages axis is axis 1 there)."""
            def put(big, small, axis):
                if axis == 0:
                    return big.at[phys].set(small.astype(big.dtype))
                return big.at[:, phys].set(small.astype(big.dtype))

            # generic over the layer dict: k/v_pages (+ k/v_scales for
            # int8 caches) all scatter along the pages axis
            if isinstance(big_layers, dict):
                new_layers = {kk: put(big_layers[kk], small_layers[kk], 1)
                              for kk in big_layers}
            else:
                new_layers = tuple(
                    {kk: put(bl[kk], sl[kk], 0) for kk in bl}
                    for bl, sl in zip(big_layers, small_layers))
            lengths = lengths.at[slot].set(small_lengths[0])
            return new_layers, lengths

        def decode_one(params, tokens, cache, active, rng, temps):
            lengths = cache["lengths"]
            logits, new_cache = model.apply(
                {"params": params}, tokens[:, None],
                positions=lengths[:, None], kv_cache=cache)
            logits = logits[:, 0]
            greedy = jnp.argmax(logits, axis=-1)
            sampled = jax.random.categorical(
                rng, logits / jnp.maximum(temps[:, None], 1e-4), axis=-1)
            out = jnp.where(temps > 1e-4, sampled, greedy).astype(jnp.int32)
            out = jnp.where(active, out, self.pad_id)
            # inactive slots must not advance their lengths
            new_cache = dict(new_cache)
            new_cache["lengths"] = jnp.where(
                active, new_cache["lengths"], lengths)
            return out, new_cache

        def decode_chunk(params, tokens, cache, active, rng, temps):
            """`chunk_steps` decode steps in one jitted scan — one host
            round-trip per chunk, not per token (the per-token sync
            dominates behind a remote-dispatch tunnel)."""
            def body(carry, step_rng):
                toks, cache_ = carry
                out, cache_ = decode_one(params, toks, cache_, active,
                                         step_rng, temps)
                return (out, cache_), out

            rngs = jax.random.split(rng, self.chunk_steps)
            (last, cache), all_toks = jax.lax.scan(
                body, (tokens, cache), rngs)
            return all_toks.T, last, cache  # (slots, chunk_steps)

        def first_token(logits, temp, rng):
            """Sample the post-prefill token ON DEVICE: admission used to
            fetch it immediately (int(argmax(...))), paying one full
            host<->device round trip (~45 ms through the tunnel) PER
            admitted request — the dominant term in TTFT under load.
            _admit now stages these scalars and fetches the whole
            admission batch in ONE transfer."""
            greedy = jnp.argmax(logits[0])
            sampled = jax.random.categorical(
                rng, logits[0] / jnp.maximum(temp, 1e-4))
            return jnp.where(temp > 1e-4, sampled, greedy).astype(jnp.int32)

        self._prefill = jax.jit(prefill)
        self._insert = jax.jit(insert, donate_argnums=(0,))
        self._decode = jax.jit(decode_one, donate_argnums=(2,))
        self._decode_chunk = jax.jit(decode_chunk, donate_argnums=(2,))
        self._first_token = jax.jit(first_token)

        multi_model = (_multi_query_model(model)
                       if (self.spec_draft or self.prefill_chunk) else None)

        if self.prefill_chunk:
            C = self.prefill_chunk

            def prefill_window(params, ids, layers, tables_row, start,
                               row, temp, rng):
                """One (1, C) prompt window straight into pool pages.

                ``start``: tokens already written for this slot; the
                window appends at start..start+C-1 and attends causally
                over the slot's whole paged history. ``row``: window row
                of the prompt's LAST real token (first-token sampling —
                only the final window's value is used; padded rows write
                garbage K/V at positions >= plen, which decode overwrites
                before they are ever attended)."""
                cache = {"layers": layers, "page_tables": tables_row,
                         "lengths": start[None],
                         "index": jnp.zeros((), jnp.int32)}
                positions = start[None, None] + jnp.arange(C)[None]
                logits, new_cache = multi_model.apply(
                    {"params": params}, ids, positions=positions,
                    kv_cache=cache)
                tok = first_token(logits[:, row], temp, rng)
                return new_cache["layers"], tok

            self._prefill_window = jax.jit(
                prefill_window, donate_argnums=(2,))

        # --- speculative windows ----------------------------------------
        if self.spec_draft:
            k = self.spec_draft
            ngram = self.spec_ngram
            # host mirror of per-slot token history (prompt + emitted);
            # device copies are rebuilt lazily after fail_all
            self._hist_np = np.zeros((num_slots, max_len), np.int32)
            self._hist_len_np = np.zeros(num_slots, np.int32)
            self._hist_dev = None
            self._hist_len_dev = None

            def propose(hist, cur):
                """Latest-occurrence n-gram continuation from history
                (same vectorized shift-compare as generate/speculative)."""
                b, L = hist.shape
                tail = jnp.take_along_axis(
                    hist, jnp.maximum(
                        cur[:, None] - ngram + jnp.arange(ngram)[None], 0),
                    axis=1)
                npos = L - ngram + 1
                match = jnp.ones((b, npos), bool)
                for t_ in range(ngram):
                    match &= hist[:, t_:t_ + npos] == tail[:, t_:t_ + 1]
                pos = jnp.arange(npos)[None]
                match &= pos + ngram <= (cur - 1)[:, None]
                best = jnp.max(jnp.where(match, pos, -1), axis=1)
                has = best >= 0
                start = jnp.where(has, best + ngram, 0)
                draft = jnp.take_along_axis(
                    hist, jnp.clip(start[:, None] + jnp.arange(k)[None],
                                   0, L - 1), axis=1)
                last = jnp.take_along_axis(
                    hist, jnp.maximum(cur[:, None] - 1, 0), axis=1)
                return jnp.where(has[:, None], draft, last)   # (b, k)

            def spec_window(params, toks, cache, active, hist, hist_len,
                            rng, temps):
                lengths = cache["lengths"]
                draft = propose(hist, hist_len)
                ids = jnp.concatenate([toks[:, None], draft], axis=1)
                positions = lengths[:, None] + jnp.arange(k + 1)[None]
                logits, new_cache = multi_model.apply(
                    {"params": params}, ids, positions=positions,
                    kv_cache=cache)
                g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                greedy_row = temps <= 1e-4
                sampled0 = jax.random.categorical(
                    rng, logits[:, 0] / jnp.maximum(temps[:, None], 1e-4),
                    axis=-1).astype(jnp.int32)
                cand = g.at[:, 0].set(
                    jnp.where(greedy_row, g[:, 0], sampled0))
                ok = jnp.cumprod((g[:, :k] == draft).astype(jnp.int32),
                                 axis=1)
                m = ok.sum(axis=1)
                count = jnp.where(greedy_row, m + 1, 1)
                count = jnp.where(active, count, 0)
                emit_mask = jnp.arange(k + 1)[None] < count[:, None]
                emitted = jnp.where(emit_mask, cand, -1)   # -1 = hole
                new_cache = dict(new_cache)
                new_cache["lengths"] = jnp.where(
                    active, lengths + count, lengths)
                hist = _scatter_rows(hist, hist_len, cand, emit_mask)
                hist_len = hist_len + count
                nxt = jnp.take_along_axis(
                    cand, jnp.maximum(count - 1, 0)[:, None], axis=1)[:, 0]
                nxt = jnp.where(active, nxt, toks)
                return nxt, new_cache, hist, hist_len, emitted

            def spec_chunk(params, tokens, cache, active, hist, hist_len,
                           rng, temps):
                if self.chunk_steps == 1:
                    # no-scan path (mirrors decode_one): the window scan's
                    # carry would hold a second copy of the paged pool
                    # during compile — at 7B the donated single-window
                    # call is what fits the chip
                    nxt, cache_, hist_, hl, emitted = spec_window(
                        params, tokens, cache, active, hist, hist_len,
                        rng, temps)
                    return emitted, nxt, cache_, hist_, hl

                def body(carry, step_rng):
                    toks, cache_, hist_, hl = carry
                    nxt, cache_, hist_, hl, emitted = spec_window(
                        params, toks, cache_, active, hist_, hl,
                        step_rng, temps)
                    return (nxt, cache_, hist_, hl), emitted

                rngs = jax.random.split(rng, self.chunk_steps)
                (last, cache, hist, hist_len), em = jax.lax.scan(
                    body, (tokens, cache, hist, hist_len), rngs)
                # (windows, slots, k+1) -> (slots, windows*(k+1)) in order
                em = em.transpose(1, 0, 2).reshape(em.shape[1], -1)
                return em, last, cache, hist, hist_len

            self._spec_chunk = jax.jit(spec_chunk, donate_argnums=(2, 4, 5))

    # ------------------------------------------------------------------
    def submit(self, input_ids, *, max_new_tokens: int = 128,
               temperature: float = 0.0,
               emit: Optional[Callable] = None) -> Request:
        with self._lock:
            req = Request(self._next_id, np.asarray(input_ids, np.int32),
                          max_new_tokens=max_new_tokens,
                          temperature=temperature, emit=emit)
            self._next_id += 1
            self._queue.append(req)
        return req

    def _route_chunked(self, ids: np.ndarray) -> bool:
        """Hybrid admission policy: chunk only prompts strictly longer
        than ``prefill_chunk_min`` (0 = chunk everything)."""
        return bool(self.prefill_chunk) and \
            len(ids) > self.prefill_chunk_min

    def _bucketed(self, ids: np.ndarray, chunked: bool) -> np.ndarray:
        # chunked prefill pads to the window size instead (its only
        # compiled prompt shape is (1, prefill_chunk))
        bucket = self.prefill_chunk if chunked else self.prompt_bucket
        pad = (-len(ids)) % bucket or 0
        if pad:
            ids = np.concatenate([ids, np.full(pad, self.pad_id, np.int32)])
        return ids[None]

    def _pop_request(self) -> Optional[Request]:
        with self._lock:
            return self._queue.popleft() if self._queue else None

    def _requeue_front(self, req: Request):
        with self._lock:
            self._queue.appendleft(req)

    def _admit(self):
        staged = []   # (slot, req, plen, device first-token scalar)
        for slot in range(self.num_slots):
            if self.slots[slot] is not None:
                continue
            while True:
                req = self._pop_request()
                if req is None:
                    self._resolve_admissions(staged)
                    return
                chunked = self._route_chunked(req.input_ids)
                ids = self._bucketed(req.input_ids, chunked)
                try:
                    # reserve the bucketed prompt's pages (prefill writes
                    # the whole bucket; padded rows are masked by `lengths`)
                    table = self.pool.allocate(req.req_id, ids.shape[1])
                    break
                except MemoryError:
                    self._requeue_front(req)
                    self._resolve_admissions(staged)
                    return
                except ValueError as e:
                    # prompt longer than a slot can ever hold: fail just
                    # this request (engine keeps serving) and retry the
                    # slot with the next queued request
                    req.done = True
                    req.error = str(e)
                    if req.emit:
                        req.emit(-1, True)  # error sentinel (see Request)
            # prompt length is HOST knowledge: never sync it from device
            plen = min(len(req.input_ids), ids.shape[1])
            if chunked:
                # windows of C tokens straight into the slot's pool pages
                # (multi-token paged path, arbitrary tables): no small
                # cache, no insert scatter, ONE compiled prompt shape.
                # Windows run INTERLEAVED with decode (one per slot per
                # engine step, _advance_prefill) so a long prompt's
                # admission does not stall the running streams.
                # the GLOBAL tables row stays on the trash page until the
                # prompt is fully written: concurrent decode chunks still
                # scatter a (masked-out) token for this slot at its STALE
                # length, and that write must land in trash, not in the
                # pages the windows are filling. The windows use their
                # own private tables row.
                row = np.zeros(self.pages_per_slot, np.int32)
                row[:len(table)] = table
                self.slots[slot] = req
                self._prefilling[slot] = {
                    "req": req, "ids": ids, "plen": plen, "done": 0,
                    "n": ids.shape[1] // self.prefill_chunk,
                    "row": row, "tables_row": jnp.asarray(row[None]),
                    "rng": jax.random.fold_in(self._rng, req.req_id),
                    "temp": jnp.float32(req.temperature),
                }
                self._active_np = None
                continue
            else:
                mask = jnp.asarray(np.arange(ids.shape[1])[None] < plen)
                small = init_kv_cache(
                    self.lm_cfg, 1, max_len=ids.shape[1], layout="paged",
                    page_size=self.page_size, dtype=self._cache_dtype)
                next_logits, small, length = self._prefill(
                    self.params, jnp.asarray(ids), mask, small)
                self.cache["layers"], self.cache["lengths"] = self._insert(
                    self.cache["layers"], small["layers"],
                    jnp.asarray(np.asarray(table, np.int32)), slot,
                    self.cache["lengths"], length)
                self._tables[slot] = 0
                self._tables[slot, :len(table)] = table
                self._tables_dirty = True
                # first token from the prefill logits, sampled ON DEVICE
                # — fetched below in one batched transfer for every
                # admission this call (per-request int() syncs cost
                # ~45 ms EACH through the tunnel and dominated TTFT
                # under load)
                tok_dev = self._first_token(
                    next_logits, jnp.float32(req.temperature),
                    jax.random.fold_in(self._rng, req.req_id))
            self.slots[slot] = req
            self._finish_admission(slot, req, plen, tok_dev, staged)
        self._resolve_admissions(staged)

    def _finish_admission(self, slot, req, plen, tok_dev, staged):
        """Device-side bookkeeping once a slot's prefill produced its
        first token; the host fetch happens in _resolve_admissions."""
        self._slot_len[slot] = plen
        # update the device token mirror FUNCTIONALLY: under pipelining
        # the host np copy lags the latest dispatch, so rebuilding from
        # it would rewind other slots' tokens
        if self._tokens_dev is None:
            self._tokens_dev = jnp.asarray(self._slot_tokens)
        self._tokens_dev = self._tokens_dev.at[slot].set(tok_dev)
        if self.spec_draft and self._hist_dev is not None:
            row = np.zeros(self.max_len, np.int32)
            row[:plen] = req.input_ids[:plen]
            self._hist_dev = self._hist_dev.at[slot].set(
                jnp.asarray(row)).at[slot, plen].set(tok_dev)
            self._hist_len_dev = self._hist_len_dev.at[slot].set(plen + 1)
        self._active_np = None
        staged.append((slot, req, plen, tok_dev))

    def _one_window(self, slot, staged):
        """Advance one (1, C) prefill window for `slot`; finish the
        admission when it was the last window."""
        st = self._prefilling[slot]
        ci, C = st["done"], self.prefill_chunk
        last_row = (st["plen"] - 1) - (st["n"] - 1) * C
        layers, tok_dev = self._prefill_window(
            self.params,
            jnp.asarray(st["ids"][:, ci * C:(ci + 1) * C]),
            self.cache["layers"], st["tables_row"],
            jnp.int32(ci * C),
            jnp.int32(last_row if ci == st["n"] - 1 else 0),
            st["temp"], st["rng"])
        self.cache["layers"] = layers
        st["done"] = ci + 1
        if st["done"] == st["n"]:
            # ragged tail: snap the slot's length to the REAL
            # prompt end (garbage rows past plen are never
            # attended; decode overwrites them in order), and
            # only now reveal the real tables row globally
            self.cache["lengths"] = \
                self.cache["lengths"].at[slot].set(st["plen"])
            self._tables[slot] = st["row"]
            self._tables_dirty = True
            del self._prefilling[slot]
            self._finish_admission(slot, st["req"], st["plen"],
                                   tok_dev, staged)

    def _advance_prefill(self):
        """Run up to `prefill_windows_per_step` pending prefill windows,
        OLDEST admission first (depth-first: finishing one request's
        prompt beats spreading windows breadth-first — same total work,
        strictly earlier first tokens). Chunked prefill interleaves with
        decode: running streams take at most a budget*C-token hit per
        step while prompts admit. With no active decode slots there is
        nothing to interleave with, so loop until at least one admission
        completes."""
        if not self._prefilling:
            return
        staged = []
        budget = self.prefill_windows_per_step
        while True:
            used = 0
            for slot in list(self._prefilling):   # insertion = admission order
                while slot in self._prefilling and used < budget:
                    self._one_window(slot, staged)
                    used += 1
                if used >= budget:
                    break
            active = any(r is not None and s not in self._prefilling
                         for s, r in enumerate(self.slots))
            if active or not self._prefilling:
                break
        self._resolve_admissions(staged)

    def _resolve_admissions(self, staged):
        """Fetch every staged first token in ONE device transfer and run
        the host bookkeeping (token history, emit callbacks, EOS)."""
        if not staged:
            return
        toks = np.asarray(jnp.stack([t for _, _, _, t in staged]))
        for (slot, req, plen, _), tok in zip(staged, toks):
            tok = int(tok)
            self._slot_tokens[slot] = tok
            if self.spec_draft:
                row = np.zeros(self.max_len, np.int32)
                row[:plen] = req.input_ids[:plen]
                row[plen] = tok
                self._hist_np[slot] = row
                self._hist_len_np[slot] = plen + 1
            self._record(slot, tok)

    def _record(self, slot: int, token: int):
        req = self.slots[slot]
        req.generated.append(int(token))
        self._slot_len[slot] += 1
        # safety margin: the cache may run ahead of the recorded tokens
        # by up to (1 + pipeline) chunks before the slot frees
        margin = self.tokens_per_chunk * (1 + self.pipeline) + 1
        done = (token == self.eos_id
                or len(req.generated) >= req.max_new_tokens
                or self._slot_len[slot] + margin >= self.max_len)
        if req.emit:
            req.emit(int(token), done)
        if done:
            req.done = True
            self.slots[slot] = None
            self.pool.release(req.req_id)
            self._tables[slot] = 0
            self._tables_dirty = True

    # ------------------------------------------------------------------
    def _preempt_youngest(self, exclude: int) -> bool:
        """Release the most recently admitted other request back to the
        queue (vLLM recompute preemption: its prompt+generated tokens
        re-prefill on next admission). Returns False if no victim."""
        victims = [(req.req_id, slot) for slot, req in enumerate(self.slots)
                   if req is not None and slot != exclude]
        if not victims:
            return False
        _, slot = max(victims)
        req = self.slots[slot]
        self.pool.release(req.req_id)
        self.slots[slot] = None
        self._tables[slot] = 0
        self._tables_dirty = True
        # a mid-prefill victim just drops its progress; re-admission
        # rewrites every page from the (unchanged) prompt
        self._prefilling.pop(slot, None)
        fresh = req.generated[req.baked_generated:]
        req.input_ids = np.concatenate(
            [req.input_ids, np.asarray(fresh, np.int32)])
        req.baked_generated = len(req.generated)
        self._requeue_front(req)
        return True

    def _grow_pages(self):
        """Before each chunk, make sure every active slot owns pages for
        the tokens the chunk will write; push the table rows to device
        only when a row changed (a host->device upload through a remote
        tunnel costs milliseconds — most chunks grow nothing)."""
        for slot, req in enumerate(self.slots):
            if req is None or slot in self._prefilling:
                continue  # prefilling slots pre-allocated their prompt
            need = min(int(self._slot_len[slot])
                       + self.tokens_per_chunk * (1 + self.pipeline) + 1,
                       self.pages_per_slot * self.page_size)
            drained = False
            while True:
                try:
                    table = self.pool.allocate(req.req_id, need)
                    break
                except MemoryError:
                    if not drained:
                        # settle all in-flight chunks first: finished
                        # requests release pages, and preempting with a
                        # chunk in flight would fork a victim's history
                        # (its requeued prompt must contain exactly the
                        # recorded tokens)
                        self._drain(force=True)
                        drained = True
                        if self.slots[slot] is not req:
                            break  # this very request just finished
                        continue
                    if not self._preempt_youngest(exclude=slot):
                        raise MemoryError(
                            "page pool exhausted by a single sequence")
            if self.slots[slot] is not req:
                continue
            new_row = np.zeros(self.pages_per_slot, np.int32)
            new_row[:len(table)] = table
            if not np.array_equal(new_row, self._tables[slot]):
                self._tables[slot] = new_row
                self._tables_dirty = True
        if self._tables_dirty:
            self.cache["page_tables"] = jnp.asarray(self._tables)
            self._tables_dirty = False

    # ------------------------------------------------------------------
    def _drain(self, force: bool = False):
        """Sync + record in-flight chunks beyond the pipeline depth (all
        of them when ``force``). All poppable chunks are stacked on device
        and fetched in ONE transfer — each host<->device round trip costs
        ~45 ms through the remote tunnel, so per-chunk fetches would cap
        throughput at 1/RTT regardless of pipeline depth. Each chunk is
        recorded against the REQUESTS captured at its dispatch: if a slot
        was freed and re-admitted while the chunk was in flight, the
        stale tokens must not leak into the new occupant."""
        if not force and len(self._inflight) <= self.pipeline:
            return
        # pipeline=0 means synchronous token recording (every chunk is
        # fetched before the next dispatch); pipeline>=1 keeps one chunk
        # in flight across the sync so the device never idles
        keep = 0 if (force or self.pipeline == 0) else 1
        batch = []
        while len(self._inflight) > keep:
            batch.append(self._inflight.popleft())
        if not batch:
            return
        stacked = np.asarray(jnp.stack([dev for dev, _ in batch]))
        for chunk, (_, reqs) in zip(stacked, batch):
            for slot in range(self.num_slots):
                if reqs[slot] is None or self.slots[slot] is not reqs[slot]:
                    continue
                for tok in chunk[slot]:
                    if tok < 0:
                        continue  # speculative window hole (not emitted)
                    self._record(slot, tok)
                    if self.slots[slot] is None:
                        break  # finished mid-chunk; rest is void

    def step(self) -> int:
        """Admit waiting requests, decode `chunk_steps` tokens for all
        active slots in one jitted call, and record results `pipeline`
        chunks behind the dispatch (latency hiding — see __init__).
        Returns the number of active slots processed."""
        self._admit()
        self._advance_prefill()
        if not any(r is not None for r in self.slots):
            self._drain(force=True)
            return 0
        # grow BEFORE taking the active mask: growth may preempt a slot,
        # and a preempted slot must not be decoded or recorded this chunk
        self._grow_pages()
        active_mask = np.asarray(
            [r is not None and s not in self._prefilling
             for s, r in enumerate(self.slots)], bool)
        if not active_mask.any():
            return 0
        temps = np.asarray(
            [r.temperature if r else 0.0 for r in self.slots], np.float32)
        # every host->device upload through a remote tunnel costs
        # milliseconds: re-upload tokens/active/temps only when they
        # changed (admissions/finishes), and feed the previous step's
        # DEVICE token array straight back between quiet steps
        if self._tokens_dev is None:
            self._tokens_dev = jnp.asarray(self._slot_tokens)
        if self._active_np is None or \
                not np.array_equal(active_mask, self._active_np):
            self._active_np = active_mask
            self._active_dev = jnp.asarray(active_mask)
            self._temps_dev = jnp.asarray(temps)
        if float(temps.max()) > 1e-4:
            self._rng, sub = jax.random.split(self._rng)
        else:
            sub = self._rng   # all-greedy: the sample branch is discarded
        if self.spec_draft:
            if self._hist_dev is None:
                self._hist_dev = jnp.asarray(self._hist_np)
                self._hist_len_dev = jnp.asarray(self._hist_len_np)
            (chunk_dev, last, self.cache, self._hist_dev,
             self._hist_len_dev) = self._spec_chunk(
                self.params, self._tokens_dev, self.cache,
                self._active_dev, self._hist_dev, self._hist_len_dev,
                sub, self._temps_dev)
        elif self.chunk_steps == 1:
            # no-scan path: the chunk scan's carry holds a SECOND copy of
            # the whole paged pool during compile; single-step decode with
            # donated cache avoids it (what lets full-7B serving fit a
            # 16GB chip). Per-step dispatch (~0.35 ms) is noise against a
            # 7B step (~23 ms); small models should keep chunk_steps > 1.
            last, self.cache = self._decode(
                self.params, self._tokens_dev,
                self.cache, self._active_dev, sub, self._temps_dev)
            chunk_dev = last[:, None]
        else:
            chunk_dev, last, self.cache = self._decode_chunk(
                self.params, self._tokens_dev,
                self.cache, self._active_dev, sub, self._temps_dev)
        self._tokens_dev = last
        # a prefilling slot is occupied but NOT in this chunk: its rows
        # are pad and must never be recorded against the new occupant
        self._inflight.append((chunk_dev, [
            None if s in self._prefilling else r
            for s, r in enumerate(self.slots)]))
        self._drain()
        return int(active_mask.sum())

    def fail_all(self, reason: str):
        """Fail every active and queued request (error set, error sentinel
        emitted) and reset the slots/pool/pipeline to a clean state.

        Recovery path for a device/transport exception out of step():
        without it the driving loop dies silently and queued clients hang
        until their own timeouts while the worker keeps heartbeating as
        healthy. After fail_all the engine accepts new requests — if the
        fault was transient (a tunnel blip) service resumes; if it is
        persistent, each new request fails fast instead of hanging."""
        with self._lock:
            pending = list(self._queue)
            self._queue.clear()
        for req in [r for r in self.slots if r is not None] + pending:
            req.done = True
            req.error = reason
            if req.emit:
                try:
                    req.emit(-1, True)  # error sentinel (see Request)
                except Exception:
                    pass
        for slot, req in enumerate(self.slots):
            if req is not None:
                self.pool.release(req.req_id)
                self.slots[slot] = None
        self._inflight.clear()
        self._prefilling.clear()
        self._tables[:] = 0
        self._tables_dirty = True
        self._slot_tokens[:] = 0
        self._slot_len[:] = 0
        self._tokens_dev = None
        self._active_np = None
        if self.spec_draft:
            self._hist_np[:] = 0
            self._hist_len_np[:] = 0
            self._hist_dev = None
            self._hist_len_dev = None

    def close(self):
        """Release device buffers. The jitted step closures reference
        ``self`` (a reference cycle), so without this the KV pool and the
        params stay alive until a full GC pass — at 7B that is ~15 GB
        still resident when the next model loads."""
        import gc

        if self.mesh is not None:
            from merlin_tpu.core.mesh import get_global_mesh, set_global_mesh

            if get_global_mesh() is self.mesh:
                set_global_mesh(self._prev_mesh)  # restore, don't clobber
        self.cache = None
        self.params = None
        self._prefill = self._insert = self._first_token = None
        self._decode = self._decode_chunk = None
        if self.prefill_chunk:
            self._prefill_window = None
            self._prefilling.clear()
        self._tokens_dev = self._active_dev = self._temps_dev = None
        if self.spec_draft:
            self._hist_dev = self._hist_len_dev = None
            self._spec_chunk = None
        gc.collect()

    def run_until_idle(self, max_steps: int = 100000):
        while True:
            with self._lock:
                queued = bool(self._queue)
            if not queued and all(r is None for r in self.slots) \
                    and not self._inflight:
                return
            self.step()
            max_steps -= 1
            if max_steps <= 0:
                raise RuntimeError("engine did not drain")
