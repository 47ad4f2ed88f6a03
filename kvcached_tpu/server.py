"""Async multi-model serving runtime + HTTP API.

TPU chips are held by a single process, so the reference's "N engine
processes colocated on one GPU" becomes **N engines colocated in one
runtime process**, all drawing physical pages from one shared
:class:`DevicePagePool` — the same elastic arbitration, without the
cross-process VMM machinery.  The /dev/shm control plane is kept per engine
so `kvctl`/`kvtop` (and any external scheduler) work unchanged from other
processes.

- :class:`AsyncEngineRunner` — one background thread steps all colocated
  engines (the chip is serial anyway); asyncio callers await per-request
  futures.
- :class:`ByteTokenizer` — self-contained byte-level tokenizer so the HTTP
  text API works without downloaded vocabularies; ``prompt_token_ids``
  bypasses it for callers with real tokenizers.
- ``build_app`` — aiohttp app: /v1/completions (+streaming), /health,
  /models, /metrics, and the sleep/wake endpoints the controller's sleep
  manager drives (reference: vLLM /sleep /wake_up /is_sleeping,
  controller/sleep_manager.py:305-397).

Sleep level 1 offloads weights to host RAM and frees all KV pages back to
the shared pool (the serverless cold-start story, reference examples/06).
"""

from __future__ import annotations

import asyncio
import json
import threading
import time
import uuid
from dataclasses import dataclass, field

import jax
import numpy as np

from .engine import EngineConfig, LLMEngine, SamplingParams
from .logging_utils import get_kvcached_logger

logger = get_kvcached_logger(__name__)


class ByteTokenizer:
    """Byte-level tokenizer: token = byte + 3 (0=pad, 1=bos, 2=eos)."""

    PAD, BOS, EOS = 0, 1, 2
    VOCAB = 259

    def encode(self, text: str) -> list[int]:
        return [self.BOS] + [b + 3 for b in text.encode("utf-8")]

    def decode(self, tokens: list[int]) -> str:
        # clamp into byte range: models with vocab > 259 (e.g. toy configs)
        # may emit ids past the byte span; decode stays total
        data = bytes((t - 3) % 256 for t in tokens if t >= 3)
        return data.decode("utf-8", errors="replace")


@dataclass
class _Pending:
    prompt: list[int]
    sampling: SamplingParams
    future: asyncio.Future
    loop: asyncio.AbstractEventLoop
    stream_queue: asyncio.Queue | None = None
    emitted: int = 0
    #: scheduling priority (smaller = sooner) under the engine's
    #: "priority" scheduling_policy; ignored otherwise
    priority: int = 0


class ModelHandle:
    """One served model: engine + sleep state + request plumbing.

    ``sleep``/``wake_up`` are safe to call from any thread: when an
    :class:`AsyncEngineRunner` is stepping this engine, the transition is
    routed onto the runner thread (a control queue drained between steps),
    so weights/pages never change under an in-flight device step.  In-flight
    sequences are preempted back to the waiting queue and recomputed after
    wake — sleeping a busy model delays its requests, never corrupts them.
    """

    def __init__(self, name: str, engine: LLMEngine, ckpt_dir: str | None = None):
        self.name = name
        self.engine = engine
        self.sleeping = False
        self.sleep_level = 0
        #: HF checkpoint directory backing this model, enabling sleep
        #: level 2 (discard weights entirely; wake reloads from disk —
        #: the reference's SGLang wake path, which resumes memory
        #: occupation then /update_weights_from_disk,
        #: controller/sleep_manager.py:507-587)
        self.ckpt_dir = ckpt_dir
        self._host_params = None
        self.pending: dict[int, _Pending] = {}
        self.runner: "AsyncEngineRunner | None" = None

    # -- sleep / wake (in-process analogue of vLLM sleep level 1/2) ---------

    def sleep(self, level: int = 1) -> None:
        if level not in (1, 2):
            raise ValueError(f"sleep level must be 1 or 2, got {level}")
        if level == 2 and self.ckpt_dir is None:
            # validate on the caller's thread, before any state is touched
            raise ValueError(
                f"model {self.name!r} has no checkpoint directory; sleep "
                f"level 2 discards weights and must reload them from disk "
                f"on wake (pass ckpt_dir= to add_model / 'checkpoint:' in "
                f"the launch YAML)"
            )
        if self.sleeping and level < self.sleep_level:
            # level 2 already discarded the weights — there is nothing to
            # offload to host RAM, so a downgrade cannot be honored
            raise ValueError(
                f"model {self.name!r} is sleeping at level "
                f"{self.sleep_level}; cannot lower to level {level} "
                f"(weights are gone — wake it first)"
            )
        self._via_runner("sleep2" if level == 2 else "sleep")

    def wake_up(self) -> None:
        # reloading a multi-GB checkpoint from cold disk can far exceed the
        # default control timeout that host-RAM restores fit in
        self._via_runner("wake", timeout=600.0 if self.sleep_level == 2 else 30.0)

    def _via_runner(self, op: str, timeout: float = 30.0) -> None:
        r = self.runner
        if r is not None and r.is_running_elsewhere():
            r.control_sync(self, op, timeout=timeout)
        else:
            self._apply_control(op)

    def _apply_control(self, op: str) -> None:
        if op == "wake":
            self._do_wake()
        else:
            self._do_sleep(level=2 if op == "sleep2" else 1)

    def _do_sleep(self, level: int = 1) -> None:
        """Must run on the thread that owns engine stepping."""
        if self.sleeping:
            if level == 2 and self.sleep_level == 1:
                # UPGRADE: discard the host copy so level 2 really frees
                # host RAM (wake will reload from the checkpoint)
                self._host_params = None
                self.sleep_level = 2
                logger.info("model %s sleep upgraded to level 2 "
                            "(host copy discarded)", self.name)
            return
        eng = self.engine
        # preempt in-flight sequences back to waiting (frees their pages);
        # they recompute after wake
        while eng.running:
            eng._preempt_one()
        eng.preempt_prefilling()  # a mid-prefill sequence also rolls back
        if level == 2:
            # discard weights entirely — wake reloads from the checkpoint
            self._host_params = None
        else:
            # offload weights to host RAM
            self._host_params = jax.tree.map(np.asarray, eng.params)
        eng.params = None
        evicted = eng.prefix_cache.reset()
        if evicted:
            eng.manager.free(evicted)
        eng.manager.trim()
        self.sleeping = True
        self.sleep_level = level
        logger.info(
            "model %s sleeping at level %d (%s)", self.name, level,
            "weights discarded" if level == 2 else "weights offloaded to host",
        )

    def _do_wake(self) -> None:
        if not self.sleeping:
            return
        eng = self.engine
        if self.sleep_level == 2:
            from .models.hf_loader import params_from_hf

            # model_cfg may be a PP adapter wrapping the real config
            mc = getattr(eng.model_cfg, "cfg", eng.model_cfg)
            _, params = params_from_hf(
                self.ckpt_dir, cfg=mc,
                dtype=str(getattr(mc, "dtype", "bfloat16")),
            )
            eng.install_params(params)
            logger.info("model %s awake (weights reloaded from %s)",
                        self.name, self.ckpt_dir)
        else:
            eng.install_params(
                jax.tree.map(jax.numpy.asarray, self._host_params),
                pp_stacked=True,
            )
            logger.info("model %s awake", self.name)
        self._host_params = None
        self.sleeping = False
        self.sleep_level = 0


class _Control:
    """A queued sleep/wake: completion event + the runner-side error (the
    runner thread must survive a failing control — it steps every model)."""

    __slots__ = ("handle", "op", "done", "error")

    def __init__(self, handle: "ModelHandle", op: str):
        self.handle = handle
        self.op = op
        self.done = threading.Event()
        self.error: BaseException | None = None


class AsyncEngineRunner:
    """Steps all colocated engines on one background thread; bridges to
    asyncio via futures + thread-safe queues."""

    def __init__(self):
        self.models: dict[str, ModelHandle] = {}
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._submissions: list[tuple[ModelHandle, _Pending]] = []
        # (handle, op, done-event) sleep/wake requests, executed on the
        # runner thread between steps so state never changes mid-step
        self._controls: list[_Control] = []

    def add_model(
        self, name: str, engine: LLMEngine, ckpt_dir: str | None = None
    ) -> ModelHandle:
        handle = ModelHandle(name, engine, ckpt_dir=ckpt_dir)
        handle.runner = self
        self.models[name] = handle
        return handle

    def is_running_elsewhere(self) -> bool:
        t = self._thread
        return (
            t is not None
            and t.is_alive()
            and threading.current_thread() is not t
        )

    def control_sync(self, handle: ModelHandle, op: str, timeout: float = 30.0) -> None:
        """Enqueue a sleep/wake for the runner thread and wait for it.
        An error on the runner thread (e.g. a level-2 wake whose checkpoint
        dir vanished) re-raises HERE, on the caller."""
        ctl = _Control(handle, op)
        with self._lock:
            self._controls.append(ctl)
        self._wake.set()
        if not ctl.done.wait(timeout):
            raise TimeoutError(f"{op} of {handle.name} timed out")
        if ctl.error is not None:
            raise ctl.error

    def start(self) -> None:
        if self._thread is None:
            self._stop.clear()  # allow restart after a previous stop()
            self._thread = threading.Thread(
                target=self._run, name="engine-runner", daemon=True
            )
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        # run leftover controls inline so control_sync callers don't hang
        with self._lock:
            ctls, self._controls = self._controls, []
        for ctl in ctls:
            try:
                ctl.handle._apply_control(ctl.op)
            except BaseException as e:  # noqa: BLE001 — reported to caller
                ctl.error = e
                logger.error("control %s of %s failed: %s",
                             ctl.op, ctl.handle.name, e)
            finally:
                ctl.done.set()

    async def submit(
        self,
        model: str,
        prompt: list[int],
        sampling: SamplingParams,
        stream: bool = False,
        priority: int = 0,
    ):
        """Submit a request; returns (future, stream_queue|None)."""
        handle = self.models[model]
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        q: asyncio.Queue | None = asyncio.Queue() if stream else None
        pending = _Pending(prompt, sampling, fut, loop, q, priority=priority)
        with self._lock:
            self._submissions.append((handle, pending))
        self._wake.set()
        return fut, q

    # -- engine thread -------------------------------------------------------

    def _run(self) -> None:
        while not self._stop.is_set():
            with self._lock:
                subs, self._submissions = self._submissions, []
                ctls, self._controls = self._controls, []
            for ctl in ctls:
                try:
                    ctl.handle._apply_control(ctl.op)
                except BaseException as e:  # noqa: BLE001
                    ctl.error = e
                    logger.error("control %s of %s failed: %s",
                                 ctl.op, ctl.handle.name, e)
                finally:
                    ctl.done.set()
            for handle, pending in subs:
                req_id = handle.engine.add_request(
                    pending.prompt, pending.sampling,
                    priority=pending.priority,
                )
                handle.pending[req_id] = pending
            busy = False
            for handle in self.models.values():
                if handle.sleeping or not handle.pending:
                    continue
                if handle.engine.has_unfinished():
                    handle.engine.step()
                    busy = True
                self._drain_finished(handle)
            if not busy:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def _drain_finished(self, handle: ModelHandle) -> None:
        # stream partial tokens for running sequences
        for seq in handle.engine.running:
            p = handle.pending.get(seq.req.req_id)
            if p and p.stream_queue is not None:
                new = seq.tokens[seq.prompt_len + p.emitted :]
                if new:
                    p.emitted += len(new)
                    p.loop.call_soon_threadsafe(p.stream_queue.put_nowait, list(new))
        done = handle.engine.finished_outputs
        if not done:
            return
        handle.engine.finished_outputs = []
        for out in done:
            p = handle.pending.pop(out.req_id, None)
            if p is None:
                continue
            if p.stream_queue is not None:
                tail = out.output_tokens[p.emitted :]
                if tail:
                    p.loop.call_soon_threadsafe(p.stream_queue.put_nowait, list(tail))
                p.loop.call_soon_threadsafe(p.stream_queue.put_nowait, None)
            if not p.future.done():
                p.loop.call_soon_threadsafe(p.future.set_result, out)


def build_app(runner: AsyncEngineRunner, tokenizer: ByteTokenizer | None = None):
    """aiohttp application exposing the OpenAI-ish + operator API."""
    from aiohttp import web

    tok = tokenizer or ByteTokenizer()

    def _get_handle(name: str) -> ModelHandle | None:
        return runner.models.get(name)

    async def _serve(request: web.Request, body: dict,
                     chat: bool = False) -> web.StreamResponse:
        model = body.get("model") or next(iter(runner.models), None)
        handle = _get_handle(model)
        if handle is None:
            return web.json_response({"error": f"unknown model {model!r}"}, status=404)
        if chat:
            msgs = body.get("messages", [])
            if hasattr(tok, "apply_chat_template"):
                # real chat models: the tokenizer's own template (HFTokenizer)
                prompt = tok.apply_chat_template(msgs)
            else:
                text = "\n".join(
                    f"{m.get('role', 'user')}: {m.get('content', '')}"
                    for m in msgs
                )
                prompt = tok.encode(text + "\nassistant:")
        elif "prompt_token_ids" in body:
            prompt = [int(t) for t in body["prompt_token_ids"]]
        else:
            prompt = tok.encode(str(body.get("prompt", "")))
        stop_ids = tuple(int(t) for t in body.get("stop_token_ids", ()))
        stop_raw = body.get("stop", ())
        stops = (
            (stop_raw,) if isinstance(stop_raw, str)
            else tuple(str(s) for s in stop_raw)
        )
        if stops and handle.engine.tokenizer is None:
            # stop strings need detokenization inside the engine
            handle.engine.tokenizer = tok
        sampling = SamplingParams(
            max_new_tokens=int(body.get("max_tokens", 32)),
            temperature=float(body.get("temperature", 0.0)),
            top_k=int(body.get("top_k", 0)),
            top_p=float(body.get("top_p", 1.0)),
            stop_token_ids=stop_ids,
            stop=stops,
        )
        if handle.sleeping:
            # wake-on-request: runs on the runner thread (never mid-step)
            await asyncio.get_running_loop().run_in_executor(
                None, handle.wake_up
            )
        stream = bool(body.get("stream", False))
        fut, q = await runner.submit(
            model, prompt, sampling, stream=stream,
            priority=int(body.get("priority", 0)),
        )

        if stream:
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            # stop strings: emit cumulative-decode deltas, HOLDING BACK
            # enough trailing text to cover (a) a stop string split across
            # chunk boundaries and (b) lossy-decode instability at the tail
            # (an incomplete multi-byte sequence renders as U+FFFD until
            # its continuation arrives) — then truncate before the earliest
            # stop, matching the non-streaming path's OpenAI semantics.
            # token_ids are omitted from stop-filtered streams: the text is
            # detokenizer-truncated, so raw chunk ids would reproduce the
            # stop marker and over-generated tail.
            hold = max((len(s) for s in stops), default=1) + 3
            all_toks: list[int] = []
            emitted = 0  # chars confirmed sent (stable region of `full`)

            async def _emit(text: str, chunk=None):
                if not text:
                    return
                choice = {"text": text}
                if chunk is not None:
                    choice["token_ids"] = chunk
                await resp.write(
                    f"data: {json.dumps({'choices': [choice], 'model': model})}\n\n".encode()
                )

            stopped = False
            while True:
                chunk = await q.get()
                if chunk is None:
                    break
                all_toks.extend(chunk)
                if stops:
                    full = tok.decode(all_toks)
                    cut = min(
                        (full.find(s) for s in stops if s in full),
                        default=-1,
                    )
                    if cut >= 0:
                        await _emit(full[emitted:cut])
                        stopped = True
                        break
                    safe = max(emitted, len(full) - hold)
                    await _emit(full[emitted:safe])
                    emitted = safe
                else:
                    await _emit(tok.decode(chunk), chunk)
            if stops and not stopped:
                # flush the holdback once generation finished without a stop
                full = tok.decode(all_toks)
                cut = min(
                    (full.find(s) for s in stops if s in full), default=-1
                )
                await _emit(full[emitted : cut if cut >= 0 else len(full)])
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        out = await fut
        # a fired stop string carries pre-truncated text (OpenAI semantics:
        # the stop itself is excluded from the response)
        text = (
            out.output_text if out.output_text is not None
            else tok.decode(out.output_tokens)
        )
        finish = (
            "stop"
            if out.output_text is not None or (
                stop_ids and out.output_tokens
                and out.output_tokens[-1] in stop_ids
            )
            else "length"
        )
        if chat:
            choice = {
                "index": 0,
                "message": {"role": "assistant", "content": text},
                "finish_reason": finish,
            }
            obj = "chat.completion"
        else:
            choice = {
                "text": text,
                "token_ids": out.output_tokens,
                "finish_reason": finish,
            }
            obj = "text_completion"
        return web.json_response({
            "id": f"cmpl-{uuid.uuid4().hex[:12]}",
            "object": obj,
            "model": model,
            "choices": [choice],
            "usage": {
                "prompt_tokens": len(prompt),
                "completion_tokens": len(out.output_tokens),
            },
        })

    async def completions(request: web.Request) -> web.StreamResponse:
        return await _serve(request, await request.json(), chat=False)

    async def chat_completions(request: web.Request) -> web.StreamResponse:
        return await _serve(request, await request.json(), chat=True)

    async def health(request: web.Request) -> web.Response:
        model = request.match_info.get("model")
        if model:
            h = _get_handle(model)
            if h is None:
                return web.json_response({"status": "unknown"}, status=404)
            return web.json_response(
                {"status": "sleeping" if h.sleeping else "ok"}
            )
        return web.json_response({"status": "ok", "models": list(runner.models)})

    async def models_list(_request: web.Request) -> web.Response:
        return web.json_response({
            "data": [
                {"id": name, "object": "model",
                 "status": "sleeping" if h.sleeping else "active"}
                for name, h in runner.models.items()
            ]
        })

    async def metrics(_request: web.Request) -> web.Response:
        return web.json_response({
            name: h.engine.kv_metrics() for name, h in runner.models.items()
        })

    async def sleep_ep(request: web.Request) -> web.Response:
        model = request.match_info["model"]
        h = _get_handle(model)
        if h is None:
            return web.json_response({"error": "unknown model"}, status=404)
        # ?level=1 offloads weights to host RAM; ?level=2 discards them
        # (wake reloads from the model's checkpoint dir) — vLLM's
        # /sleep?level=N parameter (controller/sleep_manager.py:305-397)
        try:
            level = int(request.query.get("level", "1"))
        except ValueError:
            return web.json_response({"error": "invalid level"}, status=400)
        # block an executor thread, not the event loop, while the runner
        # thread finishes its current step and applies the transition
        try:
            await asyncio.get_running_loop().run_in_executor(
                None, lambda: h.sleep(level)
            )
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"status": "sleeping", "level": level})

    async def wake_ep(request: web.Request) -> web.Response:
        model = request.match_info["model"]
        h = _get_handle(model)
        if h is None:
            return web.json_response({"error": "unknown model"}, status=404)
        await asyncio.get_running_loop().run_in_executor(None, h.wake_up)
        return web.json_response({"status": "awake"})

    async def is_sleeping(request: web.Request) -> web.Response:
        model = request.match_info["model"]
        h = _get_handle(model)
        if h is None:
            return web.json_response({"error": "unknown model"}, status=404)
        return web.json_response({"is_sleeping": h.sleeping})

    app = web.Application()
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_get("/health", health)
    app.router.add_get("/health/{model}", health)
    app.router.add_get("/models", models_list)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/sleep/{model}", sleep_ep)
    app.router.add_post("/wake_up/{model}", wake_ep)
    app.router.add_get("/is_sleeping/{model}", is_sleeping)
    return app
