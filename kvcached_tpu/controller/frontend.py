"""Multi-LLM HTTP frontend (reference: controller/frontend.py).

One aiohttp server composing router + traffic monitor + sleep manager over
colocated engines.  Endpoints mirror the reference's:

    POST /v1/completions            POST /v1/chat/completions
    GET  /health[/{model}]          GET  /models
    GET  /traffic/stats             GET  /models/idle  /models/active
    GET  /sleep/status              GET  /sleep/candidates
    POST /action/sleep/{model}      POST /action/wakeup/{model}
    GET  /metrics
"""

from __future__ import annotations

import json
import uuid

from ..engine import SamplingParams
from ..logging_utils import get_kvcached_logger
from ..server import AsyncEngineRunner, ByteTokenizer
from .router import LLMRouter
from .sleep_manager import SleepConfig, SleepManager
from .traffic_monitor import TrafficMonitor

logger = get_kvcached_logger(__name__)


class MultiLLMFrontend:
    def __init__(
        self,
        runner: AsyncEngineRunner,
        sleep_config: SleepConfig | None = None,
        tokenizer: ByteTokenizer | None = None,
    ):
        self.runner = runner
        self.tokenizer = tokenizer or ByteTokenizer()
        sleep_config = sleep_config or SleepConfig()
        self.monitor = TrafficMonitor(idle_threshold_s=sleep_config.idle_threshold_s)
        self.sleep_manager = SleepManager(runner.models, self.monitor, sleep_config)
        self.router = LLMRouter(runner, self.monitor, self.sleep_manager)

    # ------------------------------------------------------------- handlers

    def _parse_request(self, body: dict):
        model = body.get("model") or next(iter(self.runner.models), None)
        if "prompt_token_ids" in body:
            prompt = [int(t) for t in body["prompt_token_ids"]]
        elif "messages" in body:
            text = "\n".join(
                f"{m.get('role', 'user')}: {m.get('content', '')}"
                for m in body["messages"]
            )
            prompt = self.tokenizer.encode(text + "\nassistant:")
        else:
            prompt = self.tokenizer.encode(str(body.get("prompt", "")))
        sampling = SamplingParams(
            max_new_tokens=int(body.get("max_tokens", 32)),
            temperature=float(body.get("temperature", 0.0)),
        )
        return (model, prompt, sampling, bool(body.get("stream", False)),
                int(body.get("priority", 0)))

    async def handle_completion(self, request):
        from aiohttp import web

        body = await request.json()
        model, prompt, sampling, stream, priority = self._parse_request(body)
        if model not in self.runner.models:
            return web.json_response({"error": f"unknown model {model!r}"}, status=404)
        fut, q = await self.router.route_request(
            model, prompt, sampling, stream, priority=priority
        )

        if stream:
            resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
            await resp.prepare(request)
            while True:
                chunk = await q.get()
                if chunk is None:
                    break
                payload = {
                    "model": model,
                    "choices": [
                        {"text": self.tokenizer.decode(chunk), "token_ids": chunk}
                    ],
                }
                await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            await resp.write_eof()
            return resp

        out = await fut
        return web.json_response({
            "id": f"cmpl-{uuid.uuid4().hex[:12]}",
            "model": model,
            "choices": [{
                "text": self.tokenizer.decode(out.output_tokens),
                "token_ids": out.output_tokens,
                "finish_reason": "stop",
            }],
            "usage": {
                "prompt_tokens": len(prompt),
                "completion_tokens": len(out.output_tokens),
            },
        })

    # --------------------------------------------------------------- wiring

    def build_app(self):
        from aiohttp import web

        async def health(request):
            return web.json_response(
                self.router.health(request.match_info.get("model"))
            )

        async def models(_):
            return web.json_response({
                "data": [
                    {"id": m, "object": "model",
                     "status": "sleeping" if self.sleep_manager.is_sleeping(m)
                     else "active"}
                    for m in self.router.models()
                ]
            })

        async def traffic_stats(_):
            return web.json_response(self.monitor.summary())

        async def idle_models(_):
            return web.json_response({"idle": self.monitor.idle_models()})

        async def active_models(_):
            return web.json_response({"active": self.monitor.active_models()})

        async def sleep_status(_):
            return web.json_response(self.sleep_manager.status())

        async def sleep_candidates(_):
            return web.json_response(
                {"candidates": self.sleep_manager.sleep_candidates()}
            )

        async def action_sleep(request):
            model = request.match_info["model"]
            # ?level=1 offloads weights to host; ?level=2 discards them
            # (wake reloads from the model's checkpoint dir).  Unset falls
            # back to SleepConfig.sleep_level.
            try:
                level = request.query.get("level")
                level = int(level) if level is not None else None
            except ValueError:
                return web.json_response({"error": "invalid level"}, status=400)
            try:
                ok = self.sleep_manager.sleep_model(model, manual=True, level=level)
            except ValueError as e:
                return web.json_response({"error": str(e)}, status=400)
            return web.json_response({"ok": ok, "sleeping": self.sleep_manager.is_sleeping(model)})

        async def action_wakeup(request):
            model = request.match_info["model"]
            ok = self.sleep_manager.wake_model(model)
            return web.json_response({"ok": ok, "sleeping": self.sleep_manager.is_sleeping(model)})

        async def metrics(_):
            return web.json_response({
                name: h.engine.kv_metrics()
                for name, h in self.runner.models.items()
            })

        async def on_startup(_app):
            self.runner.start()
            await self.sleep_manager.start()

        async def on_cleanup(_app):
            await self.sleep_manager.stop()
            self.runner.stop()

        app = web.Application()
        r = app.router
        r.add_post("/v1/completions", self.handle_completion)
        r.add_post("/v1/chat/completions", self.handle_completion)
        r.add_get("/health", health)
        r.add_get("/health/{model}", health)
        r.add_get("/models", models)
        r.add_get("/traffic/stats", traffic_stats)
        r.add_get("/models/idle", idle_models)
        r.add_get("/models/active", active_models)
        r.add_get("/sleep/status", sleep_status)
        r.add_get("/sleep/candidates", sleep_candidates)
        r.add_post("/action/sleep/{model}", action_sleep)
        r.add_post("/action/wakeup/{model}", action_wakeup)
        r.add_get("/metrics", metrics)
        # cross-host operator plane: this host's shm segments over HTTP
        # (kvctl/kvtop --remote; SURVEY §2f N≥2-hosts aggregation)
        from .shm_http import add_shm_routes

        add_shm_routes(app)
        app.on_startup.append(on_startup)
        app.on_cleanup.append(on_cleanup)
        return app
