"""Model router (reference: controller/router.py).

Maps model names to in-process engine handles (or remote HTTP endpoints),
records traffic, and wakes sleeping models before dispatch.
"""

from __future__ import annotations

from ..engine import SamplingParams
from ..logging_utils import get_kvcached_logger
from .sleep_manager import SleepManager
from .traffic_monitor import TrafficMonitor

logger = get_kvcached_logger(__name__)


class LLMRouter:
    def __init__(
        self,
        runner,  # AsyncEngineRunner
        monitor: TrafficMonitor,
        sleep_manager: SleepManager,
    ):
        self.runner = runner
        self.monitor = monitor
        self.sleep_manager = sleep_manager

    def models(self) -> list[str]:
        return list(self.runner.models)

    def health(self, model: str | None = None) -> dict:
        if model is None:
            return {"status": "ok", "models": self.models()}
        if model not in self.runner.models:
            return {"status": "unknown"}
        return {
            "status": "sleeping" if self.sleep_manager.is_sleeping(model) else "ok"
        }

    async def route_request(
        self,
        model: str,
        prompt: list[int],
        sampling: SamplingParams,
        stream: bool = False,
        priority: int = 0,
    ):
        """Record stats → wake if sleeping → dispatch (reference :125-235).
        Returns (future, stream_queue)."""
        if model not in self.runner.models:
            raise KeyError(model)
        self.monitor.record_request_start(model)
        self.sleep_manager.handle_model_wakeup_on_request(model)
        try:
            fut, q = await self.runner.submit(
                model, prompt, sampling, stream, priority=priority
            )
        except Exception:
            self.monitor.record_request_end(model, error=True)
            raise

        def _done(f):
            self.monitor.record_request_end(model, error=f.exception() is not None)

        fut.add_done_callback(_done)
        return fut, q
