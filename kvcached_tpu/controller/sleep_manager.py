"""Sleep manager: reclaim HBM from idle models (reference: controller/sleep_manager.py).

Idle models (per the traffic monitor) are put to sleep — weights offloaded
to host RAM, KV pages released to the shared pool — and woken on demand when
a request arrives.  Works against in-process :class:`ModelHandle`s (the TPU
colocation model) or any object with ``sleep()/wake_up()/sleeping``.
"""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field

from ..logging_utils import get_kvcached_logger
from .traffic_monitor import TrafficMonitor

logger = get_kvcached_logger(__name__)


@dataclass
class SleepConfig:
    """Reference defaults: idle 300 s, check every 60 s, min sleep 60 s
    (controller/sleep_manager.py:17-37)."""

    enabled: bool = True
    idle_threshold_s: float = 300.0
    check_interval_s: float = 60.0
    min_sleep_duration_s: float = 60.0
    auto_sleep_models: set = field(default_factory=set)  # empty = all
    never_sleep_models: set = field(default_factory=set)
    #: 1 = offload weights to host RAM (vLLM /sleep?level=1); 2 = discard
    #: weights, wake reloads from the checkpoint dir (the SGLang
    #: release + /update_weights_from_disk shape, reference :507-587)
    sleep_level: int = 1


class SleepManager:
    def __init__(
        self,
        handles: dict[str, object],
        monitor: TrafficMonitor,
        config: SleepConfig | None = None,
    ):
        self.handles = handles
        self.monitor = monitor
        self.config = config or SleepConfig()
        self.manual_sleep: set[str] = set()
        self._sleep_since: dict[str, float] = {}
        self._task: asyncio.Task | None = None

    # -- queries -------------------------------------------------------------

    def is_sleeping(self, model: str) -> bool:
        h = self.handles.get(model)
        return bool(h and getattr(h, "sleeping", False))

    def status(self) -> dict:
        return {
            m: {
                "sleeping": self.is_sleeping(m),
                "manual": m in self.manual_sleep,
                "sleep_since": self._sleep_since.get(m),
            }
            for m in self.handles
        }

    def sleep_candidates(self) -> list[str]:
        cfg = self.config
        idle = set(self.monitor.idle_models())
        out = []
        for m in self.handles:
            if self.is_sleeping(m) or m in cfg.never_sleep_models:
                continue
            if cfg.auto_sleep_models and m not in cfg.auto_sleep_models:
                continue
            if m in idle:
                out.append(m)
        return out

    # -- actions -------------------------------------------------------------

    def sleep_model(
        self, model: str, manual: bool = False, level: int | None = None
    ) -> bool:
        h = self.handles.get(model)
        if h is None:
            return False
        lvl = self.config.sleep_level if level is None else level
        if getattr(h, "sleeping", False):
            # already sleeping: only an explicit UPGRADE (e.g. 1 → 2,
            # discarding the host copy) passes through to the handle
            if level is None or lvl <= getattr(h, "sleep_level", 1):
                return False
        if lvl == 1:
            h.sleep()  # bare call keeps duck-typed handles working
        else:
            try:
                h.sleep(level=lvl)
            except (ValueError, TypeError) as e:
                # TypeError: duck-typed handles whose sleep() takes no
                # level kwarg (this module promises to work against any
                # object with sleep()/wake_up()/sleeping)
                if level is not None:
                    raise  # explicit request: surface the error to the caller
                # config-driven auto-sleep, e.g. level 2 on a model with no
                # checkpoint dir — degrade to the host-offload level rather
                # than leaving an idle model holding HBM
                logger.warning(
                    "sleep level %d unavailable for %s (%s); using level 1",
                    lvl, model, e,
                )
                h.sleep()
        self._sleep_since[model] = time.time()
        if manual:
            self.manual_sleep.add(model)
        return True

    def wake_model(self, model: str) -> bool:
        h = self.handles.get(model)
        if h is None or not getattr(h, "sleeping", False):
            return False
        h.wake_up()
        self.manual_sleep.discard(model)
        self._sleep_since.pop(model, None)
        return True

    def handle_model_wakeup_on_request(self, model: str) -> bool:
        """Router calls this before dispatch (reference :275-294)."""
        if self.is_sleeping(model):
            logger.info("waking %s on incoming request", model)
            return self.wake_model(model)
        return False

    # -- background idle loop ------------------------------------------------

    async def start(self) -> None:
        if self.config.enabled and self._task is None:
            self._task = asyncio.create_task(self._idle_loop())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    async def _idle_loop(self) -> None:
        while True:
            await asyncio.sleep(self.config.check_interval_s)
            try:
                for model in self.sleep_candidates():
                    logger.info("auto-sleeping idle model %s", model)
                    self.sleep_model(model)
            except Exception as e:  # keep the loop alive
                logger.error("sleep loop error: %s", e)
