"""Launcher: YAML config → colocated multi-model serving runtime.

Reference ``controller/launch.py`` spawns one engine process per model in
tmux; on TPU a chip belongs to one process, so colocated models live in one
runtime sharing a :class:`DevicePagePool` — this launcher builds them and
starts the frontend.  (Multi-chip hosts run one launcher per chip.)

Config shape (see examples/two_models.yaml):

    port: 8080
    pool:
      num_pages: 2048          # or hbm_utilization: 0.8
      page_tokens: 64
    sleep:
      idle_threshold_s: 300
      check_interval_s: 60
    models:
      - name: llama-a
        family: llama          # llama | qwen2 | qwen3 | mistral | gemma2 | mla | hybrid | hybrid_linear
        # OR: checkpoint: /path/to/hf_dir   (config.json + safetensors)
        config: {hidden_size: 2048, num_layers: 16, ...}
        engine: {max_batch: 8, max_model_len: 2048}
        kvcached_ipc: kvcached_llama_a    # shm segment for kvctl
"""

from __future__ import annotations

import argparse

from ..config import KVConfig
from ..device.pool import DevicePagePool, PoolSpec, hbm_free_bytes
from ..engine import EngineConfig, LLMEngine
from ..logging_utils import get_kvcached_logger
from ..server import AsyncEngineRunner
from .frontend import MultiLLMFrontend
from .sleep_manager import SleepConfig

logger = get_kvcached_logger(__name__)


def _model_cfg(family: str, cfg: dict):
    cfg = dict(cfg)
    # YAML lists → the tuples the frozen configs expect
    for key in ("layer_windows", "layer_types"):
        if key in cfg:
            cfg[key] = tuple(cfg[key])
    if family in ("llama", "mistral", "qwen2", "qwen3"):
        from ..models.llama import LlamaConfig

        # qwen2 = llama + additive qkv biases; qwen3 = llama + per-head
        # q/k norms; mistral = llama + the sliding_window field (all
        # plain LlamaConfig knobs)
        if family == "qwen2":
            cfg.setdefault("attention_bias", True)
        elif family == "qwen3":
            cfg.setdefault("qk_norm", True)
        return LlamaConfig(**cfg)
    if family == "gemma2":
        from ..models.hybrid import HybridConfig

        # Gemma2 = the hybrid family with the Gemma structural knobs;
        # layer_windows defaults to the alternating sliding/full pattern
        cfg.setdefault("act", "gelu_tanh")
        cfg.setdefault("norm_offset", True)
        cfg.setdefault("embed_scale", True)
        cfg.setdefault("post_norms", True)
        # HF Gemma2Config defaults — weights trained with soft-capping and
        # query_pre_attn_scalar produce wrong outputs without them.
        # query_pre_attn_scalar equals head_dim (256) for the 2B/9B
        # geometries but hidden/heads (144) for 27B, so default from the
        # config's head_dim rather than a constant — a 27B-shaped config
        # must still pass query_scale explicitly (its scalar is NOT its
        # head_dim; HybridConfig can't derive it)
        cfg.setdefault("attn_softcap", 50.0)
        cfg.setdefault("final_softcap", 30.0)
        cfg.setdefault("query_scale", float(cfg.get("head_dim", 256)))
        if "layer_windows" not in cfg:
            sw = cfg.pop("sliding_window", 4096)
            cfg["layer_windows"] = tuple(
                sw if i % 2 == 0 else None
                for i in range(cfg.get("num_layers", 16))
            )
        return HybridConfig(**cfg)
    if family == "gemma3":
        from ..models.hybrid import HybridConfig

        # Gemma3 = Gemma2's structural knobs minus soft-capping plus
        # per-head q/k norms, split rope, and the 5:1 local:global layer
        # pattern (UNEQUAL groups — the engine gives each its own arena)
        cfg.setdefault("act", "gelu_tanh")
        cfg.setdefault("norm_offset", True)
        cfg.setdefault("embed_scale", True)
        cfg.setdefault("post_norms", True)
        cfg.setdefault("qk_norm", True)
        cfg.setdefault("query_scale", 256.0)
        cfg.setdefault("rope_theta", 1_000_000.0)
        cfg.setdefault("local_rope_theta", 10_000.0)
        if "layer_windows" not in cfg:
            sw = cfg.pop("sliding_window", 512)
            sp = int(cfg.pop("sliding_window_pattern", 6))
            cfg["layer_windows"] = tuple(
                None if (i + 1) % sp == 0 else sw
                for i in range(cfg.get("num_layers", 12))
            )
        return HybridConfig(**cfg)
    if family == "mla":
        from ..models.mla import MLAConfig

        return MLAConfig(**cfg)
    if family == "hybrid":
        from ..models.hybrid import HybridConfig

        return HybridConfig(**cfg)
    if family in ("hybrid_linear", "mamba"):
        from ..models.mamba import HybridLinearConfig

        return HybridLinearConfig(**cfg)
    raise ValueError(f"unknown model family {family!r}")


def build_runtime(config: dict) -> AsyncEngineRunner:
    """Build engines from config.  All models whose kv geometry matches the
    first model share one physical pool (the colocation story); mismatched
    geometries get their own pool but still share HBM headroom accounting."""
    runner = AsyncEngineRunner()
    pool_cfg = config.get("pool", {})
    page_tokens = int(pool_cfg.get("page_tokens", 64))

    shared: dict[tuple, tuple[DevicePagePool, tuple]] = {}
    for m in config["models"]:
        family = m.get("family", "llama")
        params = None
        if "checkpoint" in m:
            # real weights: HF checkpoint dir (config.json + safetensors)
            from ..models.hf_loader import params_from_hf

            mcfg, params = params_from_hf(m["checkpoint"])
        else:
            mcfg = _model_cfg(family, m.get("config", {}))
        ec_kw = dict(m.get("engine", {}))
        ec_kw.setdefault("page_tokens", page_tokens)
        ec_kw.setdefault("ipc_name", m.get("kvcached_ipc", f"kvcached_tpu_{m['name']}"))

        from ..models.adapter import as_adapter

        adapter = as_adapter(mcfg)
        # arena depth: multi-group (hybrid) models allocate an arena of
        # layers_per_group layers, NOT total layers — sharing must key on
        # the actual array shape
        gw = getattr(adapter, "group_windows", None)
        if gw and len(gw) > 1:
            # equal groups: one shared arena of layers_per_group layers.
            # UNEQUAL groups (Gemma3): per-group arenas — key on the full
            # layer-count tuple so only identical patterns colocate
            # (engine.pools/arrays carry one pool per group)
            arena_layers = (
                adapter.layers_per_group
                if adapter.layers_per_group is not None
                else tuple(adapter.group_layers)
            )
        else:
            arena_layers = adapter.num_layers
        geom = (
            arena_layers,
            adapter.num_kv_heads,
            adapter.head_dim,
            adapter.num_kv_buffers,
            page_tokens,
        )
        if geom in shared:
            pool, arrays = shared[geom]
            eng = LLMEngine(
                mcfg, EngineConfig(**ec_kw), params=params,
                shared_pool=pool, pool_arrays=arrays,
            )
        else:
            if "num_pages" in pool_cfg:
                ec_kw["num_pages"] = int(pool_cfg["num_pages"])
            elif "hbm_utilization" in pool_cfg:
                ec_kw["hbm_utilization"] = float(pool_cfg["hbm_utilization"])
            eng = LLMEngine(mcfg, EngineConfig(**ec_kw), params=params)
            shared[geom] = (eng.pools, eng.arrays)
        # a checkpoint-backed model supports sleep level 2 (discard weights;
        # wake reloads from this dir)
        runner.add_model(m["name"], eng, ckpt_dir=m.get("checkpoint"))
        logger.info("model %s (%s) ready", m["name"], family)
    return runner


def main(argv=None) -> int:
    import yaml

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="YAML config path")
    p.add_argument("--port", type=int, default=None)
    args = p.parse_args(argv)

    with open(args.config) as f:
        config = yaml.safe_load(f)

    runner = build_runtime(config)
    sleep_cfg = SleepConfig(**config.get("sleep", {}))
    frontend = MultiLLMFrontend(runner, sleep_cfg)
    app = frontend.build_app()

    from aiohttp import web

    port = args.port or int(config.get("port", 8080))
    logger.info("serving %d models on :%d", len(runner.models), port)
    web.run_app(app, port=port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
