"""Continuous-batching LLM engine over the elastic KV pool.

The piece the reference delegates to vLLM/SGLang, built TPU-native:

- **Scheduler** (host): FCFS admission, per-sequence block allocation through
  :class:`KVCacheManager` (so `kvctl limit` elasticity applies to serving),
  preemption under memory pressure (newest-first, like vLLM's recompute
  policy).
- **Runner** (device): jitted prefill + **multi-step decode horizon** — K
  decode iterations scanned on-device per dispatch with greedy/temperature
  sampling in the loop.  Static shapes everywhere: fixed max batch, fixed
  page-table width, bucketed prefill lengths; pools donated so KV writes are
  in-place.
- Engine blocks ARE pool pages here (``block_tokens == page_tokens``): on
  TPU the map granule is free metadata, so the reference's 2 MB-page-under-
  block split collapses; per-sequence page tables feed the Pallas kernel
  physical ids directly.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Sequence as Seq

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KVConfig
from ..device.pool import DevicePagePool, PoolArrays, PoolSpec, hbm_free_bytes
from ..kv_cache_manager import KVCacheManager
from ..kv_cache_manager_native import create_kv_cache_manager
from ..logging_utils import get_kvcached_logger
from ..models.adapter import as_adapter
from ..models.llama import LlamaConfig
from .prefix_cache import PrefixCache, page_keys

logger = get_kvcached_logger(__name__)


@dataclass
class SamplingParams:
    max_new_tokens: int = 32
    temperature: float = 0.0  # 0 = greedy (deterministic)
    top_k: int = 0  # 0 = disabled; keep the k highest-logit tokens
    top_p: float = 1.0  # nucleus sampling; 1.0 = disabled
    seed: int = 0
    stop_token_ids: tuple[int, ...] = ()
    #: stop STRINGS (OpenAI `stop`): generation ends when the decoded
    #: output contains one; the returned text is truncated before it.
    #: Needs a tokenizer on the engine (LLMEngine(tokenizer=...) or the
    #: server attaches its own).
    stop: tuple[str, ...] = ()


@partial(jax.jit, static_argnames=("filters",))
def _sample_first_tokens_batch(logits, temps, top_ks, top_ps, seeds, step,
                               *, filters: bool):
    """Batched-prefill first tokens: per-row keys fold (engine step, row
    seed, row index) so identical prompts with equal seeds in one batch
    still draw independently; one dispatch, one host pull."""
    base = jax.random.PRNGKey(step)

    def one(lg, t, tk, tp_, seed, i):
        k = jax.random.fold_in(jax.random.fold_in(base, seed), i)
        return _sample_tokens(
            lg[None], t[None], tk[None], tp_[None], k, filters=filters
        )[0]

    n = logits.shape[0]
    return jax.vmap(one)(
        logits, temps, top_ks, top_ps, seeds, jnp.arange(n, dtype=jnp.uint32)
    )


def _sample_tokens(logits, temps, top_ks, top_ps, key, *, filters: bool):
    """Per-row sampling: greedy where temp==0; else temperature scaling,
    then top-k, then top-p (nucleus) filtering before the categorical.
    ``filters=False`` compiles the unfiltered fast path (no vocab sorts) —
    the engine picks the variant per dispatch from the batch's params."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = _filtered_scaled(logits, temps, top_ks, top_ps, filters=filters)
    sampled = jax.random.categorical(key, scaled).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy)


def _filtered_scaled(logits, temps, top_ks, top_ps, *, filters: bool):
    """Temperature-scaled logits with rank-based top-k / top-p filtering
    applied along the last axis (leading axes arbitrary; param arrays must
    broadcast against them).  RANK-based (not value thresholds): a stable
    argsort breaks ties by token index exactly like argmax, so top_k=1 is
    bit-identical to greedy even when bf16-valued logits tie at the max
    (value thresholds would keep every tied token)."""
    scaled = logits / jnp.maximum(temps, 1e-6)[..., None]
    if filters:
        V = logits.shape[-1]
        order = jnp.argsort(-scaled, axis=-1, stable=True)  # desc token ids
        ranks = jnp.argsort(order, axis=-1)  # rank of each token
        k = jnp.where(top_ks > 0, top_ks, V)
        scaled = jnp.where(ranks >= k[..., None], -jnp.inf, scaled)
        # nucleus: keep the smallest rank-prefix whose exclusive cumulative
        # mass is < top_p (always ≥ 1 token)
        desc = jnp.take_along_axis(scaled, order, axis=-1)
        probs = jax.nn.softmax(desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_n = jnp.sum((cum - probs) < top_ps[..., None], axis=-1)
        scaled = jnp.where(
            ranks >= jnp.maximum(keep_n, 1)[..., None], -jnp.inf, scaled
        )
    return scaled


def _spec_accept(logits, drafts, temps, top_ks, top_ps, key, *,
                 filters: bool):
    """Acceptance rule for speculative decoding with deterministic
    (prompt-lookup) drafts.  ``logits`` [B, T, V]: position j < gamma=T-1
    verifies draft j; position gamma emits the bonus token.

    Greedy rows (temp==0): accept iff the draft equals the model's own
    argmax — token-exact vs plain greedy decode by construction.

    Sampled rows: rejection sampling against the row's
    temperature/top-k/top-p-filtered target distribution p.  The draft
    distribution q is a point mass, so ``min(1, p/q)`` reduces to accepting
    draft d with probability p(d), and the residual ``norm(max(p - q, 0))``
    reduces to p with d's mass removed — each emitted token is distributed
    EXACTLY as sequential sampling from p (the standard speculative-sampling
    guarantee; bit-identity to plain decode is not expected because the
    RNG draw pattern differs).

    Returns (out [B, T] int32 tokens, a [B] accepted drafts in 0..gamma):
    the kept tokens of an iteration are out[:, :a+1] — verified drafts,
    then the bonus (all accepted) or the replacement (first rejection)."""
    B, T, V = logits.shape
    gamma = T - 1
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    scaled = _filtered_scaled(
        logits, temps[:, None], top_ks[:, None], top_ps[:, None],
        filters=filters,
    )
    p = jax.nn.softmax(scaled, axis=-1)
    k_u, k_rep, k_bonus = jax.random.split(key, 3)
    p_draft = jnp.take_along_axis(
        p[:, :gamma], drafts[..., None], axis=-1
    )[..., 0]  # [B, gamma]
    acc_sampled = jax.random.uniform(k_u, (B, gamma)) < p_draft
    acc_greedy = greedy[:, :gamma] == drafts
    is_sampled = temps > 0
    accept = jnp.where(is_sampled[:, None], acc_sampled, acc_greedy)
    a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)
    # replacement on rejection: the draft's mass removed, renormalized
    draft_hot = jax.nn.one_hot(drafts, V, dtype=bool)
    rep = jax.random.categorical(
        k_rep, jnp.where(draft_hot, -jnp.inf, scaled[:, :gamma])
    ).astype(jnp.int32)
    bonus = jax.random.categorical(k_bonus, scaled[:, gamma]).astype(
        jnp.int32
    )
    out_draft = jnp.where(
        accept, drafts, jnp.where(is_sampled[:, None], rep, greedy[:, :gamma])
    )
    out_bonus = jnp.where(is_sampled, bonus, greedy[:, gamma])
    return jnp.concatenate([out_draft, out_bonus[:, None]], axis=1), a


@dataclass
class Request:
    req_id: int
    prompt: list[int]
    sampling: SamplingParams
    #: scheduling priority under scheduling_policy="priority" (smaller =
    #: served sooner, vLLM's convention); ignored by fcfs/sjf
    priority: int = 0


@dataclass
class RequestOutput:
    req_id: int
    prompt: list[int]
    output_tokens: list[int]
    finished: bool = True
    #: decoded output truncated before the earliest stop string (only set
    #: when a stop string fired; callers without stops decode themselves)
    output_text: str | None = None


class Sequence:
    def __init__(self, req: Request, num_groups: int = 1):
        self.req = req
        self.tokens: list[int] = list(req.prompt)
        # virtual page ids from each group's KVCacheManager (hybrid models
        # keep one block list per layer group; plain models have one group)
        self.blocks_g: list[list[int]] = [[] for _ in range(num_groups)]
        self.num_prefilled = 0
        self.num_cached_pages = 0  # prefix-cache hit pages at admission
        self.state_block: int | None = None  # mamba state slot (stateful models)
        self.stop_hit = False  # a stop STRING fired (host-side detokenize)
        self.output_text: str | None = None  # text truncated at the stop

    @property
    def blocks(self) -> list[int]:
        return self.blocks_g[0]

    @blocks.setter
    def blocks(self, v) -> None:
        self.blocks_g[0] = list(v)

    @property
    def prompt_len(self) -> int:
        return len(self.req.prompt)

    @property
    def num_generated(self) -> int:
        return len(self.tokens) - self.prompt_len

    def finished(self) -> bool:
        sp = self.req.sampling
        if self.stop_hit or self.num_generated >= sp.max_new_tokens:
            return True
        return bool(
            sp.stop_token_ids
            and self.num_generated > 0
            and self.tokens[-1] in sp.stop_token_ids
        )


@dataclass
class EngineConfig:
    max_batch: int = 8
    max_model_len: int = 2048
    page_tokens: int = 64
    decode_horizon: int = 8  # device steps per dispatch
    prefill_buckets: tuple[int, ...] = (64, 128, 256, 512, 1024, 2048)
    num_pages: int | None = None  # physical pool pages; None = from HBM budget
    hbm_utilization: float = 0.3
    kv_dtype: str = "bfloat16"
    ipc_name: str | None = None
    interpret: bool = False  # pallas interpret (CPU testing)
    enable_prefix_caching: bool = True
    max_cached_tokens: int | None = None  # None = KVCACHED_MAX_CACHED_TOKENS
    #: stateful (mamba) models: physical state slots in the state pool;
    #: None = 4 × max_batch
    state_slots: int | None = None
    #: int8 KV: default per-head dequantization scale (amax/127 of expected
    #: K/V magnitude); override per (layer, head) via set_kv_scales()
    kv_scale: float = 0.04
    #: shrink the decode horizon near sequence caps (saves wasted steps but
    #: compiles one program per power-of-two K; disable where compiles are
    #: expensive — overflow masking keeps fixed-K runs correct)
    adaptive_horizon: bool = True
    #: speculative decoding via prompt-lookup (n-gram) drafting + a fused
    #: multi-query verify kernel: up to spec_gamma+1 tokens per dispatch,
    #: weights streamed ONCE per dispatch instead of per token.  Greedy
    #: rows are token-exact vs plain decode by construction; temperature>0
    #: rows are distribution-exact via rejection sampling (_spec_accept).
    #: Ignored for stateful / multi-group families.
    spec_decode: bool = False
    spec_gamma: int = 4  # draft tokens verified per iteration
    spec_ngram: int = 2  # trailing n-gram matched for prompt lookup
    spec_horizon: int = 4  # on-device verify iterations per dispatch
    spec_window: int = 128  # token ring the device drafts from
    #: refuse spec_decode configurations that cannot guarantee token-
    #: exactness vs plain decode (sub-f32 params: the verify forward's
    #: reduction order differs, so near-tie argmax can flip).  Off by
    #: default — bf16 spec decode is distribution-faithful and logs a
    #: warning; exactness-critical serving sets this and uses float32.
    spec_exact: bool = False
    #: batched prefill: stack up to this many waiting prompts into ONE
    #: padded (bucket × batch) prefill dispatch — the weights stream once
    #: for N prompts and the host pays one dispatch instead of N (the
    #: dominant TTFT cost under bursty colocation, where each dispatch
    #: carries ~30 ms of tunnel overhead).  Token-exact vs serial prefill
    #: (rows are independent in the kernel).  1 = off.  Applies to the
    #: stateless families (Llama/GQA, MLA, hybrid layer groups); mamba
    #: prefill stays serial (chunk state resume is sequential), and long
    #: prompts beyond the largest bucket keep the chunked serial path.
    prefill_batch: int = 1
    #: pp placement: decode microbatches per pipeline fill (stages work on
    #: different microbatches each tick — GPipe-style; 1 = no overlap)
    pp_microbatches: int = 2
    #: acceptance-driven gamma: walk a power-of-two ladder ≤ spec_gamma on
    #: an EMA of accepted drafts/iteration, and cool off to plain decode
    #: when drafting is useless (vLLM's dynamic speculative length idea).
    #: Off by default — each ladder step compiles its own program, which
    #: is expensive through the axon tunnel (docs/ROUND2_NOTES.md §perf 4)
    spec_adaptive: bool = False
    #: admission order for the waiting queue (the reference delegates this
    #: to its host engines; vLLM ships fcfs + priority policies):
    #:   "fcfs"     — arrival order (default),
    #:   "priority" — Request.priority ascending (smaller = sooner, vLLM's
    #:                convention), arrival order within a priority class;
    #:                preemption evicts the WORST-priority newest sequence,
    #:   "sjf"      — shortest remaining prompt first (cuts head-of-line
    #:                blocking under bursty mixed-length arrivals; starves
    #:                long prompts under sustained short-prompt pressure —
    #:                use priority with aging where that matters).
    scheduling_policy: str = "fcfs"


class LLMEngine:
    """Single-model serving engine.  Multiple engines may share one
    :class:`DevicePagePool` (colocated models arbitrating one HBM pool —
    the kvcached story)."""

    _ids = itertools.count()

    def __init__(
        self,
        model_cfg,
        engine_cfg: EngineConfig | None = None,
        *,
        params: dict | None = None,
        shared_pool: DevicePagePool | None = None,
        pool_arrays: tuple[jax.Array, jax.Array | None] | None = None,
        seed: int = 0,
        mesh=None,
        map_hook=None,
        unmap_hook=None,
        table_mirror: "np.ndarray | None" = None,
        tokenizer=None,
    ):
        """``mesh``: optional jax.sharding.Mesh with a ``tp`` axis (and
        optionally ``dp``).  The engine then serves SHARDED: params
        Megatron-style over tp, KV pools over the kv-head axis, the decode
        batch over dp — with the page table staying host metadata shared by
        every shard (the reference's all-ranks-identical-mapping invariant
        holds by construction, kv_cache_manager.py:144-169).

        ``map_hook``/``unmap_hook``: forwarded to the page allocator — wire
        a :class:`~kvcached_tpu.parallel.ipc.PageTableBroadcaster` here and
        every mapping is acknowledged by ALL worker mirrors before block
        ids are handed out (the reference's all-ranks-atomic invariant,
        tp_ipc_util.py:173-246; prealloc keeps the broadcast off the decode
        critical path).  ``table_mirror``: make this engine a CONSUMING
        mirror — dispatch-time virtual→physical translation reads this
        array (fed only by the broadcast plane via a WorkerListener)
        instead of the allocator's own table, proving the plane carries
        every mapping serving needs, in time."""
        self.adapter = as_adapter(model_cfg)
        self.model_cfg = model_cfg
        #: optional decode() provider for stop-STRING detection (the server
        #: attaches its own when the engine was built without one)
        self.tokenizer = tokenizer
        self.cfg = engine_cfg or EngineConfig()
        ec = self.cfg
        if ec.scheduling_policy not in ("fcfs", "priority", "sjf"):
            raise ValueError(
                f"unknown scheduling_policy {ec.scheduling_policy!r} "
                "(expected 'fcfs', 'priority', or 'sjf')"
            )

        self.mesh = mesh
        self._tp_axis = self._dp_axis = self._pp_axis = None
        self._kv_replicated = False  # MQA under tp: kv head replicated
        pool_sharding = None
        if mesh is not None and "pp" in mesh.axis_names:
            # PIPELINE STAGE PLACEMENT: stages on disjoint devices, each
            # owning its layers' weights + KV pool; activations ppermute
            # stage→stage (parallel/pp_mesh.py).  Per-stage managers keep
            # independent accounting/limits — pages are NOT fungible across
            # stages (they live in different chips' HBM), unlike the
            # colocated layer-group mode.
            from jax.sharding import NamedSharding, PartitionSpec as P

            if not hasattr(self.adapter, "layers_per_group"):
                raise ValueError(
                    "a 'pp' mesh needs a staged adapter (PPLlamaAdapter)"
                )
            n_stages = len(self.adapter.group_windows)
            if mesh.shape["pp"] != n_stages:
                raise ValueError(
                    f"mesh pp axis has {mesh.shape['pp']} devices but the "
                    f"adapter declares num_stages={n_stages}"
                )
            if ec.num_pages is None:
                raise ValueError("pp placement requires an explicit num_pages")
            self._pp_axis = "pp"
            # dp×pp: the decode batch shards over dp; each dp replica runs
            # the full stage pipeline over its rows, with stage-pool
            # replicas re-equalized every dispatch (pp_mesh equalize)
            if "dp" in mesh.axis_names and mesh.shape["dp"] > 1:
                dp = mesh.shape["dp"]
                if ec.max_batch % dp:
                    raise ValueError(
                        f"max_batch={ec.max_batch} not divisible by dp={dp}"
                    )
                self._dp_axis = "dp"
            # pp×tp composition: within each stage, heads/pools shard over tp
            if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
                tp = mesh.shape["tp"]
                if self.adapter.num_kv_heads % tp:
                    raise ValueError(
                        f"num_kv_heads={self.adapter.num_kv_heads} not "
                        f"divisible by tp={tp}"
                    )
                if self.adapter.vocab_size % tp:
                    raise ValueError(
                        f"vocab_size={self.adapter.vocab_size} not divisible "
                        f"by tp={tp}"
                    )
                self._tp_axis = "tp"
                pool_sharding = NamedSharding(mesh, P("pp", None, None, "tp"))
            else:
                pool_sharding = NamedSharding(mesh, P("pp"))
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert "tp" in mesh.axis_names, "mesh needs a 'tp' axis"
            self._tp_axis = "tp"
            self._dp_axis = "dp" if "dp" in mesh.axis_names else None
            tp = mesh.shape["tp"]
            dp = mesh.shape["dp"] if self._dp_axis else 1
            if self.adapter.num_kv_heads % tp:
                kv_rep_ok = (
                    self.adapter.num_kv_buffers == 1
                    or getattr(self.adapter, "supports_kv_replication",
                               False)
                )
                if self.adapter.num_kv_heads == 1 and kv_rep_ok:
                    # single shared kv head that tp cannot split: the pool
                    # REPLICATES across tp and every shard writes identical
                    # entries.  Two shapes of this:
                    # - MLA (one combined-KV buffer): the latent path's
                    #   projections are replicated in mla_param_specs
                    #   (reference MLA-under-TP, sglang/patches.py:523-702)
                    # - MQA (two buffers): wk/wv replicate via
                    #   llama_param_specs(kv_replicated=True); the step fns
                    #   derive per-shard head counts from weight shapes, so
                    #   KH stays 1 while q heads shard
                    self._pool_pspec = P()
                    if self.adapter.num_kv_buffers == 2:
                        self._kv_replicated = True
                else:
                    raise ValueError(
                        f"num_kv_heads={self.adapter.num_kv_heads} not "
                        f"divisible by tp={tp}"
                    )
            else:
                self._pool_pspec = P(None, None, "tp")
            if self.adapter.vocab_size % tp:
                raise ValueError(
                    f"vocab_size={self.adapter.vocab_size} not divisible by "
                    f"tp={tp} (the LM head shards on the vocab axis)"
                )
            if ec.max_batch % dp:
                raise ValueError(f"max_batch={ec.max_batch} not divisible by dp={dp}")
            pool_sharding = NamedSharding(mesh, self._pool_pspec)

        # layer groups (hybrid attention): group g's pages live in a shared
        # arena of layers_per_group layers; plain models have one group
        self.group_windows: tuple = getattr(
            self.adapter, "group_windows", None
        ) or (getattr(self.adapter, "window", None),)
        self.num_groups = len(self.group_windows)
        # unequal layer groups (Gemma3's 5:1 local:global pattern): each
        # group gets its OWN arena + pool — pages are not fungible across
        # groups (their byte geometry differs), but accounting, limits,
        # and elasticity stay per-group exactly as before
        self._group_layers: tuple | None = None
        if (self.num_groups > 1
                and getattr(self.adapter, "layers_per_group", 0) is None):
            self._group_layers = tuple(self.adapter.group_layers)
            arena_layers = self._group_layers[0]
        else:
            arena_layers = (
                self.adapter.layers_per_group
                if self.num_groups > 1
                else self.adapter.num_layers
            )

        def _kv_cfg(layers: int, g: int = 0) -> KVConfig:
            return KVConfig(
                num_layers=layers,
                num_kv_heads=self.adapter.num_kv_heads,
                head_dim=self.adapter.head_dim,
                block_tokens=ec.page_tokens,  # block == page on TPU
                page_tokens=ec.page_tokens,
                kv_dtype=ec.kv_dtype,
                num_kv_buffers=self.adapter.num_kv_buffers,
                group_id=g,
            )

        self.kv_cfg = _kv_cfg(arena_layers)
        if self._group_layers is not None:
            self.kv_cfgs = [
                _kv_cfg(n, g) for g, n in enumerate(self._group_layers)
            ]
        else:
            self.kv_cfgs = None

        self._stage_pools = None
        self._group_pools = None
        if shared_pool is not None:
            if self._pp_axis:
                raise NotImplementedError("pp placement with a shared pool")
            assert pool_arrays is not None, "shared pool requires shared arrays"
            if self._group_layers is not None:
                # colocated sharing of per-GROUP pools: a same-geometry
                # unequal-group engine (e.g. two Gemma3 instances) passes
                # the owner's ``engine.pools`` list + ``engine.arrays`` —
                # pages stay fungible within each group ACROSS engines,
                # exactly like the single-arena colocation path.  Pages
                # are NOT fungible across groups (byte geometries differ),
                # so the pool list must match group-for-group.
                pools = (list(shared_pool)
                         if isinstance(shared_pool, (list, tuple))
                         else [shared_pool])
                if len(pools) != self.num_groups:
                    raise ValueError(
                        f"unequal layer groups share colocated pools per "
                        f"group: expected {self.num_groups} pools (the "
                        f"owning engine's .pools), got {len(pools)}"
                    )
                for g, (p, cfg_g) in enumerate(zip(pools, self.kv_cfgs)):
                    if (p.spec.num_layers != cfg_g.num_layers
                            or p.spec.num_kv_heads != cfg_g.num_kv_heads
                            or p.spec.page_tokens != cfg_g.page_tokens
                            or p.spec.head_dim != cfg_g.head_dim):
                        raise ValueError(
                            f"group {g} pool geometry mismatch: pool has "
                            f"L={p.spec.num_layers} KH={p.spec.num_kv_heads}"
                            f" P={p.spec.page_tokens} D={p.spec.head_dim}, "
                            f"model group needs L={cfg_g.num_layers} "
                            f"KH={cfg_g.num_kv_heads} "
                            f"P={cfg_g.page_tokens} D={cfg_g.head_dim}"
                        )
                self._group_pools = pools
                self.pool = pools[0]
            else:
                if isinstance(shared_pool, (list, tuple)):
                    if len(shared_pool) != 1:
                        raise ValueError(
                            "this model has one layer group; pass a single "
                            "shared pool"
                        )
                    shared_pool = shared_pool[0]
                self.pool = shared_pool
            self.arrays = (
                pool_arrays
                if isinstance(pool_arrays, PoolArrays)
                else PoolArrays(*pool_arrays)
            )
        elif self._pp_axis:
            # one accounting pool PER STAGE (pages live in different chips'
            # HBM — not fungible), one stacked [S, ...] device arena sharded
            # on the stage axis
            S = mesh.shape["pp"]
            spec = PoolSpec.from_config(self.kv_cfg, num_pages=ec.num_pages)
            self._stage_pools = [DevicePagePool(spec) for _ in range(S)]
            self.pool = self._stage_pools[0]
            k = jax.device_put(
                jnp.zeros((S, *spec.kv_shape), spec.dtype), pool_sharding
            )
            v = jax.device_put(
                jnp.zeros((S, *spec.kv_shape), spec.dtype), pool_sharding
            )
            self.arrays = PoolArrays(k, v)
        elif self._group_layers is not None:
            # per-GROUP arenas (unequal layer counts): one pool + one
            # [L_g, pages, KH, P, D] arena per group; the step fns take
            # the pools as tuples.  An HBM budget splits proportional to
            # each group's page bytes (∝ L_g), so groups get equal PAGE
            # counts — block accounting stays uniform.
            self._group_pools = []
            ks, vs = [], []
            total_layers = sum(self._group_layers)
            for g, cfg_g in enumerate(self.kv_cfgs):
                if ec.num_pages is not None:
                    spec_g = PoolSpec.from_config(
                        cfg_g, num_pages=ec.num_pages)
                else:
                    budget = hbm_free_bytes()
                    if budget is None:
                        budget = 2 << 30
                    spec_g = PoolSpec.from_config(
                        cfg_g,
                        hbm_budget_bytes=int(
                            budget * ec.hbm_utilization
                            * self._group_layers[g] / total_layers
                        ),
                    )
                pool_g = DevicePagePool(spec_g, sharding=pool_sharding)
                self._group_pools.append(pool_g)
                k_g, v_g = pool_g.allocate_arrays()
                ks.append(k_g)
                vs.append(v_g)
            self.pool = self._group_pools[0]
            self.arrays = PoolArrays(tuple(ks), tuple(vs))
        else:
            if ec.num_pages is not None:
                spec = PoolSpec.from_config(self.kv_cfg, num_pages=ec.num_pages)
            else:
                budget = hbm_free_bytes()
                if budget is None:
                    budget = 2 << 30  # CPU fallback: 2 GB worth of pages
                spec = PoolSpec.from_config(
                    self.kv_cfg,
                    hbm_budget_bytes=int(budget * ec.hbm_utilization),
                )
            self.pool = DevicePagePool(spec, sharding=pool_sharding)
            self.arrays = PoolArrays(*self.pool.allocate_arrays())

        # one manager per layer group over the SAME physical pool: pages are
        # fungible across groups (shared arena), accounting/limits per group
        # (reference per-group FTensorAllocator multiton + shm _g suffix)
        # mirror-plane wiring: a bare callable/array applies to group 0;
        # multi-group (hybrid/PP) families pass one per group — each group
        # gets its own plane, like its own `_g<id>` shm segment
        def _per_group(x, what):
            if x is None:
                return [None] * self.num_groups
            if isinstance(x, (list, tuple)):
                if len(x) != self.num_groups:
                    raise ValueError(
                        f"{what}: {len(x)} entries for "
                        f"{self.num_groups} layer groups"
                    )
                return list(x)
            return [x] + [None] * (self.num_groups - 1)

        map_hooks = _per_group(map_hook, "map_hook")
        unmap_hooks = _per_group(unmap_hook, "unmap_hook")
        self.table_mirrors = _per_group(table_mirror, "table_mirror")
        def _group_cfg(g):
            if self.kv_cfgs is not None:
                return self.kv_cfgs[g]  # per-group arenas: own layer count
            return (self.kv_cfg if g == 0 else
                    KVConfig(**{**self.kv_cfg.__dict__, "group_id": g}))

        def _group_pool(g):
            if self._group_pools is not None:
                return self._group_pools[g]
            return self._stage_pools[g] if self._stage_pools else self.pool

        self.managers = [
            create_kv_cache_manager(
                _group_cfg(g),
                _group_pool(g),
                ipc_name=ec.ipc_name,
                reserve_null_block=True,
                map_hook=map_hooks[g],
                unmap_hook=unmap_hooks[g],
            )
            for g in range(self.num_groups)
        ]
        self.manager = self.managers[0]

        # Elastic mamba state pool (reference ElasticMambaPool): slots are
        # blocks of a dedicated manager (block_tokens=1), over a separate
        # arena — state cells and KV pages have different byte geometry so
        # they are not fungible, but limits/accounting/prealloc are shared
        # machinery.  Slot 0 (physical page 0) is the null slot.
        # int8 KV covers stateful (mamba) models too: the ATTENTION layers'
        # pools quantize with per-head scales exactly like the plain
        # families; the mamba STATE pool stays f32 (states are recurrent
        # accumulators, not paged KV — the reference's quantized pools also
        # only cover KV buffers).
        self.has_state = bool(getattr(self.adapter, "has_state", False))
        self.state_manager = None
        self.states = None
        if self.has_state:
            spec = self.adapter.state_spec
            self._state_spp = spec.slots_per_page
            n_slots = ec.state_slots or 4 * ec.max_batch
            state_pages = 1 + -(-n_slots // spec.slots_per_page)  # + null page
            state_kv_cfg = KVConfig(
                num_layers=spec.num_layers,
                num_kv_heads=1,
                head_dim=spec.cell_elems,
                block_tokens=1,  # one block = one state slot
                page_tokens=spec.slots_per_page,
                kv_dtype="float32",
                num_kv_buffers=1,
                group_id=self.num_groups,  # after the attention groups
            )
            state_pool_spec = PoolSpec(
                num_layers=spec.num_layers,
                num_pages=state_pages,
                num_kv_heads=1,
                page_tokens=spec.slots_per_page,
                head_dim=spec.cell_elems,
                dtype=jnp.float32,
                num_kv_buffers=1,
            )
            self.state_pool = DevicePagePool(state_pool_spec)
            self.state_manager = create_kv_cache_manager(
                state_kv_cfg,
                self.state_pool,
                ipc_name=ec.ipc_name,
                reserve_null_block=True,
                virtual_blocks=n_slots + 1,  # +1: the null slot
            )
            # [L_mamba, phys_slots, cell] — physical slot = page*spp + offset
            self.states = jnp.zeros(
                (spec.num_layers, state_pages * spec.slots_per_page,
                 spec.cell_elems),
                jnp.float32,
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                # the state pool is replicated across the whole mesh (see
                # _build_step_impls: tp replicates mixers, dp merges deltas)
                self.states = jax.device_put(
                    self.states, NamedSharding(mesh, P())
                )

        self.install_params(
            params
            if params is not None
            else self.adapter.init_params(jax.random.PRNGKey(seed))
        )

        self.max_pages_per_seq = ec.max_model_len // ec.page_tokens
        # sliding-window models reclaim pages mid-sequence; cached pages
        # would dangle, so the prefix cache is forced off (hybrid models
        # always have a windowed group)
        enable_cache = (
            ec.enable_prefix_caching
            and not getattr(self.adapter, "window", None)
            and self.num_groups == 1
            # mamba state is not content-addressable at page granularity —
            # a cached KV page without its matching state is unusable
            and not self.has_state
        )
        self.prefix_cache = PrefixCache(
            ec.page_tokens,
            (ec.max_cached_tokens if enable_cache else 0),
        )
        self.cache_namespace = self._stable_namespace()
        self.waiting: list[Sequence] = []
        self.running: list[Sequence] = []
        #: sequence mid-way through an interleaved chunked prefill
        self._prefilling: Sequence | None = None
        self.finished_outputs: list[RequestOutput] = []
        self._preempt_count = 0
        self._step_count = 0

        # decode fns are compiled lazily per horizon K (adaptive horizon:
        # dispatches near a sequence's cap use a shorter scan, avoiding
        # wasted post-cap steps)
        self._verify_step_impl = None  # set by _build_step_impls if supported
        self._prefill_batch_step_impl = None  # ditto (batched prefill)
        self._build_step_impls()
        self._decode_fns: dict[int, object] = {}
        self._verify_fns: dict[int, object] = {}  # per T = gamma+1
        if ec.spec_decode:
            dt = str(getattr(self.adapter.cfg, "dtype", ""))
            if ec.spec_exact and (
                (dt and dt != "float32") or ec.kv_dtype != "float32"
            ):
                # exactness-critical serving: refuse the configuration
                # instead of warning — the verify forward reduces in a
                # different order than the decode forward, so sub-f32
                # params OR sub-f32 KV pools cannot guarantee
                # token-exactness
                raise ValueError(
                    f"spec_exact=True requires float32 params AND "
                    f"kv_dtype='float32' for token-exact speculative "
                    f"decoding (model dtype {dt or 'float32'}, kv_dtype "
                    f"{ec.kv_dtype}); use float32 or drop spec_exact"
                )
            if dt and dt != "float32":
                # the verify forward reduces in a different order than the
                # decode forward; at bf16 a near-tie argmax can flip, so
                # spec decode is token-exact only in f32 (the same caveat
                # as bf16 TP).  Loud once — exactness-critical runs should
                # use float32 params or disable spec_decode.
                logger.warning(
                    "spec_decode with %s params is distribution-faithful "
                    "but not guaranteed token-exact vs plain decode "
                    "(near-tie argmax may flip between the verify and "
                    "decode reduction orders); use float32 for exactness-"
                    "critical serving", dt,
                )
        self._spec_dispatches = 0
        self._spec_tokens = 0
        # adaptive gamma state (spec_adaptive): EMA of accepted drafts per
        # verify iteration, current ladder rung, plain-decode cooldown
        self._spec_ema: float | None = None
        self._spec_gamma_cur = self.cfg.spec_gamma
        self._spec_cooldown = 0
        self._prefill_fn = self._build_prefill_fn()
        self._prefill_batch_fn = (
            self._build_prefill_batch_fn()
            if self._batched_prefill_enabled() else None
        )
        self._pb_dispatches = 0
        self._pb_prompts = 0
        self._combined_dispatches = 0  # pp 1F1B prefill+decode dispatches

    def install_params(self, params, *, pp_stacked: bool = False) -> None:
        """(Re)install a parameter pytree with the engine's mesh sharding.

        Used at construction and by the sleep/wake path: level-1 wake
        restores the host copy of the already-stacked layout
        (``pp_stacked=True``); level-2 wake reloads raw checkpoint params,
        which stack onto the pp axis here like at construction.
        """
        if self._pp_axis:
            from ..parallel.mesh import shard_tree
            from ..parallel.pp_mesh import pp_param_specs, stack_pp_params

            if not pp_stacked:
                params = stack_pp_params(params, self.mesh.shape["pp"])
            # model_cfg may be the PP adapter itself — the model config
            # then lives on its .cfg
            mc = getattr(self.model_cfg, "cfg", self.model_cfg)
            params = shard_tree(params, self.mesh, pp_param_specs(
                self._tp_axis,
                bias=getattr(mc, "attention_bias", False),
                qk_norm=getattr(mc, "qk_norm", False),
            ))
        elif self.mesh is not None:
            from ..parallel.mesh import shard_tree

            params = shard_tree(params, self.mesh, self._param_specs())
        self.params = params

    def _batched_prefill_enabled(self) -> bool:
        return (
            self.cfg.prefill_batch > 1
            and self._prefill_batch_step_impl is not None
            and not self.has_state
        )

    def _stable_namespace(self) -> str:
        """Prefix-cache namespace isolating models that share one physical
        pool.  Derived from the model config + a weights fingerprint — not
        ``id(self)``, which collides after GC and defeats reuse across
        engine restarts (the reference's composite-key lesson,
        vllm/patches.py:260-274)."""
        import hashlib

        h = hashlib.blake2b(digest_size=8)
        h.update(repr(self.model_cfg).encode())
        h.update(repr(self.kv_cfg).encode())
        try:
            leaf = jax.tree_util.tree_leaves(self.params)[0]
            sample = np.asarray(jax.device_get(leaf)).ravel()[:64]
            h.update(sample.tobytes())
        except Exception:
            h.update(str(id(self)).encode())  # last resort: per-instance
        return h.hexdigest()

    def _param_specs(self):
        """Adapter param specs for the tp axis, threading the MQA
        kv-replication flag to adapters that understand it."""
        if self._kv_replicated:
            return self.adapter.param_specs("tp", kv_replicated=True)
        return self.adapter.param_specs("tp")

    # pool buffers live in a shared holder (see PoolArrays)
    @property
    def k_pools(self):
        return self.arrays.k_pools

    @k_pools.setter
    def k_pools(self, v):
        self.arrays.k_pools = v

    @property
    def v_pools(self):
        return self.arrays.v_pools

    @v_pools.setter
    def v_pools(self, v):
        self.arrays.v_pools = v

    @property
    def pools(self) -> list:
        """Every physical pool this engine draws from: one per layer
        group under per-group arenas (unequal groups), else the single
        shared arena.  Pass this (with ``.arrays``) as ``shared_pool``
        to colocate another same-geometry engine."""
        return list(self._group_pools) if self._group_pools else [self.pool]

    # ------------------------------------------------------------- jit build

    def set_kv_scales(self, k_scales, v_scales) -> None:
        """int8 KV: install per-(layer, head) dequantization scales
        ([L, KH] f32 each) and rebuild the compiled step fns.  Under pp
        placement, [L_total, KH] is reshaped stage-major to [S, Lp, KH]
        (or pass the stacked shape directly)."""
        ks = jnp.asarray(k_scales, jnp.float32)
        vs = jnp.asarray(v_scales, jnp.float32)
        if self._pp_axis and ks.ndim == 2:
            S = self.mesh.shape["pp"]
            ks = ks.reshape(S, -1, ks.shape[-1])
            vs = vs.reshape(S, -1, vs.shape[-1])
        # loud shape contract: under pp placement [S, Lp, KH]
        # (stage-stacked); plain models [arena_layers, KH].  COLOCATED pp
        # accepts BOTH [Lp, KH] (one set shared across stages) and
        # [num_layers, KH] (per-MODEL-layer: true per-stage calibration —
        # each layer's row rides the step fns' layer scan and is broadcast
        # to the arena shape, so the kernels' arena-layer lookup resolves
        # this layer's own scale even though stages alias arena indices)
        KH = self.adapter.num_kv_heads
        Lp = self.kv_cfg.num_layers
        colocated_pp = (
            not self._pp_axis
            and getattr(self.adapter, "num_stages", 0) > 1
        )
        hybrid_groups = self.num_groups > 1 and not colocated_pp
        if self._pp_axis:
            want = [(self.mesh.shape["pp"], Lp, KH)]
        elif colocated_pp:
            want = [(Lp, KH), (self.adapter.num_layers, KH)]
        elif hybrid_groups:
            # plain hybrid layer groups: per MODEL layer only — the step
            # fns split rows per group arena (equal AND unequal groups)
            want = [(self.adapter.num_layers, KH)]
        else:
            want = [(Lp, KH)]
        if tuple(ks.shape) not in want or tuple(vs.shape) != tuple(ks.shape):
            raise ValueError(
                f"set_kv_scales: expected shape in {want} "
                f"({'model' if hybrid_groups else 'arena'} layers x kv heads"
                + (", stage-stacked" if self._pp_axis else "")
                + (", or per model layer" if colocated_pp else "")
                + f"), got k={tuple(ks.shape)} v={tuple(vs.shape)}"
            )
        self.quant_scales = (ks, vs)
        self._build_step_impls(reset_scales=False)
        self._decode_fns.clear()
        self._verify_fns.clear()
        self._prefill_fn = self._build_prefill_fn()
        self._prefill_batch_fn = (
            self._build_prefill_batch_fn()
            if self._batched_prefill_enabled() else None
        )

    def _build_step_impls(self, reset_scales: bool = True) -> None:
        """Single-device or shard-mapped model step callables.  Under a
        mesh, decode shards the batch over dp and heads/pools over tp;
        prefill (one sequence) replicates over dp and shards over tp."""
        adapter, ec = self.adapter, self.cfg
        self._combined_step_impl = None
        self._combined_fn = None
        if self._pp_axis:
            from ..parallel.pp_mesh import (
                build_pp_combined_impl,
                build_pp_impls,
            )

            if reset_scales:
                if ec.kv_dtype == "int8":
                    # STAGE-STACKED scales [S, Lp, KH]: each placed stage
                    # owns its pool, so its layers carry their own
                    # per-head dequantization scales (sharded on pp)
                    S = self.mesh.shape["pp"]
                    Lp = self.kv_cfg.num_layers
                    KH = self.adapter.num_kv_heads
                    self.quant_scales = (
                        jnp.full((S, Lp, KH), ec.kv_scale, jnp.float32),
                        jnp.full((S, Lp, KH), ec.kv_scale, jnp.float32),
                    )
                else:
                    self.quant_scales = None
            qs = self.quant_scales
            d_impl, p_impl, v_impl, pb_impl = build_pp_impls(
                adapter.cfg, self.mesh, adapter.layers_per_group,
                microbatches=ec.pp_microbatches, interpret=ec.interpret,
                tp_axis=self._tp_axis, dp_axis=self._dp_axis,
                quantized=qs is not None,
            )
            if qs is not None:
                self._decode_step_impl = lambda *a: d_impl(*a, *qs)
                self._prefill_step_impl = lambda *a: p_impl(*a, *qs)
                self._verify_step_impl = lambda *a: v_impl(*a, *qs)
                pb = lambda *a: pb_impl(*a, *qs)
            else:
                self._decode_step_impl = d_impl
                self._prefill_step_impl = p_impl
                self._verify_step_impl = v_impl
                pb = pb_impl

            # the scheduler hands batched prefill [N, G(=S), ...] arrays
            # (the multi-group layout); the placed pipeline wants
            # stage-major [S, N, ...]
            def pb_stage_major(params, tokens, positions, k_pools, v_pools,
                               chunk_pages, page_tables, q_starts,
                               true_lens):
                return pb(
                    params, tokens, positions, k_pools, v_pools,
                    jnp.transpose(chunk_pages, (1, 0, 2)),
                    jnp.transpose(page_tables, (1, 0, 2)),
                    q_starts, true_lens,
                )

            self._prefill_batch_step_impl = pb_stage_major

            # 1F1B prefill/decode overlap: one dispatch pipelines a
            # prefill chunk's tiles AND a one-step decode together, so a
            # mid-flight chunked prefill no longer starves decode (and
            # vice versa).  Under dp the decode batch shards and the
            # replay equalizer runs once at the dispatch boundary (see
            # pp_mesh build_pp_combined_impl).
            c_impl = build_pp_combined_impl(
                adapter.cfg, self.mesh, adapter.layers_per_group,
                microbatches=ec.pp_microbatches,
                interpret=ec.interpret, tp_axis=self._tp_axis,
                dp_axis=self._dp_axis,
                quantized=qs is not None,
            )
            self._combined_step_impl = (
                (lambda *a: c_impl(*a, *qs)) if qs is not None
                else c_impl
            )
            self._combined_fn = self._build_combined_fn()
            return
        if reset_scales:
            if ec.kv_dtype == "int8":
                KH = self.adapter.num_kv_heads
                # plain hybrid layer groups (Gemma2/3-class): scales are
                # per MODEL layer [L_model, KH] — the step fns split them
                # into per-group arena-shaped arrays (models/hybrid.py
                # _group_scales; within a group arena layer <-> model
                # layer is a bijection).  Colocated pp keeps the arena
                # contract (stages ALIAS arena indices, see set_kv_scales)
                if (self.num_groups > 1
                        and not getattr(self.adapter, "num_stages", 0)):
                    L = self.adapter.num_layers
                else:
                    L = self.kv_cfg.num_layers
                self.quant_scales = (
                    jnp.full((L, KH), ec.kv_scale, jnp.float32),
                    jnp.full((L, KH), ec.kv_scale, jnp.float32),
                )
            else:
                self.quant_scales = None
        if self.mesh is None:
            # only pass quant_scales when set so adapters without an int8
            # path keep their plain signature
            extra = (
                {"quant_scales": self.quant_scales}
                if self.quant_scales is not None else {}
            )
            self._decode_step_impl = lambda *a: adapter.decode_step(
                *a, interpret=ec.interpret, **extra
            )
            self._prefill_step_impl = lambda *a: adapter.prefill_step(
                *a, interpret=ec.interpret, **extra
            )
            if hasattr(adapter, "prefill_batch_step"):
                self._prefill_batch_step_impl = (
                    lambda *a: adapter.prefill_batch_step(
                        *a, interpret=ec.interpret, **extra
                    )
                )
            if hasattr(adapter, "verify_step"):
                self._verify_step_impl = lambda *a: adapter.verify_step(
                    *a, interpret=ec.interpret, **extra
                )
            if self.has_state:
                self._decode_state_impl = (
                    lambda params, t, p, k, v, pt, sp, so, sl, states, ss:
                    adapter.decode_step(
                        params, t, p, k, v, pt, sp, so, sl,
                        states=states, state_slots=ss,
                        interpret=ec.interpret, **extra,
                    )
                )
                self._prefill_state_impl = (
                    lambda params, t, p, k, v, cp, pt, qs, tl, states, slot:
                    adapter.prefill_step(
                        params, t, p, k, v, cp, pt, qs, tl,
                        states=states, state_slot=slot,
                        interpret=ec.interpret, **extra,
                    )
                )
            return

        from jax.sharding import PartitionSpec as P

        pspecs = self._param_specs()
        pool_p = self._pool_pspec  # kv-head sharded, or P() for MLA/MQA
        single_kv = self.adapter.num_kv_buffers == 1
        dp = self._dp_axis
        bd = P(dp) if dp else P()
        b2 = P(dp, None) if dp else P()
        rep = P()
        # hybrid layer groups: page_tables [G, B, max_pages] and slot_pages
        # [G, B] shard on the BATCH dim (dim 1), never on groups
        if self.num_groups > 1:
            tbl_p = P(None, dp, None) if dp else P()
            sp_p = P(None, dp) if dp else P()
        else:
            tbl_p, sp_p = b2, bd

        # int8: per-head scales shard on the kv-head axis like the pools
        # (replicated alongside a replicated single-head pool)
        qs = self.quant_scales
        sc_p = P(None, "tp") if pool_p else P()

        # dp>1: the fused kernel writes only each dp shard's local rows into
        # its pool REPLICA.  Without equalization a sequence whose batch row
        # migrates to the other dp shard (after a neighbour finishes) reads
        # zeros for its previously decoded KV — and host gathers / prefix
        # cache / PD export see only dp0's writes.  So every decode step
        # all-gathers the per-token K/V (a few KB) and every shard writes
        # ALL rows, keeping replicas bit-identical.
        equalize = bool(dp) and self.mesh.shape[dp] > 1
        if self.num_groups > 1:
            # hybrid configs carry the maps on the config; staged (pp)
            # adapters derive them from the stage split
            gi = getattr(adapter, "group_index", None)
            lig = getattr(adapter, "layer_in_group", None)
            group_index = tuple(gi if gi is not None
                                else adapter.cfg.group_index)
            layer_in_group = tuple(lig if lig is not None
                                   else adapter.cfg.layer_in_group)

        def _equalize_kv(k_pools, v_pools, ks, vs, slot_pages, slot_offsets,
                         scales):
            from ..ops.paged_attention import (
                write_decode_tokens,
                write_decode_tokens_single,
            )

            ks = jax.lax.all_gather(ks, dp, axis=1, tiled=True)
            if not single_kv:
                vs = jax.lax.all_gather(vs, dp, axis=1, tiled=True)
            so = jax.lax.all_gather(slot_offsets, dp, axis=0, tiled=True)
            if isinstance(k_pools, tuple):
                # per-GROUP arenas (unequal layer groups): split the
                # gathered per-model-layer K/V rows per group and replay
                # each group into its own arena.  Within a group arena
                # layer <-> model layer is a bijection, so pool_layers is
                # arange and per-model-layer scales slice directly.
                sp = jax.lax.all_gather(slot_pages, dp, axis=1, tiled=True)
                B_all = so.shape[0]
                new_k, new_v = list(k_pools), list(v_pools)
                for g in range(self.num_groups):
                    sel = jnp.asarray(
                        [i for i, gx in enumerate(group_index) if gx == g],
                        jnp.int32,
                    )
                    Lg = sel.shape[0]
                    new_k[g], new_v[g] = write_decode_tokens(
                        k_pools[g], v_pools[g], ks[sel], vs[sel],
                        jnp.arange(Lg, dtype=jnp.int32),
                        jnp.broadcast_to(sp[g][None], (Lg, B_all)), so,
                        interpret=ec.interpret,
                        k_scales=scales[0][sel] if scales else None,
                        v_scales=scales[1][sel] if scales else None,
                    )
                return tuple(new_k), tuple(new_v)
            if self.num_groups > 1:
                sp = jax.lax.all_gather(slot_pages, dp, axis=1, tiled=True)
                sp_l = sp[jnp.asarray(group_index, jnp.int32)]  # [Lk, B]
                pool_layers = jnp.asarray(layer_in_group, jnp.int32)
            else:
                sp = jax.lax.all_gather(slot_pages, dp, axis=0, tiled=True)
                Lk = ks.shape[0]
                sp_l = jnp.broadcast_to(sp[None], (Lk, sp.shape[0]))
                pool_layers = jnp.arange(Lk, dtype=jnp.int32)
            if single_kv:
                # MLA latent pool: one combined-KV buffer, k-side only
                k_pools = write_decode_tokens_single(
                    k_pools, ks, pool_layers, sp_l, so,
                    interpret=ec.interpret,
                    k_scales=scales[0] if scales else None,
                )
                return k_pools, v_pools
            return write_decode_tokens(
                k_pools, v_pools, ks, vs, pool_layers, sp_l, so,
                interpret=ec.interpret,
                k_scales=scales[0] if scales else None,
                v_scales=scales[1] if scales else None,
            )

        def dstep(params, tokens, positions, k_pools, v_pools,
                  page_tables, slot_pages, slot_offsets, seq_lens,
                  *scales):
            kw = {"quant_scales": scales} if scales else {}
            if not equalize:
                return adapter.decode_step(
                    params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    tp_axis="tp", interpret=ec.interpret, **kw,
                )
            logits, k_pools, v_pools, (ks, vs) = adapter.decode_step(
                params, tokens, positions, k_pools, v_pools,
                page_tables, slot_pages, slot_offsets, seq_lens,
                tp_axis="tp", interpret=ec.interpret, collect_kv=True, **kw,
            )
            k_pools, v_pools = _equalize_kv(
                k_pools, v_pools, ks, vs, slot_pages, slot_offsets, scales
            )
            return logits, k_pools, v_pools

        d_sharded = jax.shard_map(
            dstep, mesh=self.mesh,
            in_specs=(pspecs, bd, bd, pool_p, pool_p, tbl_p, sp_p, bd, bd)
            + ((sc_p, sc_p) if qs else ()),
            out_specs=(bd, pool_p, pool_p),
            check_vma=False,
        )
        self._decode_step_impl = (
            (lambda *a: d_sharded(*a, *qs)) if qs else d_sharded
        )

        if hasattr(adapter, "verify_step"):
            bd2 = P(dp, None) if dp else P()  # [B, T] arrays

            def vstep(params, tokens, positions, k_pools, v_pools,
                      page_tables, slot_pages, slot_offsets, seq_lens,
                      *scales):
                kw = {"quant_scales": scales} if scales else {}
                if not equalize:
                    return adapter.verify_step(
                        params, tokens, positions, k_pools, v_pools,
                        page_tables, slot_pages, slot_offsets, seq_lens,
                        tp_axis="tp", interpret=ec.interpret, **kw,
                    )
                # dp>1: flatten the (row, token) pairs into writer rows and
                # reuse the decode path's replica equalizer — multi-group
                # slot_pages [G, B, T] flatten to the [G, rows] shape its
                # group branch expects
                logits, k_pools, v_pools, (ks, vs) = adapter.verify_step(
                    params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    tp_axis="tp", interpret=ec.interpret, collect_kv=True,
                    **kw,
                )
                Lk = ks.shape[0]
                Bl, Tt = slot_offsets.shape
                sp_flat = (
                    slot_pages.reshape(self.num_groups, Bl * Tt)
                    if self.num_groups > 1 else slot_pages.reshape(Bl * Tt)
                )
                k_pools, v_pools = _equalize_kv(
                    k_pools, v_pools,
                    ks.reshape(Lk, Bl * Tt, *ks.shape[3:]),
                    (vs.reshape(Lk, Bl * Tt, *vs.shape[3:])
                     if vs is not None else None),
                    sp_flat, slot_offsets.reshape(Bl * Tt), scales,
                )
                return logits, k_pools, v_pools

            # hybrid groups: page_tables [G, B, pages] / slot_pages
            # [G, B, T] shard on the BATCH dim (dim 1), never on groups
            if self.num_groups > 1:
                vsp_p = P(None, dp, None) if dp else P()
            else:
                vsp_p = bd2
            v_sharded = jax.shard_map(
                vstep, mesh=self.mesh,
                in_specs=(pspecs, bd2, bd2, pool_p, pool_p, tbl_p, vsp_p,
                          bd2, bd)
                + ((sc_p, sc_p) if qs else ()),
                out_specs=(bd, pool_p, pool_p),
                check_vma=False,
            )
            self._verify_step_impl = (
                (lambda *a: v_sharded(*a, *qs)) if qs else v_sharded
            )

        def pstep(params, tokens, positions, k_pools, v_pools,
                  chunk_pages, page_table, q_start, true_len, *scales):
            return adapter.prefill_step(
                params, tokens, positions, k_pools, v_pools,
                chunk_pages, page_table, q_start, true_len,
                tp_axis="tp", interpret=ec.interpret,
                **({"quant_scales": scales} if scales else {}),
            )

        p_sharded = jax.shard_map(
            pstep, mesh=self.mesh,
            in_specs=(pspecs, rep, rep, pool_p, pool_p, rep, rep, rep, rep)
            + ((sc_p, sc_p) if qs else ()),
            out_specs=(rep, pool_p, pool_p),
            check_vma=False,
        )
        self._prefill_step_impl = (
            (lambda *a: p_sharded(*a, *qs)) if qs else p_sharded
        )

        if hasattr(adapter, "prefill_batch_step"):
            # batched prefill replicates the batch over dp like the
            # single-sequence path (prefill is weight-streaming-bound; dp
            # sharding the tiny N would buy nothing and complicate writes)
            def pbstep(params, tokens, positions, k_pools, v_pools,
                       chunk_pages, page_tables, q_starts, true_lens,
                       *scales):
                return adapter.prefill_batch_step(
                    params, tokens, positions, k_pools, v_pools,
                    chunk_pages, page_tables, q_starts, true_lens,
                    tp_axis="tp", interpret=ec.interpret,
                    **({"quant_scales": scales} if scales else {}),
                )

            pb_sharded = jax.shard_map(
                pbstep, mesh=self.mesh,
                in_specs=(pspecs, rep, rep, pool_p, pool_p, rep, rep, rep,
                          rep) + ((sc_p, sc_p) if qs else ()),
                out_specs=(rep, pool_p, pool_p),
                check_vma=False,
            )
            self._prefill_batch_step_impl = (
                (lambda *a: pb_sharded(*a, *qs)) if qs else pb_sharded
            )

        if not self.has_state:
            return

        # Stateful (hybrid-linear) family on a mesh.  The mamba state pool
        # is REPLICATED (mixers replicate across tp — models/mamba.py):
        # - across tp, every shard computes identical state updates (x is
        #   replicated after the attention/MLP psums), so out P() holds.
        # - across dp, shards update DISJOINT slot rows (a sequence lives on
        #   exactly one dp shard), so replication is restored by summing the
        #   per-shard deltas: merged = states + psum(new - states, dp).
        #   States are tiny next to KV, so the per-step psum is noise.
        def dstep_state(params, tokens, positions, k_pools, v_pools,
                        page_tables, slot_pages, slot_offsets, seq_lens,
                        states, state_slots, *scales):
            kw = {"quant_scales": scales} if scales else {}
            if equalize:
                logits, k_pools, v_pools, new_states, (ks, vs) = (
                    adapter.decode_step(
                        params, tokens, positions, k_pools, v_pools,
                        page_tables, slot_pages, slot_offsets, seq_lens,
                        states=states, state_slots=state_slots,
                        tp_axis="tp", interpret=ec.interpret, collect_kv=True,
                        **kw,
                    )
                )
                # same replica-equalization as the stateless path: the KV
                # pools carry dp-local writes that must be replayed on every
                # shard (the states are handled by the delta psum below)
                k_pools, v_pools = _equalize_kv(
                    k_pools, v_pools, ks, vs, slot_pages, slot_offsets,
                    scales,
                )
            else:
                logits, k_pools, v_pools, new_states = adapter.decode_step(
                    params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    states=states, state_slots=state_slots,
                    tp_axis="tp", interpret=ec.interpret, **kw,
                )
            if dp:
                new_states = states + jax.lax.psum(new_states - states, dp)
            return logits, k_pools, v_pools, new_states

        ds_sharded = jax.shard_map(
            dstep_state, mesh=self.mesh,
            in_specs=(pspecs, bd, bd, pool_p, pool_p, b2, bd, bd, bd,
                      rep, bd) + ((sc_p, sc_p) if qs else ()),
            out_specs=(bd, pool_p, pool_p, rep),
            check_vma=False,
        )
        self._decode_state_impl = (
            (lambda *a: ds_sharded(*a, *qs)) if qs else ds_sharded
        )

        # prefill runs ONE sequence replicated over dp: every shard computes
        # the same state update, so no merge is needed.
        def pstep_state(params, tokens, positions, k_pools, v_pools,
                        chunk_pages, page_table, q_start, true_len,
                        states, state_slot, *scales):
            return adapter.prefill_step(
                params, tokens, positions, k_pools, v_pools,
                chunk_pages, page_table, q_start, true_len,
                states=states, state_slot=state_slot,
                tp_axis="tp", interpret=ec.interpret,
                **({"quant_scales": scales} if scales else {}),
            )

        ps_sharded = jax.shard_map(
            pstep_state, mesh=self.mesh,
            in_specs=(pspecs, rep, rep, pool_p, pool_p, rep, rep, rep, rep,
                      rep, rep) + ((sc_p, sc_p) if qs else ()),
            out_specs=(rep, pool_p, pool_p, rep),
            check_vma=False,
        )
        self._prefill_state_impl = (
            (lambda *a: ps_sharded(*a, *qs)) if qs else ps_sharded
        )

    def _decode_fn_for(self, K: int, filters: bool = False):
        fn = self._decode_fns.get((K, filters))
        if fn is None:
            fn = self._decode_fns[(K, filters)] = self._build_decode_fn(
                K, filters
            )
        return fn

    def _build_decode_fn(self, K: int, filters: bool = False):
        if self.has_state:
            return self._build_decode_fn_stateful(K, filters)
        ec = self.cfg
        decode_step = self._decode_step_impl
        P = ec.page_tokens

        @partial(jax.jit, donate_argnums=(1, 2))
        def decode_multi(params, k_pools, v_pools, tokens0, seq_lens0, page_tables, temps, top_ks, top_ps, max_lens, rng_key):
            """K decode steps on device.  seq_lens0 counts tokens whose KV is
            already written; the j-th step consumes input token j at position
            seq_lens0 + j.  Returns sampled tokens [K, B].

            ``max_lens`` caps each row's token count (prompt + max_new_tokens,
            ≤ max_model_len).  Steps past the cap would index past the
            page-table width (the gather clamps, so the overflow token's KV
            would clobber a slot of the sequence's last real page) and OOB-
            read page_tables in-kernel — so seq_lens is clamped and overflow
            writes are routed to the zero page, where the kernel discards
            them.  Padded batch rows use max_lens=0 (all steps discarded)."""

            def one_step(carry, j):
                tokens, k_pools, v_pools, key = carry
                raw_lens = seq_lens0 + j + 1  # including current token
                seq_lens = jnp.minimum(raw_lens, max_lens)
                positions = jnp.maximum(seq_lens - 1, 0)
                page_idx = positions // P
                b_idx = jnp.arange(tokens.shape[0])
                overflow = raw_lens > max_lens
                if page_tables.ndim == 3:  # [G, B, max_pages] hybrid groups
                    slot_pages = jnp.where(
                        overflow[None, :], 0, page_tables[:, b_idx, page_idx]
                    )
                else:
                    slot_pages = jnp.where(
                        overflow, 0, page_tables[b_idx, page_idx]
                    )
                slot_offsets = positions % P
                logits, k_pools, v_pools = decode_step(
                    params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                )
                key, sub = jax.random.split(key)
                next_tokens = _sample_tokens(
                    logits, temps, top_ks, top_ps, sub, filters=filters
                )
                return (next_tokens, k_pools, v_pools, key), next_tokens

            (_, k_pools, v_pools, _), toks = jax.lax.scan(
                one_step, (tokens0, k_pools, v_pools, rng_key), jnp.arange(K)
            )
            return toks, k_pools, v_pools

        return decode_multi

    def _build_decode_fn_stateful(self, K: int, filters: bool = False):
        """Decode horizon for stateful (mamba) models: the state pool rides
        the scan carry, donated alongside the KV pools."""
        ec = self.cfg
        decode_step = self._decode_state_impl
        P = ec.page_tokens

        @partial(jax.jit, donate_argnums=(1, 2, 3))
        def decode_multi(params, k_pools, v_pools, states, tokens0,
                         seq_lens0, page_tables, temps, top_ks, top_ps,
                         max_lens, state_slots, rng_key):
            def one_step(carry, j):
                tokens, k_pools, v_pools, states, key = carry
                raw_lens = seq_lens0 + j + 1
                seq_lens = jnp.minimum(raw_lens, max_lens)
                positions = jnp.maximum(seq_lens - 1, 0)
                page_idx = positions // P
                b_idx = jnp.arange(tokens.shape[0])
                overflow = raw_lens > max_lens
                slot_pages = jnp.where(
                    overflow, 0, page_tables[b_idx, page_idx]
                )
                slot_offsets = positions % P
                ss = jnp.where(overflow, -1, state_slots)  # -1 = drop write
                logits, k_pools, v_pools, states = decode_step(
                    params, tokens, positions, k_pools, v_pools,
                    page_tables, slot_pages, slot_offsets, seq_lens,
                    states, ss,
                )
                key, sub = jax.random.split(key)
                next_tokens = _sample_tokens(
                    logits, temps, top_ks, top_ps, sub, filters=filters
                )
                return (next_tokens, k_pools, v_pools, states, key), next_tokens

            (_, k_pools, v_pools, states, _), toks = jax.lax.scan(
                one_step, (tokens0, k_pools, v_pools, states, rng_key),
                jnp.arange(K),
            )
            return toks, k_pools, v_pools, states

        return decode_multi

    def _build_combined_fn(self):
        """Jit wrapper for the pp 1F1B combined dispatch: computes the
        one decode step's slot routing (overflow → zero page, same as
        decode_multi), runs the combined pipeline, samples the decode
        tokens in-jit, and returns the prefill (greedy, logits) pair in
        _prefill_fn's format."""
        ec = self.cfg
        combined = self._combined_step_impl
        P = ec.page_tokens

        @partial(jax.jit, donate_argnums=(1, 2),
                 static_argnames=("filters",))
        def combined_fn(params, k_pools, v_pools, tokens0, seq_lens0,
                        page_tables, temps, top_ks, top_ps, max_lens,
                        rng_key, p_tokens, p_positions, p_chunk_pages,
                        p_page_table, p_q_start, p_true_len, *,
                        filters: bool):
            raw_lens = seq_lens0 + 1
            seq_lens = jnp.minimum(raw_lens, max_lens)
            positions = jnp.maximum(seq_lens - 1, 0)
            page_idx = positions // P
            b_idx = jnp.arange(tokens0.shape[0])
            overflow = raw_lens > max_lens
            slot_pages = jnp.where(
                overflow[None, :], 0, page_tables[:, b_idx, page_idx]
            )  # [S, B]
            slot_offsets = positions % P
            d_logits, p_logits, k_pools, v_pools = combined(
                params, tokens0, positions, k_pools, v_pools,
                page_tables, slot_pages, slot_offsets, seq_lens,
                p_tokens, p_positions, p_chunk_pages, p_page_table,
                p_q_start, p_true_len,
            )
            _, sub = jax.random.split(rng_key)
            next_tokens = _sample_tokens(
                d_logits, temps, top_ks, top_ps, sub, filters=filters
            )
            p_greedy = jnp.argmax(p_logits, axis=-1).astype(jnp.int32)
            return next_tokens, (p_greedy, p_logits), k_pools, v_pools

        return combined_fn

    def _combined_chunk_step(self) -> bool:
        """One pp combined dispatch: advance the mid-flight prefill by a
        chunk AND every running sequence by one decode token.  Returns
        False when the decode side could not proceed (caller falls back
        to the serial chunk path)."""
        ec = self.cfg
        P = ec.page_tokens
        B = ec.max_batch
        seq_p = self._prefilling

        # ---- decode side (the _do_decode admission pattern, K=1)
        batch = self._admit_running(lambda s: len(s.tokens) + 1)
        if not batch:
            return False

        tokens0 = np.zeros(B, np.int32)
        seq_lens0 = np.zeros(B, np.int32)
        page_tables = np.zeros(
            (self.num_groups, B, self.max_pages_per_seq), np.int32
        )
        temps = np.zeros(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        top_ps = np.ones(B, np.float32)
        max_lens = np.zeros(B, np.int32)
        for i, seq in enumerate(batch):
            tokens0[i] = seq.tokens[-1]
            seq_lens0[i] = len(seq.tokens) - 1
            page_tables[:, i] = self._phys_rows(seq)
            sp = seq.req.sampling
            temps[i] = sp.temperature
            top_ks[i] = sp.top_k
            top_ps[i] = sp.top_p
            max_lens[i] = self._row_cap(seq)
        filters = bool((top_ks > 0).any() or (top_ps < 1.0).any())

        # ---- prefill side (the _prefill_chunk input build)
        plen = seq_p.prompt_len
        q_start = seq_p.num_prefilled
        max_bucket = max(ec.prefill_buckets)
        phys = self._phys_rows(seq_p)  # [S, max_pages]
        this_len = min(plen - q_start, max_bucket)
        T = self._bucket_len(this_len)
        p_tokens = np.zeros(T, np.int32)
        p_tokens[:this_len] = seq_p.req.prompt[q_start : q_start + this_len]
        p_positions = q_start + np.arange(T, dtype=np.int32)
        start_page = q_start // P
        n_real = -(-this_len // P)
        chunk_pages = np.zeros((self.num_groups, T // P), np.int32)
        chunk_pages[:, :n_real] = phys[:, start_page : start_page + n_real]

        toks, p_out, self.k_pools, self.v_pools = self._combined_fn(
            self.params, self.k_pools, self.v_pools,
            jnp.asarray(tokens0), jnp.asarray(seq_lens0),
            jnp.asarray(page_tables), jnp.asarray(temps),
            jnp.asarray(top_ks), jnp.asarray(top_ps),
            jnp.asarray(max_lens), jax.random.PRNGKey(self._step_count),
            jnp.asarray(p_tokens), jnp.asarray(p_positions),
            jnp.asarray(chunk_pages), jnp.asarray(phys),
            jnp.asarray(q_start, jnp.int32),
            jnp.asarray(this_len, jnp.int32),
            filters=filters,
        )
        toks = np.asarray(toks)  # [B]
        self._combined_dispatches += 1

        # decode post-handling (K=1 view of _do_decode's loop)
        for i, seq in enumerate(batch):
            seq.tokens.append(int(toks[i]))
            self._check_stops(seq)
            self._reclaim_slid_pages(seq)
            if seq.finished():
                sp = seq.req.sampling
                keep = min(seq.num_generated, sp.max_new_tokens)
                seq.tokens = seq.tokens[: seq.prompt_len + keep]
                self._finish_seq(seq)

        # prefill post-handling (_prefill_chunk's completion logic)
        seq_p.num_prefilled = q_start + this_len
        if seq_p.num_prefilled >= plen:
            seq_p.tokens.append(self._sample_first_token(seq_p, p_out))
            seq_p.num_prefilled = plen
            self.running.append(seq_p)
            self._check_stops(seq_p)
            if seq_p.finished():
                self._finish_seq(seq_p)
            self._prefilling = None
        return True

    def _build_prefill_fn(self):
        if self.has_state:
            return self._build_prefill_fn_stateful()
        prefill_step = self._prefill_step_impl

        @partial(jax.jit, donate_argnums=(1, 2))
        def prefill(params, k_pools, v_pools, tokens, positions, chunk_pages,
                    page_table, q_start, true_len):
            logits, k_pools, v_pools = prefill_step(
                params, tokens, positions, k_pools, v_pools,
                chunk_pages, page_table, q_start, true_len,
            )
            # greedy token computed in-jit (the temp=0 path transfers one
            # scalar, no extra dispatch); logits ride along so sampled
            # requests draw their first token with their own
            # temperature/top-k/top-p instead of being forced greedy
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (greedy, logits), k_pools, v_pools

        return prefill

    def _build_prefill_batch_fn(self):
        prefill_batch_step = self._prefill_batch_step_impl

        @partial(jax.jit, donate_argnums=(1, 2))
        def prefill_batch(params, k_pools, v_pools, tokens, positions,
                          chunk_pages, page_tables, q_starts, true_lens):
            logits, k_pools, v_pools = prefill_batch_step(
                params, tokens, positions, k_pools, v_pools,
                chunk_pages, page_tables, q_starts, true_lens,
            )
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [N]
            return (greedy, logits), k_pools, v_pools

        return prefill_batch

    def _build_prefill_fn_stateful(self):
        prefill_step = self._prefill_state_impl

        @partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(params, k_pools, v_pools, states, tokens, positions,
                    chunk_pages, page_table, q_start, true_len, state_slot):
            logits, k_pools, v_pools, states = prefill_step(
                params, tokens, positions, k_pools, v_pools,
                chunk_pages, page_table, q_start, true_len,
                states, state_slot,
            )
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (greedy, logits), k_pools, v_pools, states

        return prefill

    # ------------------------------------------------------------- requests

    def add_request(self, prompt: list[int],
                    sampling: SamplingParams | None = None,
                    *, priority: int = 0) -> int:
        req = Request(next(self._ids), list(prompt),
                      sampling or SamplingParams(), priority)
        if len(req.prompt) + req.sampling.max_new_tokens > self.cfg.max_model_len:
            raise ValueError(
                f"prompt+max_new_tokens exceeds max_model_len={self.cfg.max_model_len}"
            )
        # prompts longer than the largest bucket are served by chunked
        # prefill (_do_prefill loops bucket-sized chunks, advancing q_start)
        self._enqueue(Sequence(req, self.num_groups))
        return req.req_id

    # ------------------------------------------------------ queue policies

    def _queue_key(self, seq: Sequence):
        """Admission sort key under the configured scheduling policy.
        req_id is the arrival ordinal, so it is the fcfs key and the
        within-class tiebreak everywhere else."""
        policy = self.cfg.scheduling_policy
        if policy == "priority":
            return (seq.req.priority, seq.req.req_id)
        if policy == "sjf":
            return (seq.prompt_len - seq.num_prefilled, seq.req.req_id)
        return (seq.req.req_id,)

    def _enqueue(self, seq: Sequence) -> None:
        if self.cfg.scheduling_policy == "fcfs":
            self.waiting.append(seq)
            return
        import bisect

        keys = [self._queue_key(s) for s in self.waiting]
        self.waiting.insert(
            bisect.bisect_right(keys, self._queue_key(seq)), seq
        )

    def _requeue_preempted(self, seq: Sequence) -> None:
        """A preempted/rolled-back sequence goes back to the queue: under
        fcfs to the FRONT (it was already admitted once); under
        priority/sjf to its policy slot (a rolled-back low-priority
        sequence must not jump a waiting high-priority one)."""
        if self.cfg.scheduling_policy == "fcfs":
            self.waiting.insert(0, seq)
        else:
            self._enqueue(seq)

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running or self._prefilling)

    # ------------------------------------------------------------- scheduling

    def _blocks_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.cfg.page_tokens)

    def _alloc_blocks(self, need: int, g: int = 0) -> list[int] | None:
        """Allocate through group g's manager, reclaiming prefix-cache pages
        under pressure first (the reference evicts LRU evictable blocks
        before failing, vllm/patches.py:492-495)."""
        mgr = self.managers[g]
        blocks = mgr.alloc(need)
        if blocks is None and self.prefix_cache.num_evictable:
            evicted = self.prefix_cache.evict(need + 4)
            if evicted:
                self.manager.free(evicted)
                blocks = mgr.alloc(need)
        return blocks

    def _ensure_blocks(self, seq: Sequence, num_tokens: int) -> bool:
        """Grow seq's block lists (every group) to cover ``num_tokens``
        tokens.  All-or-nothing: on any group's failure, pages just taken
        for earlier groups are returned."""
        num_tokens = min(num_tokens, self.cfg.max_model_len)
        target = self._blocks_needed(num_tokens)
        taken: list[tuple[int, list[int]]] = []
        for g in range(self.num_groups):
            need = target - len(seq.blocks_g[g])
            if need <= 0:
                continue
            blocks = self._alloc_blocks(need, g)
            if blocks is None:
                for gg, bs in taken:
                    self.managers[gg].free(bs)
                    del seq.blocks_g[gg][-len(bs):]
                return False
            seq.blocks_g[g].extend(blocks)
            taken.append((g, blocks))
        return True

    def _reclaim_slid_pages(self, seq: Sequence) -> None:
        """Sliding-window groups free pages every token of which is below
        the window of every *future* position — full-attention groups keep
        theirs (the reference's per-group hybrid reclaim)."""
        for g, window in enumerate(self.group_windows):
            if not window:
                continue
            win_start = len(seq.tokens) - window
            if win_start <= 0:
                continue
            last_dead_page = win_start // self.cfg.page_tokens  # exclusive
            row = seq.blocks_g[g]
            dead = [b for b in row[:last_dead_page] if b is not None]
            if dead:
                self.managers[g].free(dead)
                for j in range(last_dead_page):
                    row[j] = None

    def _phys_state_slot(self, seq: Sequence) -> int:
        """Physical state-slot id: page-table translate the slot's page."""
        spp = self._state_spp
        b = seq.state_block
        pt = self.state_manager.page_allocator.page_table
        return int(pt[b // spp]) * spp + (b % spp)

    def _free_seq(self, seq: Sequence, cache_kv: bool = True) -> None:
        if self.has_state and seq.state_block is not None:
            self.state_manager.free([seq.state_block])
            seq.state_block = None
        # non-primary groups never enter the prefix cache: free directly
        for g in range(1, self.num_groups):
            live = [b for b in seq.blocks_g[g] if b is not None]
            if live:
                self.managers[g].free(live)
            seq.blocks_g[g] = []
        seq.blocks = [b for b in seq.blocks if b is not None]
        if not seq.blocks:
            return
        if cache_kv and self.prefix_cache.enabled:
            # register this sequence's full pages (prompt AND generated —
            # their tokens are now immutable) before releasing references.
            # KV is only guaranteed written for positions 0..len-2: a token's
            # KV lands when the *next* step consumes it, and the final
            # generated token is never consumed — so only pages whose every
            # slot is below len-1 are cacheable.
            n_full = min(
                (len(seq.tokens) - 1) // self.cfg.page_tokens, len(seq.blocks)
            )
            if n_full:
                keys = page_keys(
                    seq.tokens[: n_full * self.cfg.page_tokens],
                    self.cfg.page_tokens,
                    self.cache_namespace,
                )
                self.prefix_cache.insert(keys[:n_full], seq.blocks[:n_full])
            _retained, to_free = self.prefix_cache.release(seq.blocks)
            if to_free:
                self.manager.free(to_free)
        else:
            _retained, to_free = self.prefix_cache.release(seq.blocks)
            self.manager.free(to_free)
        seq.blocks = []

    def _admit_running(self, need_fn) -> list:
        """Admission scan shared by _do_decode / _do_spec_decode /
        _combined_chunk_step: take the head of the running queue (up to
        max_batch) and ensure each sequence has blocks for
        ``need_fn(seq)`` tokens, preempting under pressure.  The scan
        RESTARTS after every preemption — the priority policy's victim may
        sit BELOW the scan index, shifting a not-yet-checked sequence
        under it; that sequence would be dispatched without its pages
        (zero-page discard → silent corruption).  _ensure_blocks is cheap
        when already satisfied, so the rescan is O(B) bookkeeping.
        Returns the admitted batch (sequences still running, in queue
        order); empty when even one sequence cannot be backed."""
        B = self.cfg.max_batch
        batch = self.running[:B]
        i = 0
        while i < len(batch):
            seq = batch[i]
            if self._ensure_blocks(seq, need_fn(seq)):
                i += 1
                continue
            if not self._preempt_one():
                break
            batch = self.running[:B]  # repair view after preemption
            i = 0
        return [s for s in batch if s in self.running]

    def _preempt_one(self) -> bool:
        """Evict a running sequence back to waiting (recompute): the newest
        under fcfs/sjf (vLLM's recompute policy), the worst-priority newest
        under the priority policy."""
        if not self.running:
            return False
        if self.cfg.scheduling_policy == "priority":
            seq = max(
                self.running,
                key=lambda s: (s.req.priority, s.req.req_id),
            )
            self.running.remove(seq)
        else:
            seq = self.running.pop()
        self._free_seq(seq)
        # restart from scratch: drop generated tokens (recompute semantics
        # would keep them; dropping keeps determinism for greedy decoding)
        seq.tokens = list(seq.req.prompt)
        seq.num_prefilled = 0
        self._requeue_preempted(seq)
        self._preempt_count += 1
        logger.info("preempted request %d under memory pressure", seq.req.req_id)
        return True

    def _phys_row(self, seq: Sequence, g: int = 0) -> np.ndarray:
        # consuming-mirror mode: translate through the broadcast-fed mirror,
        # never the allocator's own table — a mapping the plane hasn't
        # delivered yet would read the zero page and corrupt output, so
        # correct serving here PROVES the all-ranks-atomic invariant
        pt = (
            self.table_mirrors[g]
            if self.table_mirrors[g] is not None
            else self.managers[g].page_allocator.page_table
        )
        row = np.zeros(self.max_pages_per_seq, np.int32)
        for j, b in enumerate(seq.blocks_g[g]):
            # None = page slid out of the attention window and was reclaimed;
            # its row entry points at the zero page (never read: the kernels
            # skip pages before the window start)
            row[j] = pt[b] if b is not None else 0
        return row

    def _phys_rows(self, seq: Sequence) -> np.ndarray:
        """[G, max_pages] physical rows (hybrid multi-group dispatch)."""
        return np.stack(
            [self._phys_row(seq, g) for g in range(self.num_groups)]
        )

    def _bucket_len(self, n: int) -> int:
        for b in self.cfg.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest prefill bucket")

    # ------------------------------------------------------------- stepping

    def _do_prefill(self, seq: Sequence) -> bool:
        """Blocking prefill: admit + run every chunk back-to-back.  The
        scheduler's interleaved path uses :meth:`_begin_prefill` +
        :meth:`_prefill_chunk` instead, so long prompts don't stall
        running sequences."""
        if not self._begin_prefill(seq):
            return False
        while not self._prefill_chunk(seq):
            pass
        return True

    def _begin_prefill(self, seq: Sequence) -> bool:
        P = self.cfg.page_tokens
        plen = seq.prompt_len

        # prefix-cache lookup: reuse whole pages of identical prefix
        hits: list[int] = []
        if self.prefix_cache.enabled:
            keys = page_keys(seq.req.prompt, P, self.cache_namespace)
            hits = self.prefix_cache.lookup(keys)
            if hits and len(hits) * P >= plen:
                # must compute at least the last token for its logits
                dropped = hits.pop()
                _, to_free = self.prefix_cache.release([dropped])
                if to_free:
                    self.manager.free(to_free)
        n_hit = len(hits)
        seq.blocks = list(hits)
        seq.num_cached_pages = n_hit

        # stateful models: one state slot per sequence (reference mamba
        # req-to-token slot), allocated before KV pages
        if self.has_state and seq.state_block is None:
            sb = self.state_manager.alloc(1)
            if sb is None:
                return False
            seq.state_block = sb[0]

        if not self._ensure_blocks(seq, plen + 1):
            # roll back the lookup references; release() may return LRU-cap
            # overflow victims that must be truly freed or they leak
            _, to_free = self.prefix_cache.release(hits)
            if to_free:
                self.manager.free(to_free)
            seq.blocks = []
            if self.has_state and seq.state_block is not None:
                self.state_manager.free([seq.state_block])
                seq.state_block = None
            return False

        seq.num_prefilled = n_hit * P  # prefill progress (tokens written)
        return True

    def _prefill_chunk(self, seq: Sequence) -> bool:
        """Run ONE bucket-sized page-aligned chunk of seq's prompt (the
        reference's host engines chunk long prefills routinely).  The
        kernel attends the chunk against all pages written so far, so the
        result is token-exact vs a single-shot prefill.  Returns True when
        the prompt is fully prefilled (first token sampled, seq running)."""
        P = self.cfg.page_tokens
        plen = seq.prompt_len
        q_start = seq.num_prefilled
        max_bucket = max(self.cfg.prefill_buckets)
        multi = self.num_groups > 1
        phys = self._phys_rows(seq) if multi else self._phys_row(seq)

        this_len = min(plen - q_start, max_bucket)
        T = self._bucket_len(this_len)
        assert T % P == 0, "prefill buckets must be multiples of page_tokens"
        tokens = np.zeros(T, np.int32)
        tokens[:this_len] = seq.req.prompt[q_start : q_start + this_len]
        positions = q_start + np.arange(T, dtype=np.int32)
        start_page = q_start // P
        n_real = -(-this_len // P)
        if multi:
            chunk_pages = np.zeros((self.num_groups, T // P), np.int32)
            chunk_pages[:, :n_real] = phys[:, start_page : start_page + n_real]
        else:
            chunk_pages = np.zeros(T // P, np.int32)
            chunk_pages[:n_real] = phys[start_page : start_page + n_real]
        if self.has_state:
            slot = jnp.asarray(self._phys_state_slot(seq), jnp.int32)
            out, self.k_pools, self.v_pools, self.states = (
                self._prefill_fn(
                    self.params, self.k_pools, self.v_pools, self.states,
                    jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray(chunk_pages), jnp.asarray(phys),
                    jnp.asarray(q_start, jnp.int32),
                    jnp.asarray(this_len, jnp.int32), slot,
                )
            )
        else:
            out, self.k_pools, self.v_pools = self._prefill_fn(
                self.params, self.k_pools, self.v_pools,
                jnp.asarray(tokens), jnp.asarray(positions),
                jnp.asarray(chunk_pages), jnp.asarray(phys),
                jnp.asarray(q_start, jnp.int32), jnp.asarray(this_len, jnp.int32),
            )
        seq.num_prefilled = q_start + this_len
        if seq.num_prefilled < plen:
            return False
        seq.tokens.append(self._sample_first_token(seq, out))
        seq.num_prefilled = plen
        self.running.append(seq)
        self._check_stops(seq)
        if seq.finished():  # stop string in the very first token
            self._finish_seq(seq)
        return True

    def _collect_prefill_batch(self) -> tuple[list["Sequence"], bool]:
        """Pop a contiguous FIFO prefix of the waiting queue whose prompts
        each fit ONE prefill bucket, admitting (page-allocating) each; stop
        at the first long prompt (head-of-line order preserved — it takes
        the chunked serial path), admission failure, or capacity.  The
        returned sequences are BEGUN: their pages are allocated and any
        prefix-cache hits taken.  Also returns whether the head of the
        queue FAILED admission — the caller must not repeat the identical
        admit/rollback cycle on it this step (page alloc + prefix-cache
        reference churn for no scheduling benefit)."""
        ec = self.cfg
        if self._prefill_batch_fn is None:
            return [], False
        cap = min(ec.prefill_batch, ec.max_batch - len(self.running))
        if cap < 2 or len(self.waiting) < 2:
            return [], False
        max_bucket = max(ec.prefill_buckets)
        batch: list[Sequence] = []
        head_blocked = False
        while self.waiting and len(batch) < cap:
            seq = self.waiting[0]
            if seq.prompt_len > max_bucket:
                break
            if not (self._can_admit(seq) and self._begin_prefill(seq)):
                head_blocked = not batch
                break
            self.waiting.pop(0)
            batch.append(seq)
        return batch, head_blocked

    def _prefill_chunk_batch(self, seqs: list[Sequence]) -> None:
        """One batched prefill dispatch for N begun sequences whose
        remaining prompts share a bucket: the weights stream once for all
        N and the host pays one dispatch instead of N.  Rows are padded to
        (N_pow2, shared bucket) — pad rows carry true_len 0 and zero-page
        chunk tables, so their writes discard and their logits are never
        read.  Token-exact vs serial _prefill_chunk by kernel construction
        (tests/test_engine.py::TestBatchedPrefill)."""
        P = self.cfg.page_tokens
        T = self._bucket_len(max(s.prompt_len - s.num_prefilled for s in seqs))
        N = 1 << (len(seqs) - 1).bit_length()  # pad to pow2: bounded compiles
        multi = self.num_groups > 1
        G = self.num_groups
        tokens = np.zeros((N, T), np.int32)
        positions = np.tile(np.arange(T, dtype=np.int32), (N, 1))
        if multi:
            chunk_pages = np.zeros((N, G, T // P), np.int32)
            page_tables = np.zeros((N, G, self.max_pages_per_seq), np.int32)
        else:
            chunk_pages = np.zeros((N, T // P), np.int32)
            page_tables = np.zeros((N, self.max_pages_per_seq), np.int32)
        q_starts = np.zeros(N, np.int32)
        true_lens = np.zeros(N, np.int32)
        for i, seq in enumerate(seqs):
            q_start = seq.num_prefilled  # page-aligned (prefix-cache hits)
            this_len = seq.prompt_len - q_start
            tokens[i, :this_len] = seq.req.prompt[q_start:]
            positions[i] += q_start
            start_page = q_start // P
            n_real = -(-this_len // P)
            if multi:
                phys = self._phys_rows(seq)  # [G, max_pages]
                chunk_pages[i, :, :n_real] = (
                    phys[:, start_page : start_page + n_real]
                )
            else:
                phys = self._phys_row(seq)
                chunk_pages[i, :n_real] = (
                    phys[start_page : start_page + n_real]
                )
            page_tables[i] = phys
            q_starts[i] = q_start
            true_lens[i] = this_len
        self._pb_dispatches += 1
        self._pb_prompts += len(seqs)
        (greedy, logits), self.k_pools, self.v_pools = self._prefill_batch_fn(
            self.params, self.k_pools, self.v_pools,
            jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(chunk_pages), jnp.asarray(page_tables),
            jnp.asarray(q_starts), jnp.asarray(true_lens),
        )
        # one host pull for the whole batch (per-row int() would pay a
        # ~30 ms tunnel round-trip each): greedy-only batches pull the
        # in-jit argmax; batches with sampled rows pull ONLY the sampler
        # output (its temp<=0 rows are the same argmax), never both
        sampled = None
        if any(s.req.sampling.temperature > 0 for s in seqs):
            sps = [s.req.sampling for s in seqs]
            pad = N - len(seqs)
            temps = jnp.asarray(
                [sp.temperature for sp in sps] + [0.0] * pad, jnp.float32)
            tks = jnp.asarray(
                [sp.top_k for sp in sps] + [0] * pad, jnp.int32)
            tps = jnp.asarray(
                [sp.top_p for sp in sps] + [1.0] * pad, jnp.float32)
            seeds = jnp.asarray(
                [sp.seed for sp in sps] + [0] * pad, jnp.int32)
            filt = any(sp.top_k > 0 or sp.top_p < 1.0 for sp in sps)
            sampled = np.asarray(_sample_first_tokens_batch(
                logits, temps, tks, tps, seeds,
                jnp.asarray(self._step_count, jnp.uint32), filters=filt,
            ))
        if sampled is None:
            firsts = np.asarray(greedy)
        else:
            firsts = sampled  # temp<=0 rows are the argmax inside the jit
        for i, seq in enumerate(seqs):
            seq.num_prefilled = seq.prompt_len
            seq.tokens.append(int(firsts[i]))
            self.running.append(seq)
            self._check_stops(seq)
            if seq.finished():  # stop string in the very first token
                self._finish_seq(seq)

    def _sample_first_token(self, seq: Sequence, out) -> int:
        """Sample the prefill's token with the request's own params (the
        decode scan handles subsequent tokens).  Keyed off the engine step
        counter + the request seed, so identical engine histories reproduce
        identical outputs (matching the decode PRNG discipline)."""
        greedy, logits = out
        sp = seq.req.sampling
        if sp.temperature <= 0:
            return int(greedy)
        key = jax.random.fold_in(
            jax.random.PRNGKey(self._step_count), sp.seed
        )
        tok = _sample_tokens(
            logits[None],
            jnp.asarray([sp.temperature], jnp.float32),
            jnp.asarray([sp.top_k], jnp.int32),
            jnp.asarray([sp.top_p], jnp.float32),
            key,
            filters=sp.top_k > 0 or sp.top_p < 1.0,
        )
        return int(tok[0])

    def _row_cap(self, seq: Sequence) -> int:
        return min(
            self.cfg.max_model_len,
            seq.prompt_len + seq.req.sampling.max_new_tokens,
        )

    def _do_decode(self) -> None:
        ec = self.cfg
        P = ec.page_tokens
        B = ec.max_batch
        batch = self.running[:B]

        # adaptive horizon: no on-device step past the batch's nearest cap
        # produces a kept token, so shrink K (to a power of two, bounding the
        # number of compiled variants) when every row is close to finishing
        if ec.adaptive_horizon:
            needed = min(
                max(1, self._row_cap(s) - len(s.tokens)) for s in batch
            )
            K = min(ec.decode_horizon, 1 << (needed.bit_length() - 1))
        else:
            K = ec.decode_horizon

        # ensure every sequence has blocks for +K tokens; preempt on pressure
        batch = self._admit_running(lambda s: len(s.tokens) + K)
        if not batch:
            return

        tokens0 = np.zeros(B, np.int32)
        seq_lens0 = np.zeros(B, np.int32)
        if self.num_groups > 1:
            page_tables = np.zeros(
                (self.num_groups, B, self.max_pages_per_seq), np.int32
            )
        else:
            page_tables = np.zeros((B, self.max_pages_per_seq), np.int32)
        temps = np.zeros(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        top_ps = np.ones(B, np.float32)
        max_lens = np.zeros(B, np.int32)  # 0 for padded rows: all writes discarded
        for i, seq in enumerate(batch):
            tokens0[i] = seq.tokens[-1]
            seq_lens0[i] = len(seq.tokens) - 1  # KV written so far
            if self.num_groups > 1:
                page_tables[:, i] = self._phys_rows(seq)
            else:
                page_tables[i] = self._phys_row(seq)
            sp = seq.req.sampling
            temps[i] = sp.temperature
            top_ks[i] = sp.top_k
            top_ps[i] = sp.top_p
            max_lens[i] = self._row_cap(seq)
        # only pay the vocab sorts when some row actually filters
        filters = bool((top_ks > 0).any() or (top_ps < 1.0).any())

        key = jax.random.PRNGKey(self._step_count)
        if self.has_state:
            state_slots = np.full(B, -1, np.int32)  # -1 = padded row (drop)
            for i, seq in enumerate(batch):
                state_slots[i] = self._phys_state_slot(seq)
            toks, self.k_pools, self.v_pools, self.states = (
                self._decode_fn_for(K, filters)(
                    self.params, self.k_pools, self.v_pools, self.states,
                    jnp.asarray(tokens0), jnp.asarray(seq_lens0),
                    jnp.asarray(page_tables), jnp.asarray(temps),
                    jnp.asarray(top_ks), jnp.asarray(top_ps),
                    jnp.asarray(max_lens), jnp.asarray(state_slots), key,
                )
            )
        else:
            toks, self.k_pools, self.v_pools = self._decode_fn_for(K, filters)(
                self.params, self.k_pools, self.v_pools,
                jnp.asarray(tokens0), jnp.asarray(seq_lens0),
                jnp.asarray(page_tables), jnp.asarray(temps),
                jnp.asarray(top_ks), jnp.asarray(top_ps),
                jnp.asarray(max_lens), key,
            )
        toks = np.asarray(toks)  # [K, B]

        for i, seq in enumerate(batch):
            for j in range(K):
                seq.tokens.append(int(toks[j, i]))
                if seq.finished():
                    break
            self._check_stops(seq)
            self._reclaim_slid_pages(seq)
            if seq.finished():
                # trim over-generated tokens beyond the stop point
                sp = seq.req.sampling
                keep = min(seq.num_generated, sp.max_new_tokens)
                seq.tokens = seq.tokens[: seq.prompt_len + keep]
                self._finish_seq(seq)

    # --------------------------------------------------------- spec decode

    def _spec_ok(self, batch) -> bool:
        """Speculative decoding applies when the adapter has a verify step
        (Llama-likes incl. sliding window + int8, MLA, hybrid layer
        groups) and the family is stateless.  Greedy rows accept on argmax
        equality (token-exact vs plain decode); temperature>0 rows use
        rejection sampling against their filtered target distribution
        (distribution-exact — see _spec_accept)."""
        return (
            self.cfg.spec_decode
            and self._verify_step_impl is not None
            and not self.has_state
        )

    def _decode_dispatch(self) -> None:
        batch = self.running[: self.cfg.max_batch]
        if batch and self._spec_ok(batch) and not self._spec_cooling():
            self._do_spec_decode()
        else:
            self._do_decode()

    # -- adaptive gamma: acceptance-driven speculation length ---------------

    def _spec_cooling(self) -> bool:
        """During a cooldown the engine runs plain decode dispatches (the
        workload isn't drafting well even at the smallest gamma); when it
        expires, speculation retries with a fresh EMA."""
        if not self.cfg.spec_adaptive or self._spec_cooldown <= 0:
            return False
        self._spec_cooldown -= 1
        if self._spec_cooldown == 0:
            self._spec_ema = None  # retry unbiased
            self._spec_gamma_cur = min(2, self.cfg.spec_gamma)
        return True

    def _spec_update_gamma(self, drafts_per_iter: float) -> None:
        """EMA-follow the observed acceptance and walk the power-of-two
        gamma ladder: shrink when most drafts are rejected (each extra
        draft token still costs verify bandwidth), grow when the current
        rung is mostly accepted, and cool off to plain decode when even
        gamma=2 yields almost nothing (a verify iteration only beats a
        decode step when it nets extra tokens)."""
        ema = (
            drafts_per_iter if self._spec_ema is None
            else 0.7 * self._spec_ema + 0.3 * drafts_per_iter
        )
        self._spec_ema = ema
        g = self._spec_gamma_cur
        if ema < 0.15 and g <= 2:
            self._spec_cooldown = 8
        elif ema < 0.8 and g > 2:
            self._spec_gamma_cur = g // 2
        elif ema > 0.6 * g and g * 2 <= self.cfg.spec_gamma:
            self._spec_gamma_cur = g * 2

    def _build_spec_fn(self, T: int, S: int, W: int, sampled: bool,
                       filters: bool):
        """Jit one SPEC HORIZON: ``S`` chained verify iterations on device,
        each drafting gamma = T-1 tokens from a device-held ring of the
        last ``W`` tokens (prompt-lookup, vLLM's ngram scheme), verifying
        them in one fused multi-query forward, and accepting per
        _spec_accept (argmax equality for greedy rows; rejection sampling
        for temperature>0 rows).  Drafting + acceptance stay in-jit, so one
        HOST DISPATCH nets up to S*T tokens per row — the speculative
        sibling of the K-step decode horizon (one dispatch per token would
        drown the win in dispatch overhead: measured 0.37x on the axon
        tunnel vs 1.116x verify/decode forward cost).  ``sampled``/
        ``filters`` are static: all-greedy batches compile the RNG-free
        token-exact program."""
        ec = self.cfg
        P = ec.page_tokens
        n = ec.spec_ngram
        gamma = T - 1
        vstep = self._verify_step_impl

        @partial(jax.jit, donate_argnums=(1, 2))
        def spec_multi(params, k_pools, v_pools, ring0, seq_lens0,
                       page_tables, max_lens, temps, top_ks, top_ps,
                       rng_key):
            """ring0 [B, W]: last W tokens, newest at column W-1 (short rows
            left-padded with -1 — never matches a real n-gram).  seq_lens0
            [B] counts tokens whose KV is already written (= len-1).
            Returns (outs [S, B, T] emitted tokens, counts [S, B] kept
            per iteration, pools)."""
            B = ring0.shape[0]
            b_idx = jnp.arange(B)[:, None]

            def draft(ring):
                key = ring[:, W - n:]  # trailing n-gram
                idx = jnp.arange(W - n)[:, None] + jnp.arange(n)[None, :]
                wins = ring[:, idx]  # [B, W-n, n] candidate windows
                m = jnp.all(wins == key[:, None, :], axis=-1)  # [B, W-n]
                found = jnp.any(m, axis=1)
                latest = (W - n - 1) - jnp.argmax(m[:, ::-1], axis=1)
                cont_idx = jnp.minimum(
                    latest[:, None] + n + jnp.arange(gamma)[None, :], W - 1
                )
                cont = jnp.take_along_axis(ring, cont_idx, axis=1)
                rep = jnp.broadcast_to(ring[:, -1:], cont.shape)
                return jnp.where(found[:, None], cont, rep)  # [B, gamma]

            def one(carry, _):
                ring, seq_lens, k_pools, v_pools, key = carry
                d = draft(ring)
                tokens = jnp.concatenate([ring[:, -1:], d], axis=1)  # [B, T]
                raw_pos = seq_lens[:, None] + jnp.arange(T)[None, :]
                cap = jnp.maximum(max_lens[:, None] - 1, 0)
                pos = jnp.clip(raw_pos, 0, cap)
                # >= cap, not > cap: position cap (the final token's slot)
                # is never consumed, and plain decode leaves it unwritten —
                # writing it here would let a SATURATED row (seq_lens
                # pinned at cap by the carry clamp) overwrite the slot with
                # a discarded post-cap token's KV on later iterations.
                # Queries at >= cap produce garbage outputs, all discarded.
                overflow = raw_pos >= cap  # incl. padded rows (max_lens 0)
                if page_tables.ndim == 3:  # [G, B, max_pages] hybrid groups
                    slot_pages = jnp.where(
                        overflow[None], 0,
                        page_tables[:, b_idx, pos // P],
                    )
                else:
                    slot_pages = jnp.where(
                        overflow, 0, page_tables[b_idx, pos // P]
                    )
                slot_offsets = pos % P
                # UNclamped: the kernel derives each query's position as
                # (kv_lens - T) + j, so clamping at a row's cap would shift
                # every query one short and corrupt the causal mask one
                # dispatch BEFORE the cap.  Overflow queries' outputs are
                # discarded host-side and their writes already routed to
                # the zero page, so the honest count is safe.
                kv_lens = seq_lens + T
                logits, k_pools, v_pools = vstep(
                    params, tokens, pos, k_pools, v_pools, page_tables,
                    slot_pages, slot_offsets, kv_lens,
                )
                if sampled:
                    key, sub = jax.random.split(key)
                    out, a = _spec_accept(
                        logits, d, temps, top_ks, top_ps, sub,
                        filters=filters,
                    )
                else:
                    # all-greedy fast path: longest prefix matching the
                    # model's own argmax; out doubles as the correction
                    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    match = (out[:, :gamma] == d).astype(jnp.int32)
                    a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                appended = a + 1  # accepted drafts + bonus/replacement
                # roll the kept tokens into the ring (out[:, :appended])
                cat = jnp.concatenate([ring, out], axis=1)  # [B, W+T]
                new_ring = jnp.take_along_axis(
                    cat, jnp.arange(W)[None, :] + appended[:, None], axis=1
                )
                new_seq = jnp.minimum(
                    seq_lens + appended, jnp.maximum(max_lens - 1, 0)
                )
                return (
                    (new_ring, new_seq, k_pools, v_pools, key),
                    (out, appended),
                )

            (_, _, k_pools, v_pools, _), (outs, counts) = jax.lax.scan(
                one,
                (ring0, jnp.maximum(seq_lens0, 0), k_pools, v_pools,
                 rng_key),
                None, length=S,
            )
            # pack (outs [S,B,T], counts [S,B]) into ONE array: every
            # device→host pull is a separate ~30 ms round-trip through the
            # axon tunnel, and two pulls per dispatch were eating the spec
            # path's entire kernel-level win
            packed = jnp.concatenate([outs, counts[..., None]], axis=-1)
            return packed, k_pools, v_pools

        return spec_multi

    def _do_spec_decode(self) -> None:
        """One speculative horizon: S on-device verify iterations, each
        drafting + verifying gamma tokens and keeping the accepted prefix.
        Greedy rows are token-exact vs plain decode by construction;
        sampled rows are distribution-exact (rejection sampling)."""
        ec = self.cfg
        B = ec.max_batch
        gamma = self._spec_gamma_cur if ec.spec_adaptive else ec.spec_gamma
        T = gamma + 1
        S = ec.spec_horizon
        W = max(ec.spec_window, ec.spec_ngram + gamma + 1)
        batch = self.running[:B]
        # adaptive horizon (same knob as decode): every iteration advances
        # a row by >= 1 token, so when the batch's nearest cap is close,
        # iterations past it only produce discarded outputs — shrink S to
        # the next power of two (bounding compiled variants)
        if ec.adaptive_horizon and batch:
            needed = min(
                max(1, self._row_cap(s) - len(s.tokens)) for s in batch
            )
            if needed < S:
                S = max(1, 1 << (needed.bit_length() - 1))
                S = min(S, ec.spec_horizon)
        # worst case a dispatch advances a row by S*T tokens (capped at the
        # row's own cap); reserve pages up front, preempting on pressure
        batch = self._admit_running(
            lambda s: min(len(s.tokens) + S * T, self._row_cap(s))
        )
        if not batch:
            return

        ring = np.full((B, W), -1, np.int32)  # -1 pad: matches no n-gram
        seq_lens0 = np.zeros(B, np.int32)
        if self.num_groups > 1:
            page_tables = np.zeros(
                (self.num_groups, B, self.max_pages_per_seq), np.int32
            )
        else:
            page_tables = np.zeros((B, self.max_pages_per_seq), np.int32)
        max_lens = np.zeros(B, np.int32)  # 0 for padded rows: all discarded
        temps = np.zeros(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        top_ps = np.ones(B, np.float32)
        for i, seq in enumerate(batch):
            tail = seq.tokens[-W:]
            ring[i, W - len(tail):] = tail
            seq_lens0[i] = len(seq.tokens) - 1  # KV written so far
            if self.num_groups > 1:
                page_tables[:, i] = self._phys_rows(seq)
            else:
                page_tables[i] = self._phys_row(seq)
            max_lens[i] = self._row_cap(seq)
            sp = seq.req.sampling
            temps[i] = sp.temperature
            top_ks[i] = sp.top_k
            top_ps[i] = sp.top_p
        sampled = bool((temps > 0).any())
        filters = sampled and bool((top_ks > 0).any() or (top_ps < 1.0).any())

        key = (T, S, W, sampled, filters)
        fn = self._verify_fns.get(key)
        if fn is None:
            fn = self._verify_fns[key] = self._build_spec_fn(
                T, S, W, sampled, filters
            )
        packed, self.k_pools, self.v_pools = fn(
            self.params, self.k_pools, self.v_pools, jnp.asarray(ring),
            jnp.asarray(seq_lens0), jnp.asarray(page_tables),
            jnp.asarray(max_lens), jnp.asarray(temps), jnp.asarray(top_ks),
            jnp.asarray(top_ps), jax.random.PRNGKey(self._step_count),
        )
        packed = np.asarray(packed)  # ONE host pull: [S, B, T+1]
        outs = packed[..., :-1]  # [S, B, T]
        counts = packed[..., -1]  # [S, B]
        self._spec_dispatches += 1
        if ec.spec_adaptive:
            # device counts = accepted drafts + 1; real rows only
            self._spec_update_gamma(
                float(counts[:, : len(batch)].mean()) - 1.0
            )

        for i, seq in enumerate(batch):
            appended = 0
            for it in range(S):
                if seq.finished():
                    break
                for j in range(int(counts[it, i])):
                    seq.tokens.append(int(outs[it, i, j]))
                    appended += 1
                    if seq.finished():
                        break
            self._spec_tokens += appended
            self._check_stops(seq)
            self._reclaim_slid_pages(seq)
            if seq.finished():
                sp = seq.req.sampling
                keep = min(seq.num_generated, sp.max_new_tokens)
                seq.tokens = seq.tokens[: seq.prompt_len + keep]
                self._finish_seq(seq)

    def _check_stops(self, seq: Sequence) -> None:
        """Stop-STRING detection: decode the generated tail and finish the
        sequence when any stop string appears, recording the text truncated
        before its earliest occurrence (OpenAI semantics — the stop itself
        is excluded).  Runs once per dispatch, so a horizon may generate a
        few tokens past the stop; truncation is by text position, so the
        returned output is identical to per-token checking (the same
        argument real engines use for chunked detokenization).

        Cost note: the full tail re-decodes each dispatch — O(n²/K) chars
        over a generation of n tokens, microseconds per call for the fast
        (rust) tokenizers at serving lengths and only for requests that
        set stops; an incremental detokenizer with a bounded lookback is
        the upgrade path if a profile ever shows it."""
        sp = seq.req.sampling
        if (
            not sp.stop or self.tokenizer is None or seq.stop_hit
            or seq.num_generated == 0
        ):
            return
        text = self.tokenizer.decode(seq.tokens[seq.prompt_len:])
        best = None
        for s in sp.stop:
            i = text.find(s)
            if i != -1 and (best is None or i < best):
                best = i
        if best is not None:
            seq.stop_hit = True
            seq.output_text = text[:best]

    def _finish_seq(self, seq: Sequence) -> None:
        self.running.remove(seq)
        self._free_seq(seq)
        self.finished_outputs.append(
            RequestOutput(
                seq.req.req_id,
                seq.req.prompt,
                seq.tokens[seq.prompt_len :],
                output_text=seq.output_text,
            )
        )

    def _can_admit(self, seq: Sequence) -> bool:
        """Admission watermark: require room for the prompt plus one decode
        horizon plus a page of margin.  Prevents admit→grow→preempt churn
        near capacity (each preemption recomputes the whole sequence), the
        engine-side analogue of vLLM's scheduler watermark."""
        target = self._blocks_needed(
            seq.prompt_len + self.cfg.decode_horizon
        ) + 1
        for g in range(self.num_groups):
            need = target - len(seq.blocks_g[g])
            avail = self.managers[g].available_size() + (
                self.prefix_cache.num_evictable if g == 0 else 0
            )
            if avail < need:
                return False
        if (
            self.has_state
            and seq.state_block is None
            and self.state_manager.available_size() < 1
        ):
            return False
        return True

    def preempt_prefilling(self) -> None:
        """Roll a mid-prefill sequence back to waiting (sleep/pressure)."""
        seq = self._prefilling
        if seq is None:
            return
        self._prefilling = None
        self._free_seq(seq, cache_kv=False)
        seq.tokens = list(seq.req.prompt)
        seq.num_prefilled = 0
        self._requeue_preempted(seq)

    def step(self) -> None:
        """One scheduler iteration: one prefill chunk, or one decode
        horizon.  A long prompt's chunks INTERLEAVE with decode (chunk on
        odd steps, decode on even) so running sequences keep generating
        while it prefills — the reference host engines' chunked-prefill
        scheduling."""
        self._step_count += 1
        if self._prefilling is not None:
            if (self._combined_fn is not None and self.running
                    and self._combined_chunk_step()):
                # pp placement: the 1F1B combined dispatch advanced the
                # chunk AND every running row together — no starvation,
                # no alternation
                return
            if not self.running or self._step_count % 2:
                if self._prefill_chunk(self._prefilling):
                    self._prefilling = None
            else:
                self._decode_dispatch()
            return
        if self.waiting and len(self.running) < self.cfg.max_batch:
            # burst admission must not starve decode: when rows are already
            # running, alternate admission/prefill dispatches with decode
            # exactly like the mid-chunk path above — otherwise a deep
            # waiting queue (batched prefills back-to-back) delays every
            # admitted row's first token until the whole queue prefills
            if self.running and self._step_count % 2 == 0:
                self._decode_dispatch()
                return
            batch, head_blocked = self._collect_prefill_batch()
            if len(batch) >= 2:
                self._prefill_chunk_batch(batch)
                return
            if len(batch) == 1:
                # begun but alone (queue drained / neighbour inadmissible):
                # its remaining prompt fits one bucket, so the serial chunk
                # completes it in one dispatch
                self._prefill_chunk(batch[0])
                return
            seq = self.waiting[0]
            if not head_blocked and self._can_admit(seq) \
                    and self._begin_prefill(seq):
                self.waiting.pop(0)
                if not self._prefill_chunk(seq):
                    self._prefilling = seq
                return
            # cannot admit: fall through to decode if anything is running
            if not self.running:
                # nothing running and can't admit → hard pressure; try shrink
                # completion via a no-op alloc (picks up resize targets), then
                # preemption is impossible; wait for operator action.
                self.manager.alloc(0)
                time.sleep(0.01)
                return
        if self.running:
            self._decode_dispatch()

    # ----------------------------------------------- PD disaggregation

    def export_sequence(self, req_id: int, *, device: bool = False):
        """Prefill side of PD disaggregation: extract a prefilled (or
        partially decoded) sequence — tokens + its KV page payloads (and,
        for stateful models, the mamba state cell) — and free its local
        pages.  A decode engine adopts the result via
        :meth:`import_sequence`, continuing bit-identically.

        ``device=True`` keeps the payload as jax arrays (no host copy):
        handing it to an engine on another chip rides ICI via
        ``jax.device_put`` inside the import's write path; ``to_wire``
        still works (it gathers lazily).

        Reference analogue: NIXL connector shipping kvcached pages between
        prefill and decode workers (vllm/nixl_compat.py:104-197)."""
        from ..parallel.pd import GroupPayload, SeqHandoff

        seq = next(s for s in self.running if s.req.req_id == req_id)
        self.running.remove(seq)
        # page gather (read-only; the pool is not donated here)
        wrap = (lambda x: x) if device else np.asarray
        payload_k = payload_v = payload_groups = None
        if self.num_groups > 1:
            # hybrid groups: sliding-window groups reclaimed pages below
            # the window (entries None) — ship only live pages with their
            # positions in the block row
            payload_groups = []
            for g in range(self.num_groups):
                pt = self.managers[g].page_allocator.page_table
                row = seq.blocks_g[g]
                idx = [j for j, b in enumerate(row) if b is not None]
                phys_g = np.asarray([pt[row[j]] for j in idx], np.int32)
                # placed pp: group g's pages live in STAGE g's slice of
                # the stage-stacked [S, Lp, pages, ...] pool; unequal
                # layer groups keep per-group arenas (tuple); colocated
                # equal-group families share one [Lp, pages, ...] arena
                per_g = self._pp_axis or self._group_pools is not None
                kp = self.k_pools[g] if per_g else self.k_pools
                vp = self.v_pools[g] if per_g else self.v_pools
                payload_groups.append(GroupPayload(
                    indices=idx,
                    n_slots=len(row),
                    k=wrap(kp[:, phys_g]),
                    v=wrap(vp[:, phys_g]),
                ))
        else:
            n = len(seq.blocks)
            phys = self._phys_row(seq)[:n]
            payload_k = wrap(self.k_pools[:, phys])
            payload_v = (
                wrap(self.v_pools[:, phys])
                if self.v_pools is not None else None
            )
        payload_state = None
        if self.has_state:
            payload_state = wrap(
                self.states[:, self._phys_state_slot(seq)]
            )
        sp = seq.req.sampling
        handoff = SeqHandoff(
            prompt=list(seq.req.prompt),
            tokens=list(seq.tokens),
            max_new_tokens=sp.max_new_tokens,
            temperature=sp.temperature,
            stop_token_ids=sp.stop_token_ids,
            payload_k=payload_k,
            payload_v=payload_v,
            payload_state=payload_state,
            payload_groups=payload_groups,
        )
        self._free_seq(seq, cache_kv=False)
        return handoff

    def import_sequence(self, handoff) -> int:
        """Decode side of PD disaggregation: allocate local pages, land the
        payload through the Pallas page writer (state cells via scatter),
        and resume decoding.  Payloads may be numpy (socket plane) or jax
        arrays (device plane): ``jnp.asarray`` device_puts either, so a
        cross-chip handoff rides ICI without a host bounce."""
        if (self.num_groups > 1) != (handoff.payload_groups is not None):
            raise ValueError("handoff group payload does not match model family")
        if self.has_state != (handoff.payload_state is not None):
            raise ValueError("handoff state payload does not match model family")
        if self.num_groups == 1 and (
            (self.v_pools is None) != (handoff.payload_v is None)
        ):
            raise ValueError("handoff buffer count does not match kv geometry")

        req = Request(
            next(self._ids), list(handoff.prompt),
            SamplingParams(
                max_new_tokens=handoff.max_new_tokens,
                temperature=handoff.temperature,
                stop_token_ids=tuple(handoff.stop_token_ids),
            ),
        )
        seq = Sequence(req, self.num_groups)
        seq.tokens = list(handoff.tokens)

        if handoff.payload_groups is not None:
            # hybrid groups: all-or-nothing allocation of each group's live
            # pages, re-placed at their original block-row positions (dead
            # sliding-window entries stay None → zero page, never read)
            if len(handoff.payload_groups) != self.num_groups:
                raise ValueError("handoff group count mismatch")
            taken: list[tuple[int, list[int]]] = []
            for g, grp in enumerate(handoff.payload_groups):
                blocks = (
                    self._alloc_blocks(len(grp.indices), g)
                    if grp.indices else []
                )
                if blocks is None:
                    for gg, bs in taken:
                        self.managers[gg].free(bs)
                    raise RuntimeError(
                        "decode engine out of pages for PD import"
                    )
                taken.append((g, blocks))
                row: list[int | None] = [None] * grp.n_slots
                for b, j in zip(blocks, grp.indices):
                    row[j] = b
                seq.blocks_g[g] = row
            for g, grp in enumerate(handoff.payload_groups):
                if not grp.indices:
                    continue
                pt = self.managers[g].page_allocator.page_table
                phys = jnp.asarray(
                    [pt[seq.blocks_g[g][j]] for j in grp.indices], jnp.int32
                )
                if self._pp_axis:
                    self._land_pages_stage(
                        g, phys, jnp.asarray(grp.k), jnp.asarray(grp.v)
                    )
                else:
                    self._land_pages(
                        phys, jnp.asarray(grp.k), jnp.asarray(grp.v),
                        group=g,
                    )
            seq.num_prefilled = seq.prompt_len
            self.running.append(seq)
            return req.req_id

        n = handoff.payload_k.shape[1]
        blocks = self._alloc_blocks(n)
        if blocks is None:
            raise RuntimeError("decode engine out of pages for PD import")
        seq.blocks = blocks
        if self.has_state:
            sb = self.state_manager.alloc(1)
            if sb is None:
                self.manager.free(blocks)
                seq.blocks = []
                raise RuntimeError("decode engine out of state slots for PD import")
            seq.state_block = sb[0]
            self.states = self.states.at[:, self._phys_state_slot(seq)].set(
                jnp.asarray(handoff.payload_state, jnp.float32)
            )
        phys = jnp.asarray(self._phys_row(seq)[:n])
        self._land_pages(
            phys,
            jnp.asarray(handoff.payload_k),  # device_put (ICI cross-chip)
            jnp.asarray(handoff.payload_v)
            if handoff.payload_v is not None else None,
        )
        seq.num_prefilled = seq.prompt_len
        self.running.append(seq)
        return req.req_id

    def _land_pages_stage(self, g: int, phys, pay_k, pay_v) -> None:
        """PD import under pp PLACEMENT: land payload [Lp, n, KH, P, D]
        into STAGE g's slice of the stage-stacked pool via an XLA scatter.
        A scatter implies a full-arena copy (the reason the decode writers
        are Pallas aliasing kernels), but PD import is off the hot path —
        one copy per imported sequence is fine, and the scatter composes
        with any pp(+tp) sharding without a dedicated shard-mapped
        writer."""
        P = self.cfg.page_tokens
        assert pay_k.shape[3] == P, "page geometry mismatch"
        # x.at[g, :, phys]: the scalar g and the array phys are BOTH
        # advanced indices separated by a slice, so the result axes move
        # to the front — the update value's layout is [n, Lp, KH, P, D]
        self.k_pools = self.k_pools.at[g, :, phys].set(
            jnp.swapaxes(pay_k, 0, 1).astype(self.k_pools.dtype)
        )
        self.v_pools = self.v_pools.at[g, :, phys].set(
            jnp.swapaxes(pay_v, 0, 1).astype(self.v_pools.dtype)
        )

    def _land_pages(self, phys, pay_k, pay_v, group: int | None = None) -> None:
        """Write gathered page payloads [L, n, KH, P, D] into the pools at
        physical pages ``phys``, through the Pallas page writers — via a
        shard-mapped writer when serving over a mesh (payload shards on the
        kv-head axis like the pool; dp shards perform identical writes).
        ``group``: under per-group arenas (unequal layer groups) the
        payload lands in that group's own pool.  Recompiles per distinct
        page count n; PD import is not the decode hot path."""
        if self._group_pools is not None:
            assert group is not None, "per-group arenas need a group id"
            kp, vp = self.k_pools[group], self.v_pools[group]
            L = pay_k.shape[0]
            n, P = pay_k.shape[1], pay_k.shape[3]
            KH, D = pay_k.shape[2], pay_k.shape[4]
            from ..ops.paged_attention import write_prefill_kv

            for layer in range(L):
                k_new = jnp.transpose(pay_k[layer], (1, 0, 2, 3)).reshape(
                    KH, n * P, D
                )
                v_new = jnp.transpose(pay_v[layer], (1, 0, 2, 3)).reshape(
                    KH, n * P, D
                )
                kp, vp = write_prefill_kv(
                    kp, vp, k_new, v_new, phys, layer,
                    interpret=self.cfg.interpret,
                )
            self.k_pools = tuple(
                kp if i == group else p for i, p in enumerate(self.k_pools)
            )
            self.v_pools = tuple(
                vp if i == group else p for i, p in enumerate(self.v_pools)
            )
            return
        from ..ops.paged_attention import (
            write_prefill_kv,
            write_prefill_kv_single,
        )

        L, n, KH, P, D = pay_k.shape
        assert P == self.cfg.page_tokens, "page geometry mismatch"
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as SP

            pool_p = SP(None, None, "tp")
            pay_p = SP(None, None, "tp")  # [L, n, KH, P, D] on KH

            def write_all(k_pools, v_pools, pay_k, pay_v, phys):
                kh, pt, d = pay_k.shape[2], pay_k.shape[3], pay_k.shape[4]
                for layer in range(L):
                    k_new = jnp.transpose(
                        pay_k[layer], (1, 0, 2, 3)
                    ).reshape(kh, n * pt, d)
                    v_new = jnp.transpose(
                        pay_v[layer], (1, 0, 2, 3)
                    ).reshape(kh, n * pt, d)
                    k_pools, v_pools = write_prefill_kv(
                        k_pools, v_pools, k_new, v_new, phys, layer,
                        interpret=self.cfg.interpret,
                    )
                return k_pools, v_pools

            sharded = jax.shard_map(
                write_all, mesh=self.mesh,
                in_specs=(pool_p, pool_p, pay_p, pay_p, SP()),
                out_specs=(pool_p, pool_p),
                check_vma=False,
            )
            self.k_pools, self.v_pools = jax.jit(
                sharded, donate_argnums=(0, 1)
            )(self.k_pools, self.v_pools, pay_k, pay_v, phys)
            return
        for layer in range(L):
            # [n, KH, P, D] -> [KH, n*P, D] (the writer's chunk layout)
            k_new = jnp.transpose(pay_k[layer], (1, 0, 2, 3)).reshape(
                KH, n * P, D
            )
            if pay_v is None:  # MLA single-buffer latent pool
                self.k_pools = write_prefill_kv_single(
                    self.k_pools, k_new, phys, layer,
                    interpret=self.cfg.interpret,
                )
                continue
            v_new = jnp.transpose(pay_v[layer], (1, 0, 2, 3)).reshape(
                KH, n * P, D
            )
            self.k_pools, self.v_pools = write_prefill_kv(
                self.k_pools, self.v_pools, k_new, v_new, phys, layer,
                interpret=self.cfg.interpret,
            )

    # ------------------------------------------------------------- frontends

    def generate(
        self,
        prompts: Seq[Seq[int]],
        sampling: SamplingParams | None = None,
    ) -> list[RequestOutput]:
        ids = [self.add_request(list(p), sampling) for p in prompts]
        want = set(ids)
        while self.has_unfinished() and want - {o.req_id for o in self.finished_outputs}:
            self.step()
        by_id = {o.req_id: o for o in self.finished_outputs}
        return [by_id[i] for i in ids]

    # ------------------------------------------------------------- metrics

    def kv_metrics(self) -> dict:
        out = {
            "mapped_bytes": sum(
                m.get_mapped_memory_size() for m in self.managers
            ),
            "in_use_pages": sum(
                m.page_allocator.num_in_use for m in self.managers
            ),
            "reserved_pages": sum(
                m.page_allocator.num_reserved for m in self.managers
            ),
            # the admission-relevant number: the scarcest group gates admits
            "available_blocks": min(
                m.available_size() for m in self.managers
            ),
            "running": len(self.running),
            "waiting": len(self.waiting),
            "prefilling": int(self._prefilling is not None),
            "preemptions": self._preempt_count,
            "prefix_cache": self.prefix_cache.get_usage(),
        }
        if self._combined_fn is not None:
            out["pp_combined_dispatches"] = self._combined_dispatches
        if self._prefill_batch_fn is not None:
            out["prefill_batch"] = {
                "dispatches": self._pb_dispatches,
                "prompts": self._pb_prompts,
                "prompts_per_dispatch": (
                    self._pb_prompts / self._pb_dispatches
                    if self._pb_dispatches else 0.0
                ),
            }
        if self.cfg.spec_decode:
            out["spec"] = {
                "dispatches": self._spec_dispatches,
                "tokens": self._spec_tokens,
                "tokens_per_dispatch": (
                    self._spec_tokens / self._spec_dispatches
                    if self._spec_dispatches else 0.0
                ),
            }
            if self.cfg.spec_adaptive:
                out["spec"]["gamma"] = self._spec_gamma_cur
                out["spec"]["acceptance_ema"] = self._spec_ema
                out["spec"]["cooldown"] = self._spec_cooldown
        if self.num_groups > 1:
            out["groups"] = [
                {
                    "window": self.group_windows[g],
                    "in_use_pages": self.managers[g].page_allocator.num_in_use,
                    "mapped_bytes": self.managers[g].get_mapped_memory_size(),
                }
                for g in range(self.num_groups)
            ]
        if self.has_state:
            out["state_pool"] = {
                "in_use_pages": self.state_manager.page_allocator.num_in_use,
                "mapped_bytes": self.state_manager.get_mapped_memory_size(),
                "available_slots": self.state_manager.available_size(),
            }
        return out

    def shutdown(self) -> None:
        for m in self.managers:
            m.shutdown()
        if self.state_manager is not None:
            self.state_manager.shutdown()
