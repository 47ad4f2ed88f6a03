"""Seeded scheduling fuzz: randomized arrivals, prompt lengths, caps, and
pool pressure must never change any request's OUTPUT — only its service
order.  This is the systematic net for bugs like the round-4
priority-preemption admission corruption (a preempted victim below the
admission scan index dispatching a block-less sequence): every scenario
is replayed with an ample pool and the per-request outputs compared.

Deterministic (fixed seeds, greedy decoding), CPU interpret mode.
"""

import random

import jax
import pytest

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig, init_llama_params


@pytest.fixture(scope="module")
def toy():
    cfg = LlamaConfig.toy(num_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _scenario(seed: int, n_reqs: int):
    """Deterministic request mix: (arrival_step, prompt, max_new, prio)."""
    rng = random.Random(seed)
    reqs = []
    for i in range(n_reqs):
        plen = rng.choice([2, 3, 5, 8, 13, 30])
        prompt = [((seed * 31 + i * 7 + j) % 120) + 1 for j in range(plen)]
        reqs.append((
            rng.randrange(0, 4),          # arrival step
            prompt,
            rng.choice([16, 24, 32]),     # max_new: grow well past admit
            rng.choice([0, 0, 1, 5]),     # priority
        ))
    return reqs


def _serve(toy, reqs, *, num_pages, policy, max_batch):
    cfg, params = toy
    eng = LLMEngine(
        cfg,
        EngineConfig(
            max_batch=max_batch, max_model_len=64, page_tokens=16,
            decode_horizon=2, prefill_buckets=(16, 32), num_pages=num_pages,
            interpret=True, scheduling_policy=policy,
        ),
        params=params,
    )
    try:
        pending = sorted(
            ((arr, i) for i, (arr, *_rest) in enumerate(reqs)),
        )
        ids = {}
        step = 0
        while pending or eng.has_unfinished():
            while pending and pending[0][0] <= step:
                _, i = pending.pop(0)
                arr, prompt, mnt, prio = reqs[i]
                ids[eng.add_request(
                    prompt, SamplingParams(max_new_tokens=mnt),
                    priority=prio,
                )] = i
            if eng.has_unfinished():
                eng.step()
            step += 1
        outs = {ids[o.req_id]: o.output_tokens
                for o in eng.finished_outputs}
        return [outs[i] for i in range(len(reqs))], eng._preempt_count
    finally:
        eng.shutdown()


@pytest.mark.parametrize("policy", ["fcfs", "priority", "sjf"])
def test_pressure_never_changes_outputs(toy, policy):
    """For each policy: the same randomized scenario under a tight pool
    (preemptions expected) must produce byte-identical per-request
    outputs as under an ample pool."""
    reqs = _scenario(seed=7, n_reqs=6)
    want, _ = _serve(toy, reqs, num_pages=96, policy=policy, max_batch=3)
    saw_preempt = False
    for pages in (5, 6, 8):
        got, preempts = _serve(
            toy, reqs, num_pages=pages, policy=policy, max_batch=3
        )
        saw_preempt = saw_preempt or preempts > 0
        assert got == want, (
            f"policy={policy} outputs changed under pressure "
            f"(num_pages={pages}, preemptions={preempts})"
        )
    assert saw_preempt, (
        "fuzz never triggered a preemption — tighten the pool sizes"
    )


def test_second_seed_priority(toy):
    reqs = _scenario(seed=23, n_reqs=8)
    want, _ = _serve(toy, reqs, num_pages=96, policy="priority", max_batch=4)
    got, _ = _serve(toy, reqs, num_pages=8, policy="priority", max_batch=4)
    assert got == want


def test_unequal_groups_pressure_invariance():
    """The per-group-arena (Gemma3-class) path under pool pressure: the
    same scenario with tight per-group pools (preemptions expected) must
    produce byte-identical outputs as with ample pools — the round-5
    unequal-groups allocator obeys the same invariant as the shared
    arena."""
    import dataclasses

    from kvcached_tpu.models.hybrid import HybridConfig, init_hybrid_params

    cfg = HybridConfig.toy(num_layers=3, window=16)
    cfg = dataclasses.replace(cfg, layer_windows=(16, 16, None))
    assert not cfg.equal_groups
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0))
    toy = (cfg, params)
    reqs = _scenario(seed=11, n_reqs=6)
    want, _ = _serve(toy, reqs, num_pages=96, policy="fcfs", max_batch=3)
    saw_preempt = False
    for pages in (6, 8):
        got, preempts = _serve(
            toy, reqs, num_pages=pages, policy="fcfs", max_batch=3
        )
        saw_preempt = saw_preempt or preempts > 0
        assert got == want, (
            f"unequal-group outputs changed under pressure "
            f"(num_pages={pages}, preemptions={preempts})"
        )
    assert saw_preempt, "fuzz never triggered a preemption"
