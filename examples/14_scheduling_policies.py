"""Example 14: scheduling policies — priority and shortest-job-first.

The reference delegates request scheduling to its host engines (vLLM
ships fcfs + priority scheduler policies); owning the engine makes the
policy a first-class knob here.  `EngineConfig.scheduling_policy`:

- "fcfs"      arrival order (default)
- "priority"  `add_request(..., priority=n)` — smaller served sooner
              (vLLM's convention); preemption under memory pressure
              evicts the WORST-priority newest sequence, and a preempted
              request re-queues at its policy slot, never the front
- "sjf"       shortest remaining prompt first (kills head-of-line
              blocking under bursty mixed-length arrivals)

Policies reorder SERVICE only — each request's tokens are unchanged.
The HTTP server forwards a `priority` body field the same way.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/14_scheduling_policies.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from kvcached_tpu.engine import EngineConfig, LLMEngine, SamplingParams
from kvcached_tpu.models.llama import LlamaConfig

ON_TPU = jax.devices()[0].platform == "tpu"


def serve(policy: str, reqs):
    """reqs: (name, prompt, priority) triples, submitted in order."""
    eng = LLMEngine(
        LlamaConfig.toy(),
        EngineConfig(
            max_batch=1,  # one slot -> the queue order is the story
            max_model_len=128, page_tokens=16, decode_horizon=4,
            prefill_buckets=(16, 32, 64), num_pages=64,
            interpret=not ON_TPU, scheduling_policy=policy,
        ),
    )
    try:
        ids = {
            eng.add_request(prompt, SamplingParams(max_new_tokens=8),
                            priority=prio): name
            for name, prompt, prio in reqs
        }
        while eng.has_unfinished():
            eng.step()
        return [ids[o.req_id] for o in eng.finished_outputs]
    finally:
        eng.shutdown()


def main():
    # an interactive tenant (high priority) stuck behind batch jobs
    reqs = [
        ("batch-job-1", list(range(1, 20)), 10),
        ("batch-job-2", list(range(30, 45)), 10),
        ("interactive", [7, 8, 9], 0),
    ]
    print("fcfs     :", serve("fcfs", reqs))
    print("priority :", serve("priority", reqs))

    # a 60-token prompt ahead of two tiny ones
    mixed = [
        ("long", [((3 * j) % 100) + 1 for j in range(60)], 0),
        ("tiny-a", [1, 2, 3], 0),
        ("tiny-b", [4, 5], 0),
    ]
    print("fcfs     :", serve("fcfs", mixed))
    print("sjf      :", serve("sjf", mixed))

    order = serve("priority", reqs)
    assert order[0] == "interactive", order
    order = serve("sjf", mixed)
    assert order[-1] == "long", order
    print("OK: priority overtakes arrival; sjf drains the short prompts first")


if __name__ == "__main__":
    main()
