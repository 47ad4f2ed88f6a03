#!/usr/bin/env python
"""Train-and-commit a ~12M-param model exercising the FLAGSHIP features.

The round-4 trained checkpoint (tinyadd, 1.25M params) proved the
real-weights accuracy gate but exercised none of the flagship serving
features.  This trainer produces ``winadd``: a Qwen2ForCausalLM-format
checkpoint (reference accuracy gate: GSM8K parity on a real served
checkpoint, /root/reference/benchmarks/gsm8k/README.md) with

- GQA            (4 query heads over 2 kv heads),
- a SLIDING WINDOW (24 tokens, uniform — Qwen2 use_sliding_window +
  max_window_layers=0) that BITES: documents chain many addition
  problems, so generation contexts exceed the window,
- ROPE SCALING   (linear, factor 2.0 — frequencies halved; serving that
  ignores it is wrong at every position),
- qkv BIASES     (Qwen2-architectural).

Task: chained reversed-answer addition ("47+38=58.12+90=201..."); the
answer to each problem depends only on the current problem's digits
(within the window), so the window never hurts accuracy while masking
away earlier problems.  Held-out pairs are disjoint from training pairs.

Training runs in JAX (fast on the TPU chip; works on CPU) using the SAME
numerics our parity tests pin against transformers; the checkpoint is
exported to HF safetensors and the accuracy gate below runs transformers'
OWN generate on it — an independent implementation of the semantics.

Run once:  python benchmarks/train_winadd.py benchmarks/assets/winadd
(committed; re-running reproduces it — seeded).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

VOCAB = list("0123456789+=.") + ["<pad>", "<unk>"]
PAD = VOCAB.index("<pad>")
EOS = VOCAB.index(".")
WINDOW = 24
ROPE_SCALING = ("linear", 2.0)
HELD_OUT_SEED = 977
DOC_LEN = 224  # tokens per training document (several problems deep)

# geometry: ~12M params, head_dim 128 (the Pallas lane width), GQA 4:2
HIDDEN, LAYERS, HEADS, KV_HEADS, HEAD_DIM, FFN = 512, 4, 4, 2, 128, 1408


def _held_out_pair(a: int, b: int) -> bool:
    # ~3% of (a, b) pairs are held out, disjoint from training
    return (a * 7919 + b * 104729 + HELD_OUT_SEED) % 33 == 0


def problem(a: int, b: int) -> str:
    return f"{a}+{b}={str(a + b)[::-1]}."


def encode(s: str) -> list[int]:
    return [VOCAB.index(c) for c in s]


def _sample_operand(rng) -> int:
    """Digit-count-uniform operand (1/2/3 digits equally likely): uniform
    0-999 is 90% 3-digit, which starves the easy carry sub-tasks the
    model bootstraps from — the mixed curriculum trains reliably."""
    n = int(rng.integers(1, 4))
    lo = 0 if n == 1 else 10 ** (n - 1)
    return int(rng.integers(lo, 10 ** n))


def make_doc(rng) -> str:
    doc = ""
    while True:
        a, b = _sample_operand(rng), _sample_operand(rng)
        if _held_out_pair(a, b):
            continue
        nxt = problem(a, b)
        if len(doc) + len(nxt) > DOC_LEN:
            return doc
        doc += nxt


def batch_arrays(rng, batch):
    import numpy as np

    x = np.full((batch, DOC_LEN), PAD, np.int32)
    y = np.full((batch, DOC_LEN), -100, np.int32)  # -100 = no loss
    for r in range(batch):
        ids = encode(make_doc(rng))
        x[r, : len(ids)] = ids
        # loss on answer digits + terminator of EVERY problem: positions
        # after each '=' up to and including the '.'
        in_ans = False
        for t, tok in enumerate(ids):
            if in_ans:
                y[r, t] = tok
            if tok == VOCAB.index("="):
                in_ans = True
            elif tok == EOS:
                in_ans = False
    return x, y


def init_params(key):
    from kvcached_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig(
        vocab_size=len(VOCAB), hidden_size=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, num_kv_heads=KV_HEADS, head_dim=HEAD_DIM,
        intermediate_size=FFN, rope_theta=10000.0, dtype="float32",
        sliding_window=WINDOW, attention_bias=True,
        rope_scaling=ROPE_SCALING,
    )
    return cfg, init_llama_params(cfg, key)


def forward(params, cfg, ids):
    """Dense training forward with the serving semantics: causal +
    sliding-window mask, scaled rope, GQA, qkv biases."""
    import jax
    import jax.numpy as jnp

    from kvcached_tpu.models.llama import qkv_heads, rms_norm, rope

    B, T = ids.shape
    H, KH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    group = H // KH
    pos = jnp.arange(T)
    qp = pos[:, None]
    kp = pos[None, :]
    mask = (kp <= qp) & (kp > qp - cfg.sliding_window)  # [T, T]
    sm = 1.0 / (D ** 0.5)

    x = params["embed"][ids]

    def layer_fn(x, lp):
        h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        q, k, v = qkv_heads(h, lp, H, KH, D, cfg.rms_eps)  # [B, T, H/KH, D]
        q = rope(q, pos[None], cfg.rope_theta, cfg.rope_scaling)
        k = rope(k, pos[None], cfg.rope_theta, cfg.rope_scaling)
        qg = q.reshape(B, T, KH, group, D).astype(jnp.float32)
        kf = k.astype(jnp.float32)
        s = jnp.einsum("btkgd,bskd->bkgts", qg, kf) * sm
        s = jnp.where(mask[None, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bkgts,bskd->btkgd", p, v.astype(jnp.float32))
        x = x + attn.reshape(B, T, H * D).astype(x.dtype) @ lp["wo"]
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)  # [B, T, V]


def export_hf(out_dir: str, cfg, params, acc: float, held) -> None:
    """Write a transformers-loadable Qwen2ForCausalLM checkpoint."""
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    t = {}
    g = lambda k: np.asarray(params[k], np.float32)  # noqa: E731
    gl = lambda k, i: np.asarray(params["layers"][k][i], np.float32)  # noqa: E731
    t["model.embed_tokens.weight"] = g("embed")
    t["lm_head.weight"] = np.ascontiguousarray(g("lm_head").T)
    t["model.norm.weight"] = g("final_norm")
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = gl("attn_norm", i)
        t[p + "post_attention_layernorm.weight"] = gl("mlp_norm", i)
        for hf, ours in (("q_proj", "wq"), ("k_proj", "wk"),
                         ("v_proj", "wv"), ("o_proj", "wo")):
            t[p + f"self_attn.{hf}.weight"] = np.ascontiguousarray(
                gl(ours, i).T
            )
        for hf, ours in (("q_proj", "bq"), ("k_proj", "bk"),
                         ("v_proj", "bv")):
            t[p + f"self_attn.{hf}.bias"] = gl(ours, i)
        for hf, ours in (("gate_proj", "w_gate"), ("up_proj", "w_up"),
                         ("down_proj", "w_down")):
            t[p + f"mlp.{hf}.weight"] = np.ascontiguousarray(gl(ours, i).T)
    save_file(t, os.path.join(out_dir, "model.safetensors"))

    hf_cfg = {
        "architectures": ["Qwen2ForCausalLM"],
        "model_type": "qwen2",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "intermediate_size": cfg.intermediate_size,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "max_position_embeddings": 2 * DOC_LEN,
        "use_sliding_window": True,
        "sliding_window": WINDOW,
        "max_window_layers": 0,
        "rope_scaling": {"rope_type": "linear", "factor": ROPE_SCALING[1]},
        "tie_word_embeddings": False,
        "torch_dtype": "float32",
        "eos_token_id": EOS,
        "pad_token_id": PAD,
        "bos_token_id": None,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)

    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {tok: i for i, tok in enumerate(VOCAB)}
    tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tk.decoder = decoders.Fuse()
    PreTrainedTokenizerFast(
        tokenizer_object=tk, pad_token="<pad>", unk_token="<unk>",
        eos_token=".",
    ).save_pretrained(out_dir)

    with open(os.path.join(out_dir, "heldout.json"), "w") as f:
        json.dump({"examples": held, "hf_accuracy": acc,
                   "window": WINDOW, "rope_scaling": list(ROPE_SCALING)}, f)


def heldout_prompts(n: int = 300):
    """Held-out eval: few-shot context (training-pair problems) pushing
    past the window, then a HELD-OUT problem to complete."""
    import numpy as np

    rng = np.random.default_rng(HELD_OUT_SEED)
    out = []
    while len(out) < n:
        # same digit-count-uniform distribution the model trains on
        a, b = _sample_operand(rng), _sample_operand(rng)
        if not _held_out_pair(a, b):
            continue
        ctx = ""
        for _ in range(4):  # ~50 tokens of context > WINDOW
            ca, cb = int(rng.integers(0, 1000)), int(rng.integers(0, 1000))
            if _held_out_pair(ca, cb):
                continue
            ctx += problem(ca, cb)
        out.append((ctx + f"{a}+{b}=", str(a + b)[::-1]))
    return out


def hf_accuracy(out_dir: str, prompts) -> float:
    """Gate: transformers' own generate on the exported checkpoint."""
    import torch
    from transformers import AutoTokenizer, Qwen2ForCausalLM

    model = Qwen2ForCausalLM.from_pretrained(
        out_dir, attn_implementation="eager")
    tok = AutoTokenizer.from_pretrained(out_dir)
    model.eval()
    correct = 0
    with torch.no_grad():
        for prompt, answer in prompts:
            ids = tok.encode(prompt)
            out = model.generate(
                torch.tensor([ids]), max_new_tokens=6, do_sample=False,
                eos_token_id=EOS, pad_token_id=PAD,
            )[0][len(ids):].tolist()
            got = "".join(VOCAB[t] for t in out if t != EOS)
            correct += got == answer
    return correct / len(prompts)


def main(out_dir: str = "benchmarks/assets/winadd", steps: int = 3000):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    cfg, params = init_params(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params / 1e6:.2f}M on {jax.devices()[0].platform}")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, warmup_steps=min(500, steps // 10),
        decay_steps=steps, end_value=3e-5,
    )
    optim = optax.adamw(sched, weight_decay=0.01)
    opt_state = optim.init(params)

    def loss_fn(params, x, y):
        logits = forward(params, cfg, x)
        # causal shift: logits[t] predicts the token AT t+1 (labels sit at
        # their own positions, like transformers' internal shift)
        lg = logits[:, :-1]
        tgt = y[:, 1:]
        valid = tgt >= 0
        losses = optax.softmax_cross_entropy_with_integer_labels(
            lg, jnp.maximum(tgt, 0)
        )
        return (losses * valid).sum() / jnp.maximum(valid.sum(), 1)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optim.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    batch = 96
    for i in range(steps):
        x, y = batch_arrays(rng, batch)
        params, opt_state, loss = step(params, opt_state, x, y)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)

    prompts = heldout_prompts()
    export_hf(out_dir, cfg, params, -1.0, prompts)
    acc = hf_accuracy(out_dir, prompts)
    print(f"held-out accuracy (transformers generate): {acc:.3f}")
    assert acc >= 0.98, "model failed to learn the task — do not commit"
    export_hf(out_dir, cfg, params, acc, prompts)  # rewrite with acc
    print(f"saved {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:2], *(int(a) for a in sys.argv[2:3]))
