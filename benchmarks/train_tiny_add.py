#!/usr/bin/env python
"""Train-and-commit a tiny REAL model for the accuracy gate.

The image has no model checkpoints and no network egress, so the
real-weights accuracy story (reference: GSM8K parity,
/root/reference/benchmarks/gsm8k/README.md) uses a genuine TRAINED
checkpoint produced here: a 1.2M-param HF ``LlamaForCausalLM`` (trained
with torch, saved with safetensors + a char-level fast tokenizer) that
learns 2-digit addition ("47+38=58." — answer reversed) to ~100% held-out accuracy.

Trained weights give sharp, non-tie logits — the thing random-weight toys
can't provide — so engine-vs-transformers token parity on them is a real
gate, and task accuracy through the FULL paged engine is measurable
exactly (accuracy_harness.py --ckpt ... --addition-eval).

Run once:  python benchmarks/train_tiny_add.py benchmarks/assets/tinyadd
(the checkpoint is committed; re-running reproduces it — seeded).
"""

from __future__ import annotations

import json
import os
import sys

VOCAB = list("0123456789+=.") + ["<pad>", "<unk>"]
HELD_OUT_SEED = 1234


def examples():
    for a in range(100):
        for b in range(100):
            # answer digits REVERSED (ones first): left-to-right
            # generation then carries naturally — the standard trick that
            # makes tiny models learn addition to ~100%
            yield f"{a}+{b}={str(a + b)[::-1]}."


def split():
    import random

    rng = random.Random(HELD_OUT_SEED)
    all_ex = list(examples())
    rng.shuffle(all_ex)
    return all_ex[1000:], all_ex[:1000]  # train, held-out


def build_tokenizer(out_dir: str):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {tok: i for i, tok in enumerate(VOCAB)}
    t = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = pre_tokenizers.Split("", "isolated")  # char-level
    t.decoder = decoders.Fuse()  # join chars without spaces on decode
    tok = PreTrainedTokenizerFast(
        tokenizer_object=t, pad_token="<pad>", unk_token="<unk>",
        eos_token=".",
    )
    tok.save_pretrained(out_dir)
    return tok


def main(out_dir: str = "benchmarks/assets/tinyadd") -> None:
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    os.makedirs(out_dir, exist_ok=True)
    tok = build_tokenizer(out_dir)
    train, held = split()

    cfg = LlamaConfig(
        vocab_size=len(VOCAB),
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=2,  # head_dim 128 (the Pallas lane width)
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        bos_token_id=None,
        eos_token_id=VOCAB.index("."),
        pad_token_id=VOCAB.index("<pad>"),
    )
    model = LlamaForCausalLM(cfg)
    print(f"params: {sum(p.numel() for p in model.parameters()) / 1e6:.2f}M")

    def batch_ids(strings):
        ids = [tok.encode(s) for s in strings]
        W = max(len(i) for i in ids)
        pad = VOCAB.index("<pad>")
        x = torch.full((len(ids), W), pad, dtype=torch.long)
        y = torch.full((len(ids), W), -100, dtype=torch.long)
        for r, seq in enumerate(ids):
            x[r, : len(seq)] = torch.tensor(seq)
            # loss only on the answer digits + terminator (after '=');
            # labels sit at their OWN positions — LlamaForCausalLM shifts
            # internally (logits[t] vs labels[t+1])
            eq = seq.index(VOCAB.index("="))
            y[r, eq + 1 : len(seq)] = torch.tensor(seq[eq + 1 :])
        return x, y

    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=4000)
    model.train()
    import random

    rng = random.Random(0)
    for step in range(4000):
        xs = rng.sample(train, 256)
        x, y = batch_ids(xs)
        out = model(input_ids=x, labels=y)
        out.loss.backward()
        opt.step()
        sched.step()
        opt.zero_grad()
        if step % 100 == 0:
            print(f"step {step}: loss {out.loss.item():.4f}", flush=True)

    # held-out exact-match accuracy with transformers' own greedy generate
    model.eval()
    correct = 0
    sample = held[:300]
    with torch.no_grad():
        for ex in sample:
            prompt, answer = ex.split("=")
            ids = tok.encode(prompt + "=")
            out = model.generate(
                torch.tensor([ids]), max_new_tokens=6, do_sample=False,
                eos_token_id=cfg.eos_token_id,
                pad_token_id=cfg.pad_token_id,
            )[0][len(ids):].tolist()
            got = "".join(VOCAB[t] for t in out)
            correct += got == answer
    acc = correct / len(sample)
    print(f"held-out accuracy (transformers generate): {acc:.3f}")
    assert acc >= 0.98, "model failed to learn the task — do not commit"

    model.save_pretrained(out_dir, safe_serialization=True)
    with open(os.path.join(out_dir, "heldout.json"), "w") as f:
        json.dump({"examples": held, "hf_accuracy": acc}, f)
    print(f"saved {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
