"""HuggingFace checkpoint loading: safetensors → stacked-param Llama layout.

The reference serves real models by construction (vLLM/SGLang load the
weights); owning the engine means owning the loader.  This module reads a
standard HF Llama-family checkpoint directory (``config.json`` +
``*.safetensors``) and produces:

- a :class:`~kvcached_tpu.models.llama.LlamaConfig`, and
- the stacked parameter pytree the engine's ``lax.scan`` layers consume
  (per-layer weights stacked on a leading axis, projection matrices
  transposed to input-major).

A minimal pure-numpy safetensors reader/writer is included so loading works
without the ``safetensors`` package (header = 8-byte LE length + JSON of
``{name: {dtype, shape, data_offsets}}``); the real package is used when
importable.

RoPE convention note: HF Llama's ``rotate_half`` splits head_dim into two
contiguous halves — exactly the convention of
:func:`kvcached_tpu.models.llama.rope`, so weights map 1:1 with no
permutation.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import jax.numpy as jnp
import numpy as np

from ..logging_utils import get_kvcached_logger
from .llama import LlamaConfig

logger = get_kvcached_logger(__name__)

_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _np_dtype(st: str):
    if st == "BF16":
        return _bf16()
    try:
        return np.dtype(_ST_DTYPES[st])
    except KeyError as e:
        raise ValueError(f"unsupported safetensors dtype {st!r}") from e


def _st_name(dt: np.dtype) -> str:
    if dt == _bf16():
        return "BF16"
    for name, d in _ST_DTYPES.items():
        if np.dtype(d) == dt:
            return name
    raise ValueError(f"unsupported numpy dtype {dt}")


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Minimal reader: full file into memory, zero-copy views per tensor."""
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len))
        data = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        a, b = meta["data_offsets"]
        arr = np.frombuffer(data[a:b], dtype=_np_dtype(meta["dtype"]))
        out[name] = arr.reshape(meta["shape"])
    return out


def write_safetensors(tensors: dict[str, np.ndarray], path: str) -> None:
    """Minimal writer (tests + exporting toy checkpoints)."""
    header: dict = {}
    off = 0
    blobs = []
    for name, t in tensors.items():
        t = np.ascontiguousarray(t)
        blob = t.tobytes()
        header[name] = {
            "dtype": _st_name(t.dtype),
            "shape": list(t.shape),
            "data_offsets": [off, off + len(blob)],
        }
        off += len(blob)
        blobs.append(blob)
    hj = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(len(hj).to_bytes(8, "little"))
        f.write(hj)
        for b in blobs:
            f.write(b)


def _load_all_tensors(ckpt_dir: str) -> dict[str, np.ndarray]:
    files = sorted(
        f for f in os.listdir(ckpt_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {ckpt_dir}")
    out: dict[str, np.ndarray] = {}
    for f in files:
        out.update(read_safetensors(os.path.join(ckpt_dir, f)))
    return out


def config_from_hf(ckpt_dir: str, dtype: str = "bfloat16") -> LlamaConfig:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        hc = json.load(f)
    head_dim = hc.get(
        "head_dim", hc["hidden_size"] // hc["num_attention_heads"]
    )
    return LlamaConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        head_dim=head_dim,
        intermediate_size=hc["intermediate_size"],
        rope_theta=float(hc.get("rope_theta", 10000.0)),
        rms_eps=float(hc.get("rms_norm_eps", 1e-5)),
        dtype=dtype,
        sliding_window=hc.get("sliding_window"),
    )


def _stack(tensors: dict, fmt: str, L: int, transpose: bool) -> np.ndarray:
    mats = []
    for i in range(L):
        t = np.asarray(tensors[fmt.format(i)])
        mats.append(t.T if transpose else t)
    return np.stack(mats)


def params_from_hf(
    ckpt_dir: str, cfg: LlamaConfig | None = None, dtype: str = "bfloat16"
) -> tuple[LlamaConfig, dict]:
    """Load an HF Llama checkpoint into the stacked-param layout.

    HF stores projection weights output-major (``y = W x``, W: [out, in]);
    our layers compute ``h @ w`` so every projection transposes to
    [in, out].  Layer weights stack on a leading axis for the scan.
    """
    if cfg is None:
        cfg = config_from_hf(ckpt_dir, dtype=dtype)
    t = _load_all_tensors(ckpt_dir)
    L = cfg.num_layers
    jdt = jnp.dtype(dtype)

    def cast(x):
        return jnp.asarray(np.asarray(x, np.float32)).astype(jdt)

    pre = "model.layers.{}."
    params = {
        "embed": cast(t["model.embed_tokens.weight"]),
        "layers": {
            "attn_norm": cast(_stack(t, pre + "input_layernorm.weight", L, False)),
            "wq": cast(_stack(t, pre + "self_attn.q_proj.weight", L, True)),
            "wk": cast(_stack(t, pre + "self_attn.k_proj.weight", L, True)),
            "wv": cast(_stack(t, pre + "self_attn.v_proj.weight", L, True)),
            "wo": cast(_stack(t, pre + "self_attn.o_proj.weight", L, True)),
            "mlp_norm": cast(
                _stack(t, pre + "post_attention_layernorm.weight", L, False)
            ),
            "w_gate": cast(_stack(t, pre + "mlp.gate_proj.weight", L, True)),
            "w_up": cast(_stack(t, pre + "mlp.up_proj.weight", L, True)),
            "w_down": cast(_stack(t, pre + "mlp.down_proj.weight", L, True)),
        },
        "final_norm": cast(t["model.norm.weight"]),
    }
    if "lm_head.weight" in t:
        params["lm_head"] = cast(np.asarray(t["lm_head.weight"]).T)
    else:
        # tied embeddings
        params["lm_head"] = params["embed"].T
    logger.info(
        "loaded HF checkpoint %s: %d layers, %d params tensors",
        ckpt_dir, L, len(t),
    )
    return cfg, params


class HFTokenizer:
    """transformers tokenizer behind the server's tokenizer interface
    (encode/decode like :class:`kvcached_tpu.server.ByteTokenizer`)."""

    def __init__(self, name_or_dir: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(name_or_dir)
        self.eos_token_id = self._tok.eos_token_id

    def encode(self, text: str) -> list[int]:
        return list(self._tok.encode(text))

    def decode(self, tokens: Iterable[int]) -> str:
        return self._tok.decode(list(tokens), skip_special_tokens=True)

    def apply_chat_template(self, messages: list[dict]) -> list[int]:
        """Render a chat with the model's own template (falls back to a
        plain role-prefixed transcript when the tokenizer has none) and
        encode it with the generation prompt appended."""
        try:
            return list(
                self._tok.apply_chat_template(
                    messages, add_generation_prompt=True, tokenize=True
                )
            )
        except (ValueError, AttributeError):
            text = "\n".join(
                f"{m.get('role', 'user')}: {m.get('content', '')}"
                for m in messages
            )
            return self.encode(text + "\nassistant:")


def engine_from_checkpoint(
    ckpt_dir: str, engine_cfg=None, dtype: str = "bfloat16", **engine_kw
):
    """One-call serving from a checkpoint directory.  Attaches the
    checkpoint's tokenizer when present (stop-string support)."""
    from ..engine import LLMEngine

    cfg, params = params_from_hf(ckpt_dir, dtype=dtype)
    if "tokenizer" not in engine_kw:
        try:
            engine_kw["tokenizer"] = HFTokenizer(ckpt_dir)
        except Exception:  # noqa: BLE001 — weights-only checkpoint dirs
            pass
    return LLMEngine(cfg, engine_cfg, params=params, **engine_kw)
