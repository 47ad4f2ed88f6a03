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


#: HF architectures this loader maps onto the Llama-family layout.  Qwen2
#: differs from Llama only by additive qkv biases (attention_bias below);
#: Qwen3 only by per-head q/k RMSNorms (qk_norm); Mistral only by
#: sliding_window — all fields the config/step fns carry.
_LLAMA_LIKE_ARCHS = (
    "LlamaForCausalLM", "MistralForCausalLM", "Qwen2ForCausalLM",
    "Qwen3ForCausalLM",
)


def _gemma2_config(hc: dict, dtype: str):
    """Gemma2ForCausalLM → HybridConfig: alternating sliding/full layer
    groups (our hybrid family's shape), geglu-tanh MLP, (1+w) norms,
    sandwich post-norms, sqrt(E) embedding scale, attention + final logit
    soft-capping, query_pre_attn_scalar softmax scale."""
    from .hybrid import HybridConfig

    L = hc["num_hidden_layers"]
    head_dim = hc.get("head_dim", hc["hidden_size"] // hc["num_attention_heads"])
    sw = hc.get("sliding_window", 4096)
    if "layer_types" in hc and hc["layer_types"]:
        windows = tuple(
            sw if t == "sliding_attention" else None for t in hc["layer_types"]
        )
    else:
        # transformers Gemma2DecoderLayer: even layer indices are sliding
        windows = tuple(sw if i % 2 == 0 else None for i in range(L))
    return HybridConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        num_layers=L,
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        head_dim=head_dim,
        intermediate_size=hc["intermediate_size"],
        rope_theta=float(hc.get("rope_theta", 10000.0)),
        rms_eps=float(hc.get("rms_norm_eps", 1e-6)),
        dtype=dtype,
        layer_windows=windows,
        act="gelu_tanh",
        norm_offset=True,
        embed_scale=True,
        post_norms=True,
        attn_softcap=hc.get("attn_logit_softcapping"),
        final_softcap=hc.get("final_logit_softcapping"),
        query_scale=float(hc.get("query_pre_attn_scalar", head_dim)),
        rope_scaling=_rope_scaling_from_hf(hc),
    )


def _gemma3_config(hc: dict, dtype: str):
    """Gemma3ForCausalLM (text) → HybridConfig.  Gemma3 = the Gemma2
    structural knobs MINUS soft-capping PLUS per-head q/k RMSNorm (the
    (1+w) convention — pre-applied at load so qkv_heads' plain rms_norm
    is exact), a 5:1 local:global layer pattern (UNEQUAL layer groups —
    the engine gives each group its own arena), and split RoPE: local
    (sliding) layers at rope_local_base_freq unscaled, global layers at
    rope_theta with the config's rope_scaling."""
    from .hybrid import HybridConfig

    L = hc["num_hidden_layers"]
    head_dim = hc.get("head_dim", hc["hidden_size"] // hc["num_attention_heads"])
    sw = hc.get("sliding_window", 512)
    if "layer_types" in hc and hc["layer_types"]:
        windows = tuple(
            sw if t == "sliding_attention" else None for t in hc["layer_types"]
        )
    else:
        # transformers Gemma3TextConfig default: every 6th layer is global
        sp = int(hc.get("sliding_window_pattern", 6))
        windows = tuple(
            None if (i + 1) % sp == 0 else sw for i in range(L)
        )
    return HybridConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        num_layers=L,
        num_heads=hc["num_attention_heads"],
        num_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        head_dim=head_dim,
        intermediate_size=hc["intermediate_size"],
        rope_theta=float(hc.get("rope_theta", 1_000_000.0)),
        rms_eps=float(hc.get("rms_norm_eps", 1e-6)),
        dtype=dtype,
        layer_windows=windows,
        act="gelu_tanh",
        norm_offset=True,
        embed_scale=True,
        post_norms=True,
        qk_norm=True,
        query_scale=float(hc.get("query_pre_attn_scalar", 256.0)),
        rope_scaling=_rope_scaling_from_hf(hc),
        local_rope_theta=float(hc.get("rope_local_base_freq", 10_000.0)),
    )


def _rope_scaling_from_hf(hc: dict) -> tuple | None:
    """config.json rope_scaling → the hashable tuple rope_inv_freqs eats.

    Llama-3.1/3.2 checkpoints carry {"rope_type": "llama3", ...} and are
    TRAINED with it — loading them unscaled is silently wrong at every
    position, so unknown scaling kinds abort loudly rather than fall back.
    """
    rs = hc.get("rope_scaling")
    if not rs:
        return None
    kind = rs.get("rope_type", rs.get("type", "default"))
    if kind == "default":
        return None
    if kind == "linear":
        return ("linear", float(rs["factor"]))
    if kind == "llama3":
        return (
            "llama3", float(rs["factor"]),
            float(rs["low_freq_factor"]), float(rs["high_freq_factor"]),
            float(rs["original_max_position_embeddings"]),
        )
    raise ValueError(
        f"unsupported rope_scaling type {kind!r} (supported: linear, "
        f"llama3) — loading this checkpoint unscaled would be silently "
        f"wrong"
    )


def config_from_hf(ckpt_dir: str, dtype: str = "bfloat16") -> LlamaConfig:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        hc = json.load(f)
    archs = hc.get("architectures") or []
    if any(a == "Gemma2ForCausalLM" for a in archs):
        return _gemma2_config(hc, dtype)
    if any(a in ("Gemma3ForCausalLM", "Gemma3ForConditionalGeneration")
           for a in archs):
        if "text_config" in hc:  # multimodal wrapper: the text tower
            hc = {**hc["text_config"], "architectures": archs}
        return _gemma3_config(hc, dtype)
    if archs and not any(a in _LLAMA_LIKE_ARCHS for a in archs):
        raise ValueError(
            f"unsupported HF architecture {archs}: this loader covers the "
            f"Llama-shaped families {_LLAMA_LIKE_ARCHS} plus "
            f"Gemma2ForCausalLM and Gemma3ForCausalLM"
        )
    head_dim = hc.get(
        "head_dim", hc["hidden_size"] // hc["num_attention_heads"]
    )
    # Llama exposes attention_bias explicitly; Qwen2's qkv biases are
    # architectural (no config field), so key on the architecture name
    attention_bias = bool(hc.get("attention_bias", False)) or any(
        a == "Qwen2ForCausalLM" for a in archs
    )
    # Qwen3's per-head q/k RMSNorm is likewise architectural
    qk_norm = any(a == "Qwen3ForCausalLM" for a in archs)
    rope_scaling = _rope_scaling_from_hf(hc)
    # Qwen records sliding_window but only APPLIES it when
    # use_sliding_window is set — and then only to layers AT OR ABOVE
    # max_window_layers (the first max_window_layers layers keep full
    # attention), a per-layer mix this flat config can't express
    sliding = hc.get("sliding_window")
    if "use_sliding_window" in hc:
        L = hc["num_hidden_layers"]
        if not hc["use_sliding_window"]:
            sliding = None  # no layer is sliding
        else:
            # transformers defaults max_window_layers to 28 when absent — a
            # >28-layer checkpoint relying on that default would silently
            # get full attention on layers trained sliding, so the absent
            # key is a loud error (real configs always carry it)
            if "max_window_layers" not in hc:
                raise ValueError(
                    "use_sliding_window=true without max_window_layers: "
                    "refusing to guess which layers slide — add the key "
                    "(transformers' implicit default is 28)"
                )
            mwl = hc["max_window_layers"]
            if mwl >= L:
                sliding = None  # no layer is sliding
            elif mwl > 0:
                raise ValueError(
                    "checkpoint mixes sliding and full layers via "
                    "max_window_layers — express it as the hybrid family "
                    "(per-layer layer_windows) instead of LlamaConfig"
                )
            # mwl == 0: every layer slides -> keep the uniform window
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
        sliding_window=sliding,
        attention_bias=attention_bias,
        qk_norm=qk_norm,
        rope_scaling=rope_scaling,
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
    if getattr(cfg, "post_norms", False):
        # Gemma2-class sandwich-norm layout: mlp_norm is
        # pre_feedforward_layernorm (NOT post_attention_layernorm, which
        # here really is a post-attention norm on the residual branch)
        layers = {
            "attn_norm": cast(_stack(t, pre + "input_layernorm.weight", L, False)),
            "wq": cast(_stack(t, pre + "self_attn.q_proj.weight", L, True)),
            "wk": cast(_stack(t, pre + "self_attn.k_proj.weight", L, True)),
            "wv": cast(_stack(t, pre + "self_attn.v_proj.weight", L, True)),
            "wo": cast(_stack(t, pre + "self_attn.o_proj.weight", L, True)),
            "post_attn_norm": cast(
                _stack(t, pre + "post_attention_layernorm.weight", L, False)
            ),
            "mlp_norm": cast(
                _stack(t, pre + "pre_feedforward_layernorm.weight", L, False)
            ),
            "post_ffw_norm": cast(
                _stack(t, pre + "post_feedforward_layernorm.weight", L, False)
            ),
            "w_gate": cast(_stack(t, pre + "mlp.gate_proj.weight", L, True)),
            "w_up": cast(_stack(t, pre + "mlp.up_proj.weight", L, True)),
            "w_down": cast(_stack(t, pre + "mlp.down_proj.weight", L, True)),
        }
        has_qk = pre.format(0) + "self_attn.q_norm.weight" in t
        if has_qk != bool(getattr(cfg, "qk_norm", False)):
            raise ValueError(
                f"config qk_norm={getattr(cfg, 'qk_norm', False)} but "
                f"checkpoint {'has' if has_qk else 'lacks'} q_norm tensors"
            )
        if has_qk:  # Gemma3-class per-head q/k RMSNorm
            # Gemma stores zero-centered norm weights (effective = 1 + w);
            # qkv_heads applies plain rms_norm, so bake the offset in here
            # — stored params are the EFFECTIVE weights (exact, and the
            # spec tree stays identical to the Qwen3 shape)
            layers["q_norm"] = cast(
                1.0 + _stack(t, pre + "self_attn.q_norm.weight", L, False))
            layers["k_norm"] = cast(
                1.0 + _stack(t, pre + "self_attn.k_norm.weight", L, False))
        params = {
            "embed": cast(t["model.embed_tokens.weight"]),
            "layers": layers,
            "final_norm": cast(t["model.norm.weight"]),
        }
        if "lm_head.weight" in t:
            params["lm_head"] = cast(np.asarray(t["lm_head.weight"]).T)
        else:
            params["lm_head"] = params["embed"].T  # tied (the Gemma norm)
        logger.info(
            "loaded HF Gemma-class checkpoint %s: %d layers, %d tensors",
            ckpt_dir, L, len(t),
        )
        return cfg, params
    layers = {
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
    }
    if pre.format(0) + "self_attn.q_norm.weight" in t:
        # Qwen3-class per-head q/k RMSNorm ([head_dim] vectors)
        layers["q_norm"] = cast(_stack(t, pre + "self_attn.q_norm.weight", L, False))
        layers["k_norm"] = cast(_stack(t, pre + "self_attn.k_norm.weight", L, False))
        if not cfg.qk_norm:
            import dataclasses

            cfg = dataclasses.replace(cfg, qk_norm=True)
    elif cfg.qk_norm:
        raise ValueError(
            "config says qk_norm=True but the checkpoint has no "
            "q_norm/k_norm tensors"
        )
    if pre.format(0) + "self_attn.q_proj.bias" in t:
        # Qwen2-class additive qkv biases (1-D: no transpose)
        layers["bq"] = cast(_stack(t, pre + "self_attn.q_proj.bias", L, False))
        layers["bk"] = cast(_stack(t, pre + "self_attn.k_proj.bias", L, False))
        layers["bv"] = cast(_stack(t, pre + "self_attn.v_proj.bias", L, False))
        if not cfg.attention_bias:
            import dataclasses

            cfg = dataclasses.replace(cfg, attention_bias=True)
    elif cfg.attention_bias:
        raise ValueError(
            "config says attention_bias=True but the checkpoint has no "
            "q_proj.bias tensors"
        )
    params = {
        "embed": cast(t["model.embed_tokens.weight"]),
        "layers": layers,
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
