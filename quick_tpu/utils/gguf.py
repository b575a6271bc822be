"""GGUF (llama.cpp) checkpoint import.

No reference analog (SqueezeBits/QUICK loads HF/AutoAWQ checkpoints only)
— but GGUF is where most quantized llama-family checkpoints live, and the
llama.cpp 4-bit formats map EXACTLY onto this framework's kernel contract:
the fused kernel consumes ``scales`` and ``zeros_x_scales`` (z*s) directly
(ops/quantized_matmul.py), i.e. it computes ``q*s - zs`` per group, which is
precisely the GGUF dequant form:

- Q4_0:  v = (q - 8)*d        -> s = d,       zs = 8*d
- Q4_1:  v = q*d + m          -> s = d,       zs = -m
- Q4_K:  v = q*(d*sc) - dmin*m -> s = d*sc,   zs = dmin*m    (g = 32)

so Q4_0/Q4_1/Q4_K tensors import BIT-EXACTLY (group_size 32, no requant
round-trip). Other quant types (Q8_0, Q6_K — llama.cpp mixes them into
"Q4_K_M" files for attn_v/ffn_down/output) are dequantized and, for linear
weights, re-quantized to int4 g=32 so every projection rides the fused
W4A16 kernel. Embeddings/norms load as float; lm_head loads float for
accuracy (models/model.py keeps the head unquantized, SURVEY 3.3).

Format spec: github.com/ggml-org/ggml/blob/master/docs/gguf.md (v2/v3).
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Dict, Optional, Tuple

import numpy as np

GGUF_MAGIC = b"GGUF"

# ggml tensor type ids
F32, F16, Q4_0, Q4_1, Q5_0, Q5_1, Q8_0 = 0, 1, 2, 3, 6, 7, 8
Q2_K, Q3_K, Q4_K, Q5_K, Q6_K = 10, 11, 12, 13, 14
BF16 = 30

#: type -> (block_elems, block_bytes); float types use (1, itemsize)
BLOCK = {
    F32: (1, 4), F16: (1, 2), BF16: (1, 2),
    Q4_0: (32, 18), Q4_1: (32, 20), Q8_0: (32, 34),
    Q4_K: (256, 144), Q6_K: (256, 210),
}

_VT_SCALAR = {
    0: ("<u1", 1), 1: ("<i1", 1), 2: ("<u2", 2), 3: ("<i2", 2),
    4: ("<u4", 4), 5: ("<i4", 4), 6: ("<f4", 4), 7: ("<u1", 1),
    10: ("<u8", 8), 11: ("<i8", 8), 12: ("<f8", 8),
}


@dataclasses.dataclass
class TensorInfo:
    name: str
    shape: Tuple[int, ...]  # numpy order (outer-first; ne reversed)
    ggml_type: int
    offset: int             # relative to the data section


def _read_str(buf: memoryview, off: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<Q", buf, off)
    off += 8
    s = bytes(buf[off : off + n]).decode("utf-8")
    return s, off + n


def _read_value(buf: memoryview, off: int, vt: int):
    if vt == 8:  # string
        return _read_str(buf, off)
    if vt == 9:  # array
        et, n = struct.unpack_from("<IQ", buf, off)
        off += 12
        if et == 8:
            vals = []
            for _ in range(n):
                v, off = _read_str(buf, off)
                vals.append(v)
            return vals, off
        dt, sz = _VT_SCALAR[et]
        arr = np.frombuffer(buf, dtype=dt, count=n, offset=off)
        if et == 7:
            arr = arr.astype(bool)
        return arr, off + n * sz
    dt, sz = _VT_SCALAR[vt]
    v = np.frombuffer(buf, dtype=dt, count=1, offset=off)[0]
    if vt == 7:
        v = bool(v)
    return v, off + sz


def read_gguf(path: str):
    """Parse a GGUF file. Returns (metadata dict, {name: TensorInfo},
    data_section_start, memory-mapped bytes)."""
    data = np.memmap(path, dtype=np.uint8, mode="r")
    buf = memoryview(data)
    if bytes(buf[:4]) != GGUF_MAGIC:
        raise ValueError(f"{path}: not a GGUF file")
    version, = struct.unpack_from("<I", buf, 4)
    if version < 2:
        raise ValueError(f"GGUF v{version} unsupported (need >= 2)")
    n_tensors, n_kv = struct.unpack_from("<QQ", buf, 8)
    off = 24
    meta: Dict[str, object] = {}
    for _ in range(n_kv):
        key, off = _read_str(buf, off)
        (vt,) = struct.unpack_from("<I", buf, off)
        off += 4
        val, off = _read_value(buf, off, vt)
        meta[key] = val
    tensors: Dict[str, TensorInfo] = {}
    for _ in range(n_tensors):
        name, off = _read_str(buf, off)
        (nd,) = struct.unpack_from("<I", buf, off)
        off += 4
        ne = struct.unpack_from(f"<{nd}Q", buf, off)
        off += 8 * nd
        ttype, = struct.unpack_from("<I", buf, off)
        toff, = struct.unpack_from("<Q", buf, off + 4)
        off += 12
        # ne is innermost-first; numpy shape is the reverse
        tensors[name] = TensorInfo(name, tuple(reversed(ne)), ttype, toff)
    align = int(meta.get("general.alignment", 32))
    data_start = (off + align - 1) // align * align
    return meta, tensors, data_start, data


# -- block decoders ------------------------------------------------------------

def _f16(raw: np.ndarray) -> np.ndarray:
    return raw.copy().view("<f2").astype(np.float32)


def _q4_0(raw: np.ndarray, nb: int):
    """[nb, 18] bytes -> (codes u8 [nb, 32], scales [nb], zs [nb])."""
    raw = raw.reshape(nb, 18)
    d = _f16(raw[:, :2]).reshape(nb)
    qs = raw[:, 2:18]
    codes = np.concatenate([qs & 0xF, qs >> 4], axis=1)
    return codes, d, 8.0 * d


def _q4_1(raw: np.ndarray, nb: int):
    raw = raw.reshape(nb, 20)
    d = _f16(raw[:, :2]).reshape(nb)
    m = _f16(raw[:, 2:4]).reshape(nb)
    qs = raw[:, 4:20]
    codes = np.concatenate([qs & 0xF, qs >> 4], axis=1)
    return codes, d, -m


def _q8_0_float(raw: np.ndarray, nb: int) -> np.ndarray:
    raw = raw.reshape(nb, 34)
    d = _f16(raw[:, :2]).reshape(nb, 1)
    q = raw[:, 2:34].copy().view(np.int8).astype(np.float32)
    return q * d


def _q4_k(raw: np.ndarray, nsb: int):
    """[nsb, 144] -> (codes u8 [nsb, 256], scales [nsb, 8], zs [nsb, 8])
    — one (scale, min) per 32-element sub-group; v = q*scale - zs."""
    raw = raw.reshape(nsb, 144)
    d = _f16(raw[:, :2]).reshape(nsb, 1)
    dmin = _f16(raw[:, 2:4]).reshape(nsb, 1)
    s_ = raw[:, 4:16]  # 12 bytes: 8x 6-bit scales + 8x 6-bit mins
    sc = np.empty((nsb, 8), np.float32)
    mn = np.empty((nsb, 8), np.float32)
    for j in range(4):
        sc[:, j] = s_[:, j] & 63
        mn[:, j] = s_[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (s_[:, j + 4] & 0xF) | ((s_[:, j - 4] >> 6) << 4)
        mn[:, j] = (s_[:, j + 4] >> 4) | ((s_[:, j] >> 6) << 4)
    qs = raw[:, 16:144]
    codes = np.empty((nsb, 256), np.uint8)
    for n in range(4):  # 32-byte chunk n covers elements 64n .. 64n+63
        ch = qs[:, 32 * n : 32 * (n + 1)]
        codes[:, 64 * n : 64 * n + 32] = ch & 0xF
        codes[:, 64 * n + 32 : 64 * n + 64] = ch >> 4
    return codes, d * sc, dmin * mn


def _q6_k_float(raw: np.ndarray, nsb: int) -> np.ndarray:
    """[nsb, 210] -> float [nsb, 256] (dequant only; re-quantized to int4
    by the loader when it lands in a linear)."""
    raw = raw.reshape(nsb, 210)
    ql = raw[:, :128]
    qh = raw[:, 128:192]
    sc = raw[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = _f16(raw[:, 208:210]).reshape(nsb, 1)
    y = np.empty((nsb, 256), np.float32)
    rep16 = lambda a, b: np.repeat(sc[:, [a, b]], 16, axis=1)  # [nsb, 32]
    for n in range(2):
        qln = ql[:, 64 * n : 64 * (n + 1)]
        qhn = qh[:, 32 * n : 32 * (n + 1)]
        s0 = 8 * n
        q1 = (qln[:, :32] & 0xF) | ((qhn & 3) << 4)
        q2 = (qln[:, 32:] & 0xF) | (((qhn >> 2) & 3) << 4)
        q3 = (qln[:, :32] >> 4) | (((qhn >> 4) & 3) << 4)
        q4 = (qln[:, 32:] >> 4) | (((qhn >> 6) & 3) << 4)
        base = 128 * n
        y[:, base : base + 32] = rep16(s0, s0 + 1) * (
            q1.astype(np.float32) - 32
        )
        y[:, base + 32 : base + 64] = rep16(s0 + 2, s0 + 3) * (
            q2.astype(np.float32) - 32
        )
        y[:, base + 64 : base + 96] = rep16(s0 + 4, s0 + 5) * (
            q3.astype(np.float32) - 32
        )
        y[:, base + 96 : base + 128] = rep16(s0 + 6, s0 + 7) * (
            q4.astype(np.float32) - 32
        )
    return y * d


def _tensor_bytes(info: TensorInfo) -> int:
    n = int(np.prod(info.shape))
    if info.ggml_type not in BLOCK:
        raise NotImplementedError(
            f"{info.name}: ggml type {info.ggml_type} not supported "
            f"(supported: F32/F16/BF16/Q4_0/Q4_1/Q8_0/Q4_K/Q6_K — Q5_K/"
            f"Q5_0/Q5_1/Q3_K/Q2_K files need a different llama.cpp "
            f"quantization, e.g. Q4_K_M)"
        )
    be, bb = BLOCK[info.ggml_type]
    assert n % be == 0, (info.name, info.shape, info.ggml_type)
    return n // be * bb


def load_tensor_float(info: TensorInfo, mm, data_start: int) -> np.ndarray:
    """Any supported tensor -> float32 numpy array of info.shape."""
    raw = np.asarray(
        mm[data_start + info.offset : data_start + info.offset
           + _tensor_bytes(info)]
    )
    n = int(np.prod(info.shape))
    t = info.ggml_type
    if t == F32:
        return raw.copy().view("<f4").reshape(info.shape)
    if t == F16:
        return _f16(raw).reshape(info.shape)
    if t == BF16:
        u16 = raw.copy().view("<u2").astype(np.uint32) << 16
        return u16.view(np.float32).reshape(info.shape)
    if t == Q4_0:
        c, s, zs = _q4_0(raw, n // 32)
        return (c.astype(np.float32) * s[:, None] - zs[:, None]).reshape(
            info.shape
        )
    if t == Q4_1:
        c, s, zs = _q4_1(raw, n // 32)
        return (c.astype(np.float32) * s[:, None] - zs[:, None]).reshape(
            info.shape
        )
    if t == Q8_0:
        return _q8_0_float(raw, n // 32).reshape(info.shape)
    if t == Q4_K:
        c, s, zs = _q4_k(raw, n // 256)
        cg = c.reshape(-1, 8, 32).astype(np.float32)
        return (cg * s[:, :, None] - zs[:, :, None]).reshape(info.shape)
    if t == Q6_K:
        return _q6_k_float(raw, n // 256).reshape(info.shape)
    raise NotImplementedError(
        f"{info.name}: ggml type {t} not supported "
        f"(supported: F32/F16/BF16/Q4_0/Q4_1/Q8_0/Q4_K/Q6_K)"
    )


def load_tensor_q4(
    info: TensorInfo, mm, data_start: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Exact int4 view of a 2D Q4_0/Q4_1/Q4_K tensor: returns
    (codes u8 [out, in], scales f32 [out, in//32], zs f32 [out, in//32])
    with v = codes*scales - zs, or None if the type has no exact int4
    form (caller falls back to dequant + requant)."""
    t = info.ggml_type
    if t not in (Q4_0, Q4_1, Q4_K) or len(info.shape) != 2:
        return None
    raw = np.asarray(
        mm[data_start + info.offset : data_start + info.offset
           + _tensor_bytes(info)]
    )
    out, k = info.shape
    n = out * k
    if t == Q4_K:
        c, s, zs = _q4_k(raw, n // 256)
        codes = c.reshape(out, k)
        scales = s.reshape(out, k // 32)
        zss = zs.reshape(out, k // 32)
        return codes, scales, zss
    dec = _q4_0 if t == Q4_0 else _q4_1
    c, s, zs = dec(raw, n // 32)  # s/zs: one per 32-block, [out*k/32]
    return c.reshape(out, k), s.reshape(out, k // 32), zs.reshape(out, k // 32)


def _unpermute_rows(arr: np.ndarray, n_head: int) -> np.ndarray:
    """Invert llama.cpp's per-head q/k row permutation.

    convert_hf_to_gguf.py permutes q_proj/k_proj OUT rows per head from
    the HF rotate-half layout to ggml's interleaved-RoPE layout:
    ggml_row[2j + i] = hf_row[i*hd/2 + j]. ops/rope.py implements the HF
    rotate-half convention, so the rows must be permuted BACK on import
    (quantized tensors permute exactly — blocks run along the IN dim)."""
    out = arr.shape[0]
    hd = out // n_head
    idx = np.empty(hd, np.int64)
    idx[: hd // 2] = 2 * np.arange(hd // 2)       # i = 0 rows
    idx[hd // 2 :] = 2 * np.arange(hd // 2) + 1   # i = 1 rows
    full = (np.arange(n_head)[:, None] * hd + idx[None, :]).reshape(-1)
    return arr[full]


# -- model-level loader ---------------------------------------------------------

def load_gguf(path: str, lm_head_float: bool = True):
    """Load a llama-architecture GGUF file into (ModelParams, ModelConfig,
    QuantConfig). Q4_0/Q4_1/Q4_K linears import bit-exactly at group_size
    32; other quant types are dequantized and re-quantized to int4 g=32 so
    every projection rides the fused kernel."""
    import jax.numpy as jnp

    from quick_tpu.config import ModelConfig, QuantConfig
    from quick_tpu.quantize.numerics import quantize_tensor
    from quick_tpu.quantize.packing import pack_qtpu
    from quick_tpu.utils.checkpoint import flat_to_params

    meta, tensors, data_start, mm = read_gguf(path)
    arch = str(meta.get("general.architecture", "llama"))
    if arch not in ("llama", "mistral"):
        raise NotImplementedError(
            f"GGUF architecture '{arch}' (llama/mistral supported)"
        )
    a = arch
    G = 32  # the llama.cpp 4-bit sub-group size

    def _rope_scaling_meta(meta, a):
        st = str(meta.get(f"{a}.rope.scaling.type", "") or "")
        if not st or st == "none":
            return None
        d = {"rope_type": st,
             "factor": float(meta.get(f"{a}.rope.scaling.factor", 1.0))}
        oc = meta.get(f"{a}.rope.scaling.original_context_length")
        if oc is not None:
            d["original_max_position_embeddings"] = int(oc)
        af = meta.get(f"{a}.rope.scaling.attn_factor")
        if af is not None:
            d["attention_factor"] = float(af)
        return d

    def mi(key, default=None):
        v = meta.get(f"{a}.{key}", default)
        if v is None:
            raise KeyError(f"{a}.{key} missing from GGUF metadata")
        return v

    vocab = tensors["token_embd.weight"].shape[0]
    cfg = ModelConfig(
        vocab_size=int(meta.get(f"{a}.vocab_size", vocab)),
        hidden_size=int(mi("embedding_length")),
        intermediate_size=int(mi("feed_forward_length")),
        num_hidden_layers=int(mi("block_count")),
        num_attention_heads=int(mi("attention.head_count")),
        num_key_value_heads=int(
            meta.get(f"{a}.attention.head_count_kv",
                     mi("attention.head_count"))
        ),
        max_position_embeddings=int(meta.get(f"{a}.context_length", 4096)),
        rms_norm_eps=float(
            meta.get(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
        ),
        rope_theta=float(meta.get(f"{a}.rope.freq_base", 10000.0)),
        rope_scaling=_rope_scaling_meta(meta, a),
        model_type="llama",  # llama.cpp writes mistral as arch 'llama' too
    )

    def fl(name):
        return load_tensor_float(tensors[name], mm, data_start)

    def bf16(a):
        # float tensors load as bf16 like the HF importer (checkpoint.py
        # load_hf_float) — f32 embeddings/head waste ~1GB HBM at 7B and
        # the matmuls cast to the activation dtype anyway
        return np.asarray(jnp.asarray(a, jnp.bfloat16))

    flat: Dict[str, np.ndarray] = {}

    def qlin(prefix, names, unpermute=0):
        """Concatenate GGUF linears along OUT and emit QTPU tensors.
        ``unpermute``: per-head count to invert the q/k rotary row
        permutation (exact on quantized tensors — rows carry their own
        blocks)."""
        cs, ss, zss = [], [], []
        for nm in names:
            info = tensors[nm]
            q4 = load_tensor_q4(info, mm, data_start)
            if q4 is None:
                w = load_tensor_float(info, mm, data_start)  # [out, in]
                if unpermute:
                    w = _unpermute_rows(w, unpermute)
                qt = quantize_tensor(
                    jnp.asarray(w.T), group_size=G
                )  # ours: [in, out]
                codes = np.asarray(qt.q, np.uint8)
                s = np.asarray(qt.scales, np.float32)
                zs = np.asarray(qt.zeros * qt.scales, np.float32)
            else:
                codes, s, zs = q4  # [out, K] / [out, K//G]
                if unpermute:
                    codes = _unpermute_rows(codes, unpermute)
                    s = _unpermute_rows(s, unpermute)
                    zs = _unpermute_rows(zs, unpermute)
                codes = np.ascontiguousarray(codes.T)  # [K, N]
                s = np.ascontiguousarray(s.T)          # [K//G, N]
                zs = np.ascontiguousarray(zs.T)
            cs.append(codes)
            ss.append(s)
            zss.append(zs)
        flat[f"{prefix}.qweight"] = np.asarray(
            pack_qtpu(np.concatenate(cs, axis=1), G)
        )
        flat[f"{prefix}.scales"] = np.concatenate(ss, 1).astype(np.float32)
        flat[f"{prefix}.zeros_x_scales"] = np.concatenate(zss, 1).astype(
            np.float32
        )

    flat["embed"] = bf16(fl("token_embd.weight"))
    flat["final_norm"] = bf16(fl("output_norm.weight"))
    if "output.weight" in tensors:
        head = fl("output.weight")  # [vocab, D]
    else:
        head = flat["embed"]        # tied embeddings
    if lm_head_float:
        flat["lm_head.weight"] = bf16(np.ascontiguousarray(head.T))
    else:
        qt = quantize_tensor(jnp.asarray(head.T), group_size=G)
        flat["lm_head.qweight"] = np.asarray(
            pack_qtpu(np.asarray(qt.q, np.uint8), G)
        )
        flat["lm_head.scales"] = np.asarray(qt.scales, np.float32)
        flat["lm_head.zeros_x_scales"] = np.asarray(
            qt.zeros * qt.scales, np.float32
        )
    for i in range(cfg.num_hidden_layers):
        b, p = f"blk.{i}", f"blocks.{i}"
        flat[f"{p}.attn_norm"] = bf16(fl(f"{b}.attn_norm.weight"))
        flat[f"{p}.mlp_norm"] = bf16(fl(f"{b}.ffn_norm.weight"))
        hq = cfg.num_attention_heads
        hkv = cfg.num_key_value_heads
        qlin(f"{p}.attn.q_part", [f"{b}.attn_q.weight"], unpermute=hq)
        qlin(f"{p}.attn.k_part", [f"{b}.attn_k.weight"], unpermute=hkv)
        qlin(f"{p}.attn.v_part", [f"{b}.attn_v.weight"])
        # fuse qkv by concatenating the already-packed planes on N
        for suf in ("qweight", "scales", "zeros_x_scales"):
            flat[f"{p}.attn.qkv.{suf}"] = np.concatenate(
                [flat.pop(f"{p}.attn.q_part.{suf}"),
                 flat.pop(f"{p}.attn.k_part.{suf}"),
                 flat.pop(f"{p}.attn.v_part.{suf}")], axis=1
            )
        qlin(f"{p}.attn.o", [f"{b}.attn_output.weight"])
        qlin(f"{p}.mlp.gate_up", [f"{b}.ffn_gate.weight",
                                  f"{b}.ffn_up.weight"])
        qlin(f"{p}.mlp.down", [f"{b}.ffn_down.weight"])
    params = flat_to_params(flat, cfg, group_size=G)
    if "rope_freqs.weight" in tensors:
        # Llama-3.1-style GGUFs bake the rope scaling into per-dim
        # frequency FACTORS (inv_freq /= factor) instead of metadata —
        # rebuild the cos/sin tables from them
        import dataclasses as _dc

        ff = load_tensor_float(
            tensors["rope_freqs.weight"], mm, data_start
        ).reshape(-1).astype(np.float64)
        hd = cfg.rotary_dim or cfg.head_dim
        half = np.arange(0, hd, 2, dtype=np.float64) / hd
        inv = (1.0 / cfg.rope_theta ** half) / ff
        pos = np.arange(cfg.max_position_embeddings, dtype=np.float64)
        ang = pos[:, None] * inv[None, :]
        params = _dc.replace(
            params,
            rope_cos=jnp.asarray(np.cos(ang), jnp.float32),
            rope_sin=jnp.asarray(np.sin(ang), jnp.float32),
        )
    qcfg = QuantConfig(w_bit=4, q_group_size=G, version="qtpu")
    return params, cfg, qcfg
