"""GGUF import: binary parsing, block decoders vs straight-line references,
and an end-to-end tiny-llama load (synthetic files — no network)."""
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu.utils import gguf as G


# ---------------------------------------------------------------------------
# minimal GGUF v3 writer (test-only)
# ---------------------------------------------------------------------------

def _wstr(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _kv(key: str, vt: int, payload: bytes) -> bytes:
    return _wstr(key) + struct.pack("<I", vt) + payload


def _kv_u32(key, v):
    return _kv(key, 4, struct.pack("<I", v))


def _kv_f32(key, v):
    return _kv(key, 6, struct.pack("<f", v))


def _kv_str(key, v):
    return _kv(key, 8, _wstr(v))


def write_gguf(path, kvs: bytes, n_kv: int, tensors):
    """tensors: list of (name, np_shape_outer_first, ggml_type, raw_bytes)."""
    ALIGN = 32
    infos, blobs, off = b"", [], 0
    for name, shape, ttype, raw in tensors:
        off = (off + ALIGN - 1) // ALIGN * ALIGN
        ne = tuple(reversed(shape))  # innermost-first
        infos += (
            _wstr(name) + struct.pack("<I", len(ne))
            + struct.pack(f"<{len(ne)}Q", *ne)
            + struct.pack("<I", ttype) + struct.pack("<Q", off)
        )
        blobs.append((off, raw))
        off += len(raw)
    head = (
        G.GGUF_MAGIC + struct.pack("<I", 3)
        + struct.pack("<QQ", len(tensors), n_kv) + kvs + infos
    )
    data_start = (len(head) + ALIGN - 1) // ALIGN * ALIGN
    out = bytearray(head)
    out += b"\x00" * (data_start - len(head))
    for off, raw in blobs:
        end = data_start + off
        out += b"\x00" * (end - len(out))
        out += raw
    with open(path, "wb") as f:
        f.write(bytes(out))


def _enc_q4_0(codes: np.ndarray, d: np.ndarray) -> bytes:
    """codes [nb, 32] uint8 0..15, d [nb] f32 -> Q4_0 block bytes."""
    nb = codes.shape[0]
    qs = (codes[:, :16] | (codes[:, 16:] << 4)).astype(np.uint8)
    db = d.astype("<f2").view(np.uint8).reshape(nb, 2)
    return np.concatenate([db, qs], axis=1).tobytes()


def _enc_q4_k(d, dmin, sbytes, qs) -> bytes:
    """d/dmin [nsb] f32, sbytes [nsb, 12] uint8, qs [nsb, 128] uint8."""
    nsb = d.shape[0]
    db = d.astype("<f2").view(np.uint8).reshape(nsb, 2)
    mb = dmin.astype("<f2").view(np.uint8).reshape(nsb, 2)
    return np.concatenate([db, mb, sbytes, qs], axis=1).tobytes()


def _f32_bytes(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(a, "<f4").tobytes()


# ---------------------------------------------------------------------------
# block decoders vs per-element references
# ---------------------------------------------------------------------------

def test_q4_0_exact(rng, tmp_path):
    out_, k = 8, 64
    nb = out_ * k // 32
    codes = rng.integers(0, 16, (nb, 32), dtype=np.uint8)
    d = (rng.random(nb, dtype=np.float32) * 0.1 + 0.01)
    d = d.astype("<f2").astype(np.float32)  # f16-representable
    raw = _enc_q4_0(codes, d)
    path = str(tmp_path / "t.gguf")
    write_gguf(path, b"", 0, [("w", (out_, k), G.Q4_0, raw)])
    meta, tensors, ds, mm = G.read_gguf(path)
    info = tensors["w"]
    assert info.shape == (out_, k) and info.ggml_type == G.Q4_0

    c2, s2, zs2 = G.load_tensor_q4(info, mm, ds)
    np.testing.assert_array_equal(c2, codes.reshape(out_, k))
    np.testing.assert_array_equal(s2, d.reshape(out_, k // 32))
    np.testing.assert_array_equal(zs2, 8.0 * d.reshape(out_, k // 32))

    # float view matches the ggml formula (q - 8) * d elementwise
    f = G.load_tensor_float(info, mm, ds)
    ref = ((codes.astype(np.float32) - 8.0) * d[:, None]).reshape(out_, k)
    np.testing.assert_allclose(f, ref, rtol=1e-6)


def test_q4_k_exact_vs_reference(rng, tmp_path):
    """Vectorized Q4_K decode vs a straight-line per-element port of
    ggml's dequantize_row_q4_K (independent implementation)."""
    out_, k = 4, 512
    nsb = out_ * k // 256
    d = (rng.random(nsb, dtype=np.float32) * 0.05 + 0.01).astype(
        "<f2"
    ).astype(np.float32)
    dmin = (rng.random(nsb, dtype=np.float32) * 0.02).astype("<f2").astype(
        np.float32
    )
    sbytes = rng.integers(0, 256, (nsb, 12), dtype=np.uint8)
    qs = rng.integers(0, 256, (nsb, 128), dtype=np.uint8)
    path = str(tmp_path / "t.gguf")
    write_gguf(path, b"", 0,
               [("w", (out_, k), G.Q4_K, _enc_q4_k(d, dmin, sbytes, qs))])
    _, tensors, ds, mm = G.read_gguf(path)
    f = G.load_tensor_float(tensors["w"], mm, ds)

    # per-element reference (ggml get_scale_min_k4 + dequantize loop)
    ref = np.zeros((nsb, 256), np.float32)
    for i in range(nsb):
        sc, mn = np.zeros(8), np.zeros(8)
        s_ = sbytes[i].astype(int)
        for j in range(8):
            if j < 4:
                sc[j] = s_[j] & 63
                mn[j] = s_[j + 4] & 63
            else:
                sc[j] = (s_[j + 4] & 0xF) | ((s_[j - 4] >> 6) << 4)
                mn[j] = (s_[j + 4] >> 4) | ((s_[j] >> 6) << 4)
        for e in range(256):
            chunk, pos = e // 64, e % 64
            byte = qs[i, 32 * chunk + (pos % 32)]
            q = (byte & 0xF) if pos < 32 else (byte >> 4)
            g = e // 32
            ref[i, e] = d[i] * sc[g] * q - dmin[i] * mn[g]
    np.testing.assert_allclose(f, ref.reshape(out_, k), rtol=1e-5, atol=1e-7)

    # the exact-int4 view reproduces the same values via q*s - zs
    c2, s2, zs2 = G.load_tensor_q4(tensors["w"], mm, ds)
    via = (
        c2.reshape(out_, k // 32, 32).astype(np.float32)
        * s2[:, :, None] - zs2[:, :, None]
    ).reshape(out_, k)
    np.testing.assert_allclose(via, ref.reshape(out_, k), rtol=1e-5,
                               atol=1e-7)


def test_q6_k_vs_reference(rng, tmp_path):
    out_, k = 2, 256
    nsb = out_ * k // 256
    ql = rng.integers(0, 256, (nsb, 128), dtype=np.uint8)
    qh = rng.integers(0, 256, (nsb, 64), dtype=np.uint8)
    scales = rng.integers(-30, 30, (nsb, 16)).astype(np.int8)
    d = (rng.random(nsb, dtype=np.float32) * 0.05 + 0.01).astype(
        "<f2"
    ).astype(np.float32)
    raw = np.concatenate([
        ql, qh, scales.view(np.uint8),
        d.astype("<f2").view(np.uint8).reshape(nsb, 2),
    ], axis=1).tobytes()
    path = str(tmp_path / "t.gguf")
    write_gguf(path, b"", 0, [("w", (out_, k), G.Q6_K, raw)])
    _, tensors, ds, mm = G.read_gguf(path)
    f = G.load_tensor_float(tensors["w"], mm, ds)

    ref = np.zeros((nsb, 256), np.float32)
    for i in range(nsb):
        for n in range(2):
            for el in range(32):
                qln = ql[i, 64 * n :]
                qhn = qh[i, 32 * n :]
                scn = scales[i, 8 * n :]
                is_ = el // 16
                q1 = (qln[el] & 0xF) | (((qhn[el] >> 0) & 3) << 4)
                q2 = (qln[el + 32] & 0xF) | (((qhn[el] >> 2) & 3) << 4)
                q3 = (qln[el] >> 4) | (((qhn[el] >> 4) & 3) << 4)
                q4 = (qln[el + 32] >> 4) | (((qhn[el] >> 6) & 3) << 4)
                base = 128 * n
                ref[i, base + el] = d[i] * scn[is_] * (int(q1) - 32)
                ref[i, base + el + 32] = d[i] * scn[is_ + 2] * (int(q2) - 32)
                ref[i, base + el + 64] = d[i] * scn[is_ + 4] * (int(q3) - 32)
                ref[i, base + el + 96] = d[i] * scn[is_ + 6] * (int(q4) - 32)
    np.testing.assert_allclose(f, ref.reshape(out_, k), rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# end-to-end model load
# ---------------------------------------------------------------------------

def _llamacpp_permute(w, n_head):
    """convert_hf_to_gguf.py's q/k row permutation (HF rotate-half ->
    ggml interleaved): ggml_row[2j+i] = hf_row[i*hd/2 + j] per head."""
    out = w.shape[0]
    return (w.reshape(n_head, 2, out // n_head // 2, *w.shape[1:])
             .swapaxes(1, 2).reshape(w.shape))


def test_unpermute_inverts_llamacpp_permute(rng):
    from quick_tpu.utils.gguf import _unpermute_rows

    w = rng.standard_normal((8 * 16, 32)).astype(np.float32)
    for heads in (1, 2, 4, 8):
        np.testing.assert_array_equal(
            _unpermute_rows(_llamacpp_permute(w, heads), heads), w
        )


def _tiny_gguf(path, rng, vocab=256, D=64, L=2, hq=4, hkv=2, ffn=128):
    hd = D // hq
    kvs, n_kv = b"", 0

    def add(b):
        nonlocal kvs, n_kv
        kvs += b
        n_kv += 1

    add(_kv_str("general.architecture", "llama"))
    add(_kv_u32("llama.embedding_length", D))
    add(_kv_u32("llama.block_count", L))
    add(_kv_u32("llama.feed_forward_length", ffn))
    add(_kv_u32("llama.attention.head_count", hq))
    add(_kv_u32("llama.attention.head_count_kv", hkv))
    add(_kv_u32("llama.context_length", 128))
    add(_kv_f32("llama.attention.layer_norm_rms_epsilon", 1e-5))
    add(_kv_f32("llama.rope.freq_base", 10000.0))

    tensors = []
    expect = {}

    def q4_lin(name, out_, in_, permute_heads=0):
        nb = out_ * in_ // 32
        codes = rng.integers(0, 16, (nb, 32), dtype=np.uint8)
        d = (rng.random(nb, dtype=np.float32) * 0.02 + 0.005).astype(
            "<f2"
        ).astype(np.float32)
        hf_codes = codes.reshape(out_, in_)
        hf_d = d.reshape(out_, in_ // 32)
        if permute_heads:
            # store ggml-permuted rows (like convert_hf_to_gguf.py);
            # expect[] keeps the HF layout the loader must recover
            codes = _llamacpp_permute(hf_codes, permute_heads).reshape(
                nb, 32
            )
            d = _llamacpp_permute(hf_d, permute_heads).reshape(nb)
        tensors.append((name, (out_, in_), G.Q4_0, _enc_q4_0(codes, d)))
        expect[name] = (hf_codes.astype(np.float32) - 8.0) * np.repeat(
            hf_d, 32, axis=1
        )

    def f32_t(name, shape):
        a = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        tensors.append((name, shape, G.F32, _f32_bytes(a)))
        expect[name] = a

    f32_t("token_embd.weight", (vocab, D))
    f32_t("output_norm.weight", (D,))
    f32_t("output.weight", (vocab, D))
    for i in range(L):
        f32_t(f"blk.{i}.attn_norm.weight", (D,))
        f32_t(f"blk.{i}.ffn_norm.weight", (D,))
        q4_lin(f"blk.{i}.attn_q.weight", hq * hd, D, permute_heads=hq)
        q4_lin(f"blk.{i}.attn_k.weight", hkv * hd, D, permute_heads=hkv)
        q4_lin(f"blk.{i}.attn_v.weight", hkv * hd, D)
        q4_lin(f"blk.{i}.attn_output.weight", D, hq * hd)
        q4_lin(f"blk.{i}.ffn_gate.weight", ffn, D)
        q4_lin(f"blk.{i}.ffn_up.weight", ffn, D)
        q4_lin(f"blk.{i}.ffn_down.weight", D, ffn)
    write_gguf(path, kvs, n_kv, tensors)
    return expect


def test_load_gguf_tiny_llama(rng, tmp_path):
    from quick_tpu.models.model import model_forward
    from quick_tpu.ops.quantized_matmul import unpack_qtpu_jax

    path = str(tmp_path / "tiny.gguf")
    expect = _tiny_gguf(path, rng)
    params, cfg, qcfg = G.load_gguf(path)
    assert cfg.model_type == "llama"
    assert cfg.hidden_size == 64 and cfg.num_hidden_layers == 2
    assert cfg.num_key_value_heads == 2
    assert qcfg.q_group_size == 32

    # the fused-qkv dequant must reproduce the GGUF weights EXACTLY
    qkv = params.blocks[0].attn.qkv_proj
    assert qkv.group_size == 32
    codes = np.asarray(unpack_qtpu_jax(qkv.qweight, 32), np.float32)
    s = np.repeat(np.asarray(qkv.scales), 32, axis=0)
    zs = np.repeat(np.asarray(qkv.zeros_x_scales), 32, axis=0)
    deq = codes * s - zs  # [K, N]
    ref = np.concatenate(
        [expect["blk.0.attn_q.weight"], expect["blk.0.attn_k.weight"],
         expect["blk.0.attn_v.weight"]], axis=0
    ).T  # [in, out]
    np.testing.assert_allclose(deq, ref, rtol=1e-6, atol=1e-7)

    # float tensors load as bf16 (HF-importer convention)
    np.testing.assert_allclose(
        np.asarray(params.embed, np.float32),
        expect["token_embd.weight"], rtol=0.01, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(params.lm_head.weight, np.float32),
        expect["output.weight"].T, rtol=0.01, atol=1e-3,
    )

    toks = jnp.asarray(rng.integers(0, 256, (2, 10)), jnp.int32)
    logits, _ = model_forward(params, cfg, toks)
    assert logits.shape == (2, 10, 256)
    assert bool(jnp.isfinite(logits).all())


def test_load_gguf_tied_head_and_mixed_types(rng, tmp_path):
    """No output.weight (tied embeddings) + a Q6_K ffn_down (the Q4_K_M
    mix) must load: Q6_K requantizes to int4 g=32."""
    path = str(tmp_path / "tiny2.gguf")
    vocab, D, L, hq, hkv, ffn = 128, 64, 1, 4, 4, 256
    kvs, n_kv = b"", 0

    def add(b):
        nonlocal kvs, n_kv
        kvs += b
        n_kv += 1

    add(_kv_str("general.architecture", "llama"))
    add(_kv_u32("llama.embedding_length", D))
    add(_kv_u32("llama.block_count", L))
    add(_kv_u32("llama.feed_forward_length", ffn))
    add(_kv_u32("llama.attention.head_count", hq))
    add(_kv_u32("llama.context_length", 64))

    tensors = []

    def f32_t(name, shape):
        a = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        tensors.append((name, shape, G.F32, _f32_bytes(a)))

    def q4_lin(name, out_, in_):
        nb = out_ * in_ // 32
        codes = rng.integers(0, 16, (nb, 32), dtype=np.uint8)
        d = np.full(nb, 0.01, np.float32)
        tensors.append((name, (out_, in_), G.Q4_0, _enc_q4_0(codes, d)))

    f32_t("token_embd.weight", (vocab, D))
    f32_t("output_norm.weight", (D,))
    f32_t("blk.0.attn_norm.weight", (D,))
    f32_t("blk.0.ffn_norm.weight", (D,))
    q4_lin("blk.0.attn_q.weight", D, D)
    q4_lin("blk.0.attn_k.weight", D, D)
    q4_lin("blk.0.attn_v.weight", D, D)
    q4_lin("blk.0.attn_output.weight", D, D)
    q4_lin("blk.0.ffn_gate.weight", ffn, D)
    q4_lin("blk.0.ffn_up.weight", ffn, D)
    # Q6_K down projection (256-elem superblocks: ffn=256 rows of D=64…
    # ne0 is the INPUT dim = ffn for down, so blocks run along ffn=256)
    nsb = D * ffn // 256
    ql = rng.integers(0, 256, (nsb, 128), dtype=np.uint8)
    qh = rng.integers(0, 256, (nsb, 64), dtype=np.uint8)
    sc = rng.integers(-20, 20, (nsb, 16)).astype(np.int8)
    d6 = np.full(nsb, 0.004, np.float32)
    raw = np.concatenate([
        ql, qh, sc.view(np.uint8),
        d6.astype("<f2").view(np.uint8).reshape(nsb, 2),
    ], axis=1).tobytes()
    tensors.append(("blk.0.ffn_down.weight", (D, ffn), G.Q6_K, raw))
    write_gguf(path, kvs, n_kv, tensors)

    params, cfg, _ = G.load_gguf(path)
    # tied head: lm_head is embed.T
    np.testing.assert_allclose(
        np.asarray(params.lm_head.weight), np.asarray(params.embed).T,
        rtol=1e-6,
    )
    from quick_tpu.models.model import model_forward

    toks = jnp.asarray(rng.integers(0, vocab, (1, 6)), jnp.int32)
    logits, _ = model_forward(params, cfg, toks)
    assert bool(jnp.isfinite(logits).all())


def test_rope_scaling_metadata_and_freq_factors(rng, tmp_path):
    """llama.rope.scaling.* metadata lands in cfg.rope_scaling; a
    rope_freqs.weight tensor (Llama-3.1 style) rebuilds the cos/sin
    tables with per-dim frequency factors."""
    path = str(tmp_path / "tiny.gguf")
    _tiny_gguf(path, rng)
    params_base, cfg_base, _ = G.load_gguf(path)
    assert cfg_base.rope_scaling is None

    # same file + linear scaling metadata + freq factors tensor
    path2 = str(tmp_path / "tiny2.gguf")
    expect = _tiny_gguf(path2, rng)  # regenerate (different weights, fine)
    # append metadata + tensor by rebuilding with extras
    import struct as _st
    vocab, D, L, hq, hkv, ffn = 256, 64, 2, 4, 2, 128
    hd = D // hq
    # easier: rebuild the file through the writer with extra kvs/tensor
    kvs, n_kv = b"", 0

    def add(b):
        nonlocal kvs, n_kv
        kvs += b
        n_kv += 1

    add(_kv_str("general.architecture", "llama"))
    add(_kv_u32("llama.embedding_length", D))
    add(_kv_u32("llama.block_count", 1))
    add(_kv_u32("llama.feed_forward_length", ffn))
    add(_kv_u32("llama.attention.head_count", hq))
    add(_kv_u32("llama.attention.head_count_kv", hkv))
    add(_kv_u32("llama.context_length", 64))
    add(_kv_str("llama.rope.scaling.type", "linear"))
    add(_kv_f32("llama.rope.scaling.factor", 2.0))

    ff = (rng.random(hd // 2, dtype=np.float32) * 3 + 1).astype(np.float32)
    tensors = []

    def f32_t(name, shape, a=None):
        a = (rng.standard_normal(shape) * 0.05).astype(np.float32) \
            if a is None else a
        tensors.append((name, shape, G.F32, _f32_bytes(a)))

    def q4(name, out_, in_):
        nb = out_ * in_ // 32
        codes = rng.integers(0, 16, (nb, 32), dtype=np.uint8)
        d = np.full(nb, 0.01, np.float32)
        tensors.append((name, (out_, in_), G.Q4_0, _enc_q4_0(codes, d)))

    f32_t("token_embd.weight", (vocab, D))
    f32_t("output_norm.weight", (D,))
    f32_t("rope_freqs.weight", (hd // 2,), ff)
    f32_t("blk.0.attn_norm.weight", (D,))
    f32_t("blk.0.ffn_norm.weight", (D,))
    q4("blk.0.attn_q.weight", D, D)
    q4("blk.0.attn_k.weight", hkv * hd, D)
    q4("blk.0.attn_v.weight", hkv * hd, D)
    q4("blk.0.attn_output.weight", D, D)
    q4("blk.0.ffn_gate.weight", ffn, D)
    q4("blk.0.ffn_up.weight", ffn, D)
    q4("blk.0.ffn_down.weight", D, ffn)
    path3 = str(tmp_path / "tiny3.gguf")
    write_gguf(path3, kvs, n_kv, tensors)
    params, cfg, _ = G.load_gguf(path3)
    d = dict(cfg.rope_scaling)
    assert d["rope_type"] == "linear" and d["factor"] == 2.0
    # freq-factor tables: cos at position 1, dim j is cos(inv_freq/ff)
    half = np.arange(0, hd, 2, dtype=np.float64) / hd
    inv = (1.0 / cfg.rope_theta ** half) / ff.astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(params.rope_cos[1]), np.cos(inv), rtol=1e-5
    )
