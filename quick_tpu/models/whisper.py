"""Whisper encoder-decoder (quantized ASR) — the WER evaluation path.

The reference's eval_librispeech drives a quantized Whisper through the HF
ASR pipeline (quick/awq/evaluation/eval_utils.py:63-113). This module is the
TPU-native equivalent: a functional JAX Whisper (conv frontend + bidirectional
encoder; causal decoder with cross-attention) whose linears are AnyLinear, so
the same W4A16 ``QuantLinear`` kernels that serve the causal-LM zoo serve ASR
too. ``transcribe_fn`` plugs straight into evaluation/wer.py::eval_librispeech.

Layout notes (TPU-first, not a torch translation):
- Linear weights are [K_in, N_out] like the rest of the framework (x @ w).
- The decoder self-attention reuses the dense ``KVCache`` and
  ``causal_attention``; cross-attention K/V are computed once per utterance
  from the encoder output and reused every decode step.
- Greedy decode is one jitted ``lax.while_loop`` with an EOS latch — no
  per-token dispatch.
- The log-mel frontend reimplements Whisper's exact features (n_fft=400,
  hop=160, 80/128 slaney-normalized mel bands, log10 + max-8 floor + /4
  scaling) in numpy — no librosa dependency.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.modules.cache import KVCache
from quick_tpu.modules.linear import Linear, QuantLinear
from quick_tpu.ops.attention import causal_attention
from quick_tpu.ops.norms import layer_norm

AnyLinear = QuantLinear | Linear

SAMPLE_RATE = 16_000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    encoder_layers: int = 4
    encoder_heads: int = 6
    decoder_layers: int = 4
    decoder_heads: int = 6
    ffn_dim: int = 1536
    n_mels: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258  # <|startoftranscript|>
    eos_token_id: int = 50257

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_heads

    @classmethod
    def from_hf_config(cls, hf: dict) -> "WhisperConfig":
        return cls(
            vocab_size=hf["vocab_size"],
            d_model=hf["d_model"],
            encoder_layers=hf["encoder_layers"],
            encoder_heads=hf["encoder_attention_heads"],
            decoder_layers=hf["decoder_layers"],
            decoder_heads=hf["decoder_attention_heads"],
            ffn_dim=hf.get("encoder_ffn_dim", 4 * hf["d_model"]),
            n_mels=hf.get("num_mel_bins", 80),
            max_source_positions=hf.get("max_source_positions", 1500),
            max_target_positions=hf.get("max_target_positions", 448),
            decoder_start_token_id=hf.get("decoder_start_token_id", 50258),
            eos_token_id=hf.get("eos_token_id", 50257),
        )


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhisperAttnParams:
    q: AnyLinear
    k: AnyLinear  # no bias in HF whisper
    v: AnyLinear
    o: AnyLinear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhisperBlockParams:
    attn_norm_w: jax.Array
    attn_norm_b: jax.Array
    attn: WhisperAttnParams
    mlp_norm_w: jax.Array
    mlp_norm_b: jax.Array
    fc1: AnyLinear
    fc2: AnyLinear
    cross_norm_w: Optional[jax.Array] = None  # decoder blocks only
    cross_norm_b: Optional[jax.Array] = None
    cross: Optional[WhisperAttnParams] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhisperParams:
    conv1_w: jax.Array  # [3, n_mels, D]
    conv1_b: jax.Array
    conv2_w: jax.Array  # [3, D, D] (stride 2)
    conv2_b: jax.Array
    enc_pos: jax.Array  # [max_source_positions, D] sinusoidal
    enc_blocks: List[WhisperBlockParams]
    enc_norm_w: jax.Array
    enc_norm_b: jax.Array
    dec_embed: jax.Array  # [V, D]; lm_head is tied (proj_out)
    dec_pos: jax.Array  # [max_target_positions, D] learned
    dec_blocks: List[WhisperBlockParams]
    dec_norm_w: jax.Array
    dec_norm_b: jax.Array


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's encoder position table (openai whisper audio.py)."""
    log_timescale = np.log(10_000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def init_whisper_params(
    cfg: WhisperConfig, key: jax.Array, dtype=jnp.float32
) -> WhisperParams:
    """Random-init float Whisper (hermetic tests / calibration source)."""
    ks = iter(jax.random.split(key, 64 + 16 * (cfg.encoder_layers + cfg.decoder_layers)))

    def lin(kin, kout, bias=True):
        w = jax.random.normal(next(ks), (kin, kout), dtype) / jnp.sqrt(kin)
        return Linear(w, jnp.zeros((kout,), dtype) if bias else None)

    def attn(cross=False):
        D = cfg.d_model
        return WhisperAttnParams(
            q=lin(D, D), k=lin(D, D, bias=False), v=lin(D, D), o=lin(D, D)
        )

    def block(decoder=False):
        D, F = cfg.d_model, cfg.ffn_dim
        ones, zeros = jnp.ones((D,), dtype), jnp.zeros((D,), dtype)
        return WhisperBlockParams(
            attn_norm_w=ones, attn_norm_b=zeros, attn=attn(),
            mlp_norm_w=ones, mlp_norm_b=zeros,
            fc1=lin(D, F), fc2=lin(F, D),
            cross_norm_w=ones if decoder else None,
            cross_norm_b=zeros if decoder else None,
            cross=attn(cross=True) if decoder else None,
        )

    D = cfg.d_model
    return WhisperParams(
        conv1_w=jax.random.normal(next(ks), (3, cfg.n_mels, D), dtype) * 0.05,
        conv1_b=jnp.zeros((D,), dtype),
        conv2_w=jax.random.normal(next(ks), (3, D, D), dtype) * 0.05,
        conv2_b=jnp.zeros((D,), dtype),
        enc_pos=jnp.asarray(_sinusoids(cfg.max_source_positions, D), dtype),
        enc_blocks=[block() for _ in range(cfg.encoder_layers)],
        enc_norm_w=jnp.ones((D,), dtype), enc_norm_b=jnp.zeros((D,), dtype),
        dec_embed=jax.random.normal(next(ks), (cfg.vocab_size, D), dtype) * 0.02,
        dec_pos=jax.random.normal(
            next(ks), (cfg.max_target_positions, D), dtype
        ) * 0.02,
        dec_blocks=[block(decoder=True) for _ in range(cfg.decoder_layers)],
        dec_norm_w=jnp.ones((D,), dtype), dec_norm_b=jnp.zeros((D,), dtype),
    )


def quantize_whisper(
    params: WhisperParams, group_size: int = 64, zero_point: bool = True
) -> WhisperParams:
    """W4A16-quantize every linear (RTN). Convs, norms and embeddings stay
    float — the reference likewise swaps only nn.Linear modules
    (models/base.py::_load_quantized_modules)."""

    def q(lin):
        if lin is None or isinstance(lin, QuantLinear):
            return lin
        K = lin.weight.shape[0]
        g = group_size if K % group_size == 0 else K
        return QuantLinear.from_float(lin.weight, lin.bias, g, zero_point)

    def qattn(a):
        if a is None:
            return None
        return WhisperAttnParams(q=q(a.q), k=q(a.k), v=q(a.v), o=q(a.o))

    def qblock(b):
        return dataclasses.replace(
            b, attn=qattn(b.attn), cross=qattn(b.cross),
            fc1=q(b.fc1), fc2=q(b.fc2),
        )

    return dataclasses.replace(
        params,
        enc_blocks=[qblock(b) for b in params.enc_blocks],
        dec_blocks=[qblock(b) for b in params.dec_blocks],
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _mha(
    p: WhisperAttnParams, cfg: WhisperConfig, x: jax.Array,
    kv_src: jax.Array, heads: int, causal: bool,
    cache: Optional[KVCache] = None, layer: int = 0,
    kv_precomp: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    B, S, D = x.shape
    hd = D // heads
    q = p.q(x).reshape(B, S, heads, hd)
    if kv_precomp is not None:  # cross-attention: K/V fixed per utterance
        k, v = kv_precomp  # [B, T, H, hd]
        out = causal_attention(q, k, v, q_offset=k.shape[1])  # offset >= T
        # q_offset >= T makes every key visible: "causal" masks nothing
        return p.o(out.reshape(B, S, D)), cache
    k = p.k(kv_src).reshape(B, -1, heads, hd)
    v = p.v(kv_src).reshape(B, -1, heads, hd)
    if cache is not None:
        start = cache.length
        cache = cache.update(layer, k, v, start)
        k_all, v_all = cache.layer(layer)
        out = causal_attention(
            q, k_all, v_all, q_offset=start, kv_len=start + S,
            kv_heads_major=True,
        )
        return p.o(out.reshape(B, S, D)), cache
    if causal:
        out = causal_attention(q, k, v)
    else:  # encoder: bidirectional == every key visible
        out = causal_attention(q, k, v, q_offset=k.shape[1])
    return p.o(out.reshape(B, S, D)), cache


def _ln(x, w, b):
    return layer_norm(x, w, b, 1e-5)


def whisper_encode(params: WhisperParams, cfg: WhisperConfig, mel: jax.Array):
    """mel [B, n_mels, T] (T = 3000 for a 30s chunk) -> [B, T//2, D]."""
    dn = jax.lax.conv_dimension_numbers(
        mel.shape, (1, 1, 1), ("NCH", "HIO", "NCH")
    )
    x = jax.lax.conv_general_dilated(
        mel, params.conv1_w, (1,), [(1, 1)], dimension_numbers=dn
    ) + params.conv1_b[None, :, None]
    x = jax.nn.gelu(x)
    x = jax.lax.conv_general_dilated(
        x, params.conv2_w, (2,), [(1, 1)], dimension_numbers=dn
    ) + params.conv2_b[None, :, None]
    x = jax.nn.gelu(x)
    x = x.transpose(0, 2, 1)  # [B, T', D]
    x = x + params.enc_pos[: x.shape[1]].astype(x.dtype)
    for b in params.enc_blocks:
        h = _ln(x, b.attn_norm_w, b.attn_norm_b)
        a, _ = _mha(b.attn, cfg, h, h, cfg.encoder_heads, causal=False)
        x = x + a
        h = _ln(x, b.mlp_norm_w, b.mlp_norm_b)
        x = x + b.fc2(jax.nn.gelu(b.fc1(h)))
    return _ln(x, params.enc_norm_w, params.enc_norm_b)


def precompute_cross_kv(params: WhisperParams, cfg: WhisperConfig, enc_out):
    """Per decoder layer: (k, v) [B, T', H, hd] from the encoder output."""
    B, T, D = enc_out.shape
    H = cfg.decoder_heads
    out = []
    for b in params.dec_blocks:
        k = b.cross.k(enc_out).reshape(B, T, H, D // H)
        v = b.cross.v(enc_out).reshape(B, T, H, D // H)
        out.append((k, v))
    return out


def whisper_decode(
    params: WhisperParams, cfg: WhisperConfig, tokens: jax.Array,
    cross_kv, cache: Optional[KVCache] = None,
    positions: Optional[jax.Array] = None,
):
    """tokens [B, S] -> (logits [B, S, V], cache)."""
    B, S = tokens.shape
    if positions is None:
        start = cache.length if cache is not None else jnp.zeros((), jnp.int32)
        positions = jnp.arange(S) + start
    x = params.dec_embed[tokens] + params.dec_pos[positions].astype(
        params.dec_embed.dtype
    )
    for i, b in enumerate(params.dec_blocks):
        h = _ln(x, b.attn_norm_w, b.attn_norm_b)
        a, cache = _mha(
            b.attn, cfg, h, h, cfg.decoder_heads, causal=True,
            cache=cache, layer=i,
        )
        x = x + a
        h = _ln(x, b.cross_norm_w, b.cross_norm_b)
        a, _ = _mha(
            b.cross, cfg, h, h, cfg.decoder_heads, causal=False,
            kv_precomp=cross_kv[i],
        )
        x = x + a
        h = _ln(x, b.mlp_norm_w, b.mlp_norm_b)
        x = x + b.fc2(jax.nn.gelu(b.fc1(h)))
    x = _ln(x, params.dec_norm_w, params.dec_norm_b)
    logits = x @ params.dec_embed.T.astype(x.dtype)  # tied proj_out
    if cache is not None:
        cache = cache.with_length(cache.length + S)
    return logits.astype(jnp.float32), cache


def greedy_decode(
    params: WhisperParams, cfg: WhisperConfig, mel: jax.Array,
    forced_tokens: List[int], max_new_tokens: int = 128,
) -> jax.Array:
    """Jitted greedy transcription: encode once, decode with an EOS latch
    inside one ``lax.while_loop``. Returns [B, max_new_tokens] int32 padded
    with EOS after the latch."""
    B = mel.shape[0]
    enc = whisper_encode(params, cfg, mel)
    cross_kv = precompute_cross_kv(params, cfg, enc)
    hd = cfg.d_model // cfg.decoder_heads
    max_len = len(forced_tokens) + max_new_tokens
    cache = KVCache.create(
        cfg.decoder_layers, B, max_len, cfg.decoder_heads, hd,
        dtype=enc.dtype,
    )
    prompt = jnp.broadcast_to(
        jnp.asarray(forced_tokens, jnp.int32)[None], (B, len(forced_tokens))
    )
    logits, cache = whisper_decode(params, cfg, prompt, cross_kv, cache)
    tok0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    out0 = jnp.full((B, max_new_tokens), cfg.eos_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(tok0)
    done0 = tok0 == cfg.eos_token_id

    def cond(state):
        i, _, _, done = state
        return jnp.logical_and(i < max_new_tokens, ~jnp.all(done))

    def body(state):
        i, cache, out, done = state
        logits, cache = whisper_decode(
            params, cfg, out[:, i - 1][:, None], cross_kv, cache
        )
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        out = out.at[:, i].set(nxt)
        return i + 1, cache, out, jnp.logical_or(done, nxt == cfg.eos_token_id)

    _, _, out, _ = jax.lax.while_loop(cond, body, (1, cache, out0, done0))
    return out


# ---------------------------------------------------------------------------
# Log-mel frontend (numpy; Whisper-exact)
# ---------------------------------------------------------------------------

def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]
    (what librosa.filters.mel produces and Whisper ships as a constant)."""
    fmin, fmax = 0.0, sr / 2
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mel,
        )
        return mel
    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        return np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-10)
        down = (hi - bins) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # slaney area normalization
    return fb.astype(np.float32)


def log_mel_spectrogram(
    audio: np.ndarray, sr: int = SAMPLE_RATE, n_mels: int = 80,
    pad_to_chunk: bool = True,
) -> np.ndarray:
    """waveform -> [n_mels, T] Whisper features (audio.py semantics:
    hann STFT, |.|^2, mel, log10, max-8 floor, (x+4)/4)."""
    audio = np.asarray(audio, np.float32)
    if sr != SAMPLE_RATE:  # naive linear resample (tests use 16k directly)
        n_out = int(round(len(audio) * SAMPLE_RATE / sr))
        audio = np.interp(
            np.linspace(0, len(audio) - 1, n_out),
            np.arange(len(audio)), audio,
        ).astype(np.float32)
    if pad_to_chunk:
        n = CHUNK_SECONDS * SAMPLE_RATE
        audio = audio[:n]
        audio = np.pad(audio, (0, n - len(audio)))
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = padded[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # [T, n_fft//2+1]
    spec = spec[:-1]  # whisper drops the final frame
    mel = mel_filterbank(n_mels) @ spec.T  # [n_mels, T]
    log = np.log10(np.maximum(mel, 1e-10))
    log = np.maximum(log, log.max() - 8.0)
    return ((log + 4.0) / 4.0).astype(np.float32)


# ---------------------------------------------------------------------------
# HF import + transcribe driver
# ---------------------------------------------------------------------------

def import_hf_whisper(model_dir: str, dtype=jnp.float32):
    """(params, cfg) from an HF WhisperForConditionalGeneration directory."""
    import json
    import os

    from quick_tpu.utils.checkpoint import _hf_tensor_iter

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = WhisperConfig.from_hf_config(json.load(f))
    raw = {}
    for name, arr in _hf_tensor_iter(model_dir):
        raw[name.removeprefix("model.")] = np.asarray(arr)

    def lin(prefix, bias=True):
        w = jnp.asarray(raw[f"{prefix}.weight"].T, dtype)  # [out,in]->[in,out]
        b = (
            jnp.asarray(raw[f"{prefix}.bias"], dtype)
            if bias and f"{prefix}.bias" in raw else None
        )
        return Linear(w, b)

    def attn(prefix):
        return WhisperAttnParams(
            q=lin(f"{prefix}.q_proj"), k=lin(f"{prefix}.k_proj", bias=False),
            v=lin(f"{prefix}.v_proj"), o=lin(f"{prefix}.out_proj"),
        )

    def block(prefix, decoder):
        return WhisperBlockParams(
            attn_norm_w=jnp.asarray(raw[f"{prefix}.self_attn_layer_norm.weight"], dtype),
            attn_norm_b=jnp.asarray(raw[f"{prefix}.self_attn_layer_norm.bias"], dtype),
            attn=attn(f"{prefix}.self_attn"),
            mlp_norm_w=jnp.asarray(raw[f"{prefix}.final_layer_norm.weight"], dtype),
            mlp_norm_b=jnp.asarray(raw[f"{prefix}.final_layer_norm.bias"], dtype),
            fc1=lin(f"{prefix}.fc1"), fc2=lin(f"{prefix}.fc2"),
            cross_norm_w=(
                jnp.asarray(raw[f"{prefix}.encoder_attn_layer_norm.weight"], dtype)
                if decoder else None
            ),
            cross_norm_b=(
                jnp.asarray(raw[f"{prefix}.encoder_attn_layer_norm.bias"], dtype)
                if decoder else None
            ),
            cross=attn(f"{prefix}.encoder_attn") if decoder else None,
        )

    params = WhisperParams(
        # HF conv weight [D_out, C_in, 3] -> [3, C_in, D_out] (HIO)
        conv1_w=jnp.asarray(raw["encoder.conv1.weight"].transpose(2, 1, 0), dtype),
        conv1_b=jnp.asarray(raw["encoder.conv1.bias"], dtype),
        conv2_w=jnp.asarray(raw["encoder.conv2.weight"].transpose(2, 1, 0), dtype),
        conv2_b=jnp.asarray(raw["encoder.conv2.bias"], dtype),
        enc_pos=jnp.asarray(raw["encoder.embed_positions.weight"], dtype),
        enc_blocks=[
            block(f"encoder.layers.{i}", False)
            for i in range(cfg.encoder_layers)
        ],
        enc_norm_w=jnp.asarray(raw["encoder.layer_norm.weight"], dtype),
        enc_norm_b=jnp.asarray(raw["encoder.layer_norm.bias"], dtype),
        dec_embed=jnp.asarray(raw["decoder.embed_tokens.weight"], dtype),
        dec_pos=jnp.asarray(raw["decoder.embed_positions.weight"], dtype),
        dec_blocks=[
            block(f"decoder.layers.{i}", True)
            for i in range(cfg.decoder_layers)
        ],
        dec_norm_w=jnp.asarray(raw["decoder.layer_norm.weight"], dtype),
        dec_norm_b=jnp.asarray(raw["decoder.layer_norm.bias"], dtype),
    )
    return params, cfg


def make_transcribe_fn(
    params: WhisperParams, cfg: WhisperConfig,
    detokenize: Callable[[List[int]], str],
    forced_tokens: Optional[List[int]] = None,
    max_new_tokens: int = 128,
) -> Callable[[np.ndarray, int], str]:
    """Build eval_librispeech's ``transcribe_fn(waveform, sr) -> text``.

    ``detokenize`` maps token ids to text (the HF WhisperTokenizer's
    ``decode`` with skip_special_tokens, or any callable in tests)."""
    forced = forced_tokens or [cfg.decoder_start_token_id]
    decode = jax.jit(
        lambda p, mel: greedy_decode(p, cfg, mel, forced, max_new_tokens)
    )

    def transcribe(waveform: np.ndarray, sr: int) -> str:
        mel = log_mel_spectrogram(waveform, sr, cfg.n_mels)
        # a 30s chunk yields exactly 2*max_source_positions frames for real
        # checkpoints; smaller test configs truncate to their window
        mel = mel[:, : 2 * cfg.max_source_positions]
        toks = np.asarray(decode(params, jnp.asarray(mel[None])))[0]
        ids = []
        for t in toks.tolist():
            if t == cfg.eos_token_id:
                break
            ids.append(t)
        return detokenize(ids)

    return transcribe


# ---------------------------------------------------------------------------
# Persistence (quantized or float)
# ---------------------------------------------------------------------------
# Same flavor as utils/checkpoint.py for the causal-LM zoo: one safetensors
# file of flat tensors (QuantLinear triples keep the QTPU packed layout on
# disk) + config.json carrying the WhisperConfig and a format marker.

def _put_lin(out: dict, prefix: str, lin) -> None:
    if lin is None:
        return
    if isinstance(lin, QuantLinear):
        out[f"{prefix}.qweight"] = np.asarray(lin.qweight)
        out[f"{prefix}.scales"] = np.asarray(lin.scales)
        out[f"{prefix}.zeros_x_scales"] = np.asarray(lin.zeros_x_scales)
    else:
        out[f"{prefix}.weight"] = np.asarray(lin.weight)
    if lin.bias is not None:
        out[f"{prefix}.bias"] = np.asarray(lin.bias)


def _get_lin(flat: dict, prefix: str, dtype):
    bias = flat.get(f"{prefix}.bias")
    bias = None if bias is None else jnp.asarray(bias, dtype)
    if f"{prefix}.qweight" in flat:
        qw = flat[f"{prefix}.qweight"]
        scales = flat[f"{prefix}.scales"]
        group = qw.shape[0] * 8 // scales.shape[0]
        return QuantLinear(
            qweight=jnp.asarray(qw),
            scales=jnp.asarray(scales),
            zeros_x_scales=jnp.asarray(flat[f"{prefix}.zeros_x_scales"]),
            bias=bias, group_size=group,
        )
    if f"{prefix}.weight" not in flat:
        return None
    return Linear(jnp.asarray(flat[f"{prefix}.weight"], dtype), bias)


def _walk_blocks(blocks, prefix, put):
    for i, b in enumerate(blocks):
        p = f"{prefix}.{i}"
        put(f"{p}.attn_norm_w", b.attn_norm_w)
        put(f"{p}.attn_norm_b", b.attn_norm_b)
        put(f"{p}.mlp_norm_w", b.mlp_norm_w)
        put(f"{p}.mlp_norm_b", b.mlp_norm_b)
        if b.cross_norm_w is not None:
            put(f"{p}.cross_norm_w", b.cross_norm_w)
            put(f"{p}.cross_norm_b", b.cross_norm_b)


def save_whisper(params: WhisperParams, cfg: WhisperConfig, save_dir: str) -> str:
    import json
    import os

    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    out: dict = {}
    for name in ("conv1_w", "conv1_b", "conv2_w", "conv2_b", "enc_pos",
                 "enc_norm_w", "enc_norm_b", "dec_embed", "dec_pos",
                 "dec_norm_w", "dec_norm_b"):
        out[name] = np.asarray(getattr(params, name))
    _walk_blocks(params.enc_blocks, "enc", lambda k, v: out.__setitem__(k, np.asarray(v)))
    _walk_blocks(params.dec_blocks, "dec", lambda k, v: out.__setitem__(k, np.asarray(v)))
    for i, b in enumerate(params.enc_blocks):
        for nm, a in (("attn", b.attn),):
            for f in ("q", "k", "v", "o"):
                _put_lin(out, f"enc.{i}.{nm}.{f}", getattr(a, f))
        _put_lin(out, f"enc.{i}.fc1", b.fc1)
        _put_lin(out, f"enc.{i}.fc2", b.fc2)
    for i, b in enumerate(params.dec_blocks):
        for nm, a in (("attn", b.attn), ("cross", b.cross)):
            for f in ("q", "k", "v", "o"):
                _put_lin(out, f"dec.{i}.{nm}.{f}", getattr(a, f))
        _put_lin(out, f"dec.{i}.fc1", b.fc1)
        _put_lin(out, f"dec.{i}.fc2", b.fc2)
    save_file(out, os.path.join(save_dir, "model.safetensors"))
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(
            {"quick_whisper": True, **dataclasses.asdict(cfg)}, f, indent=2
        )
    return save_dir


def load_whisper(model_dir: str, dtype=jnp.float32):
    """(params, cfg) from a save_whisper directory (quantized linears come
    back as QuantLinear with the packed layout intact)."""
    import json
    import os

    from safetensors.numpy import load_file

    with open(os.path.join(model_dir, "config.json")) as f:
        raw_cfg = json.load(f)
    if not raw_cfg.pop("quick_whisper", False):
        # plain HF layout
        return import_hf_whisper(model_dir, dtype)
    cfg = WhisperConfig(**raw_cfg)
    flat = load_file(os.path.join(model_dir, "model.safetensors"))

    def arr(name):
        return jnp.asarray(flat[name], dtype)

    def block(prefix, i, decoder):
        p = f"{prefix}.{i}"

        def attn(nm):
            return WhisperAttnParams(
                q=_get_lin(flat, f"{p}.{nm}.q", dtype),
                k=_get_lin(flat, f"{p}.{nm}.k", dtype),
                v=_get_lin(flat, f"{p}.{nm}.v", dtype),
                o=_get_lin(flat, f"{p}.{nm}.o", dtype),
            )

        return WhisperBlockParams(
            attn_norm_w=arr(f"{p}.attn_norm_w"),
            attn_norm_b=arr(f"{p}.attn_norm_b"),
            attn=attn("attn"),
            mlp_norm_w=arr(f"{p}.mlp_norm_w"),
            mlp_norm_b=arr(f"{p}.mlp_norm_b"),
            fc1=_get_lin(flat, f"{p}.fc1", dtype),
            fc2=_get_lin(flat, f"{p}.fc2", dtype),
            cross_norm_w=arr(f"{p}.cross_norm_w") if decoder else None,
            cross_norm_b=arr(f"{p}.cross_norm_b") if decoder else None,
            cross=attn("cross") if decoder else None,
        )

    params = WhisperParams(
        conv1_w=arr("conv1_w"), conv1_b=arr("conv1_b"),
        conv2_w=arr("conv2_w"), conv2_b=arr("conv2_b"),
        enc_pos=arr("enc_pos"),
        enc_blocks=[block("enc", i, False) for i in range(cfg.encoder_layers)],
        enc_norm_w=arr("enc_norm_w"), enc_norm_b=arr("enc_norm_b"),
        dec_embed=arr("dec_embed"), dec_pos=arr("dec_pos"),
        dec_blocks=[block("dec", i, True) for i in range(cfg.decoder_layers)],
        dec_norm_w=arr("dec_norm_w"), dec_norm_b=arr("dec_norm_b"),
    )
    return params, cfg
