"""Whisper encoder-decoder: forward consistency, quantization, HF import
parity vs torch transformers, and the WER evaluation drive
(reference eval_librispeech, quick/awq/evaluation/eval_utils.py:63-113)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quick_tpu.models.whisper import (
    WhisperConfig,
    greedy_decode,
    import_hf_whisper,
    init_whisper_params,
    log_mel_spectrogram,
    make_transcribe_fn,
    mel_filterbank,
    precompute_cross_kv,
    quantize_whisper,
    whisper_decode,
    whisper_encode,
)
from quick_tpu.modules.cache import KVCache

TINY = WhisperConfig(
    vocab_size=64, d_model=64, encoder_layers=2, encoder_heads=4,
    decoder_layers=2, decoder_heads=4, ffn_dim=128, n_mels=16,
    max_source_positions=32, max_target_positions=24,
    decoder_start_token_id=1, eos_token_id=2,
)
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def wparams():
    return init_whisper_params(TINY, jax.random.PRNGKey(0))


def _mel(B=1, T=64):
    return jnp.asarray(RNG.standard_normal((B, TINY.n_mels, T)), jnp.float32)


def test_encode_decode_shapes(wparams):
    mel = _mel(2)
    enc = whisper_encode(wparams, TINY, mel)
    assert enc.shape == (2, 32, 64)  # T//2 after the stride-2 conv
    cross = precompute_cross_kv(wparams, TINY, enc)
    toks = jnp.asarray(RNG.integers(0, 64, (2, 5)), jnp.int32)
    logits, _ = whisper_decode(wparams, TINY, toks, cross)
    assert logits.shape == (2, 5, 64)
    assert bool(jnp.isfinite(logits).all())


def test_incremental_decode_matches_full(wparams):
    """Cached stepwise decode must equal one-shot full-context decode."""
    mel = _mel(1)
    enc = whisper_encode(wparams, TINY, mel)
    cross = precompute_cross_kv(wparams, TINY, enc)
    toks = jnp.asarray(RNG.integers(0, 64, (1, 8)), jnp.int32)
    full, _ = whisper_decode(wparams, TINY, toks, cross)

    hd = TINY.d_model // TINY.decoder_heads
    cache = KVCache.create(TINY.decoder_layers, 1, 16, TINY.decoder_heads, hd,
                           dtype=jnp.float32)
    lg, cache = whisper_decode(wparams, TINY, toks[:, :5], cross, cache)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(full[:, :5]), atol=1e-4, rtol=1e-4
    )
    for t in range(5, 8):
        lg, cache = whisper_decode(
            wparams, TINY, toks[:, t : t + 1], cross, cache
        )
        np.testing.assert_allclose(
            np.asarray(lg[:, 0]), np.asarray(full[:, t]), atol=1e-4, rtol=1e-4
        )


def test_greedy_decode_runs_and_latches_eos(wparams):
    out = np.asarray(greedy_decode(wparams, TINY, _mel(2), [1], 10))
    assert out.shape == (2, 10)
    for row in out:
        hit = np.where(row == TINY.eos_token_id)[0]
        if len(hit):  # everything after the first EOS stays EOS
            assert (row[hit[0]:] == TINY.eos_token_id).all()


def test_quantized_whisper_close_to_float(wparams):
    qp = quantize_whisper(wparams, group_size=32)
    from quick_tpu.modules.linear import QuantLinear

    assert isinstance(qp.dec_blocks[0].attn.q, QuantLinear)
    assert isinstance(qp.enc_blocks[0].fc1, QuantLinear)
    mel = _mel(1)
    ref = np.asarray(greedy_decode(wparams, TINY, mel, [1], 8))
    out = np.asarray(greedy_decode(qp, TINY, mel, [1], 8))
    assert out.shape == ref.shape  # token-exactness is not guaranteed at
    # this tiny width; numerics closeness is asserted on logits:
    enc_f = whisper_encode(wparams, TINY, mel)
    enc_q = whisper_encode(qp, TINY, mel)
    rel = float(jnp.max(jnp.abs(enc_q - enc_f)) / jnp.max(jnp.abs(enc_f)))
    assert rel < 0.2, rel


def test_mel_frontend_shapes():
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    mel = log_mel_spectrogram(audio, 16000, n_mels=80)
    assert mel.shape == (80, 3000)  # 30s chunk -> 3000 frames
    assert np.isfinite(mel).all()
    fb = mel_filterbank(80)
    assert fb.shape == (80, 201)
    assert (fb.sum(axis=1) > 0).all()


def test_hf_import_matches_torch(tmp_path):
    """Import a random HF WhisperForConditionalGeneration and match its
    torch logits — layout parity for conv/attention/cross/tied head."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFWhisperConfig(
        vocab_size=64, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_ffn_dim=128, num_mel_bins=16, max_source_positions=32,
        max_target_positions=24, decoder_start_token_id=1, eos_token_id=2,
        pad_token_id=0, bos_token_id=0, suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    tmodel = WhisperForConditionalGeneration(hf_cfg).eval()
    d = str(tmp_path / "whisper")
    tmodel.save_pretrained(d, safe_serialization=True)

    params, cfg = import_hf_whisper(d)
    mel = RNG.standard_normal((1, 16, 64)).astype(np.float32)
    dec_ids = np.asarray([[1, 5, 9, 3]], np.int64)
    with torch.no_grad():
        ref = tmodel(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()

    enc = whisper_encode(params, cfg, jnp.asarray(mel))
    cross = precompute_cross_kv(params, cfg, enc)
    ours, _ = whisper_decode(
        params, cfg, jnp.asarray(dec_ids, jnp.int32), cross
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=2e-3)


def test_eval_librispeech_with_quantized_whisper(wparams):
    """End-to-end WER drive: quantized tiny Whisper transcribing synthetic
    rows through evaluation/wer.py::eval_librispeech (the reference's
    eval_utils.py:63-113 flow, minus the network)."""
    from quick_tpu.evaluation.wer import eval_librispeech

    qp = quantize_whisper(wparams, group_size=32)
    detok = lambda ids: " ".join(f"t{i}" for i in ids)
    fn = make_transcribe_fn(qp, TINY, detok, max_new_tokens=6)
    rows = []
    for i in range(3):
        wave = np.sin(
            np.linspace(0, (300 + 100 * i) * 2 * np.pi, 16000)
        ).astype(np.float32)
        rows.append({
            "audio": {"array": wave, "sampling_rate": 16000},
            "text": "t1 t2 t3",
        })
    res = eval_librispeech(fn, dataset_rows=rows)
    assert set(res) == {"wer", "errors", "words"}
    assert np.isfinite(res["wer"]) and res["words"] == 9.0


def test_whisper_save_load_roundtrip(wparams, tmp_path):
    """Quantized whisper persists (packed QuantLinear triples on disk) and
    reloads to identical greedy transcriptions."""
    from quick_tpu.models.whisper import load_whisper, save_whisper
    from quick_tpu.modules.linear import QuantLinear

    qp = quantize_whisper(wparams, group_size=32)
    d = str(tmp_path / "wq")
    save_whisper(qp, TINY, d)
    p2, cfg2 = load_whisper(d)
    assert cfg2 == TINY
    assert isinstance(p2.dec_blocks[0].attn.q, QuantLinear)
    assert p2.dec_blocks[0].attn.q.group_size == 32
    mel = _mel(1)
    a = np.asarray(greedy_decode(qp, TINY, mel, [1], 6))
    b = np.asarray(greedy_decode(p2, cfg2, mel, [1], 6))
    np.testing.assert_array_equal(a, b)
