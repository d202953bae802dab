"""Pallas flash attention kernel vs XLA oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.ops.attention import attention_reference
from inferix_tpu.ops.flash_attention import flash_attention_prefix


@pytest.mark.parametrize("softmax", ["fixedm", "runmax"])
@pytest.mark.parametrize("kv_len", [640, 511, 300, 17, 1])
def test_flash_prefix_parity(kv_len, softmax):
    rng = np.random.default_rng(0)
    b, sq, skv, h, d = 1, 24, 640, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    mask = jnp.arange(skv) < kv_len
    want, want_lse = attention_reference(q, k, v, mask)
    got, lse = flash_attention_prefix(
        q, k, v, jnp.int32(kv_len), return_lse=True, interpret=True,
        q_block=16, kv_block=128, softmax=softmax,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-3, atol=1e-3)


def test_flash_fixedm_large_logits():
    """The max-free softmax must stay exact up to its documented bound
    (|natural logit| ~ 60): scale q so max|q.k|*scale ~ 50 and compare to
    the oracle — this is far beyond any normalized-QK attention's range."""
    rng = np.random.default_rng(9)
    b, sq, skv, h, d = 1, 16, 384, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    q = q * 12.0  # logits ~ N(0, 12) after 1/sqrt(d) scale; max ~ +-50
    want, want_lse = attention_reference(q, k, v, jnp.arange(skv) < 300)
    got, lse = flash_attention_prefix(
        q, k, v, jnp.int32(300), return_lse=True, interpret=True,
        q_block=16, kv_block=128, softmax="fixedm",
    )
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-3, atol=1e-3)


def test_flash_kv_layout_bhsd_parity():
    """kv_layout='bhsd' (head-major cache, free kernel fold) must equal the
    default 'bshd' path — same kernel, different operand layout."""
    rng = np.random.default_rng(4)
    b, sq, skv, h, d = 2, 24, 640, 3, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    want, want_lse = flash_attention_prefix(
        q, k, v, jnp.int32(500), return_lse=True, interpret=True,
        q_block=16, kv_block=128)
    got, lse = flash_attention_prefix(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), jnp.int32(500),
        return_lse=True, interpret=True, q_block=16, kv_block=128,
        kv_layout="bhsd")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(lse), np.asarray(want_lse))


def test_flash_quant_kv_layout_bhsd_parity():
    """int8-KV kernel with head-major cache + scales equals the token-major
    call (same kernel; the bhsd fold is a reshape)."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_prefix_quant

    rng = np.random.default_rng(5)
    b, sq, skv, h, d = 2, 16, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    want = flash_attention_prefix_quant(
        q, k_q, v_q, k_s, v_s, jnp.int32(400), interpret=True,
        q_block=16, kv_block=128)
    got = flash_attention_prefix_quant(
        q, k_q.transpose(0, 2, 1, 3), v_q.transpose(0, 2, 1, 3),
        k_s.transpose(0, 2, 1), v_s.transpose(0, 2, 1), jnp.int32(400),
        interpret=True, q_block=16, kv_block=128, kv_layout="bhsd")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_flash_unpadded_q_and_kv():
    """Shapes not multiples of the block sizes are padded internally."""
    rng = np.random.default_rng(1)
    b, sq, skv, h, d = 2, 13, 200, 3, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    want, _ = attention_reference(q, k, v, jnp.arange(skv) < 150)
    got = flash_attention_prefix(q, k, v, jnp.int32(150), interpret=True,
                                 q_block=16, kv_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_bf16():
    rng = np.random.default_rng(2)
    b, sq, skv, h, d = 1, 16, 256, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.bfloat16)
    want, _ = attention_reference(q, k, v, jnp.arange(skv) < 200)
    got = flash_attention_prefix(q, k, v, jnp.int32(200), interpret=True,
                                 q_block=16, kv_block=128)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_flash_kv_span():
    """[kv_start, kv_end) span masking (MAGI noise2clean kv ranges)."""
    rng = np.random.default_rng(3)
    b, sq, skv, h, d = 1, 16, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    start, end = 130, 400
    mask = (jnp.arange(skv) >= start) & (jnp.arange(skv) < end)
    want, _ = attention_reference(q, k, v, mask)
    got = flash_attention_prefix(q, k, v, jnp.int32(end), kv_start=jnp.int32(start),
                                 interpret=True, q_block=16, kv_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_quant_parity():
    """int8-KV kernel (interpret) vs dequantized XLA oracle."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_prefix_quant

    rng = np.random.default_rng(5)
    b, sq, skv, h, d = 1, 16, 384, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    kv_len = 300
    want, _ = attention_reference(q, k_deq, v_deq, jnp.arange(skv) < kv_len)
    got = flash_attention_prefix_quant(
        q, k_q, v_q, k_s, v_s, jnp.int32(kv_len), interpret=True,
        q_block=16, kv_block=128,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_flash_quant_i8_parity():
    """Full-int8 attention compute vs dequantized f32 oracle."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_prefix_quant_i8

    rng = np.random.default_rng(6)
    b, sq, skv, h, d = 1, 32, 384, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    kv_len = 300
    want, _ = attention_reference(q, k_deq, v_deq, jnp.arange(skv) < kv_len)
    got = flash_attention_prefix_quant_i8(
        q, k_q, v_q, k_s, v_s, jnp.int32(kv_len), interpret=True,
        q_block=32, kv_block=128,
    )
    # int8 q + int8 p quantization add noise; attention outputs are O(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.06, atol=0.06)


def test_flash_per_batch_kv_len():
    """Continuous batching: each batch slot has its own live prefix length."""
    rng = np.random.default_rng(7)
    b, sq, skv, h, d = 3, 16, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    lens = jnp.asarray([100, 512, 257], jnp.int32)
    got = flash_attention_prefix(q, k, v, lens, interpret=True,
                                 q_block=16, kv_block=128)
    for i, L in enumerate([100, 512, 257]):
        want, _ = attention_reference(q[i:i+1], k[i:i+1], v[i:i+1],
                                      jnp.arange(skv) < L)
        np.testing.assert_allclose(np.asarray(got[i:i+1]), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_flash_gqa_matches_repeated_kv():
    from inferix_tpu.ops.flash_attention import flash_attention_gqa

    rng = np.random.default_rng(8)
    b, sq, skv, hq, hkv, d = 1, 16, 256, 6, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    want, _ = attention_reference(q, jnp.repeat(k, 3, axis=2),
                                  jnp.repeat(v, 3, axis=2),
                                  jnp.arange(skv) < 200)
    got = flash_attention_gqa(q, k, v, jnp.int32(200), interpret=True,
                              q_block=16, kv_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_quant_per_batch_kv_len():
    """Quantized-KV kernel honors PER-BATCH prefix lengths (continuous
    batching + int8 KV cache: every stream must attend over its own live
    prefix, not stream 0's)."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_prefix_quant

    rng = np.random.default_rng(9)
    b, sq, skv, h, d = 3, 16, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    lens = jnp.asarray([100, 512, 257], jnp.int32)
    got = flash_attention_prefix_quant(
        q, k_q, v_q, k_s, v_s, lens, interpret=True, q_block=16, kv_block=128,
    )
    for i, L in enumerate([100, 512, 257]):
        want, _ = attention_reference(q[i:i+1], k_deq[i:i+1], v_deq[i:i+1],
                                      jnp.arange(skv) < L)
        np.testing.assert_allclose(np.asarray(got[i:i+1]), np.asarray(want),
                                   rtol=5e-3, atol=5e-3)


def test_flash_gqa_return_lse():
    """GQA wrapper unfolds the rep-folded LSE back to [B, Hq, Sq]."""
    from inferix_tpu.ops.flash_attention import flash_attention_gqa

    rng = np.random.default_rng(10)
    b, sq, skv, hq, hkv, d = 1, 16, 256, 6, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    want, want_lse = attention_reference(q, jnp.repeat(k, 3, axis=2),
                                         jnp.repeat(v, 3, axis=2),
                                         jnp.arange(skv) < 200)
    got, lse = flash_attention_gqa(q, k, v, jnp.int32(200), interpret=True,
                                   q_block=16, kv_block=128, return_lse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-3, atol=1e-3)


def test_flash_quant_v2_parity():
    """int8-PV kernel (per-kv-block V scales, fixed 127 p-quant) vs the
    dequantized oracle — p is quantized to 1/127 steps so tolerance is
    looser than the bf16 path but must stay within ~1%."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_prefix_quant_v2

    rng = np.random.default_rng(11)
    b, sq, skv, h, d = 2, 16, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    lens = jnp.asarray([300, 512], jnp.int32)
    got = flash_attention_prefix_quant_v2(
        q, k_q, v_q, k_s, v_s, lens, interpret=True, q_block=16, kv_block=128,
    )
    for i, L in enumerate([300, 512]):
        want, _ = attention_reference(q[i:i+1], k_deq[i:i+1], v_deq[i:i+1],
                                      jnp.arange(skv) < L)
        np.testing.assert_allclose(np.asarray(got[i:i+1]), np.asarray(want),
                                   rtol=0.02, atol=0.02)


def test_flash_quant_span_parity():
    """int8-KV kernel with a nonzero kv_start span (the MAGI chunk-causal
    path) vs dequantized XLA oracle."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_prefix_quant

    rng = np.random.default_rng(6)
    b, sq, skv, h, d = 1, 16, 512, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    for start, end in ((128, 300), (200, 512), (0, 512), (260, 300)):
        idx = jnp.arange(skv)
        want, _ = attention_reference(q, k_deq, v_deq,
                                      (idx >= start) & (idx < end))
        for sm in ("fixedm", "runmax"):
            got = flash_attention_prefix_quant(
                q, k_q, v_q, k_s, v_s, jnp.int32(end), jnp.int32(start),
                interpret=True, q_block=16, kv_block=128, softmax=sm,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3,
                err_msg=f"{start}:{end}:{sm}")


def test_flash_gqa_quant_span():
    """GQA fold over the int8-KV span kernel vs repeated-heads oracle."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_gqa_quant

    rng = np.random.default_rng(7)
    b, sq, skv, hq, hkv, d = 1, 16, 384, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    rep = hq // hkv
    k_deq = jnp.repeat(k_q.astype(jnp.float32) * k_s[..., None], rep, axis=2)
    v_deq = jnp.repeat(v_q.astype(jnp.float32) * v_s[..., None], rep, axis=2)
    idx = jnp.arange(skv)
    want, _ = attention_reference(q, k_deq, v_deq, (idx >= 128) & (idx < 300))
    got = flash_attention_gqa_quant(
        q, k_q, v_q, k_s, v_s, jnp.int32(300), jnp.int32(128),
        interpret=True, q_block=16, kv_block=128,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)

def test_flash_span_grid_bf16():
    """max_span span-sized grid vs the full-cache grid (exact same math,
    fewer grid steps): misaligned kv_start, span < / = / > one block,
    per-batch bounds, and the >=cache fallback."""
    rng = np.random.default_rng(11)
    b, sq, skv, h, d = 2, 16, 1024, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    cases = [
        # (starts [B], ends [B], max_span)
        ([130, 200], [400, 450], 270),      # misaligned, multi-block
        ([0, 64], [100, 164], 128),         # sub-block spans
        ([300, 300], [428, 428], 128),      # exactly one block, misaligned
        ([0, 0], [1024, 900], 1024),        # fallback: max_span >= cache
        ([512, 700], [900, 830], 512),      # slack: spans well under bound
    ]
    for starts, ends, max_span in cases:
        idx = jnp.arange(skv)
        s_v = jnp.asarray(starts, jnp.int32)
        e_v = jnp.asarray(ends, jnp.int32)
        mask = (idx[None] >= s_v[:, None]) & (idx[None] < e_v[:, None])
        want, _ = attention_reference(q, k, v, mask)
        for sm in ("fixedm", "runmax"):
            got = flash_attention_prefix(
                q, k, v, e_v, kv_start=s_v, interpret=True,
                q_block=16, kv_block=128, softmax=sm, max_span=max_span,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3,
                err_msg=f"{starts}:{ends}:span{max_span}:{sm}")


def test_flash_span_grid_quant():
    """max_span over the int8-KV span kernel vs dequantized oracle."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_prefix_quant

    rng = np.random.default_rng(12)
    b, sq, skv, h, d = 2, 16, 768, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    idx = jnp.arange(skv)
    for starts, ends, max_span in [([130, 250], [400, 500], 270),
                                   ([600, 0], [768, 120], 200)]:
        s_v = jnp.asarray(starts, jnp.int32)
        e_v = jnp.asarray(ends, jnp.int32)
        mask = (idx[None] >= s_v[:, None]) & (idx[None] < e_v[:, None])
        want, _ = attention_reference(q, k_deq, v_deq, mask)
        got = flash_attention_prefix_quant(
            q, k_q, v_q, k_s, v_s, e_v, kv_start=s_v, interpret=True,
            q_block=16, kv_block=128, max_span=max_span,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3,
            err_msg=f"{starts}:{ends}:span{max_span}")


def test_flash_span_grid_gqa():
    """max_span flows through the GQA fold (the MAGI serving call shape)."""
    from inferix_tpu.kvcache.cache import quantize_kv_block
    from inferix_tpu.ops.flash_attention import flash_attention_gqa_quant

    rng = np.random.default_rng(13)
    b, sq, skv, hq, hkv, d = 1, 16, 640, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, hkv, d)), jnp.float32)
    k_q, k_s = quantize_kv_block(k)
    v_q, v_s = quantize_kv_block(v)
    rep = hq // hkv
    k_deq = jnp.repeat(k_q.astype(jnp.float32) * k_s[..., None], rep, axis=2)
    v_deq = jnp.repeat(v_q.astype(jnp.float32) * v_s[..., None], rep, axis=2)
    idx = jnp.arange(skv)
    want, _ = attention_reference(q, k_deq, v_deq, (idx >= 140) & (idx < 380))
    got = flash_attention_gqa_quant(
        q, k_q, v_q, k_s, v_s, jnp.int32(380), jnp.int32(140),
        interpret=True, q_block=16, kv_block=128, max_span=256,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
