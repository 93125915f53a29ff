"""approx_max_k_packed: the bf16 single-key-sort pre-NMS selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.ops.postprocess import (_orderable_u16, _unorderable_u16,
                                           approx_max_k_packed)


def _finite_bf16_universe():
    bits = np.arange(65536, dtype=np.uint16)
    vals = np.asarray(jax.lax.bitcast_convert_type(
        jnp.asarray(bits), jnp.bfloat16), dtype=np.float32)
    finite = np.isfinite(vals)
    return jnp.asarray(bits[finite]), vals[finite]


def test_orderable_is_monotone_over_all_finite_bf16():
    bits, as_f32 = _finite_bf16_universe()
    bf = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
    ordered = np.asarray(_orderable_u16(bf)).astype(np.uint32)
    # sort by float value; the u16 keys must be sorted too (ties allowed:
    # +0.0 / -0.0 map to different keys but compare equal as floats)
    perm = np.argsort(as_f32, kind="stable")
    keys_sorted = ordered[perm]
    float_sorted = as_f32[perm]
    # strictly increasing wherever the float strictly increases
    inc = np.diff(float_sorted) > 0
    assert np.all(np.diff(keys_sorted.astype(np.int64))[inc] > 0)


def test_unorderable_roundtrips():
    bits, _ = _finite_bf16_universe()
    bf = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
    back = _unorderable_u16(_orderable_u16(bf))
    assert np.array_equal(
        np.asarray(jax.lax.bitcast_convert_type(back, jnp.uint16)),
        np.asarray(bits))


def test_packed_matches_exact_on_distinct_values():
    # distinct bf16 values -> the approx candidate set decides recall, but
    # every selected (value, index) pair must be internally consistent and
    # sorted descending with top_k tie semantics
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.permutation(4096).reshape(2, 4, 512),
                    jnp.bfloat16)  # all distinct, exactly representable
    k = 32
    vals, idx = jax.jit(lambda s: approx_max_k_packed(s, k))(x)
    vals, idx = np.asarray(vals, np.float32), np.asarray(idx)
    xs = np.asarray(x, np.float32)
    for b in range(2):
        for c in range(4):
            # consistency: value really lives at the reported index
            assert np.array_equal(xs[b, c][idx[b, c]], vals[b, c])
            # descending order
            assert np.all(np.diff(vals[b, c]) <= 0)


def test_packed_ties_keep_valid_distinct_indices():
    # Tie choice/order among equal values belongs to approx_max_k's bin
    # reducer and differs per backend (TPU bins are spatial, the CPU
    # fallback is an exact sort). Portable guarantees: the strict max is
    # first, and tied winners are distinct in-range indices whose values
    # are consistent.
    x = jnp.zeros((1, 1, 256), jnp.bfloat16).at[0, 0, 17].set(2.0)
    vals, idx = jax.jit(lambda s: approx_max_k_packed(s, 4))(x)
    assert float(vals[0, 0, 0]) == 2.0 and int(idx[0, 0, 0]) == 17
    rest = np.asarray(idx)[0, 0, 1:]
    assert len(set(rest.tolist())) == rest.size
    assert np.all((rest >= 0) & (rest < 256))
    assert np.all(np.asarray(vals, np.float32)[0, 0, 1:] == 0.0)


def test_f32_input_falls_back_to_plain_approx():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 512)),
                    jnp.float32)
    v_packed, i_packed = approx_max_k_packed(x, 16)
    v_ref, i_ref = jax.lax.approx_max_k(x, 16, recall_target=0.95)
    assert np.array_equal(np.asarray(v_packed), np.asarray(v_ref))
    assert np.array_equal(np.asarray(i_packed), np.asarray(i_ref))


def test_recall_against_exact_topk():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8192)) * 3, jnp.bfloat16)
    k = 64
    _, idx = jax.jit(lambda s: approx_max_k_packed(s, k))(x)
    _, exact = jax.jit(lambda s: jax.lax.top_k(s.astype(jnp.float32), k))(x)
    idx, exact = np.asarray(idx), np.asarray(exact)
    recall = np.mean([len(np.intersect1d(idx[b, c], exact[b, c])) / k
                      for b in range(2) for c in range(8)])
    assert recall >= 0.93  # target 0.95, margin for bin-edge variance


def test_packed_drop1_path_quantizes_one_ulp():
    """ADVICE r2: exercise the idx_bits=17 (A > 65536, COCO-640) path where
    the bf16 LSB is dropped from the sort key. The returned value must
    equal scores[index] rounded DOWN to 7 mantissa bits (the documented
    quantization), and ordering must hold on the quantized values."""
    a = 70000  # > 2**16 -> idx_bits=17, drop=1
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 4, (2, a)).astype(np.float32),
                    jnp.bfloat16)
    k = 64
    vals, idx = jax.jit(lambda s: approx_max_k_packed(s, k))(x)
    vals_u16 = np.asarray(
        jax.lax.bitcast_convert_type(vals, jnp.uint16))
    gathered = np.take_along_axis(np.asarray(
        jax.lax.bitcast_convert_type(x, jnp.uint16)), np.asarray(idx),
        axis=-1)
    # value == scores[index] with the low mantissa bit cleared (positive
    # scores: orderable map keeps bit patterns monotone, drop clears LSB)
    assert np.array_equal(vals_u16, gathered & np.uint16(0xFFFE)), (
        "drop=1 unpack must round scores[idx] to 7 mantissa bits")
    # at most one bf16 ulp of value error
    err = np.abs(np.asarray(vals, np.float32)
                 - np.take_along_axis(np.asarray(x, np.float32),
                                      np.asarray(idx), axis=-1))
    ulp = np.abs(np.asarray(x, np.float32)) * 2 ** -7
    assert np.all(err <= np.take_along_axis(ulp, np.asarray(idx), axis=-1))
    # descending on the quantized values
    v = np.asarray(vals, np.float32)
    assert np.all(np.diff(v, axis=-1) <= 0)
    # indices valid and unique per row
    assert np.asarray(idx).min() >= 0 and np.asarray(idx).max() < a
    for b in range(2):
        assert len(set(np.asarray(idx)[b])) == k
