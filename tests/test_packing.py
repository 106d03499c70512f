"""Property tests for sign packing (reference layout semantics:
bitdelta/binary_gemm_kernel.py:6-46 — K-axis, LSB-first, int32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitdelta_tpu.ops.packing import (
    pack_signs,
    pack_signs_np,
    unpack_signs,
    unpack_to_pm1,
)


@pytest.mark.parametrize("shape", [(32, 8), (64, 128), (256, 16), (2, 64, 8)])
def test_roundtrip(shape):
    rng = np.random.default_rng(0)
    signs = rng.integers(0, 2, size=shape).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    assert packed.dtype == jnp.int32
    assert packed.shape == (*shape[:-2], shape[-2] // 32, shape[-1])
    out = np.asarray(unpack_signs(packed))
    np.testing.assert_array_equal(out, signs)


def test_lsb_first_layout():
    # Word [k32, n] bit s must be signs[k32*32 + s, n] — the reference's
    # contiguous LSB-first convention.
    signs = np.zeros((64, 4), dtype=bool)
    signs[0, 0] = True     # word 0, bit 0 -> value 1
    signs[1, 0] = True     # word 0, bit 1 -> value 2
    signs[33, 2] = True    # word 1, bit 1 -> value 2
    packed = np.asarray(pack_signs(jnp.asarray(signs)))
    assert packed[0, 0] == 3
    assert packed[1, 2] == 2
    assert packed[0, 2] == 0


def test_all_ones_is_minus_one_word():
    signs = np.ones((32, 4), dtype=bool)
    packed = np.asarray(pack_signs(jnp.asarray(signs)))
    # 32 set bits in an int32 view == -1
    assert (packed == -1).all()


def test_pm1_mapping():
    signs = np.array([[True], [False]] * 16, dtype=bool)  # (32, 1)
    pm1 = np.asarray(unpack_to_pm1(pack_signs(jnp.asarray(signs)), jnp.float32))
    np.testing.assert_array_equal(pm1[:, 0], np.where(signs[:, 0], 1.0, -1.0))


def test_numpy_pack_matches_jax():
    rng = np.random.default_rng(1)
    signs = rng.integers(0, 2, size=(128, 96)).astype(bool)
    np.testing.assert_array_equal(
        pack_signs_np(signs), np.asarray(pack_signs(jnp.asarray(signs)))
    )


def test_k_shard_contiguity():
    # K-axis sharding by multiples of 32 rows == contiguous word slices;
    # this is what makes row-parallel TP layouts work without repacking.
    rng = np.random.default_rng(2)
    signs = rng.integers(0, 2, size=(128, 8)).astype(bool)
    full = np.asarray(pack_signs(jnp.asarray(signs)))
    lo = np.asarray(pack_signs(jnp.asarray(signs[:64])))
    hi = np.asarray(pack_signs(jnp.asarray(signs[64:])))
    np.testing.assert_array_equal(full[:2], lo)
    np.testing.assert_array_equal(full[2:], hi)


def test_pack_under_jit():
    signs = jnp.asarray(np.random.default_rng(3).integers(0, 2, (64, 32), dtype=np.int64).astype(bool))
    packed = jax.jit(pack_signs)(signs)
    np.testing.assert_array_equal(np.asarray(unpack_signs(packed)), np.asarray(signs))


def test_repack_pairs_layout():
    # Pair word [k16, ni*128 + r] holds K rows [16*k16, 16*k16+16) of
    # column ni*256 + r (low half) and ni*256 + 128 + r (high half).
    import numpy as np
    from bitdelta_tpu.ops.packing import pack_signs, repack_pairs

    rng = np.random.default_rng(31)
    k, n = 96, 512
    signs = rng.integers(0, 2, (k, n)).astype(bool)
    pair = np.asarray(repack_pairs(pack_signs(jnp.asarray(signs)))).view(np.uint32)
    assert pair.shape == (k // 16, n // 2)
    for k16, j in [(0, 0), (1, 127), (2, 128), (5, 200), (3, 255)]:
        ni, r = divmod(j, 128)
        word = int(pair[k16, j])
        for s in range(16):
            assert ((word >> s) & 1) == int(signs[16 * k16 + s, ni * 256 + r])
            assert ((word >> (16 + s)) & 1) == int(
                signs[16 * k16 + s, ni * 256 + 128 + r])


def test_repack_pairs_leading_dims_and_popcount():
    import numpy as np
    from bitdelta_tpu.ops.packing import (column_popcount, pack_signs,
                                          repack_pairs)

    rng = np.random.default_rng(32)
    signs = rng.integers(0, 2, (2, 3, 64, 256)).astype(bool)
    packed = pack_signs(jnp.asarray(signs))
    pair = repack_pairs(packed)
    assert pair.shape == (2, 3, 4, 128)
    cnt = np.asarray(column_popcount(packed))
    np.testing.assert_array_equal(cnt, signs.sum(axis=-2))


def test_unpair_roundtrip():
    import numpy as np
    from bitdelta_tpu.ops.packing import pack_signs, repack_pairs, unpair_packed

    rng = np.random.default_rng(33)
    for shape in [(64, 256), (3, 96, 512), (2, 2, 32, 256)]:
        signs = rng.integers(0, 2, shape).astype(bool)
        packed = pack_signs(jnp.asarray(signs))
        back = unpair_packed(repack_pairs(packed))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(packed))
