"""64-bit particle-id policy (VERDICT r3 weak #4).

Under default JAX config jnp.int64 silently truncates to int32, so at
the 2048^3 stretch shape (8.6e9 particles) ids, FOF labels and segment
keys would all wrap. The policy: uint32 through 2^32 sites (covers
every mesh to 1625^3 with no config change -- int32 would already wrap
at 1290^3), and an explicit jax_enable_x64 requirement beyond, enforced
by store.ensure_id_capacity instead of silent truncation. The reference
is i8 end-to-end (store.h ID column)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpm_tpu.store import Store, id_dtype, ensure_id_capacity


def test_id_dtype_policy():
    assert id_dtype(2 ** 20) == jnp.uint32
    assert id_dtype(2 ** 32) == jnp.uint32
    # 2048^3 without x64: a hard error, never a silent wrap
    with pytest.raises(RuntimeError, match="jax_enable_x64"):
        id_dtype(2048 ** 3)
    ensure_id_capacity(2 ** 32)  # no raise
    with pytest.raises(RuntimeError, match="jax_enable_x64"):
        ensure_id_capacity(2 ** 40)
    with jax.enable_x64():
        assert id_dtype(2048 ** 3) == jnp.int64
        ensure_id_capacity(2 ** 40)


def test_q_from_id_uint32_above_int31():
    """ids from a 1600^3 lattice reach 4.1e9: representable in uint32
    with NO x64 -- and q_from_id must not overflow on its Python-int
    stride constants (weak-type parsing rejects ints >= 2^31)."""
    nc = 1600
    ids = np.array([0, 2 ** 31 + 12345, nc ** 3 - 1], dtype=np.uint32)
    st = Store(x=jnp.zeros((3, 3), jnp.float32), id=jnp.asarray(ids),
               q_nc=(nc, nc, nc), q_scale=(0.5, 0.5, 0.5))
    q = np.asarray(st.q_from_id())
    i = ids.astype(np.int64)
    ref = np.stack([i // (nc * nc), (i // nc) % nc, i % nc],
                   axis=-1) * 0.5
    np.testing.assert_allclose(q, ref.astype(np.float32))


def test_q_from_id_int64_stretch_shape():
    """The 2048^3 stretch shape: 8.6e9 ids ride int64 under x64 and
    q_from_id recovers the exact lattice coordinates."""
    nc = 2048
    with jax.enable_x64():
        ids = np.array([0, 2 ** 32 + 777, nc ** 3 - 1], dtype=np.int64)
        st = Store(x=jnp.zeros((3, 3), jnp.float32),
                   id=jnp.asarray(ids),
                   q_nc=(nc, nc, nc), q_scale=(1.0, 1.0, 1.0))
        assert st.id.dtype == np.dtype(np.int64)
        q = np.asarray(st.q_from_id())
    ref = np.stack([ids // (nc * nc), (ids // nc) % nc, ids % nc],
                   axis=-1)
    np.testing.assert_allclose(q, ref.astype(np.float32))


def test_ncdm_split_id_dtype_guard():
    """split-ncdm ids reach nsplit * q_size; the guard must catch the
    wrap case loudly."""
    from fastpm_tpu.store import id_dtype as idt
    # 16 shells x 64 dirs on a 1024^3 site grid -> 2^40: needs x64
    with pytest.raises(RuntimeError, match="jax_enable_x64"):
        idt(1024 ** 3 * 16 * 64)
