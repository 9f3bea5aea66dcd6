"""Packed-real device-boundary layer: round trips and cjit semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from quantized_channel_estimation_tpu.ops import boundary as B


def test_pack_unpack_roundtrip(rng):
    z = (rng.standard_normal((4, 5)) + 1j * rng.standard_normal((4, 5))).astype(np.complex64)
    p = B.pack(z)
    assert isinstance(p, B.Packed)
    np.testing.assert_allclose(B.asnumpy(p), z)
    np.testing.assert_allclose(np.asarray(B.unpack(p)), z)


def test_pack_real_passthrough():
    x = jnp.ones((3,))
    assert B.pack(x) is x


def test_cjit_complex_signature(rng):
    z = (rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))).astype(np.complex64)

    def f(a, scale):
        return a @ a.conj().T * scale

    g = B.cjit(f)
    out = g(z, 2.0)
    assert isinstance(out, B.Packed)
    np.testing.assert_allclose(B.asnumpy(out), (z @ z.conj().T) * 2,
                               rtol=1e-5)


def test_cjit_packed_input_chains(rng):
    """Outputs of one cjit stage feed the next without host round trips."""
    z = (rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))).astype(np.complex64)
    f = B.cjit(lambda a: a + 1)
    g = B.cjit(lambda a: jnp.sum(jnp.abs(a)))
    out = g(f(z))
    assert not isinstance(out, B.Packed)  # real scalar stays real
    np.testing.assert_allclose(float(out), np.sum(np.abs(z + 1)), rtol=1e-5)


def test_cjit_static_args(rng):
    z = (rng.standard_normal((4,)) + 1j * rng.standard_normal((4,))).astype(np.complex64)
    f = B.cjit(lambda a, n: a * n, static_argnums=(1,))
    np.testing.assert_allclose(B.asnumpy(f(z, 3)), z * 3, rtol=1e-6)


def test_cjit_pytree_leaves(rng):
    """Mixed pytrees with complex and real leaves cross the boundary."""
    tree = {"c": (rng.standard_normal((3,)) + 1j * rng.standard_normal((3,))).astype(np.complex64),
            "r": jnp.arange(3.0)}
    f = B.cjit(lambda t: {"c": t["c"] * 2, "r": t["r"] + 1})
    out = f(tree)
    assert isinstance(out["c"], B.Packed)
    np.testing.assert_allclose(B.asnumpy(out["c"]), tree["c"] * 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["r"]), [1.0, 2.0, 3.0])


def test_graft_entry_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(not jnp.iscomplexobj(l) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0
