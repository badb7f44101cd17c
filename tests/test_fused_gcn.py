"""Fused dense GCN-stack kernel vs the layer-by-layer dense reference:
forward and full gradients (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.ops.pallas.fused_gcn_kernel import (_folded_operator,
                                                        fused_gcn_stack)


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

def _ref_stack(x_blocks, adj, params):
    a_hat = _folded_operator(adj)
    h = x_blocks
    for l, p in enumerate(params):
        z = jnp.einsum("gij,gjf->gif", a_hat, h @ p["kernel"]) + p["bias"]
        h = jax.nn.relu(z) if l < len(params) - 1 else z
    return h


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    G, S, F0 = 3, 32, 9
    dims = [F0, 16, 16, 10]
    x = jnp.asarray(rng.normal(size=(G, S, F0)).astype(np.float32))
    adj = np.zeros((G, S, S), np.float32)
    for g in range(G):
        for _ in range(60):
            i, j = rng.integers(0, 24, 2)
            if i != j:
                adj[g, i, j] = 1.0
                adj[g, j, i] = 1.0
    adj = jnp.asarray(adj)
    params = []
    for i in range(len(dims) - 1):
        params.append({
            "kernel": jnp.asarray(rng.normal(
                size=(dims[i], dims[i + 1])).astype(np.float32) * 0.2),
            "bias": jnp.asarray(rng.normal(
                size=(dims[i + 1],)).astype(np.float32) * 0.1),
        })
    return x, adj, params


def test_fused_forward_matches_reference(setup):
    x, adj, params = setup
    out = fused_gcn_stack(x, adj, params, None, 0.0, True)
    ref = _ref_stack(x, adj, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_backward_matches_reference(setup):
    x, adj, params = setup
    g = jnp.asarray(np.random.default_rng(1).normal(
        size=np.asarray(_ref_stack(x, adj, params)).shape)
        .astype(np.float32))

    def f_fused(x, params):
        return jnp.vdot(fused_gcn_stack(x, adj, params, None, 0.0, True), g)

    def f_ref(x, params):
        return jnp.vdot(_ref_stack(x, adj, params), g)

    (dx_f, dp_f) = jax.grad(f_fused, argnums=(0, 1))(x, params)
    (dx_r, dp_r) = jax.grad(f_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(dp_f),
                    jax.tree_util.tree_leaves(dp_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_fused_bf16_forward_close_to_f32(setup):
    """bf16 operands / f32 accumulation: forward within bf16 tolerance of
    the f32 kernel; logits come back f32 (the mixed-precision contract)."""
    x, adj, params = setup
    out32 = fused_gcn_stack(x, adj, params, None, 0.0, True)
    out16 = fused_gcn_stack(x.astype(jnp.bfloat16), adj, params,
                            None, 0.0, True)
    assert out16.dtype == jnp.float32          # logits stay f32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=5e-2, atol=5e-2)


def test_fused_bf16_backward_close_to_f32(setup):
    x, adj, params = setup
    g = jnp.asarray(np.random.default_rng(2).normal(
        size=np.asarray(_ref_stack(x, adj, params)).shape)
        .astype(np.float32))

    def f(xi, params):
        return jnp.vdot(fused_gcn_stack(xi, adj, params, None, 0.0, True),
                        g)

    dx32, dp32 = jax.grad(f, argnums=(0, 1))(x, params)
    dx16, dp16 = jax.grad(f, argnums=(0, 1))(x.astype(jnp.bfloat16), params)
    assert dx16.dtype == jnp.bfloat16          # cotangent matches primal
    # Param grads stay f32 (master params).
    for leaf in jax.tree_util.tree_leaves(dp16):
        assert leaf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(dx16, dtype=np.float32),
                               np.asarray(dx32), rtol=1e-1, atol=1e-1)
    for a, b in zip(jax.tree_util.tree_leaves(dp16),
                    jax.tree_util.tree_leaves(dp32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-1, atol=2e-1)


def test_fused_bf16_dropout_bits_path(setup):
    """bf16 + dropout (external-bits CPU path): deterministic given bits,
    and the kept elements carry the 1/(1-p) scale like the f32 path."""
    x, adj, params = setup
    G, S, _ = x.shape
    dims = [p["kernel"].shape[1] for p in params]
    rng = jax.random.PRNGKey(3)
    bits = [jax.random.bits(jax.random.fold_in(rng, l), (G, S, dims[l]),
                            dtype=jnp.uint32)
            for l in range(len(params) - 1)]
    out16a = fused_gcn_stack(x.astype(jnp.bfloat16), adj, params,
                             {"bits": bits}, 0.3, True)
    out16b = fused_gcn_stack(x.astype(jnp.bfloat16), adj, params,
                             {"bits": bits}, 0.3, True)
    np.testing.assert_array_equal(np.asarray(out16a), np.asarray(out16b))
    out32 = fused_gcn_stack(x, adj, params, {"bits": bits}, 0.3, True)
    np.testing.assert_allclose(np.asarray(out16a), np.asarray(out32),
                               rtol=1e-1, atol=1e-1)
