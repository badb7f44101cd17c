"""Fused dense GCN-stack kernel vs the layer-by-layer dense reference:
forward and full gradients (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_hscn_tpu.ops.pallas.fused_gcn_kernel import (_folded_operator,
                                                        fused_gcn_stack)


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
