"""PE subsystem: Laplacian eigen stats (parity with the reference's numpy
pipeline), SignNet sign-invariance, frozen-random transform semantics."""

import jax
import numpy as np

from graph_hscn_tpu.config.config import DataConfig, PEConfig
from graph_hscn_tpu.data.batching import GraphData, PadBudget, pack_batch
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.models.signnet import SignNetNodeEncoder
from graph_hscn_tpu.transform.posenc import (batched_eigh,
                                             compute_posenc_stats,
                                             eigvec_normalizer)
from graph_hscn_tpu.utils.logger import Logger


def _path_graph(n=6):
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return GraphData(x=np.ones((n, 3), np.float32), edge_index=ei)


def test_eigh_path_graph_spectrum():
    """Sym-normalized Laplacian of a path graph: eigenvalues in [0, 2],
    smallest = 0 with constant-ish eigenvector scaled by sqrt(deg)."""
    g = compute_posenc_stats(_path_graph(6), max_freqs=10)
    vals = g.eigvals[0]
    assert abs(vals[0]) < 1e-6
    # N=6 < max_freqs=10 -> NaN padding.
    assert np.isnan(vals[6:]).all()
    assert np.isnan(g.eigvecs[:, 6:]).all()
    # L2-normalized columns.
    for k in range(6):
        np.testing.assert_allclose(np.linalg.norm(g.eigvecs[:, k]), 1.0,
                                   rtol=1e-5)
    # Eigen equation check on the first nontrivial pair.
    n = 6
    a = np.zeros((n, n))
    src, dst = g.edge_index
    np.add.at(a, (dst, src), 1.0)
    d = a.sum(1)
    lap = np.eye(n) - a / np.sqrt(np.outer(d, d))
    v = g.eigvecs[:, 1]
    np.testing.assert_allclose(lap @ v, vals[1] * v, atol=1e-5)


def test_eigvec_normalizers():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(7, 3))
    l1 = eigvec_normalizer(m, "L1")
    np.testing.assert_allclose(np.abs(l1).sum(0), 1.0, rtol=1e-6)
    am = eigvec_normalizer(m, "abs-max")
    np.testing.assert_allclose(np.abs(am).max(0), 1.0, rtol=1e-6)


def test_batched_eigh_matches_host():
    import jax.numpy as jnp
    g = _path_graph(8)
    host = compute_posenc_stats(g, max_freqs=8)
    n = 8
    a = np.zeros((1, n, n), np.float32)
    src, dst = g.edge_index
    for s, r in zip(src, dst):
        a[0, r, s] = 1.0
    evals, _ = batched_eigh(jnp.asarray(a), jnp.ones((1, n), bool))
    np.testing.assert_allclose(np.sort(np.asarray(evals[0])),
                               host.eigvals[0][:8], atol=1e-4)


def _pe_batch():
    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=4, num_graphs=8))
    dm.apply_transform(lambda g: compute_posenc_stats(g, max_freqs=10))
    return dm, dm.example_batch()


def test_signnet_sign_invariance():
    dm, batch = _pe_batch()
    enc = SignNetNodeEncoder(dim_in=dm.num_features, dim_emb=16, dim_pe=4,
                             max_freqs=10)
    params = enc.init(jax.random.PRNGKey(0), batch)
    out1 = enc.apply(params, batch)
    flipped = batch.replace(eigvecs=-batch.eigvecs)
    out2 = enc.apply(params, flipped)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)
    assert out1.shape == (batch.num_nodes_padded, 16)


def test_frozen_random_transform():
    dm, _ = _pe_batch()
    # Reset: attach_posenc recomputes stats itself.
    dm = DataModule.from_config(DataConfig(dataset_name="peptides_func",
                                           batch_size=4, num_graphs=8))
    pe_cfg = PEConfig(dim_in=dm.num_features, dim_emb=16, dim_pe=4)
    from graph_hscn_tpu.transform.posenc import attach_posenc
    attach_posenc(dm, pe_cfg, Logger(metric_name="ap"), frozen_random=True)
    assert dm.num_features == 16
    for g in dm.graphs:
        assert g.x.shape[1] == 16
        assert np.isfinite(g.x).all()


def test_signnet_mlp_variant_sign_invariance():
    """GINDeepSigns ("MLP" model_type): concat over K, still
    sign-invariant, and its rho consumes K*phi_out_dim inputs."""
    dm, batch = _pe_batch()
    enc = SignNetNodeEncoder(dim_in=dm.num_features, dim_emb=16, dim_pe=4,
                             max_freqs=10, phi_out_dim=3,
                             model_type="MLP")
    params = enc.init(jax.random.PRNGKey(0), batch)
    out1 = enc.apply(params, batch)
    out2 = enc.apply(params, batch.replace(eigvecs=-batch.eigvecs))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)
    assert out1.shape == (batch.num_nodes_padded, 16)
    # rho input width = K * phi_out_dim (reference signnet.py:189).
    rho_kernel = params["params"]["Dense_0"]["kernel"]
    assert rho_kernel.shape[0] == 10 * 3
    # Differs from the DeepSet aggregation with the same seed.
    enc_ds = SignNetNodeEncoder(dim_in=dm.num_features, dim_emb=16,
                                dim_pe=4, max_freqs=10, phi_out_dim=3)
    params_ds = enc_ds.init(jax.random.PRNGKey(0), batch)
    out_ds = enc_ds.apply(params_ds, batch)
    assert not np.allclose(np.asarray(out1), np.asarray(out_ds))


def test_sparse_lap_stats_matches_dense():
    """LOBPCG PE path vs dense eigh on a mid-size graph: eigenvalues
    agree and every returned pair satisfies the eigen equation (vectors
    within degenerate eigenspaces may legitimately differ)."""
    import numpy as np

    from graph_hscn_tpu.data.synthetic import make_voc_superpixels
    from graph_hscn_tpu.transform.posenc import (_sym_laplacian,
                                                 compute_posenc_stats,
                                                 sparse_lap_stats)

    g = make_voc_superpixels(num_graphs=1, seed=3, mean_nodes=300)[0]
    K = 6
    dense = compute_posenc_stats(g, max_freqs=K)
    sparse = sparse_lap_stats(g, max_freqs=K, iters=400)

    np.testing.assert_allclose(sparse.eigvals[0], dense.eigvals[0],
                               atol=1e-5)
    lap = _sym_laplacian(g, "sym")
    v = np.asarray(sparse.eigvecs, np.float64)
    lam = np.asarray(sparse.eigvals[0], np.float64)
    resid = lap @ v - v * lam[None, :]
    assert np.abs(resid).max() < 1e-4

    # Threshold routing: a graph above dense_threshold takes the sparse
    # path inside compute_posenc_stats.
    big = compute_posenc_stats(g, max_freqs=K, dense_threshold=100)
    np.testing.assert_allclose(big.eigvals[0], dense.eigvals[0], atol=1e-5)
